"""Device-dispatch policy — the ONE place that decides host vs device.

Two independent questions, two predicates:

``device_default()`` — should a codec entry point (encode_*/decode_*,
and therefore every CLI) run its batched device pipeline or its native
host path when the caller passed ``device=None``?  Policy: the env var
``DXT_DEVICE`` wins ("1" forces the device pipeline, "0" forces the
native host path); otherwise use the device exactly when an accelerator
backend is active.  Both codec directions and all CLIs consult this one
predicate — encode and decode never default differently.

    Tunnel-environment exception: this development environment reaches
    its TPU through a TCP relay (~10-40 MB/s host<->device, minutes of
    first-transfer warmup per process), so end-to-end CLI runs through
    the tunnel measure the tunnel, not the codec.  Set ``DXT_DEVICE=0``
    in such environments; on a production TPU host (real DMA) the
    default is correct as-is.

``pallas_ok()`` — may a Mosaic (Pallas TPU) kernel be dispatched?  True
only on the TPU backend: the kernels lower through Mosaic and would fail
on GPU, where the XLA formulations run instead.  Callers that already
know their width/shape constraints AND this predicate may dispatch the
fused kernels.
"""

from __future__ import annotations

import os


def pallas_ok() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def device_default() -> bool:
    v = os.environ.get("DXT_DEVICE")
    if v:
        return v == "1"
    import jax

    return jax.default_backend() != "cpu"
