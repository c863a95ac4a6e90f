"""CLI argument handling with the reference's single-letter flag semantics.

The reference parses flags with the ARG_INIT/ARG_FLAGS/ARG_POSITIVE/
ARG_NON_NEGATIVE/ARG_REAL macro family (reference DB.h:79-123): boolean
single-letter flags may be ganged ("-vk"), value flags take their value
immediately after the letter ("-w80", "-ofile", "-e'expr'").
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field


@dataclass
class ArgSpec:
    prog: str
    usage: str
    flags: str = ""              # ganged boolean flag letters, e.g. "vki"
    int_opts: dict = field(default_factory=dict)    # letter -> (name, default, min)
    str_opts: dict = field(default_factory=dict)    # letter -> default
    float_opts: dict = field(default_factory=dict)  # letter -> (default, min, max)
    help_lines: tuple = ()


class ArgError(SystemExit):
    pass


def usage_exit(spec: ArgSpec) -> None:
    sys.stderr.write(f"Usage: {spec.prog} {spec.usage}\n")
    if spec.help_lines:
        sys.stderr.write("\n")
        for line in spec.help_lines:
            sys.stderr.write(f"      {line}\n")
    raise SystemExit(1)


def parse_flags(spec: ArgSpec, argv: list[str]):
    """Return (flags: dict[letter,bool], opts: dict[letter,value], positional)."""
    flags = {c: False for c in spec.flags}
    opts = {}
    for letter, (_, default, _) in spec.int_opts.items():
        opts[letter] = default
    for letter, default in spec.str_opts.items():
        opts[letter] = default
    for letter, (default, _, _) in spec.float_opts.items():
        opts[letter] = default

    positional = []
    for arg in argv:
        if arg.startswith("-") and len(arg) > 1:
            c = arg[1]
            if c in spec.int_opts:
                name, _, minv = spec.int_opts[c]
                try:
                    v = int(arg[2:])
                except ValueError:
                    sys.stderr.write(f"{spec.prog}: -{c} '{arg[2:]}' argument is not an integer\n")
                    raise SystemExit(1)
                if v < minv:
                    kind = "positive" if minv > 0 else "non-negative"
                    sys.stderr.write(f"{spec.prog}: {name} must be {kind}\n")
                    raise SystemExit(1)
                opts[c] = v
            elif c in spec.str_opts:
                opts[c] = arg[2:]
            elif c in spec.float_opts:
                _, lo, hi = spec.float_opts[c]
                try:
                    v = float(arg[2:])
                except ValueError:
                    sys.stderr.write(f"{spec.prog}: -{c} '{arg[2:]}' argument is not a real number\n")
                    raise SystemExit(1)
                if (lo is not None and v < lo) or (hi is not None and v > hi):
                    sys.stderr.write(f"{spec.prog}: -{c} argument out of range\n")
                    raise SystemExit(1)
                opts[c] = v
            else:
                for ch in arg[1:]:
                    if ch not in flags:
                        sys.stderr.write(f"{spec.prog}: -{ch} is an illegal option\n")
                        usage_exit(spec)
                    flags[ch] = True
        else:
            positional.append(arg)
    return flags, opts, positional
