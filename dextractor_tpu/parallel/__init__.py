from .mesh import make_mesh, data_sharding
from .pipeline import (
    qv_encode_step,
    qv_scan_step,
    sharded_qv_encode,
    sharded_qv_scan,
    sharded_twobit_encode,
    sharded_twobit_decode,
    null_run_luts,
)
