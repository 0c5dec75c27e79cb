from awq_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    pick_mesh_shape,
)
from awq_tpu.parallel.shard import (  # noqa: F401
    cache_pspec,
    param_pspecs,
    shard_cache,
    shard_params,
)
from awq_tpu.parallel.tp import (  # noqa: F401
    check_tp_compatible,
    tp_decode_scan,
    tp_forward,
    tp_local_cfg,
    tp_prefill_sp,
)
