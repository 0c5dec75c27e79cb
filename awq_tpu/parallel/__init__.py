from awq_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    parse_mesh_arg,
    pick_mesh_shape,
)
from awq_tpu.parallel.shard import (  # noqa: F401
    cache_pspec,
    param_pspecs,
    shard_cache,
    shard_params,
)
from awq_tpu.parallel.deploy import (  # noqa: F401
    TPParams,
    build_tp_params,
)
from awq_tpu.parallel.tp import (  # noqa: F401
    check_tp_compatible,
    tp_decode_scan,
    tp_decode_step_batched,
    tp_decode_step_paged,
    tp_forward,
    tp_local_cfg,
    tp_prefill_sp,
    tp_verify_step_batched,
)
