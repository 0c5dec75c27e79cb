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
