from awq_tpu.models.llama import (  # noqa: F401
    init_params,
    init_qparams,
    forward,
    quantize_params,
    init_kv_cache,
)
from awq_tpu.models.hf_import import import_hf_model  # noqa: F401
