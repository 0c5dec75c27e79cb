from awq_tpu.quant.core import (  # noqa: F401
    pseudo_quantize,
    quantize_groupwise,
    dequantize_groupwise,
)
from awq_tpu.quant.packing import (  # noqa: F401
    pack_int4,
    unpack_int4,
    pack_int3_dense,
    unpack_int3_dense,
    PACK_CHUNK,
    PACK_FACTOR,
)
