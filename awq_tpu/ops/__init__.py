from awq_tpu.ops.w4a16 import (  # noqa: F401
    QLinear,
    quantize_linear,
    w4a16_matmul,
    qlinear_apply,
)
