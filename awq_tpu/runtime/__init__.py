from awq_tpu.runtime.engine import InferenceEngine  # noqa: F401
from awq_tpu.runtime.generate import generate, StreamGenerator  # noqa: F401
from awq_tpu.runtime.sampling import sample_logits  # noqa: F401
