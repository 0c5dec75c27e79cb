"""awq_tpu — a TPU-native AWQ quantization + inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mit-han-lab/llm-awq (activation-aware weight quantization, W4A16/W3A16
inference kernels, TinyChat-class serving), built TPU-first:

- pure-functional models over parameter pytrees (no module surgery),
- Pallas kernels for the hot ops (fused dequant matmul, decode attention),
- GSPMD sharding over `jax.sharding.Mesh` instead of accelerate device maps.

See SURVEY.md at the repo root for the structural map of the reference.
"""

__version__ = "0.1.0"

from awq_tpu.config import QuantConfig, ModelConfig  # noqa: F401
