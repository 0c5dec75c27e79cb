"""W8A8 int8 compute path (vision towers; serving-grade int8 linears).

TPU-native counterparts of the reference CUDA kernels:
- ``w8a8_gemm_forward_cuda`` / fused-bias variant (``csrc/w8a8/w8a8_gemm_cuda.cu``)
  -> :func:`w8a8_matmul` — int8xint8->int32 on the MXU, per-OC weight scale x
  per-token activation scale dequant epilogue (XLA fuses it).
- ``invoke_quant`` per-token dynamic quant (``csrc/w8a8/quantization.cu:56-113``)
  -> :func:`quant_per_token`.
- ``rms_norm_general`` LN+quant (``csrc/w8a8/layernorm.cu:56-231``)
  -> :func:`layer_norm_quant` / :func:`rms_norm_quant`.
- ``gelu_and_quant`` / ``silu_and_mul`` (``csrc/w8a8/act.cu``)
  -> :func:`gelu_quant` / :func:`silu_and_mul`.

And of the torch-side ``W8A8OF16Linear*`` (``awq/quantize/w8a8_linear.py``):
:class:`W8A8Linear` with static per-OC weight scales and dynamic per-token
input scales; ``FakeW8A8Linear``'s accuracy-ablation role is covered by
:func:`fake_quant_w8a8`.

On TPU there is no reason for the reference's preallocated activation
buffer arena (``tinychat/utils/input_metadata.py``) — XLA owns scheduling
and buffer reuse.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quant_per_token(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-token int8 quant. Returns (q [..., D] int8,
    scale [..., 1] f32)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-5) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -128, 127).astype(jnp.int8)
    return q, scale


def quant_weight_per_oc(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 weight quant for ``[IC, OC]``."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -128, 127).astype(jnp.int8)
    return q, scale[0]


def w8a8_matmul(
    q_x: jax.Array,          # [..., IC] int8
    x_scale: jax.Array,      # [..., 1] f32 per token
    q_w: jax.Array,          # [IC, OC] int8
    w_scale: jax.Array,      # [OC] f32
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8 x int8 -> int32 (MXU) with fused dequant(+bias) epilogue."""
    acc = jax.lax.dot_general(
        q_x, q_w,
        dimension_numbers=(((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class W8A8Linear:
    """int8 weight + per-OC scale; dynamic per-token input scales.

    Counterpart of ``W8A8OF16LinearDynamicInputScale``
    (``awq/quantize/w8a8_linear.py:70-211``)."""

    qweight: jax.Array                # int8 [IC, OC]
    scale: jax.Array                  # f32 [OC]
    bias: Optional[jax.Array] = None  # [OC]

    @staticmethod
    def from_linear(w: jax.Array, bias: Optional[jax.Array] = None) -> "W8A8Linear":
        q, s = quant_weight_per_oc(w)
        return W8A8Linear(qweight=q, scale=s, bias=bias)

    def __call__(self, q_x, x_scale, out_dtype=jnp.bfloat16):
        return w8a8_matmul(q_x, x_scale, self.qweight, self.scale,
                           self.bias, out_dtype)


def layer_norm_quant(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float
) -> Tuple[jax.Array, jax.Array]:
    """LayerNorm -> per-token int8 (counterpart of N11 ``rms_norm_general``
    with use_per_token_quant=true)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return quant_per_token(out)


def rms_norm_quant(
    x: jax.Array, weight: jax.Array, eps: float
) -> Tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return quant_per_token(out)


def gelu_quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """tanh-GELU then per-token int8 (counterpart of N12 ``gelu_and_quant``)."""
    h = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
    return quant_per_token(h)


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """SwiGLU on a fused [..., 2*D] gate|up tensor (N12 ``silu_and_mul``)."""
    d = gate_up.shape[-1] // 2
    g, u = gate_up[..., :d], gate_up[..., d:]
    return (jax.nn.silu(g.astype(jnp.float32)) *
            u.astype(jnp.float32)).astype(gate_up.dtype)


def fake_quant_w8a8(x: jax.Array, w: jax.Array) -> jax.Array:
    """Accuracy-simulation path (counterpart of ``FakeW8A8Linear``,
    ``w8a8_linear.py:214-277``): quantize/dequantize both operands, matmul
    in float."""
    q_x, sx = quant_per_token(x)
    q_w, sw = quant_weight_per_oc(w)
    xf = q_x.astype(jnp.float32) * sx
    wf = q_w.astype(jnp.float32) * sw[None, :]
    return jnp.matmul(xf, wf)
