"""Shared functional building blocks for decoder models.

Counterparts of the reference's rewritten modules (``tinychat/modules/``,
``tinychat/models/llama.py:24-57``), expressed as pure functions over
parameter pytrees. Norms/softmax run in f32, matmuls in bf16 — XLA fuses
the elementwise work into neighbouring ops, so there is no need for the
reference's fused RMSNorm/rope CUDA kernels (N6/N7/N8) as separate entities.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig
from awq_tpu.ops.w4a16 import QLinear, qlinear_apply


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Linear:
    """Unquantized linear parameters (fp16/bf16 baseline path)."""

    w: jax.Array                      # [IC, OC]
    b: Optional[jax.Array] = None     # [OC]


def linear_apply(p, x: jax.Array) -> jax.Array:
    """Apply a Linear or QLinear to ``x [..., IC]``."""
    if isinstance(p, QLinear):
        return qlinear_apply(p, x)
    out = jnp.matmul(
        x, p.w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if p.b is not None:
        out = out + p.b.astype(out.dtype)
    return out


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """T5/Llama RMSNorm (reference kernel N6, ``csrc/layernorm/layernorm.cu``)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# RoPE
# --------------------------------------------------------------------------


def rope_table(cfg: ModelConfig, max_len: int) -> Tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables ``[max_len, rotary_dim]`` in f32.

    HF-llama convention (rotate_half, frequencies duplicated across the two
    halves). Supports llama3-style frequency rescaling
    (counterpart of the reference freqs precompute, ``tinychat/models/llama.py:39-57``)
    and NeoX-style partial rotary dims (``rotary_pct``).
    """
    rotary_dim = int(cfg.head_dim * cfg.rotary_pct) // 2 * 2
    half = rotary_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    rs = cfg.rope_scaling
    if rs is not None and rs.rope_type == "llama3":
        low_wl = rs.original_max_position_embeddings / rs.low_freq_factor
        high_wl = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2 * jnp.pi / inv_freq
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor
        )
        scaled = jnp.where(
            wavelen > low_wl,
            inv_freq / rs.factor,
            jnp.where(
                wavelen < high_wl,
                inv_freq,
                (1 - smooth) * inv_freq / rs.factor + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                     # [T, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)     # [T, rotary_dim]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(
    q: jax.Array,            # [B, S, n_q, hd]
    k: jax.Array,            # [B, S, n_kv, hd]
    cos: jax.Array,          # [max_len, rotary_dim]  (rotary_dim <= hd)
    sin: jax.Array,
    positions: jax.Array,    # [S] shared, or [B, S] per-row positions
) -> Tuple[jax.Array, jax.Array]:
    if positions.ndim == 1:
        c = cos[positions][None, :, None, :]
        s = sin[positions][None, :, None, :]
    else:  # per-row (continuous batching: rows decode at own lengths)
        c = cos[positions][:, :, None, :]
        s = sin[positions][:, :, None, :]
    rd = cos.shape[-1]

    def rot(x):
        xf = x[..., :rd].astype(jnp.float32)
        half = rd // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        out = (xf * c + rotated * s).astype(x.dtype)
        if rd == x.shape[-1]:
            return out
        return jnp.concatenate([out, x[..., rd:]], axis=-1)

    return rot(q), rot(k)


def alibi_slopes(n_heads: int) -> jax.Array:
    """ALiBi slopes (MPT; counterpart of ``tinychat/models/mpt.py:22-46``)."""
    import math

    def pow2slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        vals = pow2slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        vals = pow2slopes(closest)
        extra = pow2slopes(2 * closest)[0::2][: n_heads - closest]
        vals = vals + extra
    return jnp.asarray(vals, jnp.float32)


# --------------------------------------------------------------------------
# Attention over a static KV cache
# --------------------------------------------------------------------------


def attention(
    q: jax.Array,            # [B, S, n_q, hd]
    k_cache: jax.Array,      # [B, n_kv, T, hd]  (full static cache)
    v_cache: jax.Array,      # [B, n_kv, T, hd]
    start_pos: jax.Array,    # scalar: this chunk occupies [start, start+S)
    bias: Optional[jax.Array] = None,  # e.g. alibi [n_q, 1, T]
) -> jax.Array:
    """Causal (chunk-offset) attention, GQA-aware, masked over a static cache.

    The chunked-prefill mask mirrors the reference
    (``tinychat/models/llama.py:342-350``): query i may attend to cache
    positions j <= start_pos + i. The cache is **head-major** so each
    head's [T, hd] slab is contiguous in HBM — the layout the Pallas
    flash-decode kernel (counterpart of N5) streams with full-width DMAs.
    """
    b, s, n_q, hd = q.shape
    n_kv, t = k_cache.shape[1], k_cache.shape[2]
    groups = n_q // n_kv

    if (
        s == 1
        and bias is None
        and t % 256 == 0
        and hd % 128 == 0  # hd<128 trips Mosaic memref slicing; XLA path
        and jax.default_backend() == "tpu"
    ):
        from awq_tpu.ops.decode_attn import flash_decode

        out = flash_decode(q[:, 0], k_cache, v_cache, start_pos + 1)
        return out.reshape(b, 1, n_q * hd)

    qf = q.reshape(b, s, n_kv, groups, hd)
    scores = jnp.einsum(
        "bskgh,bkth->bkgst",
        qf,
        k_cache,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(hd).astype(jnp.float32)
    if bias is not None:
        scores = scores + bias.reshape(1, n_kv, groups, 1, t)

    j = jnp.arange(t)[None, :]
    i = jnp.arange(s)[:, None]
    mask = j <= (start_pos + i)                       # [S, T]
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bkth->bskgh",
        probs.astype(q.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.reshape(b, s, n_q * hd)


def update_kv_cache(
    k_cache: jax.Array,      # [B, n_kv, T, hd]
    v_cache: jax.Array,
    k: jax.Array,            # [B, S, n_kv, hd]
    v: jax.Array,
    start_pos: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Write the new K/V chunk at ``start_pos`` (static shapes, no
    recompilation across positions — the TPU replacement for the
    reference's in-kernel cache append)."""
    zeros = (0, 0, start_pos, 0)
    kt = jnp.swapaxes(k, 1, 2).astype(k_cache.dtype)   # [B, n_kv, S, hd]
    vt = jnp.swapaxes(v, 1, 2).astype(v_cache.dtype)
    k_cache = jax.lax.dynamic_update_slice(k_cache, kt, zeros)
    v_cache = jax.lax.dynamic_update_slice(v_cache, vt, zeros)
    return k_cache, v_cache


def mlp_swiglu(gate, up, down, x) -> jax.Array:
    """SwiGLU MLP (counterpart of QuantLlamaMLP + silu_and_mul, N12)."""
    g = linear_apply(gate, x)
    u = linear_apply(up, x)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    return linear_apply(down, h)


def mlp_gelu(fc1, fc2, x, act: str = "gelu",
             act_scale: Optional[jax.Array] = None) -> jax.Array:
    h = linear_apply(fc1, x)
    if act == "relu":
        h = jnp.maximum(h, 0)
    elif act == "gelu_tanh":  # bigcode gelu_pytorch_tanh
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    else:  # exact erf gelu (falcon/mpt/neox/opt-gelu)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    if act_scale is not None:
        # AWQ activation-scale fold: act output divided here, fc2 weights
        # multiplied (counterpart of ScaledActivation, quantizer.py:14-57)
        h = (h.astype(jnp.float32) / act_scale).astype(h.dtype)
    return linear_apply(fc2, h)
