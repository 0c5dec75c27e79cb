"""Group-wise weight quantization math (pure JAX, device-agnostic).

Semantics mirror the reference quantizer ``awq/quantize/quantizer.py:61-103``
(group-wise asymmetric min/max INT-n fake quantization with a zero point),
re-expressed for JAX-convention weights.

Conventions
-----------
- Linear weights are ``[IC, OC]`` (``y = x @ w``), i.e. the transpose of the
  torch ``[OC, IC]`` layout. Quantization groups are contiguous runs of
  ``group_size`` along the **input-channel** axis (axis 0) — the same
  groups as the reference's ``w.view(-1, group_size)`` over ``[OC, IC]``.
- ``scales``/``zeros`` have shape ``[IC // group_size, OC]``.
- Rounding is ``jnp.round`` (round-half-to-even), which matches
  ``torch.round`` — required to reproduce published perplexities bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def exact_divisor(c: float) -> jnp.ndarray:
    """A compile-time-constant divisor XLA cannot fold.

    XLA rewrites ``x / const`` into ``x * (1/const)``; for 1/15 that is a
    1-ulp perturbation of ``scales``, which flips ``round()`` at the exact
    .5 ties that clipping creates by construction (clipped weights sit at
    ``max_val``, i.e. precisely on a quantization-boundary tie). Hiding the
    constant behind an ``optimization_barrier`` keeps the correctly-rounded
    IEEE division, making jitted results bit-identical to eager JAX and to
    the reference's torch math (``quantizer.py:76``)."""
    return jax.lax.optimization_barrier(jnp.float32(c))


def _grouped(w: jnp.ndarray, group_size: int) -> Tuple[jnp.ndarray, int]:
    """[IC, OC] -> [n_groups, group, OC]."""
    ic, oc = w.shape
    g = ic if group_size == -1 else group_size
    if ic % g != 0:
        raise ValueError(f"IC={ic} not divisible by group_size={g}")
    return w.reshape(ic // g, g, oc), g


def quantize_groupwise(
    w: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    zero_point: bool = True,
    clip_max: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Quantize ``w [IC, OC]`` to integer codes plus scales/zeros.

    Returns ``(q, scales, zeros)`` with
    - ``q``: uint8 ``[IC, OC]`` codes in ``[0, 2^n_bit - 1]``
    - ``scales``: f32 ``[IC//G, OC]``
    - ``zeros``: f32 ``[IC//G, OC]`` (integer-valued)
    so that ``deq = (q - zeros) * scales``.

    ``clip_max`` optionally clamps ``|w|`` per (group, OC) before
    quantization — the AWQ clip-search result (``awq/quantize/auto_clip.py:87-98``).
    """
    wg, g = _grouped(w.astype(jnp.float32), group_size)
    if clip_max is not None:
        cm = clip_max.astype(jnp.float32)[:, None, :]
        wg = jnp.clip(wg, -cm, cm)
    max_int = 2**n_bit - 1
    if zero_point:
        max_val = wg.max(axis=1, keepdims=True)
        min_val = wg.min(axis=1, keepdims=True)
        scales = jnp.maximum(max_val - min_val, 1e-5) / exact_divisor(max_int)
        zeros = jnp.clip(-jnp.round(min_val / scales), 0, max_int)
    else:
        # Symmetric variant (unused by the reference pipeline; see
        # quantizer.py:76 "we actually never used this"). Codes are shifted
        # into the unsigned range so packing stays uniform.
        absmax = jnp.maximum(jnp.abs(wg).max(axis=1, keepdims=True), 1e-5)
        half = 2 ** (n_bit - 1)
        scales = absmax / (half - 1)
        zeros = jnp.full_like(scales, float(half))
    q = jnp.clip(jnp.round(wg / scales) + zeros, 0, max_int)
    ic, oc = w.shape
    return (
        q.reshape(ic, oc).astype(jnp.uint8),
        scales[:, 0, :],
        zeros[:, 0, :],
    )


def dequantize_groupwise(
    q: jnp.ndarray,
    scales: jnp.ndarray,
    zeros: jnp.ndarray,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Inverse of :func:`quantize_groupwise`: ``(q - zeros) * scales``."""
    ic, oc = q.shape
    n_g = scales.shape[0]
    qg = q.reshape(n_g, ic // n_g, oc).astype(jnp.float32)
    deq = (qg - zeros[:, None, :]) * scales[:, None, :]
    return deq.reshape(ic, oc).astype(out_dtype)


def pseudo_quantize(
    w: jnp.ndarray,
    n_bit: int = 4,
    group_size: int = 128,
    zero_point: bool = True,
    clip_max: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fake-quantize: quantize + dequantize, preserving dtype and shape.

    Counterpart of ``pseudo_quantize_tensor`` (``quantizer.py:61-103``).
    """
    q, s, z = quantize_groupwise(w, n_bit, group_size, zero_point, clip_max)
    return dequantize_groupwise(q, s, z, out_dtype=w.dtype)
