"""Sampling / logits processors (pure jnp, usable inside ``lax.scan``).

Counterpart of the HF logits-processor chain built by the reference
stream generator (``tinychat/stream_generators/stream_gen.py:19-32``):
repetition penalty -> temperature -> top-k -> top-p, then greedy or
categorical sampling.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig


def apply_repetition_penalty(
    logits: jax.Array,       # [B, V] f32
    seen: jax.Array,         # [B, V] bool — tokens generated/present so far
    penalty: float,
) -> jax.Array:
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix with cumulative prob >= p (always keep top-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    # threshold = smallest kept logit
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits < thresh, -jnp.inf, logits)


def sample_logits_batched(
    logits: jax.Array,             # [B, V] f32
    key: jax.Array,
    temperature: jax.Array,        # [B]
    top_k: jax.Array,              # [B] int32 (0 = off)
    top_p: jax.Array,              # [B] (1.0 = off)
    greedy: jax.Array,             # [B] bool
) -> jax.Array:
    """Per-ROW sampling parameters (continuous batching mixes requests with
    different GenConfigs in one step). Vectorized masking versions of the
    top-k/top-p processors; greedy rows take the argmax."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    t = jnp.maximum(temperature, 1e-5)[:, None]
    proc = logits / t

    sorted_desc = jnp.sort(proc, axis=-1)[..., ::-1]
    # per-row top-k threshold: value at index (k-1), k=0 -> last index (off)
    k = jnp.where(top_k > 0, jnp.clip(top_k, 1, v), v).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    proc = jnp.where(proc < kth, -jnp.inf, proc)

    # per-row top-p on the already-top-k-masked logits
    s2 = jnp.sort(proc, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(s2, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < top_p[:, None]],
        axis=-1,
    )
    thresh = jnp.min(jnp.where(keep, s2, jnp.inf), axis=-1, keepdims=True)
    proc = jnp.where(proc < thresh, -jnp.inf, proc)

    sampled = jax.random.categorical(key, proc, axis=-1).astype(jnp.int32)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(greedy | (temperature < 1e-5), arg, sampled)


def sample_logits(
    logits: jax.Array,             # [B, V]
    key: jax.Array,
    gen: GenConfig,
    seen: Optional[jax.Array] = None,
) -> jax.Array:
    """Process logits and draw one token per batch row -> [B] int32.

    Greedy when ``gen.greedy`` or temperature < 1e-5, mirroring
    ``stream_gen.py:129-133``.
    """
    logits = logits.astype(jnp.float32)
    if seen is not None:
        logits = apply_repetition_penalty(logits, seen, gen.repetition_penalty)
    if gen.greedy or gen.temperature < 1e-5:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / gen.temperature
    logits = apply_top_k(logits, gen.top_k)
    logits = apply_top_p(logits, gen.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
