"""Sampling / logits processors (pure jnp, usable inside ``lax.scan``).

Counterpart of the HF logits-processor chain built by the reference
stream generator (``tinychat/stream_generators/stream_gen.py:19-32``):
repetition penalty -> temperature -> top-k -> top-p, then greedy or
categorical sampling.
"""

from __future__ import annotations

import functools
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


def process_logits(
    logits: jax.Array,             # [..., V] f32
    temperature: jax.Array,        # [...] (broadcast against rows)
    top_k: jax.Array,              # [...] int32 (0 = off)
    top_p: jax.Array,              # [...] (1.0 = off)
) -> jax.Array:
    """Per-row temperature/top-k/top-p masking with ROW-VARYING
    parameters (vs the scalar-config processors above). Param arrays
    must have shape ``logits.shape[:-1]`` (or broadcast to it)."""
    v = logits.shape[-1]
    t = jnp.maximum(temperature, 1e-5)[..., None]
    proc = logits / t

    sorted_desc = jnp.sort(proc, axis=-1)[..., ::-1]
    # per-row top-k threshold: value at index (k-1), k=0 -> last index (off)
    k = jnp.where(top_k > 0, jnp.clip(top_k, 1, v), v).astype(jnp.int32)
    k = jnp.broadcast_to(k, logits.shape[:-1])
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[..., None], axis=-1)
    proc = jnp.where(proc < kth, -jnp.inf, proc)

    # per-row top-p on the already-top-k-masked logits
    s2 = jnp.sort(proc, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(s2, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool),
         cum[..., :-1] < top_p[..., None]],
        axis=-1,
    )
    thresh = jnp.min(jnp.where(keep, s2, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(proc < thresh, -jnp.inf, proc)


@jax.jit
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
    proc = process_logits(logits, temperature, top_k, top_p)
    sampled = jax.random.categorical(key, proc, axis=-1).astype(jnp.int32)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(greedy | (temperature < 1e-5), arg, sampled)


@jax.jit
def spec_accept_sample(
    logits: jax.Array,             # [B, W, V] verify-step logits
    windows: jax.Array,            # [B, W] int32; windows[:, 1:] = drafts
    m_cap: jax.Array,              # [B] int32: min(draft_len, budget - 1)
    key: jax.Array,
    temperature: jax.Array,        # [B]
    top_k: jax.Array,              # [B] int32 (0 = off)
    top_p: jax.Array,              # [B] (1.0 = off)
    greedy: jax.Array,             # [B] bool
) -> tuple:
    """Speculative window acceptance, greedy AND sampled rows, on device.

    Returns ``(emit [B, W], take [B])``: row ``b`` emits
    ``emit[b, :take[b]]`` — its accepted draft prefix plus one bonus
    token.

    Greedy rows keep the longest draft prefix that matches the model's
    own argmax, with the argmax at the first disagreement as the bonus
    (bit-identical to vanilla greedy decoding — the host accept loop's
    contract). Sampled rows run standard speculative REJECTION sampling
    specialized to a deterministic drafter (prompt lookup proposes a
    point-mass q): draft ``d`` at window position ``j`` is accepted with
    probability ``p_j(d)`` where ``p_j`` is the temperature/top-k/top-p
    processed distribution, and the first rejection resamples from the
    residual ``norm(max(0, p_j - q)) = p_j`` with ``d`` masked out. The
    emitted tokens are distributed exactly as vanilla ancestral sampling
    from ``p`` (tested distributionally in tests/test_spec_sampling.py).
    Reference has no counterpart (one token per forward, greedy or HF
    samplers — ``stream_gen.py:129-133``).
    """
    b, w, v = logits.shape
    k = w - 1
    lf = logits.astype(jnp.float32)
    proc = process_logits(lf, temperature[:, None], top_k[:, None],
                          top_p[:, None])               # [B, W, V]
    p = jax.nn.softmax(proc, axis=-1)
    drafts = windows[:, 1:]                              # [B, k]
    # p_j(d_{j+1}): position j's processed prob of draft j
    pd = jnp.take_along_axis(p[:, :k], drafts[..., None],
                             axis=-1)[..., 0]            # [B, k]
    ku, ks = jax.random.split(key)
    u = jax.random.uniform(ku, (b, k))
    argm = jnp.argmax(lf, axis=-1).astype(jnp.int32)     # [B, W]
    greedy = greedy | (temperature < 1e-5)
    ok = jnp.where(greedy[:, None], drafts == argm[:, :k], u < pd)
    ok = ok & (jnp.arange(k)[None] < m_cap[:, None])
    m = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=-1), axis=-1)

    # bonus token from position m's distribution; a true rejection
    # (m < m_cap) masks the rejected draft out of the residual, a forced
    # stop (drafts exhausted / budget) samples the full distribution
    proc_m = jnp.take_along_axis(
        proc, m[:, None, None], axis=1)[:, 0]            # [B, V]
    d_next = jnp.take_along_axis(
        windows, jnp.minimum(m + 1, k)[:, None], axis=1)[:, 0]
    rejected = m < m_cap
    mask = rejected[:, None] & (jnp.arange(v)[None] == d_next[:, None])
    proc_m = jnp.where(mask, -jnp.inf, proc_m)
    bonus_g = jnp.take_along_axis(argm, m[:, None], axis=1)[:, 0]
    bonus_s = jax.random.categorical(ks, proc_m, axis=-1).astype(jnp.int32)
    # degenerate residual (the masked draft held ALL processed mass,
    # e.g. top_k=1): rejection probability is ~0, but guard the branch
    empty = jnp.all(proc_m == -jnp.inf, axis=-1)
    bonus = jnp.where(greedy | empty, bonus_g, bonus_s)
    emit = jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emit = jnp.where(jnp.arange(w)[None] == m[:, None],
                     bonus[:, None], emit)
    return emit, m + 1


@functools.partial(jax.jit, static_argnames=("gen",))
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
