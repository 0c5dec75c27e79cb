"""Speculative decoding with prompt-lookup (n-gram) drafting.

New capability (the reference decodes strictly one token per forward):
draft tokens are proposed by matching the trailing n-gram of the context
against its own earlier occurrences (prompt-lookup decoding — no draft
model, so it composes with any checkpoint), then the whole window
``[next, d1..dk]`` is verified by ONE forward of s = k+1 <= 32 tokens —
which rides the chunked-prefill megakernel (``ops/megakernel_chunk.py``),
so a verify step costs ~2x a single decode step while emitting up to
k+1 tokens.

Correctness invariant: greedy speculative output is IDENTICAL to vanilla
greedy decoding token-for-token, for any drafting policy — draft ``d_j``
is only kept when it equals the model's own argmax after the accepted
prefix, and the first disagreement position contributes the model's
argmax instead (tested in ``tests/test_speculative.py``).

Cache rollback is free: the static cache masks by ``length``, so rows
written for rejected draft positions are simply overwritten later.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def ngram_propose(ctx: np.ndarray, k: int, n: int = 3,
                  max_scan: int = 2048) -> np.ndarray:
    """Draft up to ``k`` tokens: find the most recent earlier occurrence
    of the trailing ``n``-gram (falling back to shorter grams) and
    return the tokens that followed it. Empty when nothing matches."""
    L = len(ctx)
    lo = max(0, L - max_scan)
    for m in range(n, 0, -1):
        if L < m + 1:
            continue
        tail = ctx[L - m:]
        # scan right-to-left over earlier occurrences (skip the tail
        # itself); vectorized window compare
        hay = ctx[lo:L - 1]
        if len(hay) < m:
            continue
        win = np.lib.stride_tricks.sliding_window_view(hay, m)
        hits = np.nonzero((win == tail).all(axis=1))[0]
        if len(hits):
            start = lo + hits[-1] + m
            return np.asarray(ctx[start:start + k], np.int32)
    return np.zeros((0,), np.int32)


def generate_speculative(
    params, cfg, tokens: jax.Array, cache, max_new: int,
    k: int = 7, n: int = 3, eos: Optional[int] = None,
    start_pos: int = 0,
) -> Tuple[List[int], dict]:
    """Greedy generation with n-gram speculative verification.

    ``tokens [1, S0]`` is the (possibly incremental — ``start_pos`` for
    dialogue KV reuse) prompt. Returns ``(new_tokens, stats)`` with
    ``stats = {steps, drafted, accepted}`` — tokens/step =
    ``(len(new_tokens)) / steps`` is the speedup over one-per-step.
    """
    from awq_tpu.models import forward

    ctx = list(np.asarray(tokens[0]))
    logits, cache = forward(params, cfg, tokens, cache,
                            jnp.int32(start_pos))
    nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
    length = start_pos + tokens.shape[1]
    out: List[int] = [nxt]
    max_t = _cache_len(cache)
    steps, drafted, accepted = 1, 0, 0

    while len(out) < max_new and (eos is None or out[-1] != eos):
        room = max_t - length - 2
        remaining = max_new - len(out)
        draft = np.zeros((0,), np.int32)
        if room >= k and remaining > 1:
            draft = ngram_propose(np.asarray(ctx + out, np.int32), k, n)
        true_k = len(draft)
        if true_k:
            # FIXED window shape [k+1]: padding the draft keeps forward
            # at exactly two compiled shapes (s=1 and s=k+1) — variable
            # draft lengths would each trigger a full-model compile.
            # Pad positions are excluded from the accept loop below.
            draft = np.concatenate([draft,
                                    np.zeros(k - true_k, np.int32)])
            window = np.concatenate([[out[-1]], draft]).astype(np.int32)
        else:
            window = np.asarray([out[-1]], np.int32)
        logits, cache = forward(params, cfg, jnp.asarray(window[None]),
                                cache, jnp.int32(length),
                                last_only=False)
        greedy = np.asarray(jnp.argmax(logits[0], axis=-1))  # [s]
        # don't accept past what the caller asked for — the final window
        # would otherwise verify (and count) tokens that get discarded
        m_max = min(true_k, remaining - 1)
        m = 0
        while m < m_max and draft[m] == greedy[m]:
            m += 1
        emit = list(draft[:m]) + [int(greedy[m])]
        steps += 1
        drafted += m_max
        accepted += m
        length += m + 1          # rows for window[0..m] are now valid
        if eos is not None and eos in emit:
            emit = emit[:emit.index(eos) + 1]
        out.extend(emit)
        if length >= max_t - 1:
            break

    return out[:max_new], dict(steps=steps, drafted=drafted,
                               accepted=accepted, length=length,
                               cache=cache)


def _cache_len(cache):
    data = getattr(cache, "data", cache)
    return data.shape[4]


# ---------------------------------------------------------------------------
# Fully device-side speculative decode (round 4)
# ---------------------------------------------------------------------------
#
# The host loop above costs one dispatch+fetch round-trip PER VERIFY
# WINDOW (~27 ms on the tunneled platform — PERF.md methodology), which
# dwarfs the verify step itself. Here the whole draft -> verify -> accept
# loop runs inside ONE jitted ``lax.while_loop``: the n-gram match is a
# vectorized compare over a device-resident context buffer, emissions
# write into a fixed output buffer at a running offset, and the host
# fetches once at the end. Output is bit-identical to vanilla greedy for
# ANY drafting policy (acceptance == agreement with the model's argmax).


def _device_draft(ctx_row: jax.Array, p: jax.Array, k: int, n: int):
    """Draft ``k`` tokens from the most recent earlier occurrence of the
    trailing m-gram (m = n..1 fallback, first that matches), vectorized.
    ``ctx_row [C]``, ``p`` = valid length. Returns ``[k]`` int32; rows
    with no match (or out-of-range reads) carry arbitrary tokens — the
    verify step only ever accepts tokens equal to the model's argmax, so
    junk drafts cost acceptance, never correctness."""
    C = ctx_row.shape[0]
    idx = jnp.arange(C)
    start = jnp.int32(0)
    found = jnp.bool_(False)
    for m in range(n, 0, -1):
        # tail = ctx[p-m : p]; windows w_t = ctx[t : t+m]
        tail = jax.lax.dynamic_slice(ctx_row, (jnp.maximum(p - m, 0),),
                                     (n,))[:m]
        hit = jnp.ones((C,), bool)
        for j in range(m):
            shifted = jnp.roll(ctx_row, -j)
            hit = hit & (shifted == tail[j])
        # window must END strictly before the tail's last token
        # (reference scan: hay = ctx[:L-1]) and start within bounds
        ok = hit & (idx + m <= p - 1) & (p >= m + 1)
        t_star = jnp.max(jnp.where(ok, idx, -1))
        this_found = t_star >= 0
        start = jnp.where(found, start,
                          jnp.where(this_found, t_star + m, start))
        found = found | this_found
    draft = jax.lax.dynamic_slice(ctx_row, (jnp.clip(start, 0, C - k),),
                                  (k,))
    return draft.astype(jnp.int32), found


@functools.partial(jax.jit,
                   static_argnames=("cfg", "s0", "max_new", "k", "n"))
def _spec_loop_device(params, cfg, cache, ctx0, out0, first, length0,
                      eos_id, s0, max_new, k, n):
    from awq_tpu.models import forward

    w = k + 1
    max_t = _cache_len(cache)

    def cond(st):
        ctx, n_ctx, cache, length, out, n_out, done, steps, accepted = st
        return (~done) & (n_out < max_new) & (length + w + 1 < max_t)

    def body(st):
        ctx, n_ctx, cache, length, out, n_out, done, steps, accepted = st
        last = out[n_out - 1]
        draft, _ = _device_draft(ctx, n_ctx, k, n)
        window = jnp.concatenate([last[None], draft])[None]   # [1, w]
        logits, cache = forward(params, cfg, window, cache, length,
                                last_only=False)
        greedy = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        ok = draft == greedy[:k]
        m = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
        m = jnp.minimum(m, max_new - n_out - 1)       # budget cap
        emit = jnp.concatenate([draft, greedy[k:]])   # candidates [w]
        # position j emits draft[j] for j<m and greedy[m] at j==m
        emit = jnp.where(jnp.arange(w) == m, greedy, emit)
        valid = jnp.arange(w) <= m
        is_eos = (emit == eos_id) & valid & (eos_id >= 0)
        hit = jnp.any(is_eos)
        take = jnp.where(hit, jnp.argmax(is_eos) + 1, m + 1)
        out = jax.lax.dynamic_update_slice(out, emit, (n_out,))
        ctx = jax.lax.dynamic_update_slice(ctx, emit, (n_ctx,))
        return (ctx, n_ctx + take, cache, length + m + 1, out,
                n_out + take, done | hit, steps + 1, accepted + m)

    st = (ctx0, jnp.int32(s0 + 1), cache, length0, out0, jnp.int32(1),
          first == eos_id, jnp.int32(1), jnp.int32(0))
    ctx, n_ctx, cache, length, out, n_out, done, steps, accepted = \
        jax.lax.while_loop(cond, body, st)
    return out, jnp.minimum(n_out, max_new), cache, length, steps, accepted


def spec_decode_device(
    params, cfg, tokens: jax.Array, cache, max_new: int,
    k: int = 7, n: int = 3, eos: Optional[int] = None,
    start_pos: int = 0,
) -> Tuple[List[int], dict]:
    """Device-side sibling of :func:`generate_speculative`: same
    greedy-identity contract, ONE host fetch for the whole generation
    (the host loop pays a ~27 ms tunneled dispatch+fetch round-trip per
    verify window). ``cache`` must leave room for ``k+1`` optimistic
    rows per window."""
    from awq_tpu.models import forward

    b, s0 = tokens.shape
    assert b == 1, "device spec loop is single-stream"
    C = s0 + max_new + k + 1
    eos_id = jnp.int32(-1 if eos is None else eos)

    logits, cache = forward(params, cfg, tokens, cache,
                            jnp.int32(start_pos))
    first = jnp.argmax(logits[0, -1]).astype(jnp.int32)

    ctx0 = jnp.zeros((C,), jnp.int32).at[:s0].set(tokens[0]) \
        .at[s0].set(first)
    out0 = jnp.zeros((max_new + k + 1,), jnp.int32).at[0].set(first)

    out, n_out, cache, length, steps, accepted = _spec_loop_device(
        params, cfg, cache, ctx0, out0, first,
        jnp.int32(start_pos + s0), eos_id, s0, max_new, k, n)
    n_out = int(n_out)
    toks = [int(t) for t in np.asarray(out[:n_out])]
    return toks, dict(steps=int(steps), accepted=int(accepted),
                      drafted=(int(steps) - 1) * k,
                      length=int(length), cache=cache)
