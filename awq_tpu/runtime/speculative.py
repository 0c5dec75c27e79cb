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
