"""Token generation loops.

Counterpart of ``tinychat/stream_generators/stream_gen.py:36-207``:
prefill (timed as TTFT) then one-token decode steps, with stop tokens,
stream-interval yields, and a timing dict on the final chunk. Two
flavours:

- :func:`decode_scan` — the whole decode loop inside one jitted
  ``lax.scan`` (sampling included). This is the TPU-native hot path:
  one executable per generation burst, zero per-token dispatch overhead.
- :class:`StreamGenerator` — a python generator for interactive
  streaming, one jit call per token, API-compatible in spirit with the
  reference (yields dicts with text and timing).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import forward
from awq_tpu.runtime.sampling import sample_logits


@functools.partial(
    jax.jit, static_argnames=("cfg", "gen", "num_steps", "vocab", "tp_axis")
)
def decode_scan(
    params,
    cfg: ModelConfig,
    cache: jax.Array,
    first_token: jax.Array,      # [B] first generated token (from prefill)
    start_pos: jax.Array,        # scalar: position of first_token
    key: jax.Array,
    stop_ids: jax.Array,         # [n_stop] int32 (pad with -1)
    seen0: jax.Array,            # [B, V] bool repetition-penalty state
    gen: GenConfig,
    num_steps: int,
    vocab: int,
    tp_axis=None,
    alibi_slopes=None,           # [n_q local] per-rank slopes under tp
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Generate ``num_steps`` further tokens fully on-device.

    Returns ``(tokens [B, num_steps], done [B], cache)``. After a stop
    token, rows keep their cache but emit ``stop`` repeatedly (masked by
    the caller via ``done`` step index).

    ``tp_axis``: running inside ``shard_map`` (parallel/tp.py) — forward
    returns vocab-sharded logits, so all-gather them (64 KB at 32k vocab,
    negligible) and sample identically on every device: same key -> same
    token, keeping the carried state replicated.
    """

    def body(carry, _):
        token, cache, pos, key, done, seen = carry
        logits, cache = forward(params, cfg, token[:, None], cache, pos,
                                tp_axis=tp_axis,
                                alibi_slopes=alibi_slopes)
        if tp_axis is not None:
            logits = jax.lax.all_gather(
                logits, tp_axis, axis=-1, tiled=True)
        key, sub = jax.random.split(key)
        nxt = sample_logits(logits[:, -1], sub, gen, seen)
        nxt = jnp.where(done, token, nxt)
        is_stop = jnp.isin(nxt, stop_ids)
        done = done | is_stop
        seen = seen.at[jnp.arange(nxt.shape[0]), nxt].set(True)
        return (nxt, cache, pos + 1, key, done, seen), (nxt, done)

    b = first_token.shape[0]
    init = (
        first_token,
        cache,
        start_pos,
        key,
        jnp.zeros((b,), bool),
        seen0,
    )
    (tok, cache, _, _, done, _), (tokens, dones) = jax.lax.scan(
        body, init, None, length=num_steps
    )
    return tokens.T, dones.T, cache


def cache_bucket(t_total: int, need: int, min_bucket: int = 256) -> int:
    """Smallest power-of-two cache prefix covering ``need`` positions.

    Attention cost scales with the cache length actually materialized, so
    generation bursts run on a sliced prefix instead of the full
    ``max_seq_len`` cache (the reference reads only the valid prefix via
    its dynamic-length decode kernel, ``fused_attn.py:484-502``; on TPU the
    static-shape equivalent is a small set of power-of-two buckets, one
    compile each)."""
    if need >= t_total:
        return t_total
    return min(t_total, max(min_bucket, 1 << (need - 1).bit_length()))


def generate(
    params,
    cfg: ModelConfig,
    tokens: jax.Array,            # [B, S] prompt
    cache: jax.Array,
    gen: GenConfig,
    stop_ids: Sequence[int] = (),
    start_pos: int = 0,
    key: Optional[jax.Array] = None,
    track_seen: bool = True,
    mesh=None,
) -> Dict[str, Any]:
    """Prefill + scan-decode. Returns dict with output ids and timing.

    ``mesh``: run through the explicit-shard TP path (parallel/tp.py) —
    ``params`` should then be a :class:`~awq_tpu.parallel.deploy.TPParams`
    deploy bundle (or plain-layout params) and ``cache`` sharded on the
    mesh. Prefill rides ``tp_forward``, the decode burst
    ``tp_decode_scan`` — the same one-executable-per-burst structure."""
    key = jax.random.PRNGKey(0) if key is None else key
    b, s = tokens.shape
    vocab = cfg.vocab_size

    from awq_tpu.models.llama import cache_seq_len

    t_total = cache_seq_len(cache)
    bucket = cache_bucket(t_total, start_pos + s + gen.max_new_tokens)
    full_cache = cache if bucket < t_total else None
    if bucket < t_total:
        # position axis is 4 for both the plain cache and KVCache8 leaves
        cache = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, 0, bucket, axis=4), cache
        )

    t0 = time.perf_counter()
    if mesh is not None:
        from awq_tpu.parallel import tp_forward

        logits, cache = tp_forward(
            params, cfg, tokens, cache, jnp.int32(start_pos), mesh
        )
    else:
        logits, cache = forward(
            params, cfg, tokens, cache, jnp.int32(start_pos)
        )
    key, sub = jax.random.split(key)
    seen = jnp.zeros((b, vocab), bool)
    if track_seen and gen.repetition_penalty != 1.0:
        seen = seen.at[jnp.arange(b)[:, None], tokens].set(True)
    first = sample_logits(logits[:, -1], sub, gen, seen)
    first.block_until_ready()
    ttft = time.perf_counter() - t0

    n = max(gen.max_new_tokens - 1, 0)
    stop = jnp.asarray(list(stop_ids) or [-1], jnp.int32)
    t1 = time.perf_counter()
    if mesh is not None:
        from awq_tpu.parallel import tp_decode_scan

        toks, dones, cache = tp_decode_scan(
            params, cfg, cache, first,
            jnp.int32(start_pos + s), key, stop,
            seen.at[jnp.arange(b), first].set(True),
            gen, n, mesh,
        )
    else:
        toks, dones, cache = decode_scan(
            params, cfg, cache, first,
            jnp.int32(start_pos + s), key, stop,
            seen.at[jnp.arange(b), first].set(True),
            gen, n, vocab,
        )
    toks.block_until_ready()
    decode_time = time.perf_counter() - t1

    if full_cache is not None:
        cache = jax.tree_util.tree_map(
            lambda full, part: jax.lax.dynamic_update_slice(
                full, part, (0,) * full.ndim
            ),
            full_cache, cache,
        )

    toks = jnp.concatenate([first[:, None], toks], axis=1)
    dones = jnp.concatenate([jnp.isin(first, stop)[:, None], dones], axis=1)
    # count tokens up to and including the first stop
    n_valid = jnp.where(
        dones.any(axis=1), dones.argmax(axis=1) + 1, toks.shape[1]
    )
    total_new = int(n_valid.sum())
    return {
        "output_ids": toks,
        "n_valid": n_valid,
        "cache": cache,
        "timing": {
            "ttft_s": ttft,
            "decode_s": decode_time,
            "new_tokens": total_new,
            "ms_per_token": (decode_time / max(n, 1)) * 1e3,
        },
    }


class StreamGenerator:
    """Interactive streaming generation (one jit call per token).

    Mirrors the reference StreamGenerator protocol
    (``stream_gen.py:36-207``): iterate to receive dicts with the text so
    far; the final dict carries a ``timing`` entry with TTFT and the
    per-token generation times.
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        tokenizer,
        gen: GenConfig,
        cache: jax.Array,
        stop_ids: Sequence[int] = (),
        stream_interval: int = 2,
        mesh=None,
    ):
        self.params, self.cfg, self.tok = params, cfg, tokenizer
        self.gen, self.cache = gen, cache
        self.stop_ids = list(stop_ids)
        self.stream_interval = stream_interval
        self.mesh = mesh

    def _forward(self, tokens, cache, start_pos):
        if self.mesh is not None:
            from awq_tpu.parallel import tp_forward

            return tp_forward(self.params, self.cfg, tokens, cache,
                              start_pos, self.mesh)
        return forward(self.params, self.cfg, tokens, cache, start_pos)

    def __call__(
        self, input_ids: List[int], start_pos: int = 0, key=None
    ) -> Iterator[Dict[str, Any]]:
        key = jax.random.PRNGKey(int(time.time())) if key is None else key
        cfg, gen = self.cfg, self.gen
        tokens = jnp.asarray([input_ids], jnp.int32)
        b, s = tokens.shape
        seen = jnp.zeros((b, cfg.vocab_size), bool)
        if gen.repetition_penalty != 1.0:
            seen = seen.at[0, tokens[0]].set(True)

        out_ids: List[int] = []
        token_times: List[float] = []

        t0 = time.perf_counter()
        logits, self.cache = self._forward(
            tokens, self.cache, jnp.int32(start_pos)
        )
        key, sub = jax.random.split(key)
        tok = sample_logits(logits[:, -1], sub, gen, seen)
        tok_i = int(tok[0])
        ttft = time.perf_counter() - t0
        out_ids.append(tok_i)
        pos = start_pos + s

        for i in range(gen.max_new_tokens - 1):
            if tok_i in self.stop_ids:
                break
            t1 = time.perf_counter()
            seen = seen.at[0, tok_i].set(True)
            logits, self.cache = self._forward(
                tok[:, None], self.cache, jnp.int32(pos)
            )
            key, sub = jax.random.split(key)
            tok = sample_logits(logits[:, -1], sub, gen, seen)
            tok_i = int(tok[0])
            token_times.append(time.perf_counter() - t1)
            out_ids.append(tok_i)
            pos += 1
            if (i + 1) % self.stream_interval == 0:
                yield {
                    "text": self.tok.decode(out_ids) if self.tok else None,
                    "ids": list(out_ids),
                    "finished": False,
                }
        if out_ids and out_ids[-1] in self.stop_ids:
            out_ids = out_ids[:-1]
        yield {
            "text": self.tok.decode(out_ids) if self.tok else None,
            "ids": list(out_ids),
            "finished": True,
            "new_start_pos": pos,
            "timing": {
                "ttft_s": ttft,
                "token_times_s": token_times,
                "ms_per_token": (
                    sum(token_times) / max(len(token_times), 1) * 1e3
                ),
            },
        }
