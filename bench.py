#!/usr/bin/env python
"""Headline benchmark: W4A16 decode latency, Llama-2-7B geometry.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms/token", "vs_baseline": ...}

Baseline: the reference's published Llama-2-7B AWQ-W4A16 decode latency on
A100 (5.71 ms/token, `tinychat/README.md:157` — the closest datacenter-class
hardware to a TPU chip in its tables). ``vs_baseline`` is the speedup ratio
(baseline / measured; >1 means faster than the reference system).

Methodology mirrors ``tinychat/benchmark.py``: warmup, then time a decode
burst and average per token. Decode runs as one jitted ``lax.scan``
(sampling included) over a 2048-token static KV cache — a harsher setting
than the reference's 4-context-token decode bench.
"""

from __future__ import annotations

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Force completion by fetching to host.

    On the tunneled TPU platform ``block_until_ready`` returns before the
    computation finishes; only a device->host copy synchronizes. ``x`` must
    be small (token ids) so the copy itself is negligible.
    """
    return np.asarray(x)

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_qparams
from awq_tpu.runtime.generate import decode_scan

BASELINE_MS = 5.71  # Llama-2-7B W4A16 decode, A100 (tinychat/README.md:157)

LLAMA2_7B = dict(
    arch="llama", vocab_size=32000, hidden_size=4096, intermediate_size=11008,
    num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
    max_position_embeddings=4096, rope_theta=10000.0,
)
TINY = dict(
    arch="llama", vocab_size=1024, hidden_size=512, intermediate_size=1024,
    num_layers=4, num_heads=8, num_kv_heads=8, head_dim=64,
    max_position_embeddings=2048,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--context", type=int, default=4,
                    help="prefill length before the decode burst "
                         "(reference uses 4, tinychat/README.md:93)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry (CPU smoke test)")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (halved cache traffic)")
    args = ap.parse_args()

    # the shared chip's free HBM fluctuates with co-tenants; a smaller
    # static cache bucket does NOT change the measured decode work
    # (attention reads only `length` positions), so degrade the cache
    # footprint rather than record nothing
    import sys

    last = None
    ladder = [m for m in dict.fromkeys((args.max_seq, 1024, 512))
              if m <= args.max_seq]
    for max_seq in ladder:
        try:
            return _run(args, max_seq)
        except Exception as e:  # jax RESOURCE_EXHAUSTED surfaces lazily
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            last = e
            print(f"[bench] OOM at max_seq={max_seq}, retrying smaller",
                  file=sys.stderr, flush=True)
    raise last


def _run(args, max_seq):

    on_tpu = jax.default_backend() == "tpu"
    shape = TINY if (args.tiny or not on_tpu) else LLAMA2_7B
    cfg = ModelConfig(**shape, dtype="bfloat16")
    qcfg = QuantConfig(w_bit=4, group_size=128)

    params = init_qparams(cfg, qcfg, jax.random.PRNGKey(0))
    from awq_tpu.models.llama import fuse_linears
    from awq_tpu.ops.w4a16 import quantize_linear

    # quantized output head (the deploy default, quantize_params
    # quantize_lm_head=True): a fp16 7B head is ~260 MB/token of reads
    params["lm_head"] = quantize_linear(
        params["lm_head"].astype(jnp.float32), n_bit=qcfg.w_bit,
        group_size=qcfg.group_size,
    )
    params = fuse_linears(params, cfg, consume=True)
    from awq_tpu.ops.w4a16 import strip_unfolded_qparams

    # the folded layout carries its own packed qparams; drop the
    # redundant f32 fields (~0.4 GB) — the shared chip is often tight
    params = strip_unfolded_qparams(params)
    jax.block_until_ready(params)
    if args.kv8:
        from awq_tpu.models.llama import init_kv_cache8

        cache = init_kv_cache8(cfg, 1, max_seq)
    else:
        cache = init_kv_cache(cfg, 1, max_seq, jnp.bfloat16)
    gen = GenConfig(greedy=True, temperature=1.0, repetition_penalty=1.0)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)

    # prefill a short context, as the reference decode benchmark does
    tokens = jnp.zeros((1, args.context), jnp.int32)
    logits, cache = forward(params, cfg, tokens, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    def burst(cache):
        toks, dones, c2 = decode_scan(
            params, cfg, cache, first, jnp.int32(args.context),
            jax.random.PRNGKey(0), stop, seen, gen, args.steps,
            cfg.vocab_size,
        )
        return toks, c2

    # warmup (compile)
    toks, _ = burst(cache)
    _sync(toks)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _ = burst(cache)
        _sync(toks)
        times.append(time.perf_counter() - t0)
    ms_per_tok = min(times) / args.steps * 1e3

    print(json.dumps({
        "metric": "llama2_7b_w4a16_decode_latency"
                  if shape is LLAMA2_7B else "tiny_w4a16_decode_latency",
        "value": round(ms_per_tok, 3),
        "unit": "ms/token",
        "vs_baseline": round(BASELINE_MS / ms_per_tok, 3)
                       if shape is LLAMA2_7B else 0.0,
    }))


if __name__ == "__main__":
    main()
