#!/usr/bin/env python
"""TTFT with the int8 prefill weight cache (prefill_w8) vs W4A8 vs bf16,
exp_ttft-comparable timing (same 3-run min, same full-forward shape)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_qparams
from awq_tpu.models.llama import fuse_linears


def main(S=2048):
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=4096,
        rope_theta=10000.0, dtype="bfloat16",
    )
    params = init_qparams(cfg, QuantConfig(w_bit=4, group_size=128),
                          jax.random.PRNGKey(0))
    raw = fuse_linears(params, cfg)
    from awq_tpu.ops.w4a16 import strip_unfolded_qparams

    params = strip_unfolded_qparams(raw)
    cache = init_kv_cache(cfg, 1, max(S, 2048), jnp.bfloat16)
    toks = jnp.zeros((1, S), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("cfg_v",))
    def prefill(params, toks, cache, cfg_v):
        logits, c2 = forward(params, cfg_v, toks, cache, jnp.int32(0))
        return logits[:, -1, :8], c2

    def run(name, ps, a8):
        cfg_v = dataclasses.replace(cfg, prefill_a8=a8)
        out, _ = prefill(ps, toks, cache, cfg_v)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = prefill(ps, toks, cache, cfg_v)
            np.asarray(out)
            ts.append(time.perf_counter() - t0)
        print(f"full prefill S={S} {name}: {min(ts)*1e3:.1f} ms",
              flush=True)

    run("bf16", params, False)
    run("a8", params, True)

    # build the w8 cache LAST: the +6.6 GB cache plus compile workspace
    # is what OOMs a contended chip when the control configs come after
    from awq_tpu.ops.w4a16 import attach_w8_caches

    params_w8 = strip_unfolded_qparams(
        {**raw, "layers": attach_w8_caches(raw["layers"])})
    del raw
    jax.block_until_ready(params_w8["layers"]["wqkv_w8"].w8)
    run("w8", params_w8, True)
    run("w8", params_w8, True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
