#!/usr/bin/env python
"""Prefill TTFT decomposition at the 7B geometry: full forward @S, the
bare 4-matmul chain @m=S, and the flash prefill attention @S — shows how
far the non-GEMM chain sits from the matmul floor."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_qparams
from awq_tpu.models.llama import fuse_linears


def _sync(x):
    return np.asarray(x)


def main(S=2048):
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=4096,
        rope_theta=10000.0, dtype="bfloat16",
    )
    params = init_qparams(cfg, QuantConfig(w_bit=4, group_size=128),
                          jax.random.PRNGKey(0))
    params = fuse_linears(params, cfg)
    from awq_tpu.ops.w4a16 import strip_unfolded_qparams

    params = strip_unfolded_qparams(params)
    jax.block_until_ready(params["layers"]["wqkv"].qweight)
    la = params["layers"]

    # ---- full prefill ------------------------------------------------------
    cache = init_kv_cache(cfg, 1, 2048, jnp.bfloat16)
    toks = jnp.zeros((1, S), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("cfg_v",))
    def prefill(params, toks, cache, cfg_v):
        logits, c2 = forward(params, cfg_v, toks, cache, jnp.int32(0))
        return logits[:, -1, :8], c2

    import dataclasses

    for a8 in (False, True, False):
        cfg_v = dataclasses.replace(cfg, prefill_a8=a8)
        out, c2 = prefill(params, toks, cache, cfg_v)
        _sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, _ = prefill(params, toks, cache, cfg_v)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"full prefill S={S} a8={int(a8)}: {min(ts)*1e3:.1f} ms",
              flush=True)

    # ---- matmul chain only -------------------------------------------------
    from awq_tpu.ops.w4a16 import qlinear_apply_stacked

    @jax.jit
    def mm_chain(params, x):
        la = params["layers"]

        def body(xc, idx):
            a = qlinear_apply_stacked(la["wqkv"], idx, xc)
            o = qlinear_apply_stacked(la["wo"], idx, a[:, :4096])
            g = qlinear_apply_stacked(la["wgateup"], idx, xc + o)
            d = qlinear_apply_stacked(la["down"], idx, g[:, :11008])
            return (xc + d).astype(xc.dtype), None

        x, _ = jax.lax.scan(body, x, jnp.arange(32))
        return x[:1, :8]

    x0 = jnp.ones((S, 4096), jnp.bfloat16) * 0.01
    _sync(mm_chain(params, x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(mm_chain(params, x0))
        ts.append(time.perf_counter() - t0)
    print(f"matmul chain S={S}: {min(ts)*1e3:.1f} ms "
          f"({2*S*6.6e9/min(ts)/1e12:.0f} TFLOP/s)", flush=True)

    # ---- flash prefill attention only --------------------------------------
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    q = jnp.ones((1, S, 32, 128), jnp.bfloat16) * 0.02

    @jax.jit
    def attn_chain(q, cache):
        def body(_, idx):
            a = flash_prefill_stacked(q, cache, idx, jnp.int32(0))
            return None, jnp.sum(a).astype(jnp.float32)

        _, ss = jax.lax.scan(body, None, jnp.arange(32))
        return ss[:4]

    _sync(attn_chain(q, c2))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(attn_chain(q, c2))
        ts.append(time.perf_counter() - t0)
    print(f"attn chain S={S}: {min(ts)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
