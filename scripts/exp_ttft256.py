#!/usr/bin/env python
"""Short-sequence TTFT itemization (round-5 verdict task #2): at S=256
the 7B prefill measured 44 ms (w8) vs the reference's 18 ms, and the
fixed costs had no itemization. Break the full prefill into
  matmul chain (w8/a8/bf16, m=S) + attn chain + lm_head + GLUE
and probe M-padding behavior of the prefill matmul kernels (a bm=512
block minimum would make S=256 do 2x work)."""
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


def _sync(x):
    return np.asarray(x)


def timeit(fn, *args, reps=5):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main(S=256):
    cfg = ModelConfig(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=4096,
        rope_theta=10000.0, dtype="bfloat16",
    )
    params = init_qparams(cfg, QuantConfig(w_bit=4, group_size=128),
                          jax.random.PRNGKey(0))
    params = fuse_linears(params, cfg)
    from awq_tpu.ops.w4a16 import attach_w8_caches, strip_unfolded_qparams

    params = {**params, "layers": attach_w8_caches(params["layers"])}
    params = strip_unfolded_qparams(params)
    jax.block_until_ready(params["layers"]["wqkv"].qweight)
    la = params["layers"]

    cache = init_kv_cache(cfg, 1, 2048, jnp.bfloat16)
    toks = jnp.zeros((1, S), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("cfg_v",))
    def prefill(params, toks, cache, cfg_v):
        logits, c2 = forward(params, cfg_v, toks, cache, jnp.int32(0))
        return logits[:, -1, :8], c2

    cfg_w8 = dataclasses.replace(cfg, prefill_a8=True)
    out, c2 = prefill(params, toks, cache, cfg_w8)
    _sync(out)
    full_w8 = timeit(lambda: prefill(params, toks, cache, cfg_w8)[0])
    print(f"full prefill S={S} w8: {full_w8:.2f} ms", flush=True)
    full_bf = timeit(lambda: prefill(params, toks, cache, cfg)[0])
    print(f"full prefill S={S} bf16: {full_bf:.2f} ms", flush=True)

    # ---- matmul chain at several m: slope = per-flop cost, flat region
    # reveals the kernel's M-block padding ---------------------------------
    from awq_tpu.ops.w4a16 import (qlinear_apply_stacked,
                                   w8a8_matmul_stacked_tiled)

    def mm_chain_w8(x):
        def body(xc, idx):
            a = w8a8_matmul_stacked_tiled(
                xc, la["wqkv_w8"].w8, la["wqkv_w8"].scol, idx)
            o = w8a8_matmul_stacked_tiled(
                a[:, :4096], la["wo_w8"].w8, la["wo_w8"].scol, idx)
            g = w8a8_matmul_stacked_tiled(
                xc + o, la["wgateup_w8"].w8, la["wgateup_w8"].scol, idx)
            d = w8a8_matmul_stacked_tiled(
                g[:, :11008], la["down_w8"].w8, la["down_w8"].scol, idx)
            return (xc + d).astype(xc.dtype), None

        x, _ = jax.lax.scan(body, x, jnp.arange(32))
        return x[:1, :8]

    mm_w8 = {}
    for m in (64, 128, 256, 512):
        x0 = jnp.ones((m, 4096), jnp.bfloat16) * 0.01
        mm_w8[m] = timeit(jax.jit(mm_chain_w8), x0)
        tf = 2 * m * 6.6e9 / (mm_w8[m] / 1e3) / 1e12
        print(f"w8 matmul chain m={m}: {mm_w8[m]:.2f} ms "
              f"({tf:.0f} TFLOP/s)", flush=True)

    # ---- attn chain -------------------------------------------------------
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    q = jnp.ones((1, S, 32, 128), jnp.bfloat16) * 0.02

    @jax.jit
    def attn_chain(q, cache):
        def body(_, idx):
            a = flash_prefill_stacked(q, cache, idx, jnp.int32(0))
            return None, jnp.sum(a).astype(jnp.float32)

        _, ss = jax.lax.scan(body, None, jnp.arange(32))
        return ss[:4]

    attn = timeit(attn_chain, q, c2)
    print(f"attn chain S={S}: {attn:.2f} ms", flush=True)

    # ---- lm_head (last token only) ---------------------------------------
    from awq_tpu.models.llama import _head_logits

    h1 = jnp.ones((1, 1, 4096), jnp.bfloat16) * 0.01

    @jax.jit
    def head(h):
        return _head_logits(params, h, jnp.bfloat16)[:, :, :8]

    head_ms = timeit(head, h1)
    print(f"lm_head: {head_ms:.2f} ms", flush=True)

    # ---- cache append glue: forward's per-layer k/v scatter --------------
    @jax.jit
    def append_only(cache, k):
        def body(c, idx):
            c = jax.lax.dynamic_update_slice(
                c, k, (idx, 0, 0, 0, jnp.int32(0), 0))
            return c, None

        c, _ = jax.lax.scan(body, cache, jnp.arange(32))
        return c[0, 0, 0, 0, :1, :1]

    knew = jnp.ones((1, 2, 1, 32, S, 128), jnp.bfloat16)
    app = timeit(append_only, c2, knew)
    print(f"cache append x32: {app:.2f} ms", flush=True)

    glue = full_w8 - mm_w8.get(S, 0) - attn - head_ms
    print(f"\nGLUE (full - mm - attn - head) = {glue:.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
