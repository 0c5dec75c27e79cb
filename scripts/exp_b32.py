#!/usr/bin/env python
"""Probe: compile the batched megakernel at the 7B geometry, B=32,
with/without the in-kernel lm_head, and time a decode step."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.ops.megakernel_batched import w4a16_llama_token_step_batched
from awq_tpu.ops.w4a16 import quantize_linear, tile_qlinear

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
HEAD = len(sys.argv) > 2 and sys.argv[2] == "head"
BN = int(sys.argv[3]) if len(sys.argv) > 3 else 512
H, I, NQ, NKV, HD, L, T, V = 4096, 11008, 32, 32, 128, 32, 256, 32000


def mk(key, ic, oc, layers, bn=None):
    ks = jax.random.split(key, layers)
    qls = [quantize_linear(jax.random.normal(k, (ic, oc), jnp.float32) * 0.02)
           for k in ks]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    return tile_qlinear(ql, block_n=bn or BN, fold_scales=True)


ks = jax.random.split(jax.random.PRNGKey(0), 8)
print("building params...", flush=True)
wqkv = mk(ks[0], H, (NQ + 2 * NKV) * HD, L)
wo = mk(ks[1], H, H, L)
wgu = mk(ks[2], H, 2 * I, L)
wdn = mk(ks[3], I, H, L)
ln1 = jnp.ones((L, H), jnp.float32)
ln2 = jnp.ones((L, H), jnp.float32)
cache = jnp.zeros((L, 2, B, NKV, T, HD), jnp.bfloat16)
h = jax.random.normal(ks[4], (B, H), jnp.float32).astype(jnp.bfloat16) * 0.1
lengths = jnp.full((B,), 37, jnp.int32)
cos = jnp.ones((B, HD), jnp.float32)
sin = jnp.zeros((B, HD), jnp.float32)
kw = {}
if HEAD:
    kw["whead"] = mk(ks[5], H, V, 1, bn=256)   # 32000 % 512 != 0
    kw["norm_w"] = jnp.ones((H,), jnp.float32)

print(f"compiling B={B} head={HEAD} bn={BN}...", flush=True)
t0 = time.perf_counter()
out = w4a16_llama_token_step_batched(
    h, wqkv, wo, wgu, wdn, ln1, ln2, cos, sin, cache, lengths,
    nq=NQ, nkv=NKV, eps=1e-5, **kw)
np.asarray(out[0][0, :8])   # block_until_ready returns early here
print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)

for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        out = w4a16_llama_token_step_batched(
            out[0].astype(h.dtype), wqkv, wo, wgu, wdn, ln1, ln2, cos, sin,
            cache, lengths, nq=NQ, nkv=NKV, eps=1e-5, **kw)
    np.asarray(out[0][0, :8])
    dt = (time.perf_counter() - t0) / 8
    print(f"step {dt*1e3:.2f} ms  ({B/dt:.0f} tok/s)", flush=True)
