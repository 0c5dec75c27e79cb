#!/usr/bin/env python
"""Same-session decode bandwidth triage at the Llama-3-8B geometry.

Three timings of the SAME ~4 GB/token weight stream:
  mega      — the real whole-token megakernel (unpack="bf16")
  floor     — identical DMA/block structure, compute stubbed
              (unpack="floor"): what the 2-slot manual pipeline can stream
  mosaic    — Mosaic-managed window stream over the same folded arrays
              (grid over blocks, no manual DMA): the chip's achievable rate

mega ≈ floor << mosaic  -> per-block pipeline overhead; restructure DMA.
floor << mega           -> compute doesn't hide; optimize dots.
mega ≈ mosaic           -> at the chip's rate; the gap is contention.
"""
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.megakernel import w4a16_llama_token_step
from awq_tpu.ops.w4a16 import quantize_linear, tile_qlinear

t0 = time.perf_counter()


def stamp(m):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {m}", flush=True)


# Llama-3-8B geometry
L, H, I, V = 32, 4096, 14336, 128256
NQ, NKV, HD = 32, 8, 128
T = 2048
STEPS = 64


def mk(key, ic, oc, bn):
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.02
    ql = quantize_linear(w)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape).copy(), ql)
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


@jax.jit
def build(key):
    ks = jax.random.split(key, 8)
    wqkv = mk(ks[0], H, (NQ + 2 * NKV) * HD, 512)
    wo = mk(ks[1], H, H, 512)
    wgu = mk(ks[2], H, 2 * I, 512)
    wdn = mk(ks[3], I, H, 512)
    whead0 = quantize_linear(
        jax.random.normal(ks[4], (H, V), jnp.float32) * 0.02)
    whead = tile_qlinear(
        jax.tree_util.tree_map(lambda a: a[None], whead0),
        block_n=256, fold_scales=True)
    return wqkv, wo, wgu, wdn, whead


stamp(f"backend {jax.default_backend()}; building params")
wqkv, wo, wgu, wdn, whead = build(jax.random.PRNGKey(0))
jax.block_until_ready(wqkv.qweight)
stamp("params built")

ln = jnp.ones((L, H), jnp.float32)
normw = jnp.ones((H,), jnp.float32)
cache = jnp.zeros((L, 2, 1, NKV, T, HD), jnp.bfloat16)
cos = jnp.full((HD,), 0.8, jnp.float32)
sin = jnp.sqrt(1 - cos * cos)
h0 = jnp.ones((1, H), jnp.bfloat16) * 0.01

code_gb = sum(
    w.qweight.size * 4 for w in (wqkv, wo, wgu, wdn, whead)) / 1e9
stamp(f"stream bytes/token: {code_gb:.3f} GB")


@functools.partial(jax.jit, static_argnames=("unpack", "steps"))
def burst(h0, wqkv, wo, wgu, wdn, whead, cache, unpack, steps):
    def tok(h, _):
        out = w4a16_llama_token_step(
            h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
            jnp.int32(4), nq=NQ, nkv=NKV, eps=1e-5, unpack=unpack,
            whead=whead, norm_w=normw)
        h2, kn, vn, logits = out
        # keep a dependence on logits so nothing dead-codes
        h2 = h2 + (logits[0, :1] * 1e-9).astype(h2.dtype)
        return h2, None

    h, _ = jax.lax.scan(tok, h0, None, length=steps)
    return h[:, :8]


def timeit(name, unpack):
    args = (h0, wqkv, wo, wgu, wdn, whead, cache)
    np.asarray(burst(*args, unpack=unpack, steps=STEPS))
    stamp(f"{name}: warm")
    best = 1e9
    for _ in range(3):
        tA = time.perf_counter()
        np.asarray(burst(*args, unpack=unpack, steps=STEPS))
        best = min(best, (time.perf_counter() - tA) / STEPS)
    stamp(f"{name}: {best * 1e3:7.3f} ms/token  "
          f"({code_gb / best:5.0f} GB/s effective)")
    return best


# ---- mosaic-managed upper bound: stream the same arrays via BlockSpec ----
def _touch_kernel(idx_ref, qw_ref, o_ref):
    o_ref[:] = (o_ref[:] * 0.0
                + pltpu.bitcast(qw_ref[0, 0, 0:8, :128], jnp.float32))


def mosaic_stream(qw, bn):
    """One grid pass streaming qw [L, NB, rows, bn] fully through VMEM."""
    Lq, nb, rows, bnn = qw.shape

    def kern(idx_ref, qw_ref, o_ref):
        o_ref[:] = (pltpu.bitcast(qw_ref[0, 0, 0:8, :128], jnp.float32)
                    + pltpu.bitcast(qw_ref[0, 0, rows - 8:rows, :128],
                                    jnp.float32))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Lq, nb),
        in_specs=[pl.BlockSpec((1, 1, rows, bnn),
                               lambda i, j, s: (i, j, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i, j, s: (0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.zeros((1,), jnp.int32), qw)


@functools.partial(jax.jit, static_argnames=("steps",))
def mosaic_burst(wqkv, wo, wgu, wdn, whead, steps):
    def tok(c, _):
        outs = [mosaic_stream(w.qweight, w.tiled_bn)
                for w in (wqkv, wo, wgu, wdn, whead)]
        s = sum(jnp.sum(o) for o in outs)
        return c + s * 1e-30, None

    c, _ = jax.lax.scan(tok, jnp.float32(0), None, length=steps)
    return c


def timeit_mosaic():
    np.asarray(mosaic_burst(wqkv, wo, wgu, wdn, whead, STEPS))
    stamp("mosaic: warm")
    best = 1e9
    for _ in range(3):
        tA = time.perf_counter()
        np.asarray(mosaic_burst(wqkv, wo, wgu, wdn, whead, STEPS))
        best = min(best, (time.perf_counter() - tA) / STEPS)
    stamp(f"mosaic: {best * 1e3:7.3f} ms/token  "
          f"({code_gb / best:5.0f} GB/s effective)")


import sys as _s

modes = _s.argv[1:] or ["bf16", "floor"]
for m in modes:
    if m == "mosaic":
        timeit_mosaic()
    else:
        timeit(f"{m:7s}", m)
