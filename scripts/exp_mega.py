#!/usr/bin/env python
"""Megakernel TPU smoke + timing: small geometry correctness on-chip, then
the 7B layer scan (32 layers) vs the 5-kernel chain baseline."""
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

from awq_tpu.ops.megakernel import (w4a16_llama_layer_step,
                                    w4a16_llama_token_step)
from awq_tpu.ops.w4a16 import quantize_linear, tile_qlinear


def mk(key, ic, oc, bn, L):
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.05
    ql = quantize_linear(w)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), ql)
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


def smoke():
    """Small valid geometry; compare vs interpret mode run on-chip inputs."""
    nq = nkv = 2
    hd, L, T, I = 128, 2, 256, 256
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    wqkv = mk(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = mk(ks[1], H, H, 128, L)
    wgu = mk(ks[2], H, 2 * I, 128, L)
    wdn = mk(ks[3], I, H, 128, L)
    ln = jnp.ones((L, H), jnp.float32)
    cache = (jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    args = (h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
            jnp.int32(1), jnp.int32(37))
    kw = dict(nq=nq, nkv=nkv, eps=1e-5)
    got = w4a16_llama_layer_step(*args, **kw)
    got = [np.asarray(x) for x in got]
    print("smoke TPU run OK", [g.shape for g in got], flush=True)
    ref = w4a16_llama_layer_step(*args, **kw, interpret=True)
    bad = False
    for name, a, b in zip("h k v".split(), got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        print(f"  {name}: max|diff|={d.max():.5f} "
              f"n>3e-2={(d > 3e-2).sum()}/{d.size}", flush=True)
        bad = bad or d.max() > 3e-2
    if bad:
        raise SystemExit("smoke parity FAILED")
    print("smoke parity vs interpret OK", flush=True)


def bench7b(ctx):
    nq = nkv = 32
    hd, L, T, I = 128, 32, 2048, 11008
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    wqkv = mk(ks[0], H, (nq + 2 * nkv) * hd, 512, L)
    wo = mk(ks[1], H, H, 512, L)
    wgu = mk(ks[2], H, 2 * I, 512, L)
    wdn = mk(ks[3], I, H, 512, L)
    ln = jnp.ones((L, H), jnp.float32)
    cache = jnp.zeros((L, 2, 1, nkv, T, hd), jnp.bfloat16)
    h0 = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
          ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    jax.block_until_ready((wqkv, wo, wgu, wdn, cache))

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def steps(r, mode, h0, wqkv, wo, wgu, wdn, cache):
        def tok(h, _):
            if mode == "token":
                hn, kn, vn = w4a16_llama_token_step(
                    h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
                    jnp.int32(ctx), nq=nq, nkv=nkv, eps=1e-5)
            else:
                def layer(hh, idx):
                    hn, kn, vn = w4a16_llama_layer_step(
                        hh, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
                        idx, jnp.int32(ctx), nq=nq, nkv=nkv, eps=1e-5)
                    return hn + 1e-6 * (jnp.sum(kn) + jnp.sum(vn)), None
                hn, _ = jax.lax.scan(layer, h, jnp.arange(L))
                kn = vn = jnp.zeros((), h.dtype)
            return hn + 1e-6 * (jnp.sum(kn) + jnp.sum(vn)).astype(h.dtype), None
        h, _ = jax.lax.scan(tok, h0, None, length=r)
        return h[:, :8]

    for mode in ("token", "scan", "token"):
        ts = {}
        for r in (4, 12):
            np.asarray(steps(r, mode, h0, wqkv, wo, wgu, wdn, cache))
            t0 = time.perf_counter()
            np.asarray(steps(r, mode, h0, wqkv, wo, wgu, wdn, cache))
            ts[r] = time.perf_counter() - t0
        ms = (ts[12] - ts[4]) / 8 * 1e3
        print(f"7B mega step @ctx{ctx} mode={mode}: {ms:.3f} ms",
              flush=True)


if __name__ == "__main__":
    smoke()
    bench7b(4)
    bench7b(1792)
