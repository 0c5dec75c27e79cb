#!/usr/bin/env python
"""Time the prefill GLUE passes (everything between the Pallas matmuls)
at the 7B geometry, S=2048, to decide what deserves a fused kernel.

Each candidate runs as a 32-iteration scan (one per layer) so dispatch
overhead amortizes; times are per-32-layer totals, directly comparable
to the ~29 ms glue residual measured by exp_ttft.py.
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

S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
H, I, NQ, NKV, HD = 4096, 11008, 32, 32, 128
L = 32


def _sync(x):
    return np.asarray(x)


def bench(name, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:7.2f} ms", flush=True)
    return min(ts) * 1e3


def scan32(body, *xs):
    def fn(*xs):
        def step(c, _):
            return body(*xs, c), None

        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(L))
        return c

    return fn


def main():
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (S, H), jnp.bfloat16)
    gu = jax.random.normal(key, (S, 2 * I), jnp.bfloat16)
    qkv = jax.random.normal(key, (1, S, 3 * H), jnp.bfloat16)
    ln = jnp.ones((H,), jnp.bfloat16)
    sx = jnp.ones((S, 1), jnp.float32)
    cos = jnp.ones((S, HD // 2), jnp.float32)
    sin = jnp.ones((S, HD // 2), jnp.float32)
    cache = jnp.zeros((L, 2, 1, NKV, S, HD), jnp.bfloat16)

    from awq_tpu.models.layers import apply_rope, rms_norm
    from awq_tpu.ops.w8a8 import quant_per_token

    # 1. norm (+ implicit consumer) per layer
    def g_norm(h, ln, c):
        x = rms_norm(h + c.astype(h.dtype), ln, 1e-5)
        return jnp.sum(x.astype(jnp.float32)[:1, :1]) + c

    bench("rms_norm x2/layer", scan32(
        lambda h, ln, c: g_norm(h, ln, g_norm(h, ln, c)), h, ln), h, ln)

    # 2. norm + per-token int8 quant (a8 prologue), x2 per layer
    def g_nq(h, ln, c):
        x = rms_norm(h + c.astype(h.dtype), ln, 1e-5)
        q, s = quant_per_token(x)
        return jnp.sum(q[:1, :1].astype(jnp.float32)) + s[0, 0] + c

    bench("rms_norm+quant x2/layer", scan32(
        lambda h, ln, c: g_nq(h, ln, g_nq(h, ln, c)), h, ln), h, ln)

    # 3. a8 epilogue: out * sx on the qkv output
    def g_sx(qkv, sx, c):
        o = (qkv[0] + c.astype(qkv.dtype)) * sx.astype(qkv.dtype)
        return jnp.sum(o.astype(jnp.float32)[:1, :1]) + c

    bench("qkv*sx /layer", scan32(g_sx, qkv, sx), qkv, sx)

    # 4. rope + swapaxes + cache append (per layer)
    def g_rope(qkv, cos, sin, cache, c):
        q, k, v = jnp.split(qkv + c.astype(qkv.dtype),
                            [NQ * HD, (NQ + NKV) * HD], axis=-1)
        q = q.reshape(1, S, NQ, HD)
        k = k.reshape(1, S, NKV, HD)
        v = v.reshape(1, S, NKV, HD)
        q, k = apply_rope(q, k, cos, sin, jnp.arange(S)[None])
        kv_new = jnp.stack([jnp.swapaxes(k, 1, 2),
                            jnp.swapaxes(v, 1, 2)])[None]
        cache = jax.lax.dynamic_update_slice(
            cache, kv_new.astype(cache.dtype), (0, 0, 0, 0, 0, 0))
        return (jnp.sum(q.astype(jnp.float32)[:1, :1, :1])
                + jnp.sum(cache[0, 0, 0, 0, :1, :1].astype(jnp.float32))
                + c)

    def fn_rope(qkv, cos, sin, cache):
        def step(carry, _):
            c, cache = carry
            return (g_rope(qkv, cos, sin, cache, c), cache), None

        (c, cache), _ = jax.lax.scan(step, (jnp.float32(0), cache),
                                     jnp.arange(L))
        return c, cache[0, 0, 0, 0, :1, :1]

    f = jax.jit(fn_rope)
    _sync(f(qkv, cos, sin, cache)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(qkv, cos, sin, cache)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{'rope+append /layer':44s} {min(ts)*1e3:7.2f} ms", flush=True)

    # 5. SwiGLU: split + silu*mul (+ quant for the a8 down input)
    def g_swiglu(gu, c):
        g, u = jnp.split(gu + c.astype(gu.dtype), 2, axis=-1)
        hm = jax.nn.silu(g.astype(jnp.float32)).astype(gu.dtype) * u
        return jnp.sum(hm.astype(jnp.float32)[:1, :1]) + c

    bench("silu*mul /layer", scan32(g_swiglu, gu), gu)

    def g_swiglu_q(gu, c):
        g, u = jnp.split(gu + c.astype(gu.dtype), 2, axis=-1)
        hm = jax.nn.silu(g.astype(jnp.float32)).astype(gu.dtype) * u
        q, s = quant_per_token(hm)
        return jnp.sum(q[:1, :1].astype(jnp.float32)) + s[0, 0] + c

    bench("silu*mul+quant /layer", scan32(g_swiglu_q, gu), gu)

    # 6. gu*sx consumer too (a8 epilogue on the gateup output)
    def g_gusx(gu, sx, c):
        o = (gu + c.astype(gu.dtype)) * sx.astype(gu.dtype)
        g, u = jnp.split(o, 2, axis=-1)
        hm = jax.nn.silu(g.astype(jnp.float32)).astype(gu.dtype) * u
        q, s = quant_per_token(hm)
        return jnp.sum(q[:1, :1].astype(jnp.float32)) + s[0, 0] + c

    bench("gu*sx+silu*mul+quant /layer", scan32(g_gusx, gu, sx), gu, sx)


if __name__ == "__main__":
    main()
