#!/usr/bin/env python
"""Per-grid-step fixed cost probe: same bytes, different block counts."""
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

from awq_tpu.ops.w4a16 import (
    quantize_linear, tile_qlinear, w4a16_matmul_stacked_tiled,
)

L = 32


def mk(key, ic, oc, bn):
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.05
    ql = quantize_linear(w)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), ql)
    return tile_qlinear(ql, block_n=bn)


def timeit(ic, oc, bn):
    ql = mk(jax.random.PRNGKey(0), ic, oc, bn)
    jax.block_until_ready(ql)
    x0 = jnp.ones((1, ic), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def chain(r, x0, ql):
        def step(x, _):
            def body(xc, idx):
                y = w4a16_matmul_stacked_tiled(
                    xc, ql.qweight, ql.scales, ql.szeros, idx, 128, bn)
                return xc * (1.0 + 1e-9 * jnp.sum(y).astype(xc.dtype)), None
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    ts = {}
    for r in (4, 12):
        np.asarray(chain(r, x0, ql))
        t0 = time.perf_counter()
        np.asarray(chain(r, x0, ql))
        ts[r] = time.perf_counter() - t0
    per_call = (ts[12] - ts[4]) / 8 / L
    gb = ic * oc / 2 / 1e9
    print(f"ic={ic} oc={oc} bn={bn} steps={oc//bn}: "
          f"{per_call*1e6:.2f} us/call, {gb/per_call:.0f} GB/s", flush=True)


if __name__ == "__main__":
    for bn in (256, 512, 1024, 2048):
        if 22016 % bn == 0:
            timeit(4096, 22016, bn)
    for bn in (256, 512):
        timeit(11008, 4096, bn)
    for bn in (256, 512, 1024):
        timeit(4096, 12288, bn)
