#!/usr/bin/env python
"""Per-matmul streaming rate of the folded tiled GEMV kernel at the 7B
phase geometries — tells whether the megakernel's per-block compute chain
(unpack + per-group dot + scale) keeps up with the DMA stream."""
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
    quantize_linear, tile_qlinear, w4a16_matmul_stacked_tiled_folded,
)

L = 32


def mk(key, ic, oc, bn):
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.05
    ql = quantize_linear(w)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), ql)
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


def timeit(name, ic, oc, bn):
    ql = mk(jax.random.PRNGKey(0), ic, oc, bn)
    jax.block_until_ready(ql.qweight)
    x0 = jnp.ones((1, ic), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def chain(r, x0, qw):
        def step(x, _):
            def body(xc, idx):
                y = w4a16_matmul_stacked_tiled_folded(
                    xc, qw, idx, 128, bn)
                return xc * (1.0 + 1e-9 * jnp.sum(y).astype(xc.dtype)), None
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    ts = {}
    for r in (4, 12):
        np.asarray(chain(r, x0, ql.qweight))
        t0 = time.perf_counter()
        np.asarray(chain(r, x0, ql.qweight))
        ts[r] = time.perf_counter() - t0
    per_call = (ts[12] - ts[4]) / 8 / L
    gb = ql.qweight.size * 4 / 1e9
    print(f"{name}: ic={ic} oc={oc} bn={bn} blocks={oc//bn}: "
          f"{per_call*1e6:.2f} us/call, {gb/per_call:.0f} GB/s", flush=True)


if __name__ == "__main__":
    timeit("qkv ", 4096, 12288, 512)
    timeit("o   ", 4096, 4096, 512)
    timeit("gu  ", 4096, 22016, 512)
    timeit("down", 11008, 4096, 512)
