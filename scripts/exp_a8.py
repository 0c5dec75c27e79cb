#!/usr/bin/env python
"""W4A8 vs W4A16 prefill matmul on real TPU: correctness (vs the bf16
folded kernel) + timing at the 7B gate/up geometry, small L to fit a
contended chip."""
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
    qlinear_apply_stacked, quantize_linear, tile_qlinear,
    w4a8_matmul_stacked_tiled_folded,
)

L = 4


def main():
    ic, oc, bn, m = 4096, 22016, 512, 2048
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05)
        for k in jax.random.split(ks[0], L)]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    ql = tile_qlinear(ql, block_n=bn, fold_scales=True)
    x = (jax.random.normal(ks[1], (m, ic), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    jax.block_until_ready(ql.qweight)

    got = np.asarray(w4a8_matmul_stacked_tiled_folded(
        x, ql.qweight, jnp.int32(1), 128, bn), np.float32)
    ref = np.asarray(qlinear_apply_stacked(ql, jnp.int32(1), x), np.float32)
    sc = np.abs(ref).max()
    bad = (np.abs(got - ref) / sc > 0.04).sum()
    print(f"a8 correctness: max|d|/scale="
          f"{np.abs(got-ref).max()/sc:.4f} bad={bad}/{got.size}", flush=True)

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def chain(r, mode, x, qw):
        def body(xc, idx):
            if mode == "a8":
                y = w4a8_matmul_stacked_tiled_folded(xc, qw, idx, 128, bn)
            else:
                from awq_tpu.ops.w4a16 import (
                    w4a16_matmul_stacked_tiled_folded,
                )

                y = w4a16_matmul_stacked_tiled_folded(xc, qw, idx, 128, bn)
            return xc * (1.0 + 1e-9 * jnp.sum(y).astype(xc.dtype)), None

        def step(xx, _):
            xx, _ = jax.lax.scan(body, xx, jnp.arange(L))
            return xx, None

        x, _ = jax.lax.scan(step, x, None, length=r)
        return x[:1, :8]

    for mode in ("a8", "bf16", "a8"):
        ts = {}
        for r in (2, 6):
            np.asarray(chain(r, mode, x, ql.qweight))
            t0 = time.perf_counter()
            np.asarray(chain(r, mode, x, ql.qweight))
            ts[r] = time.perf_counter() - t0
        per_call = (ts[6] - ts[2]) / 4 / L
        tf = 2 * m * ic * oc / per_call / 1e12
        print(f"{mode}: {per_call*1e3:.2f} ms/call, {tf:.0f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
