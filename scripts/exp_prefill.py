"""Prefill kernel experiment, m=256: per-group K=128 matmuls (current)
vs dequant-to-VMEM then one full-K matmul (MXU-friendlier for big M)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.w4a16 import w4a16_matmul_stacked, _unpack_block

IC, OC, GS, L = 4096, 11008, 128, 2
M = 256


def chain(op, x0, n):
    @jax.jit
    def run(x):
        def body(c, i):
            out = op(c, i % L)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, jnp.arange(n))
        return jnp.sum(f)
    return run


def slope(op, x, n1=20, n2=140, reps=3):
    r1, r2 = chain(op, x, n1), chain(op, x, n2)
    np.asarray(r1(x)); np.asarray(r2(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(r1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r2(x)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def kernel_prescale(idx_ref, x_ref, qw_ref, s_ref, sz_ref, o_ref, wbuf, *,
                    group_size):
    del idx_ref
    x = x_ref[:]
    ic = x.shape[1]
    n_g = ic // group_size
    rows = group_size // 8
    # dequant whole K panel into VMEM scratch (VPU), then one MXU matmul
    for g in range(n_g):
        codes = _unpack_block(qw_ref[0, g * rows:(g + 1) * rows, :])
        wf = codes.astype(jnp.float32) * s_ref[0, g, :][None, :] \
            - sz_ref[0, g, :][None, :]
        wbuf[g * group_size:(g + 1) * group_size, :] = wf.astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x, wbuf[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "bm"))
def matmul_prescale(x, qw, s, sz, idx, bn=512, bm=256):
    m, ic = x.shape
    _, icp, oc = qw.shape
    idxa = jnp.reshape(idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // bm, oc // bn),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, icp, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // 128, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // 128, bn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((ic, bn), jnp.bfloat16)],
    )
    return pl.pallas_call(
        functools.partial(kernel_prescale, group_size=128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, oc), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(idxa, x, qw, s, sz)


def main():
    key = jax.random.PRNGKey(0)
    qw = jax.random.randint(key, (L, IC // 8, OC), -(2**31), 2**31 - 1,
                            jnp.int32)
    s = jnp.full((L, IC // GS, OC), 0.01, jnp.float32)
    sz = jnp.full((L, IC // GS, OC), 0.08, jnp.float32)
    x = jax.random.normal(key, (M, IC), jnp.bfloat16)
    flops = 2 * M * IC * OC

    t = slope(lambda xx, i: w4a16_matmul_stacked(xx, qw, s, sz, i, GS), x)
    print(f"per-group (current): {t*1e6:8.1f}us ({flops/t/1e12:5.1f} TFLOP/s)",
          flush=True)
    t = slope(lambda xx, i: matmul_prescale(xx, qw, s, sz, i), x)
    print(f"prescale full-K    : {t*1e6:8.1f}us ({flops/t/1e12:5.1f} TFLOP/s)",
          flush=True)
    # dense reference
    w = jax.random.normal(key, (IC, OC), jnp.bfloat16) * 0.02

    def dense(xx, i):
        return jnp.matmul(xx, w, preferred_element_type=jnp.float32
                          ).astype(xx.dtype)

    t = slope(dense, x)
    print(f"dense bf16         : {t*1e6:8.1f}us ({flops/t/1e12:5.1f} TFLOP/s)",
          flush=True)


if __name__ == "__main__":
    main()
