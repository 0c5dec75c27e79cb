"""Does a block-contiguous weight layout beat the strided [ICp, OC] one?

Current: qweight [L, ICp, OC]; an (ICp, bn) block is 1376 rows x 2KB
strided reads. Tiled: [L, OC/bn, ICp, bn] makes each block one contiguous
2.8MB stream.
"""

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

IC, OC, GS, L, BN = 4096, 11008, 128, 2, 512
M = 1


def kernel(idx_ref, x_ref, qw_ref, s_ref, sz_ref, o_ref, *, group_size,
           out_dtype):
    del idx_ref
    x = x_ref[:]
    ic = x.shape[1]
    n_g = ic // group_size
    rows = group_size // 8
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(n_g):
        wq = _unpack_block(
            qw_ref[0, 0, g * rows:(g + 1) * rows, :]
        ).astype(jnp.bfloat16)
        xg = x[:, g * group_size:(g + 1) * group_size]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * s_ref[0, g, :][None, :] \
            - xsum * sz_ref[0, g, :][None, :]
    o_ref[:] = acc.astype(out_dtype)


@jax.jit
def matmul_tiled(x, qw_t, s, sz, idx):
    m, ic = x.shape
    L_, nb, icp, bn = qw_t.shape
    bm = 16
    x = jnp.pad(x, ((0, bm - m), (0, 0)))
    idxa = jnp.reshape(idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nb),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, 1, icp, bn), lambda i, j, l: (l[0], j, 0, 0)),
            pl.BlockSpec((1, ic // GS, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // GS, bn), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(kernel, group_size=GS, out_dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(idxa, x, qw_t, s, sz)
    return out[:m]


def chain(op, x0, n):
    @jax.jit
    def run(x):
        def body(c, i):
            out = op(c, i % L)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, jnp.arange(n))
        return jnp.sum(f)
    return run


def slope(op, x, n1=10, n2=110, reps=3):
    r1, r2 = chain(op, x, n1), chain(op, x, n2)
    np.asarray(r1(x)); np.asarray(r2(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(r1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r2(x)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    key = jax.random.PRNGKey(0)
    qw = jax.random.randint(key, (L, IC // 8, OC), -(2**31), 2**31 - 1,
                            jnp.int32)
    qw_t = jnp.stack([
        jnp.stack([qw[l][:, j * BN:(j + 1) * BN] for j in range(OC // BN)])
        for l in range(L)
    ])                                               # [L, NB, ICp, BN]
    s = jnp.full((L, IC // GS, OC), 0.01, jnp.float32)
    sz = jnp.full((L, IC // GS, OC), 0.08, jnp.float32)
    x = jax.random.normal(key, (M, IC), jnp.bfloat16)
    gb = IC * OC / 2 / 1e9

    t = slope(lambda xx, i: w4a16_matmul_stacked(xx, qw, s, sz, i, GS), x)
    print(f"strided [ICp, OC] : {t*1e6:7.1f}us ({gb/t:6.1f} GB/s)", flush=True)
    t = slope(lambda xx, i: matmul_tiled(xx, qw_t, s, sz, i), x)
    print(f"tiled  [NB,ICp,bn]: {t*1e6:7.1f}us ({gb/t:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
