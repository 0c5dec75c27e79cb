"""Kernel variants, slope-timed (t(n2)-t(n1))/(n2-n1) to cancel the ~27ms
tunnel roundtrip.

A: current production kernel
B: planar-in-group packing + mantissa-OR dequant (3 int ops -> f32 bits)
C: current kernel, bigger N blocks
D: dense bf16 (memory ceiling reference)
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

from awq_tpu.ops.w4a16 import w4a16_matmul_pallas

IC, OC, GS = 4096, 11008, 128
M = 1


def chain(op, x0, n):
    @jax.jit
    def run(x):
        def body(c, _):
            out = op(c)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(f)
    return run


def slope(op, x, n1=10, n2=60, reps=3):
    r1, r2 = chain(op, x, n1), chain(op, x, n2)
    np.asarray(r1(x)); np.asarray(r2(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(r1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r2(x)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


# --- variant B: planar packing + mantissa trick ---------------------------

MAGIC = 0x43000000  # f32 bits of 128.0; code lands at mantissa<<16 -> 128+c


def kernel_b(x_ref, qw_ref, s_ref, sz_ref, o_ref, acc_ref, *, bk):
    k = pl.program_id(2)
    ng = bk // GS

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:]
    x = x_ref[:].astype(jnp.float32)
    acc = acc_ref[:]
    g0 = k * ng
    for g in range(ng):
        wg = w[g * 16:(g + 1) * 16]                  # [16, bn] int32
        planes = []
        for s in range(8):
            if s <= 4:
                v = (wg << (16 - 4 * s)) & 0x000F0000
            else:
                v = (wg >> (4 * s - 16)) & 0x000F0000
            planes.append(v | MAGIC)
        wf = pltpu.bitcast(
            jnp.concatenate(planes, axis=0), jnp.float32
        )                                            # [128, bn] = 128 + c
        xg = x[:, g * GS:(g + 1) * GS]
        part = jnp.dot(xg, wf, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg, axis=1, keepdims=True)
        s_row = s_ref[g0 + g][None]
        sz_row = sz_ref[g0 + g][None]
        acc += part * s_row - xsum * (s_row * 128.0 + sz_row)
    acc_ref[:] = acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def matmul_b(x, qw, s, sz, bm=8, bn=512, bk=1024):
    m = x.shape[0]
    if m < bm:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
    grid = (x.shape[0] // bm, OC // bn, IC // bk)
    out = pl.pallas_call(
        functools.partial(kernel_b, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((IC // GS, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((IC // GS, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], OC), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, qw, s, sz)
    return out[:m]


def main():
    key = jax.random.PRNGKey(0)
    qw = jax.random.randint(key, (IC // 8, OC), -(2**31), 2**31 - 1, jnp.int32)
    s = jnp.full((IC // GS, OC), 0.01, jnp.float32)
    sz = jnp.full((IC // GS, OC), 0.08, jnp.float32)
    x = jax.random.normal(key, (M, IC), jnp.bfloat16)
    w = jax.random.normal(key, (IC, OC), jnp.bfloat16) * 0.02
    packed_gb = IC * OC / 2 / 1e9

    t = slope(lambda xx: w4a16_matmul_pallas(xx, qw, s, sz, GS), x)
    print(f"A current       : {t*1e6:8.1f}us ({packed_gb/t:7.1f} GB/s)", flush=True)

    t = slope(lambda xx: matmul_b(xx, qw, s, sz), x)
    print(f"B planar+magic  : {t*1e6:8.1f}us ({packed_gb/t:7.1f} GB/s)", flush=True)

    t = slope(lambda xx: w4a16_matmul_pallas(xx, qw, s, sz, GS,
                                             block_n=1376, block_k=2048), x)
    print(f"C big blocks    : {t*1e6:8.1f}us ({packed_gb/t:7.1f} GB/s)", flush=True)

    t = slope(lambda xx: jnp.matmul(xx, w, preferred_element_type=jnp.float32
                                    ).astype(xx.dtype), x)
    print(f"D dense bf16    : {t*1e6:8.1f}us ({IC*OC*2/1e9/t:7.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
