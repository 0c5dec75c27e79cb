"""Experiment: which W4 unpack strategy is fastest inside a Pallas kernel?

V1 current   : shifts -> stack(axis=1) -> reshape (sublane interleave)
V2 planar    : group-planar packing; shifts -> concat along sublanes
V3 no-unpack : floor — stream packed words, convert, matmul K=bk/8
V4 int8      : codes stored as int8 (2x bytes), convert + matmul
V5 plane-dots: shifts only; 8 small matmuls per group, no relayout
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

IC, OC = 4096, 4096
GS = 128
BM, BN, BK = 16, 512, 1024
NG = BK // GS


def timed(op, x, n=50, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            out = op(c)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(f)

    np.asarray(run(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / n


def make_call(kernel, packed_rows, extra_specs=(), extra_args=()):
    def wrapped(x, qw, s, sz):
        grid = (1, OC // BN, IC // BK)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
                pl.BlockSpec((packed_rows, BN), lambda i, j, k: (k, j)),
                pl.BlockSpec((IC // GS, BN), lambda i, j, k: (0, j)),
                pl.BlockSpec((IC // GS, BN), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((BM, OC), x.dtype),
            scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x, qw, s, sz)
    return wrapped


def finish(o_ref, acc_ref, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def v1_kernel(x_ref, qw_ref, s_ref, sz_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:]
    bkp, bn = w.shape
    w3 = w.reshape(bkp // 8, 8, bn)
    planes = [(w3 >> (4 * s)) & 0xF for s in range(8)]
    wq = jnp.stack(planes, axis=1).reshape(bkp * 8, bn).astype(jnp.bfloat16)
    x = x_ref[:]
    acc = acc_ref[:]
    g0 = k * NG
    for g in range(NG):
        lo = g * GS
        xg = x[:, lo:lo + GS]
        part = jnp.dot(xg, wq[lo:lo + GS], preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc += part * s_ref[g0 + g][None] - xsum * sz_ref[g0 + g][None]
    acc_ref[:] = acc
    finish(o_ref, acc_ref, x_ref.dtype)


def v2_kernel(x_ref, qw_ref, s_ref, sz_ref, o_ref, acc_ref):
    # planar-in-group packing: group g's word p holds channels
    # 128g + p + 16s at nibble s -> plane_s of rows [16g:16g+16] is the
    # contiguous channel run [128g+16s, 128g+16s+16)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:]
    x = x_ref[:]
    acc = acc_ref[:]
    g0 = k * NG
    for g in range(NG):
        wg = w[g * 16:(g + 1) * 16]                     # [16, bn]
        planes = [((wg >> (4 * s)) & 0xF) for s in range(8)]
        wq = jnp.concatenate(planes, axis=0).astype(jnp.bfloat16)  # [128, bn]
        xg = x[:, g * GS:(g + 1) * GS]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc += part * s_ref[g0 + g][None] - xsum * sz_ref[g0 + g][None]
    acc_ref[:] = acc
    finish(o_ref, acc_ref, x_ref.dtype)


def v3_kernel(x_ref, qw_ref, s_ref, sz_ref, o_ref, acc_ref):
    # floor: no unpack — stream words, convert once, K=bk/8 matmul
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:].astype(jnp.bfloat16)                  # [bk/8, bn]
    x = x_ref[:, ::8]                                   # [bm, bk/8]
    acc_ref[:] = acc_ref[:] + jnp.dot(
        x, w, preferred_element_type=jnp.float32
    ) * s_ref[0][None]
    finish(o_ref, acc_ref, x_ref.dtype)


def v5_kernel(x_ref, qw_ref, s_ref, sz_ref, o_ref, acc_ref):
    # plane dots: shifts only, 8 matmuls of K=bk/8 per block; x pre-split
    # by plane OUTSIDE; here approximated by strided slices of x (cheap).
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:]
    x = x_ref[:]
    acc = acc_ref[:]
    # NOTE: ignores group scales (timing skeleton only) — single global scale
    for s in range(8):
        plane = ((w >> (4 * s)) & 0xF).astype(jnp.bfloat16)   # [bk/8, bn]
        xs = x[:, s::8]                                       # [bm, bk/8]
        acc += jnp.dot(xs, plane, preferred_element_type=jnp.float32)
    acc_ref[:] = acc * s_ref[0][None]
    finish(o_ref, acc_ref, x_ref.dtype)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, IC), jnp.bfloat16)
    qw = jax.random.randint(key, (IC // 8, OC), -(2**31), 2**31 - 1, jnp.int32)
    q8 = jax.random.randint(key, (IC, OC), 0, 16, jnp.int8)
    s = jnp.full((IC // GS, OC), 0.01, jnp.float32)
    sz = jnp.full((IC // GS, OC), 0.08, jnp.float32)
    packed_gb = IC * OC / 2 / 1e9

    def pad(xx):
        return jnp.pad(xx, ((0, BM - xx.shape[0]), (0, 0)))

    for name, kern in (("v1-stack", v1_kernel), ("v2-planar", v2_kernel),
                       ("v3-floor", v3_kernel), ("v5-planedots", v5_kernel)):
        call = make_call(kern, BK // 8)
        try:
            t = timed(lambda xx: call(pad(xx), qw, s, sz)[:1], x)
            print(f"{name:14s}: {t*1e6:8.1f}us ({packed_gb/t:7.1f} GB/s)",
                  flush=True)
        except Exception as e:
            print(f"{name:14s}: FAILED {type(e).__name__} {str(e)[:140]}",
                  flush=True)

    # V4: int8 container (2x bytes) via plain XLA
    sb = s.astype(jnp.bfloat16)

    def int8_op(xx):
        w = q8.astype(jnp.bfloat16).reshape(IC // GS, GS, OC)
        wd = (w * sb[:, None, :]).reshape(IC, OC)
        return jnp.matmul(xx, wd, preferred_element_type=jnp.float32)

    t = timed(int8_op, x)
    print(f"{'v4-int8-xla':14s}: {t*1e6:8.1f}us "
          f"({IC * OC / 1e9 / t:7.1f} GB/s of int8 bytes)", flush=True)


if __name__ == "__main__":
    main()
