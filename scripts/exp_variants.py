#!/usr/bin/env python
"""Decompose the folded GEMV kernel's per-block cost: stream floor (no
unpack), unpack variants, dot granularity. Geometry = gate/up (the
biggest phase): ic=4096, oc=22016, bn=512, L=32."""
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

from awq_tpu.ops.w4a16 import (
    _unpack_block, _unpack_block_bf16, quantize_linear, tile_qlinear,
)

L, IC, OC, BN = 32, 4096, 22016, 512
NG = IC // 128
ROWS = IC // 8 + 2 * NG
GB = (OC // BN) * ROWS * BN * 4 / 1e9  # bytes streamed per layer call


def kern_floor(idx_ref, x_ref, qw_ref, o_ref):
    """Stream the block, one token dot on 128 rows only (no unpack)."""
    wq = pltpu.bitcast(qw_ref[0, 0, 0:64, :], jnp.bfloat16)
    acc = jnp.dot(x_ref[:, :128].astype(jnp.bfloat16), wq,
                  preferred_element_type=jnp.float32)
    # touch the tail so the whole block must arrive
    tail = pltpu.bitcast(qw_ref[0, 0, ROWS - 8:ROWS, :], jnp.float32)
    o_ref[:] = (acc + jnp.sum(tail)).astype(x_ref.dtype)


def kern_new(idx_ref, x_ref, qw_ref, o_ref):
    """Current: bf16-bitpack unpack + center + per-group dot."""
    x = x_ref[:]
    icp = NG * 16
    acc = jnp.zeros((x.shape[0], BN), jnp.float32)
    for g in range(NG):
        wq = _unpack_block_bf16(qw_ref[0, 0, g * 16:(g + 1) * 16, :]) \
            - jnp.bfloat16(128)
        xg = x[:, g * 128:(g + 1) * 128]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        s = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :], jnp.float32)
        acc = acc + part * s
    o_ref[:] = acc.astype(x.dtype)


def kern_new_nocenter(idx_ref, x_ref, qw_ref, o_ref):
    """bf16-bitpack unpack, biased (wrong math, speed probe)."""
    x = x_ref[:]
    icp = NG * 16
    acc = jnp.zeros((x.shape[0], BN), jnp.float32)
    for g in range(NG):
        wq = _unpack_block_bf16(qw_ref[0, 0, g * 16:(g + 1) * 16, :])
        xg = x[:, g * 128:(g + 1) * 128]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        s = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :], jnp.float32)
        acc = acc + part * s
    o_ref[:] = acc.astype(x.dtype)


def kern_old(idx_ref, x_ref, qw_ref, o_ref):
    """Round-1 unpack (shift/mask + interleave stack + convert)."""
    x = x_ref[:]
    icp = NG * 16
    acc = jnp.zeros((x.shape[0], BN), jnp.float32)
    for g in range(NG):
        wq = _unpack_block(
            qw_ref[0, 0, g * 16:(g + 1) * 16, :]).astype(jnp.bfloat16)
        xg = x[:, g * 128:(g + 1) * 128]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        s = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :], jnp.float32)
        acc = acc + part * s
    o_ref[:] = acc.astype(x.dtype)


def kern_new_2g(idx_ref, x_ref, qw_ref, o_ref):
    """bf16-bitpack unpack, dot over 2 groups at once (fewer MXU issues;
    scales folded into x? no — apply per-group scale to partials by
    splitting the dot output is impossible, so scale the UNPACKED weight
    rows instead: one [128,bn] f32 mult per group)."""
    x = x_ref[:]
    icp = NG * 16
    acc = jnp.zeros((x.shape[0], BN), jnp.float32)
    for g2 in range(NG // 2):
        ws = []
        for h in range(2):
            g = 2 * g2 + h
            wq = _unpack_block_bf16(qw_ref[0, 0, g * 16:(g + 1) * 16, :])
            s = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :],
                              jnp.float32)
            ws.append((wq.astype(jnp.float32) * s).astype(jnp.bfloat16))
        wqs = jnp.concatenate(ws, axis=0)                  # [256, bn]
        xg = x[:, g2 * 256:(g2 + 1) * 256]
        acc = acc + jnp.dot(xg, wqs, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(x.dtype)


def bench(name, kern):
    ql = quantize_linear(
        jax.random.normal(jax.random.PRNGKey(0), (IC, OC), jnp.float32)
        * 0.05)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), ql)
    ql = tile_qlinear(ql, block_n=BN, fold_scales=True)
    qw = ql.qweight
    jax.block_until_ready(qw)
    rows = qw.shape[2]
    x0 = jnp.ones((16, IC), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def chain(r, x0, qw):
        def grid_call(xc, idx):
            idxv = jnp.reshape(idx, (1,)).astype(jnp.int32)
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, OC // BN),
                in_specs=[
                    pl.BlockSpec((16, IC), lambda i, j, l: (0, 0)),
                    pl.BlockSpec((1, 1, rows, BN),
                                 lambda i, j, l: (l[0], j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((16, BN), lambda i, j, l: (0, j)),
            )
            y = pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((16, OC), x0.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
            )(idxv, xc, qw)
            return xc * (1.0 + 1e-9 * jnp.sum(y).astype(xc.dtype)), None

        def step(x, _):
            x, _ = jax.lax.scan(grid_call, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    for r in (4, 12):
        np.asarray(chain(r, x0, qw))
    ts = {}
    for r in (4, 12):
        t0 = time.perf_counter()
        np.asarray(chain(r, x0, qw))
        ts[r] = time.perf_counter() - t0
    per_call = (ts[12] - ts[4]) / 8 / L
    print(f"{name}: {per_call*1e6:.2f} us/call, {GB/per_call:.0f} GB/s",
          flush=True)


def bench_floor_multi(P):
    ql = quantize_linear(
        jax.random.normal(jax.random.PRNGKey(0), (IC, OC), jnp.float32)
        * 0.05)
    ql = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (L,) + a.shape), ql)
    ql = tile_qlinear(ql, block_n=BN, fold_scales=True)
    qw = ql.qweight
    # pad the block axis so P divides it
    nb = qw.shape[1]
    pad = -nb % P
    if pad:
        qw = jnp.concatenate([qw, qw[:, :pad]], axis=1)
    nbp = qw.shape[1]
    jax.block_until_ready(qw)
    rows = qw.shape[2]
    x0 = jnp.ones((16, IC), jnp.bfloat16)

    def kern(idx_ref, x_ref, qw_ref, o_ref):
        wq = pltpu.bitcast(qw_ref[0, 0, 0:64, :], jnp.bfloat16)
        acc = jnp.dot(x_ref[:, :128].astype(jnp.bfloat16), wq,
                      preferred_element_type=jnp.float32)
        tail = pltpu.bitcast(qw_ref[0, P - 1, rows - 8:rows, :], jnp.float32)
        o_ref[:] = (acc + jnp.sum(tail)).astype(x_ref.dtype)

    @functools.partial(jax.jit, static_argnums=0)
    def chain(r, x0, qw):
        def grid_call(xc, idx):
            idxv = jnp.reshape(idx, (1,)).astype(jnp.int32)
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, nbp // P),
                in_specs=[
                    pl.BlockSpec((16, IC), lambda i, j, l: (0, 0)),
                    pl.BlockSpec((1, P, rows, BN),
                                 lambda i, j, l: (l[0], j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((16, BN), lambda i, j, l: (0, j)),
            )
            y = pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((16, (nbp // P) * BN),
                                               x0.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
            )(idxv, xc, qw)
            return xc * (1.0 + 1e-9 * jnp.sum(y).astype(xc.dtype)), None

        def step(x, _):
            x, _ = jax.lax.scan(grid_call, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    gb = nbp * rows * BN * 4 / 1e9
    for r in (4, 12):
        np.asarray(chain(r, x0, qw))
    ts = {}
    for r in (4, 12):
        t0 = time.perf_counter()
        np.asarray(chain(r, x0, qw))
        ts[r] = time.perf_counter() - t0
    per_call = (ts[12] - ts[4]) / 8 / L
    print(f"floorP={P}: {per_call*1e6:.2f} us/call, {gb/per_call:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--multi" in _s.argv:
        for P in (2, 4, 8):
            bench_floor_multi(P)
    else:
        for name, k in [("floor   ", kern_floor), ("new     ", kern_new),
                        ("nocenter", kern_new_nocenter), ("old     ", kern_old),
                        ("2group  ", kern_new_2g)]:
            bench(name, k)
