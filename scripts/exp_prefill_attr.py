#!/usr/bin/env python
"""Attribute flash_prefill_stacked's per-element cost: strip one piece of
the softmax chain at a time (max-reduce, sum-reduce, exp2, mask, renorm)
and time the 32-layer attention chain at the 7B S=2048 geometry. The
stripped kernels are WRONG numerically — timing only."""
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


def make_kernel(block_t, block_q, scale, *, do_max, do_sum, do_exp,
                do_mask, sum_mxu):
    def kernel(scalars_ref, q_ref, cache_ref, o_ref, kbuf, vbuf, ksem, vsem):
        b = pl.program_id(0)
        h = pl.program_id(1)
        qb = pl.program_id(2)
        layer = scalars_ref[0]
        start_pos = scalars_ref[1]
        groups = scalars_ref[2]
        kvh = h // groups
        q = (q_ref[0].astype(jnp.float32)
             * (scale * 1.4426950408889634)).astype(jnp.bfloat16)
        bq, hd = q.shape
        q0 = start_pos + qb * block_q
        hi = q0 + bq
        nblk = jnp.minimum(pl.cdiv(hi, block_t),
                           cache_ref.shape[4] // block_t)

        def dma(buf, kv, sem, slot, i):
            return pltpu.make_async_copy(
                cache_ref.at[layer, kv, b, kvh,
                             pl.ds(i * block_t, block_t), :],
                buf.at[slot], sem.at[slot])

        dma(kbuf, 0, ksem, 0, 0).start()
        dma(vbuf, 1, vsem, 0, 0).start()
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, block_t), 0) + q0

        def body(i, carry):
            m, l, acc = carry
            slot = i % 2

            @pl.when(i + 1 < nblk)
            def _():
                dma(kbuf, 0, ksem, (i + 1) % 2, i + 1).start()
                dma(vbuf, 1, vsem, (i + 1) % 2, i + 1).start()

            dma(kbuf, 0, ksem, slot, i).wait()
            s = jax.lax.dot_general(
                q, kbuf[slot].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if do_mask:
                def _mask(s):
                    cols = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                            + i * block_t)
                    return jnp.where(cols <= rows, s, -jnp.inf)
                s = jax.lax.cond((i + 1) * block_t - 1 <= q0,
                                 lambda s: s, _mask, s)
            if do_max:
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp2(m - m_new)
            else:
                m_new, alpha = m, jnp.ones_like(m)
            p = jnp.exp2(s - m_new) if do_exp else (s - m_new)
            if do_sum:
                l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            else:
                l_new = l
            dma(vbuf, 1, vsem, slot, i).wait()
            pb = p.astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                pb, vbuf[slot].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sum_mxu:
                ones = jnp.ones((block_t, 8), jnp.bfloat16)
                lcol = jax.lax.dot_general(
                    pb, ones, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                l_new = l * alpha + lcol[:, :1]
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((block_q, 1), -jnp.inf if do_max else 8.0, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, q_ref.shape[2]), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-6)).astype(o_ref.dtype)
    return kernel


def run_variant(q, cache, name, **flags):
    b, s, n_q, hd = q.shape
    L = cache.shape[0]
    bq = bt = 512
    qt = q.reshape(b, s, n_q * hd)

    @jax.jit
    def attn_chain(qt, cache):
        def one(idx):
            scalars = jnp.stack([jnp.asarray(idx, jnp.int32),
                                 jnp.asarray(0, jnp.int32),
                                 jnp.asarray(n_q // cache.shape[3],
                                             jnp.int32)])
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b, n_q, s // bq),
                in_specs=[
                    pl.BlockSpec((1, bq, hd), lambda i, j, k, *_: (i, k, j)),
                    pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, bq, hd),
                                       lambda i, j, k, *_: (i, k, j)),
                scratch_shapes=[
                    pltpu.VMEM((2, bt, hd), cache.dtype),
                    pltpu.VMEM((2, bt, hd), cache.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))])
            return pl.pallas_call(
                make_kernel(bt, bq, hd ** -0.5, **flags),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    vmem_limit_bytes=32 * 1024 * 1024),
            )(scalars, qt, cache)

        def body(_, idx):
            return None, jnp.sum(one(idx)).astype(jnp.float32)

        _, ss = jax.lax.scan(body, None, jnp.arange(L))
        return ss[:4]

    try:
        np.asarray(attn_chain(qt, cache))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(attn_chain(qt, cache))
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s}: {min(ts)*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {str(e).splitlines()[0][:100]}",
              flush=True)


def main(S=2048):
    L, NH, HD = 32, 32, 128
    cache = jax.random.normal(
        jax.random.PRNGKey(0), (L, 2, 1, NH, S, HD), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, S, NH, HD),
                          jnp.bfloat16)
    base = dict(do_max=True, do_sum=True, do_exp=True, do_mask=True,
                sum_mxu=False)
    run_variant(q, cache, "full (baseline)", **base)
    run_variant(q, cache, "no max-reduce", **{**base, "do_max": False})
    run_variant(q, cache, "no sum-reduce", **{**base, "do_sum": False})
    run_variant(q, cache, "sum via MXU ones-dot",
                **{**base, "do_sum": False, "sum_mxu": True})
    run_variant(q, cache, "no exp2", **{**base, "do_exp": False})
    run_variant(q, cache, "no mask", **{**base, "do_mask": False})
    run_variant(q, cache, "dots only", do_max=False, do_sum=False,
                do_exp=False, do_mask=False, sum_mxu=False)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
