#!/usr/bin/env python
"""Interleaved A/B of the old prefill kernel structure (double-buffered
DMAs + iota causal mask — the exp_prefill_attr copy) vs the current
flash_prefill_stacked (nbuf-deep prefetch + hoisted diff mask): the
shared chip drifts +-10% minute-to-minute, so A and B alternate within
one process and each reports its min over interleaved reps."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exp_prefill_attr import make_kernel
from awq_tpu.ops.decode_attn import flash_prefill_stacked


def main(S=2048, rounds=6):
    L, NH, HD = 32, 32, 128
    cache = jax.random.normal(
        jax.random.PRNGKey(0), (L, 2, 1, NH, S, HD), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, S, NH, HD),
                          jnp.bfloat16)
    qt = q.reshape(1, S, NH * HD)
    bq = bt = 512

    @jax.jit
    def chain_old(qt, cache):
        def one(idx):
            scalars = jnp.stack([jnp.asarray(idx, jnp.int32),
                                 jnp.asarray(0, jnp.int32),
                                 jnp.asarray(NH // NH, jnp.int32)])
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, NH, S // bq),
                in_specs=[
                    pl.BlockSpec((1, bq, HD), lambda i, j, k, *_: (i, k, j)),
                    pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, bq, HD),
                                       lambda i, j, k, *_: (i, k, j)),
                scratch_shapes=[
                    pltpu.VMEM((2, bt, HD), cache.dtype),
                    pltpu.VMEM((2, bt, HD), cache.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,))])
            return pl.pallas_call(
                make_kernel(bt, bq, HD ** -0.5, do_max=True, do_sum=True,
                            do_exp=True, do_mask=True, sum_mxu=False),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(qt.shape, jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                    vmem_limit_bytes=32 * 1024 * 1024),
            )(scalars, qt, cache)

        def body(_, idx):
            return None, jnp.sum(one(idx)).astype(jnp.float32)

        _, ss = jax.lax.scan(body, None, jnp.arange(L))
        return ss[:4]

    @jax.jit
    def chain_new(q, cache):
        def body(_, idx):
            a = flash_prefill_stacked(q, cache, idx, jnp.int32(0))
            return None, jnp.sum(a).astype(jnp.float32)

        _, ss = jax.lax.scan(body, None, jnp.arange(L))
        return ss[:4]

    np.asarray(chain_old(qt, cache))
    np.asarray(chain_new(q, cache))
    ta, tb = [], []
    for r in range(rounds):
        t0 = time.perf_counter()
        np.asarray(chain_old(qt, cache))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(chain_new(q, cache))
        tb.append(time.perf_counter() - t0)
    print(f"old (nbuf=2, iota mask): min {min(ta)*1e3:7.2f} ms  "
          f"med {sorted(ta)[len(ta)//2]*1e3:7.2f}", flush=True)
    print(f"new (nbuf=6, diff mask): min {min(tb)*1e3:7.2f} ms  "
          f"med {sorted(tb)[len(tb)//2]*1e3:7.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
