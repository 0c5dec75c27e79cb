#!/usr/bin/env python
"""Sweep flash_prefill_stacked block sizes at the 7B S=2048 geometry.

Hypothesis: the 45 ms attention chain (vs ~5 ms of MXU work) is grid-cell
overhead (128 cells/layer at bq=512) plus per-block VPU softmax rounds;
larger q/t blocks trade cheap masked MXU work for fewer cells/rounds."""
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

from awq_tpu.ops.decode_attn import flash_prefill_stacked


def main(S=2048):
    L, NH, HD = 32, 32, 128
    cache = jax.random.normal(
        jax.random.PRNGKey(0), (L, 2, 1, NH, S, HD), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, S, NH, HD),
                          jnp.bfloat16)

    combos = [(512, 512, 2), (512, 512, 4), (512, 512, 6), (512, 512, 8),
              (512, 256, 8), (1024, 512, 4), (512, 1024, 4)]
    for bq, bt, nbuf in combos:
        if bq > S or bt > S:
            continue

        @functools.partial(jax.jit, static_argnames=("bq", "bt", "nbuf"))
        def attn_chain(q, cache, bq, bt, nbuf):
            def body(_, idx):
                a = flash_prefill_stacked(q, cache, idx, jnp.int32(0),
                                          block_t=bt, block_q=bq,
                                          nbuf=nbuf)
                return None, jnp.sum(a).astype(jnp.float32)

            _, ss = jax.lax.scan(body, None, jnp.arange(L))
            return ss[:4]

        try:
            out = attn_chain(q, cache, bq=bq, bt=bt, nbuf=nbuf)
            np.asarray(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(attn_chain(q, cache, bq=bq, bt=bt, nbuf=nbuf))
                ts.append(time.perf_counter() - t0)
        except Exception as e:
            print(f"bq={bq:5d} bt={bt:5d} nbuf={nbuf}: FAILED "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        flops = L * NH * (S * S // 2) * HD * 2 * 2   # causal useful flops
        best = min(ts)
        print(f"bq={bq:5d} bt={bt:5d} nbuf={nbuf}: {best*1e3:7.2f} ms "
              f"({flops/best/1e12:5.1f} causal TFLOP/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
