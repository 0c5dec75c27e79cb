#!/usr/bin/env python
"""Interleaved A/B: online-softmax vs FIXED-MAX prefill flash attention
(the round-5 remedy for the VPU pass chain). Times the 32-layer attn
chain at the 7B geometry for several S; A/B alternate within one
process (shared-chip drift)."""
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


def main(S=2048, t=2048, reps=5):
    L, b, n_q, n_kv, hd = 32, 1, 32, 32, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    cache = (jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.bfloat16)
             * 0.3)
    q = (jax.random.normal(ks[1], (b, S, n_q, hd), jnp.bfloat16) * 0.3)

    def chain(fm):
        @jax.jit
        def f(q, cache):
            def body(_, idx):
                a = flash_prefill_stacked(q, cache, idx, jnp.int32(0),
                                          fixed_max=fm)
                return None, jnp.sum(a).astype(jnp.float32)

            _, ss = jax.lax.scan(body, None, jnp.arange(L))
            return ss[:4]

        return f

    fa, fb = chain(None), chain(16.0)
    ra = np.asarray(fa(q, cache))
    rb = np.asarray(fb(q, cache))
    print(f"S={S}: outputs close: "
          f"{np.allclose(ra, rb, rtol=2e-2, atol=2e-2)}  {ra} {rb}",
          flush=True)
    amins, bmins = [], []
    for r in range(reps):
        t0 = time.perf_counter(); np.asarray(fa(q, cache))
        amins.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fb(q, cache))
        bmins.append(time.perf_counter() - t0)
    a, b = min(amins) * 1e3, min(bmins) * 1e3
    print(f"S={S}: online {a:.2f} ms vs fixed-max {b:.2f} ms "
          f"({(1 - b / a) * 100:.1f}% faster)", flush=True)


if __name__ == "__main__":
    for s in ([int(x) for x in sys.argv[1:]] or [256, 1024, 2048]):
        main(S=s)
