"""Microbenchmark the W4A16 kernel vs dense bf16 and XLA-dequant paths.

Reports effective HBM bandwidth (packed bytes / time) for decode (m=1)
and prefill (m=512) shapes. Run on the real chip.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.ops.w4a16 import w4a16_matmul_pallas, w4a16_matmul_xla

SHAPES = [  # (IC, OC) of llama2-7B linears
    (4096, 4096),
    (4096, 11008),
    (11008, 4096),
    (4096, 12288),  # fused qkv
]


def timeit(fn, n=20):
    s = fn()  # compile
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn()
    np.asarray(s)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    for m in (1, 16, 512):
        print(f"--- m={m}")
        for ic, oc in SHAPES:
            qw = jax.random.randint(key, (ic // 8, oc), -(2**31), 2**31 - 1, jnp.int32)
            s = jnp.ones((ic // 128, oc), jnp.float32) * 0.01
            sz = jnp.ones((ic // 128, oc), jnp.float32) * 0.08
            x = jax.random.normal(key, (m, ic), jnp.bfloat16)
            w = jax.random.normal(key, (ic, oc), jnp.bfloat16)

            @jax.jit
            def pallas_sum(x=x, qw=qw, s=s, sz=sz):
                return jnp.sum(w4a16_matmul_pallas(x, qw, s, sz, 128))

            @jax.jit
            def xla_sum(x=x, qw=qw, s=s, sz=sz):
                return jnp.sum(w4a16_matmul_xla(x, qw, s, sz, 128))

            @jax.jit
            def dense_sum(x=x, w=w):
                return jnp.sum(jnp.matmul(x, w, preferred_element_type=jnp.float32))

            tp = timeit(pallas_sum)
            tx = timeit(xla_sum)
            td = timeit(dense_sum)
            packed_gb = ic * oc / 2 / 1e9
            dense_gb = ic * oc * 2 / 1e9
            print(
                f"  [{ic:6d}x{oc:6d}] pallas {tp*1e6:8.1f}us ({packed_gb/tp:6.1f} GB/s) | "
                f"xla-deq {tx*1e6:8.1f}us | dense {td*1e6:8.1f}us ({dense_gb/td:6.1f} GB/s)"
            )


if __name__ == "__main__":
    main()
