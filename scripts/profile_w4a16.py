"""Microbenchmark W4A16 implementations vs dense bf16.

Timing uses the SLOPE method: the tunneled TPU platform has a ~27 ms fixed
dispatch+fetch roundtrip per jit execution, so per-op time is
(t(n2) - t(n1)) / (n2 - n1) over two chain lengths inside one jit each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.ops.w4a16 import w4a16_matmul_pallas, w4a16_matmul_xla

SHAPES = [
    (4096, 4096),
    (4096, 11008),
    (11008, 4096),
]


def chain(op, x0, n):
    @jax.jit
    def run(x):
        def body(c, _):
            out = op(c)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(f)
    return run


def slope_time(op, x, n1=10, n2=110, reps=3):
    r1, r2 = chain(op, x, n1), chain(op, x, n2)
    np.asarray(r1(x)); np.asarray(r2(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(r1(x)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(r2(x)); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    key = jax.random.PRNGKey(0)
    for ic, oc in SHAPES:
        qw = jax.random.randint(key, (ic // 8, oc), -(2**31), 2**31 - 1, jnp.int32)
        s = jnp.full((ic // 128, oc), 0.01, jnp.float32)
        sz = jnp.full((ic // 128, oc), 0.08, jnp.float32)
        x = jax.random.normal(key, (m, ic), jnp.bfloat16)
        w = (jax.random.normal(key, (ic, oc), jnp.bfloat16) * 0.02)

        def pallas_op(xx):
            return w4a16_matmul_pallas(xx, qw, s, sz, 128)

        def xla_op(xx):
            return w4a16_matmul_xla(xx, qw, s, sz, 128)

        def dense_op(xx):
            return jnp.matmul(xx, w, preferred_element_type=jnp.float32
                              ).astype(xx.dtype)

        packed_gb = ic * oc / 2 / 1e9
        dense_gb = ic * oc * 2 / 1e9
        for name, op, gb in (
            ("pallas ", pallas_op, packed_gb),
            ("xla-deq", xla_op, packed_gb),
            ("dense  ", dense_op, dense_gb),
        ):
            try:
                t = slope_time(op, x)
                print(f"  m={m} [{ic:6d}x{oc:6d}] {name}: {t*1e6:8.1f}us "
                      f"({gb/t:7.1f} GB/s)", flush=True)
            except Exception as e:
                print(f"  m={m} [{ic:6d}x{oc:6d}] {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
