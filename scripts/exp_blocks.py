"""Sweep W4A16 stacked-kernel block shapes (slope-timed), m=1."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.ops.w4a16 import w4a16_matmul_stacked

SHAPES = [(4096, 12288), (4096, 22016), (11008, 4096)]
L = 4


def chain(op, x0, n):
    @jax.jit
    def run(x):
        def body(c, i):
            out = op(c, i % L)
            return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
        f, _ = jax.lax.scan(body, x, jnp.arange(n))
        return jnp.sum(f)
    return run


def slope(op, x, n1=5, n2=35, reps=2):
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
    for ic, oc in SHAPES:
        qw = jax.random.randint(key, (L, ic // 8, oc), -(2**31), 2**31 - 1,
                                jnp.int32)
        s = jnp.full((L, ic // 128, oc), 0.01, jnp.float32)
        sz = jnp.full((L, ic // 128, oc), 0.08, jnp.float32)
        x = jax.random.normal(key, (1, ic), jnp.bfloat16)
        packed_gb = ic * oc / 2 / 1e9
        for bn, bk in ((512, 1024), (512, 2048), (1024, 1024)):
            if oc % bn or ic % bk:
                continue
            try:
                t = slope(lambda xx, i, bn=bn, bk=bk: w4a16_matmul_stacked(
                    xx, qw, s, sz, i, 128, block_n=bn, block_k=bk), x)
                print(f"[{ic}x{oc}] bn={bn:5d} bk={bk:5d}: {t*1e6:7.1f}us "
                      f"({packed_gb/t:6.1f} GB/s)", flush=True)
            except Exception as e:
                print(f"[{ic}x{oc}] bn={bn:5d} bk={bk:5d}: FAILED "
                      f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
