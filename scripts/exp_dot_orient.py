#!/usr/bin/env python
"""Pure-MXU microbench: [512,128] q-block dots against K in different
orientations/widths, VMEM-resident (no DMA), to find why the flash
prefill dots run at ~38 TFLOP/s vs the ~129-250 TFLOP/s GEMM pace.

Each rep's input depends on the previous rep's output (no hoisting), and
time is the SLOPE between REPS and 2*REPS kernels (cancels the ~26 ms
tunnel dispatch+fetch round-trip and the pallas_call fixed cost)."""
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

REPS = 256


def timed(make_kernel, flops_per_rep, name, *args):
    def build(reps):
        @jax.jit
        def run(*a):
            out = pl.pallas_call(
                make_kernel(reps),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(*a)
            return out[0, 0]
        return run

    lo, hi = build(REPS), build(2 * REPS)
    np.asarray(lo(*args)); np.asarray(hi(*args))
    t = {}
    for nm, fn in (("lo", lo), ("hi", hi)):
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        t[nm] = best
    per = (t["hi"] - t["lo"]) / REPS
    print(f"{name:24s}: {per*1e6:8.2f} us/rep "
          f"({flops_per_rep/max(per,1e-12)/1e12:6.1f} TFLOP/s)", flush=True)


def mk_qkT(reps):
    def kernel(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (a + s[:, :128].astype(jnp.bfloat16) * 1e-8)

        a = jax.lax.fori_loop(0, reps, body, q_ref[...])
        o_ref[...] = a[:8].astype(jnp.float32)
    return kernel


def mk_qk(reps):
    def kernel(q_ref, kt_ref, o_ref):
        kt = kt_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, kt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (a + s[:, :128].astype(jnp.bfloat16) * 1e-8)

        a = jax.lax.fori_loop(0, reps, body, q_ref[...])
        o_ref[...] = a[:8].astype(jnp.float32)
    return kernel


def mk_qkT_transpose(reps):
    def kernel(q_ref, k_ref, o_ref):
        k = k_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, k.T, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (a + s[:, :128].astype(jnp.bfloat16) * 1e-8)

        a = jax.lax.fori_loop(0, reps, body, q_ref[...])
        o_ref[...] = a[:8].astype(jnp.float32)
    return kernel


def mk_pv(reps):
    def kernel(p_ref, v_ref, o_ref):
        v = v_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # fold the [512,128] result back into p's first 128 cols
            upd = s.astype(jnp.bfloat16) * 1e-8
            return a.at[:, :128].add(upd) if hasattr(a, "at") else a

        a = jax.lax.fori_loop(0, reps, body, p_ref[...])
        o_ref[...] = a[:8, :128].astype(jnp.float32)
    return kernel


def mk_gemm(reps, n):
    """[512,512]@[512,n] — GEMM-shaped control (contraction 512)."""
    def kernel(a_ref, b_ref, o_ref):
        bm = b_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, bm, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (a + s[:, :512].astype(jnp.bfloat16) * 1e-8)

        a = jax.lax.fori_loop(0, reps, body, a_ref[...])
        o_ref[...] = a[:8, :128].astype(jnp.float32)
    return kernel


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (512, 128), jnp.bfloat16)
    for n in (512, 1024, 2048):
        k = jax.random.normal(key, (n, 128), jnp.bfloat16)
        timed(mk_qkT, 2 * 512 * n * 128, f"qkT  N={n}", q, k)
    for n in (512, 1024, 2048):
        kt = jax.random.normal(key, (128, n), jnp.bfloat16)
        timed(mk_qk, 2 * 512 * n * 128, f"qk   N={n} (natural)", q, kt)
    k = jax.random.normal(key, (512, 128), jnp.bfloat16)
    timed(mk_qkT_transpose, 2 * 512 * 512 * 128, "qkT->T then (1,0)", q, k)
    p = jax.random.normal(key, (512, 512), jnp.bfloat16)
    v = jax.random.normal(key, (512, 128), jnp.bfloat16)
    timed(mk_pv, 2 * 512 * 512 * 128, "pv   [512,512]@[512,128]", p, v)
    for n in (512,):
        a = jax.random.normal(key, (512, 512), jnp.bfloat16)
        bm = jax.random.normal(key, (512, n), jnp.bfloat16)
        timed(functools.partial(mk_gemm, n=n), 2 * 512 * 512 * n,
              f"gemm [512,512]@[512,{n}]", a, bm)


if __name__ == "__main__":
    main()


def mk_qkT_dynslot(reps):
    """QK dot reading K from a 2-slot VMEM scratch with a TRACED slot
    index (i % 2) — tests whether dynamic leading-dim indexing of
    scratch buffers is what slows the real kernel's dots."""
    def kernel(q_ref, k_ref, o_ref, kbuf):
        kbuf[0] = k_ref[...]
        kbuf[1] = k_ref[...]

        def body(i, a):
            s = jax.lax.dot_general(
                a, kbuf[i % 2],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (a + s[:, :128].astype(jnp.bfloat16) * 1e-8)

        a = jax.lax.fori_loop(0, reps, body, q_ref[...])
        o_ref[...] = a[:8].astype(jnp.float32)
    return kernel


def main_dynslot():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (512, 128), jnp.bfloat16)
    k = jax.random.normal(key, (512, 128), jnp.bfloat16)
    timed(mk_qkT, 2 * 512 * 512 * 128, "qkT  static ref", q, k)

    def timed_scratch(make_kernel, flops, name, *args):
        def build(reps):
            @jax.jit
            def run(*a):
                out = pl.pallas_call(
                    make_kernel(reps),
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((2, 512, 128), jnp.bfloat16)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024),
                )(*a)
                return out[0, 0]
            return run
        lo, hi = build(REPS), build(2 * REPS)
        np.asarray(lo(*args)); np.asarray(hi(*args))
        t = {}
        for nm, fn in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                best = min(best, time.perf_counter() - t0)
            t[nm] = best
        per = (t["hi"] - t["lo"]) / REPS
        print(f"{name:24s}: {per*1e6:8.2f} us/rep "
              f"({flops/max(per,1e-12)/1e12:6.1f} TFLOP/s)", flush=True)

    timed_scratch(mk_qkT_dynslot, 2 * 512 * 512 * 128,
                  "qkT  dyn-slot scratch", q, k)
