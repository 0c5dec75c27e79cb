#!/usr/bin/env python
"""Decode-step cost breakdown on the real chip (round-2 perf work).

Attributes the headline ms/token across:
  A. the 4 stacked W4A16 matmuls x 32 layers (weights stream)
  B. flash decode attention x 32 (ctx 4 and 1792)
  C. the fp16 lm_head matmul
  D. a minimal pallas kernel x 160 (pure launch overhead)
  E. the full decode step (bench path)

Timing per platform rules (PERF.md): chain everything inside one jit,
fetch ONE small array, use slope timing over rep counts.
"""
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

from awq_tpu.config import ModelConfig, QuantConfig, GenConfig
from awq_tpu.models import init_kv_cache, init_qparams, forward
from awq_tpu.models.llama import fuse_linears
from awq_tpu.ops.w4a16 import qlinear_apply_stacked
from awq_tpu.ops.decode_attn import flash_decode_stacked
from awq_tpu.runtime.generate import decode_scan

LLAMA2_7B = dict(
    arch="llama", vocab_size=32000, hidden_size=4096, intermediate_size=11008,
    num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
    max_position_embeddings=4096, rope_theta=10000.0,
)


def slope_time(fn, *args, reps=(8, 24)):
    """fn(r, *args) runs r chained steps and returns a small array."""
    outs = {}
    for r in reps:
        np.asarray(fn(r, *args))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(r, *args))
        outs[r] = time.perf_counter() - t0
    r1, r2 = reps
    return (outs[r2] - outs[r1]) / (r2 - r1)


def main():
    cfg = ModelConfig(**LLAMA2_7B, dtype="bfloat16")
    qcfg = QuantConfig(w_bit=4, group_size=128)
    params = fuse_linears(init_qparams(cfg, qcfg, jax.random.PRNGKey(0)), cfg)
    jax.block_until_ready(params)
    layers = params["layers"]
    L = cfg.num_layers

    wqkv, wo = layers["wqkv"], layers["wo"]
    wgu, wdn = layers["wgateup"], layers["down"]

    # ---- A: matmul chain --------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def matmul_chain(r, x0, wqkv, wo, wgu, wdn):
        def step(x, _):
            def body(xc, idx):
                y = qlinear_apply_stacked(wqkv, idx, xc)
                a = qlinear_apply_stacked(wo, idx, y[:, :4096])
                g = qlinear_apply_stacked(wgu, idx, a)
                d = qlinear_apply_stacked(wdn, idx, g[:, :11008])
                return d, None
            x, _ = jax.lax.scan(body, x, jnp.arange(L))
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    x0 = jnp.ones((1, 4096), jnp.bfloat16)
    t_mm = slope_time(matmul_chain, x0, wqkv, wo, wgu, wdn, reps=(4, 12))
    print(f"A matmuls (4x{L}): {t_mm*1e3:.3f} ms/step", flush=True)

    # ---- B: attention chain ------------------------------------------------
    cache = init_kv_cache(cfg, 1, 2048, jnp.bfloat16)

    def attn_chain_fn(length):
        @functools.partial(jax.jit, static_argnums=0)
        def attn_chain(r, q0, cache):
            def step(q, _):
                def body(qc, idx):
                    o = flash_decode_stacked(
                        qc, qc[:, :32], qc[:, :32], cache, idx,
                        jnp.int32(length))
                    return o + qc * 1e-6, None
                q, _ = jax.lax.scan(body, q, jnp.arange(L))
                return q, None
            q, _ = jax.lax.scan(step, q0, None, length=r)
            return q[:, 0, :8]
        return attn_chain

    q0 = jnp.ones((1, 32, 128), jnp.bfloat16)
    t_attn4 = slope_time(attn_chain_fn(4), q0, cache, reps=(4, 12))
    print(f"B attention x{L} (ctx 4): {t_attn4*1e3:.3f} ms/step", flush=True)
    t_attn_long = slope_time(attn_chain_fn(1792), q0, cache, reps=(4, 12))
    print(f"B attention x{L} (ctx 1792): {t_attn_long*1e3:.3f} ms/step",
          flush=True)

    # ---- C: lm_head --------------------------------------------------------
    head = jax.random.normal(jax.random.PRNGKey(1), (4096, 32000),
                             jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=0)
    def head_chain(r, x0, head):
        def step(x, _):
            lg = jnp.matmul(x, head, preferred_element_type=jnp.float32)
            return (x + lg[:, :4096].astype(x.dtype) * 1e-9), None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:, :8]

    t_head = slope_time(head_chain, x0, head, reps=(16, 48))
    print(f"C lm_head fp16: {t_head*1e3:.3f} ms/step", flush=True)

    # ---- D: minimal pallas launch overhead ---------------------------------
    from jax.experimental import pallas as pl

    def _tiny_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def tiny_call(x):
        return pl.pallas_call(
            _tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    @functools.partial(jax.jit, static_argnums=0)
    def launch_chain(r, x0):
        def step(x, _):
            def body(xc, _i):
                return tiny_call(xc), None
            x, _ = jax.lax.scan(body, x, None, length=160)
            return x, None
        x, _ = jax.lax.scan(step, x0, None, length=r)
        return x[:1, :8]

    t_launch = slope_time(launch_chain, jnp.zeros((8, 128), jnp.float32),
                          reps=(4, 12))
    print(f"D 160 tiny pallas launches: {t_launch*1e3:.3f} ms/step "
          f"({t_launch*1e6/160:.1f} us/launch)", flush=True)

    # ---- E: full decode step (bench path) ----------------------------------
    gen = GenConfig(greedy=True, temperature=1.0, repetition_penalty=1.0)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)
    tokens = jnp.zeros((1, 4), jnp.int32)
    logits, cache2 = forward(params, cfg, tokens, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    def full(r):
        toks, dones, c2 = decode_scan(
            params, cfg, cache2, first, jnp.int32(4),
            jax.random.PRNGKey(0), stop, seen, gen, r, cfg.vocab_size)
        return toks

    np.asarray(full(16)); np.asarray(full(48))
    ts = {}
    for r in (16, 48):
        t0 = time.perf_counter(); np.asarray(full(r))
        ts[r] = time.perf_counter() - t0
    t_full = (ts[48] - ts[16]) / 32
    print(f"E full decode step: {t_full*1e3:.3f} ms/step", flush=True)

    glue = t_full - t_mm - t_attn4 - t_head
    print(f"=> implied XLA glue (norms/rope/append/sample): "
          f"{glue*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
