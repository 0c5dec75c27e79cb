#!/usr/bin/env python
"""Interleaved A/B: single-chip whole-token megakernel decode (the
headline path) vs shard_map(tp=1) decode on the TP deploy layout, which
dispatches the half-layer megakernels (ops/megakernel_tp.py). The
VERDICT round-5 acceptance bar is B within ~10% of A — i.e. multi-chip
decode no longer forfeits ~30% to the 5-kernel/layer fallback. The
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


def main(geometry="llama3-8b", steps=128, rounds=5, max_seq=1024):
    from awq_tpu.benchmark import build_model
    from awq_tpu.config import GenConfig
    from awq_tpu.models import forward
    from awq_tpu.parallel import (MeshConfig, make_mesh, tp_decode_scan,
                                  tp_forward)
    from awq_tpu.runtime.generate import decode_scan
    import awq_tpu.ops.megakernel_tp as mtp

    calls = {"attn": 0, "mlp": 0}
    real_attn, real_mlp = mtp.w4a16_llama_attn_half, mtp.w4a16_llama_mlp_half

    def attn(*a, **kw):
        calls["attn"] += 1
        return real_attn(*a, **kw)

    def mlp(*a, **kw):
        calls["mlp"] += 1
        return real_mlp(*a, **kw)

    mtp.w4a16_llama_attn_half = attn
    mtp.w4a16_llama_mlp_half = mlp

    context = 4
    gen = GenConfig(greedy=True)
    stop = jnp.asarray([-1], jnp.int32)

    # ---- A: single-chip fused/folded/tiled layout -------------------------
    cfg, params_a, cache_a = build_model(geometry, "W4A16", None, max_seq)
    toks = jnp.zeros((1, context), jnp.int32)
    logits, cache_a = forward(params_a, cfg, toks, cache_a, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)

    def burst_a():
        t, _, _ = decode_scan(
            params_a, cfg, cache_a, first, jnp.int32(context),
            jax.random.PRNGKey(0), stop, seen, gen, steps, cfg.vocab_size)
        return t

    # ---- B: deploy layout through shard_map on a tp=1 mesh ----------------
    mesh = make_mesh(MeshConfig(dp=1, tp=1), devices=jax.devices()[:1])
    cfg_b, dep, cache_b = build_model(geometry, "W4A16", None, max_seq,
                                      mesh=mesh)
    logits_b, cache_b = tp_forward(dep, cfg_b, toks, cache_b, jnp.int32(0),
                                   mesh)
    first_b = jnp.argmax(logits_b[:, -1], -1).astype(jnp.int32)

    def burst_b():
        t, _, _ = tp_decode_scan(
            dep, cfg_b, cache_b, first_b, jnp.int32(context),
            jax.random.PRNGKey(0), stop, seen, gen, steps, mesh)
        return t

    print("compiling A...", flush=True)
    ta = np.asarray(burst_a())
    print("compiling B...", flush=True)
    tb = np.asarray(burst_b())
    print(f"dispatch probe: attn={calls['attn']} mlp={calls['mlp']}",
          flush=True)
    assert calls["attn"] > 0 and calls["mlp"] > 0, "tpmega never dispatched"
    # same greedy tokens from the same weights: parity spot-check
    print(f"tokens match: {(ta == tb).all()}  A[:8]={ta[0, :8]}"
          f"  B[:8]={tb[0, :8]}", flush=True)

    amins, bmins = [], []
    for r in range(rounds):
        t0 = time.perf_counter(); np.asarray(burst_a())
        a = (time.perf_counter() - t0) / steps * 1e3
        t0 = time.perf_counter(); np.asarray(burst_b())
        b = (time.perf_counter() - t0) / steps * 1e3
        amins.append(a); bmins.append(b)
        print(f"round {r}: A={a:.3f} ms/tok  B={b:.3f} ms/tok", flush=True)
    a, b = min(amins), min(bmins)
    print(f"\nA (single-chip megakernel) min: {a:.3f} ms/tok")
    print(f"B (shard_map tp=1, half-layer megakernels) min: {b:.3f} ms/tok")
    print(f"B/A = {b / a:.3f}  (bar: <= 1.10)")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="llama3-8b")
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--max_seq", type=int, default=1024)
    a = p.parse_args()
    main(a.geometry, a.steps, a.rounds, a.max_seq)
