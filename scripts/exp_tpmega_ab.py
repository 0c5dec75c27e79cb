#!/usr/bin/env python
"""A/B: single-chip whole-token megakernel decode (the headline path)
vs shard_map(tp=1) decode on the TP deploy layout, which dispatches the
half-layer megakernels (ops/megakernel_tp.py). The VERDICT round-5
acceptance bar is B within ~10% of A — i.e. multi-chip decode no longer
forfeits ~30% to the 5-kernel/layer fallback.

Two full layouts do NOT fit the shared chip at once (7B/8B: observed
OOM), so A and B alternate at PHASE granularity — build A, burst, free,
build B, burst, free, repeat — with the compilation cache making
rebuild cycles cheap. Each side reports its min over cycles; the
shared chip drifts +-10% minute-to-minute, so compare mins, and re-run
if the cycle spread is wide."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import gc
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_a(geometry, steps, max_seq, reps):
    """Single-chip fused/folded/tiled layout + whole-token megakernel."""
    from awq_tpu.benchmark import build_model
    from awq_tpu.config import GenConfig
    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import decode_scan

    cfg, params, cache = build_model(geometry, "W4A16", None, max_seq)
    toks = jnp.zeros((1, 4), jnp.int32)
    logits, cache = forward(params, cfg, toks, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)
    gen = GenConfig(greedy=True)
    stop = jnp.asarray([-1], jnp.int32)

    def burst():
        t, _, _ = decode_scan(
            params, cfg, cache, first, jnp.int32(4),
            jax.random.PRNGKey(0), stop, seen, gen, steps,
            cfg.vocab_size)
        return np.asarray(t)

    tok = burst()                                   # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter(); burst()
        times.append((time.perf_counter() - t0) / steps * 1e3)
    return min(times), tok


def run_b(geometry, steps, max_seq, reps, disable_mega=False):
    """Deploy layout through shard_map on a tp=1 mesh (the multi-chip
    code path, measurable on one chip)."""
    import os as _os

    if disable_mega:
        _os.environ["AWQ_TPU_DISABLE_MEGAKERNEL"] = "1"
    else:
        _os.environ.pop("AWQ_TPU_DISABLE_MEGAKERNEL", None)
    from awq_tpu.benchmark import build_model
    from awq_tpu.config import GenConfig
    from awq_tpu.parallel import (MeshConfig, make_mesh, tp_decode_scan,
                                  tp_forward)
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
    try:
        mesh = make_mesh(MeshConfig(dp=1, tp=1),
                         devices=jax.devices()[:1])
        cfg, dep, cache = build_model(geometry, "W4A16", None, max_seq,
                                      mesh=mesh)
        toks = jnp.zeros((1, 4), jnp.int32)
        logits, cache = tp_forward(dep, cfg, toks, cache, jnp.int32(0),
                                   mesh)
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        seen = jnp.zeros((1, cfg.vocab_size), bool)
        gen = GenConfig(greedy=True)
        stop = jnp.asarray([-1], jnp.int32)

        def burst():
            t, _, _ = tp_decode_scan(
                dep, cfg, cache, first, jnp.int32(4),
                jax.random.PRNGKey(0), stop, seen, gen, steps, mesh)
            return np.asarray(t)

        tok = burst()                               # compile + warmup
        print(f"  [B] dispatch probe: attn={calls['attn']} "
              f"mlp={calls['mlp']}", flush=True)
        # counters only move on a fresh trace; cached executables from a
        # previous cycle re-run without re-entering the python dispatch
        times = []
        for _ in range(reps):
            t0 = time.perf_counter(); burst()
            times.append((time.perf_counter() - t0) / steps * 1e3)
        return min(times), tok
    finally:
        mtp.w4a16_llama_attn_half = real_attn
        mtp.w4a16_llama_mlp_half = real_mlp


def main(geometry="llama2-7b", steps=128, cycles=3, reps=3,
         max_seq=1024):
    amins, bmins = [], []
    tok_a = tok_b = None
    for c in range(cycles):
        a, tok_a = run_a(geometry, steps, max_seq, reps)
        gc.collect()
        amins.append(a)
        print(f"cycle {c}: A={a:.3f} ms/tok", flush=True)
        b, tok_b = run_b(geometry, steps, max_seq, reps)
        gc.collect()
        bmins.append(b)
        print(f"cycle {c}: B={b:.3f} ms/tok", flush=True)
    match = bool((tok_a == tok_b).all())
    print(f"\ntokens match: {match}  A[:8]={tok_a[0, :8]}"
          f"  B[:8]={tok_b[0, :8]}")
    a, b = min(amins), min(bmins)
    print(f"A (single-chip megakernel) min: {a:.3f} ms/tok  {amins}")
    print(f"B (shard_map tp=1, half-layer megakernels) min: {b:.3f} "
          f"ms/tok  {bmins}")
    print(f"B/A = {b / a:.3f}  (bar: <= 1.10)")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--geometry", default="llama2-7b")
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--cycles", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--max_seq", type=int, default=1024)
    a = p.parse_args()
    main(a.geometry, a.steps, a.cycles, a.reps, a.max_seq)
