"""Benchmark CLI: TTFT across context lengths + decode throughput.

Counterpart of ``tinychat/benchmark.py:24-379`` — same methodology:
warmup, multi-run averages, decode measured exLLaMA-style with a short
context, TTFT swept over context lengths, optional chunked-prefill mode
(history KV reuse across rounds). Random weights by default (benchmark is
about kernels, not accuracy), or a quantized checkpoint via --load_quant.

  python -m awq_tpu.benchmark --geometry llama2-7b --precision W4A16
  python -m awq_tpu.benchmark --geometry llama3-8b --mode ttft
  python -m awq_tpu.benchmark --geometry llama2-7b --mode chunk_prefill
"""

from __future__ import annotations

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import time
from typing import Dict

import numpy as np

GEOMETRIES: Dict[str, dict] = {
    "llama2-7b": dict(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=4096,
    ),
    "llama2-13b": dict(
        arch="llama", vocab_size=32000, hidden_size=5120,
        intermediate_size=13824, num_layers=40, num_heads=40,
        num_kv_heads=40, head_dim=128, max_position_embeddings=4096,
    ),
    "llama3-8b": dict(
        arch="llama", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, head_dim=128, max_position_embeddings=8192,
        rope_theta=500000.0,
    ),
    # Qwen2.5-7B: QKV biases ride inside the megakernel (the reference's
    # fused path serves qwen2 natively, tinychat/models/qwen2.py:118-283)
    "qwen2-7b": dict(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, max_position_embeddings=8192,
        rope_theta=1000000.0, qkv_bias=True,
    ),
    # head_dim-64 families (round-5: flash decode relaxed to hd % 64;
    # falcon rides MQA + parallel block, mpt ALiBi — both previously sat
    # on the XLA fallback the reference never had)
    "falcon-7b": dict(
        arch="falcon", vocab_size=65024, hidden_size=4544,
        intermediate_size=18176, num_layers=32, num_heads=71,
        num_kv_heads=1, head_dim=64, max_position_embeddings=2048,
        norm="layernorm", act="gelu", parallel_block=True, single_ln=True,
    ),
    "mpt-7b": dict(
        arch="mpt", vocab_size=50432, hidden_size=4096,
        intermediate_size=16384, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=2048,
        norm="layernorm", norm_bias=False, act="gelu", pos_embed="alibi",
    ),
    # 70B-class geometries: don't fit one v5e chip even at W4 (~35 GB
    # packed) — these are the --mesh / --mode scaling targets (the
    # BASELINE north star: quantized weights + KV sharded over ICI)
    "llama2-70b": dict(
        arch="llama", vocab_size=32000, hidden_size=8192,
        intermediate_size=28672, num_layers=80, num_heads=64,
        num_kv_heads=8, head_dim=128, max_position_embeddings=4096,
    ),
    "llama3-70b": dict(
        arch="llama", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_layers=80, num_heads=64,
        num_kv_heads=8, head_dim=128, max_position_embeddings=8192,
        rope_theta=500000.0,
    ),
    "tiny": dict(
        arch="llama", vocab_size=1024, hidden_size=512,
        intermediate_size=1024, num_layers=4, num_heads=8, num_kv_heads=8,
        head_dim=64, max_position_embeddings=2048,
    ),
}


def _sync(x):
    return np.asarray(x)  # host fetch = the only reliable sync (see bench.py)


def build_model(geometry: str, precision: str, load_quant, max_seq: int,
                mesh=None, prefill_w8: bool = False,
                prefill_w8_budget_gb: float = 0.0):
    import jax
    import jax.numpy as jnp

    from awq_tpu.config import ModelConfig, QuantConfig
    from awq_tpu.models import init_kv_cache, init_params, init_qparams
    from awq_tpu.models.llama import quantize_params

    if load_quant:
        from awq_tpu.utils.checkpoint import load_checkpoint

        params, cfg, _ = load_checkpoint(load_quant)
    else:
        cfg = ModelConfig(**GEOMETRIES[geometry], dtype="bfloat16")
        if precision in ("W4A16", "W3A16"):
            # falcon-7b's 4544 hidden is not 128-divisible: g64 (the
            # reference zoo ships g128 for llama-family; group size is a
            # free parameter of the packing)
            gs = 128 if cfg.hidden_size % 128 == 0 else 64
            qcfg = QuantConfig(
                w_bit=4 if precision == "W4A16" else 3, group_size=gs
            )
            params = init_qparams(cfg, qcfg, jax.random.PRNGKey(0))
        else:
            params = init_params(cfg, jax.random.PRNGKey(0))
    if mesh is not None:
        # multi-chip: the sharded TP deploy layout (fused + folded tiled
        # per-device shards, quantized lm_head) — parallel/deploy.py
        from jax.sharding import NamedSharding
        from awq_tpu.parallel import build_tp_params
        from awq_tpu.parallel.shard import cache_pspec

        dep = build_tp_params(
            params, cfg, mesh,
            quantize_head=precision in ("W4A16", "W3A16"),
            prefill_w8=prefill_w8)
        tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
        cache = jax.device_put(
            init_kv_cache(cfg, 1, max_seq, jnp.bfloat16),
            NamedSharding(mesh, cache_pspec(shard_kv=tp > 1)))
        return cfg, dep, cache
    from awq_tpu.models.llama import fuse_linears
    from awq_tpu.ops.w4a16 import (
        QLinear, quantize_linear, strip_unfolded_qparams,
    )

    if (precision in ("W4A16", "W3A16") and "lm_head" in params
            and not isinstance(params["lm_head"], QLinear)):
        # quantized output head is the deploy default (a 128k-vocab fp16
        # head alone streams >1 GB/token); fuse_linears tiles it folded
        params["lm_head"] = quantize_linear(
            params["lm_head"].astype(jnp.float32),
            n_bit=4, group_size=128 if cfg.hidden_size % 128 == 0 else 64)
    params = fuse_linears(params, cfg, consume=True)
    if prefill_w8:
        # int8 prefill weight cache — must build before the strip below
        # removes the unfolded scales
        from awq_tpu.ops.w4a16 import attach_w8_caches

        params = {**params, "layers": attach_w8_caches(
            params["layers"],
            budget_bytes=int(prefill_w8_budget_gb * 2**30) or None)}
    params = strip_unfolded_qparams(params)
    cache = init_kv_cache(cfg, 1, max_seq, jnp.bfloat16)
    return cfg, params, cache


def bench_decode(cfg, params, cache, context: int, steps: int, runs: int,
                 mesh=None):
    import jax
    import jax.numpy as jnp

    from awq_tpu.config import GenConfig
    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import cache_bucket, decode_scan

    bucket = cache_bucket(cache.shape[4], context + steps + 1)
    cache = jax.lax.slice_in_dim(cache, 0, bucket, axis=4)
    toks = jnp.zeros((1, context), jnp.int32)
    if mesh is not None:
        from awq_tpu.parallel import tp_forward

        logits, cache = tp_forward(params, cfg, toks, cache, jnp.int32(0),
                                   mesh)
    else:
        logits, cache = forward(params, cfg, toks, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    gen = GenConfig(greedy=True)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)

    def burst():
        if mesh is not None:
            from awq_tpu.parallel import tp_decode_scan

            t, _, _ = tp_decode_scan(
                params, cfg, cache, first, jnp.int32(context),
                jax.random.PRNGKey(0), stop, seen, gen, steps, mesh,
            )
            return t
        t, _, _ = decode_scan(
            params, cfg, cache, first, jnp.int32(context),
            jax.random.PRNGKey(0), stop, seen, gen, steps, cfg.vocab_size,
        )
        return t

    _sync(burst())  # compile
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(burst())
        times.append(time.perf_counter() - t0)
    ms = np.mean(times) / steps * 1e3
    return {"ms_per_token": ms, "tokens_per_s": 1e3 / ms}


def bench_scaling(geometry: str, precision: str, load_quant, max_seq: int,
                  context: int, steps: int, runs: int, tp_max: int):
    """Tensor-parallel scaling efficiency: single-stream decode rate at
    tp=1 vs tp=N, each on the TP deploy layout. Efficiency is
    ``rate(tpN) / (N * rate(tp1))`` for the SAME model — i.e. how much of
    the ideal N-chip speedup survives the collectives. The BASELINE north
    star asks ≥85% from 1 chip -> 1 host -> 2+ hosts; this harness is the
    measurement tool (on the CI CPU mesh it validates compile+run; the
    number is meaningful on real multi-chip ICI)."""
    import jax

    from awq_tpu.parallel import MeshConfig, make_mesh

    n_dev = len(jax.devices())
    tps = sorted({1, min(tp_max, n_dev)})
    out = {}
    for tp in tps:
        mesh = make_mesh(MeshConfig(dp=1, tp=tp),
                         devices=jax.devices()[:tp])
        cfg, dep, cache = build_model(
            geometry, precision, load_quant, max_seq, mesh=mesh)
        r = bench_decode(cfg, dep, cache, context, steps, runs, mesh=mesh)
        out[tp] = r["tokens_per_s"]
    base = out[tps[0]]
    eff = {tp: out[tp] / (tp * base) for tp in tps}
    return {"tokens_per_s": out, "efficiency": eff}


def bench_spec_decode(cfg, params, cache, context: int, runs: int,
                      k: int = 7):
    """Speculative-verify economics: one s=k+1 verify window (rides the
    chunked-prefill megakernel) vs k+1 sequential decode steps. Reports
    the verify-step latency, the per-token cost at full acceptance, and
    the break-even acceptance rate. New capability — the reference
    decodes strictly one token per forward."""
    import jax
    import jax.numpy as jnp

    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import cache_bucket

    bucket = cache_bucket(cache.shape[4], context + k + 2)
    cache = jax.lax.slice_in_dim(cache, 0, bucket, axis=4)
    toks = jnp.zeros((1, context), jnp.int32)
    _, cache = forward(params, cfg, toks, cache, jnp.int32(0))
    window = jnp.zeros((1, k + 1), jnp.int32)
    one = jnp.zeros((1, 1), jnp.int32)

    def verify():
        logits, _ = forward(params, cfg, window, cache,
                            jnp.int32(context), last_only=False)
        return logits[0, -1, 0].astype(jnp.float32)

    def decode1():
        logits, _ = forward(params, cfg, one, cache, jnp.int32(context))
        return logits[0, -1, 0].astype(jnp.float32)

    verify_ms = _marginal_ms(verify, runs)
    decode_ms = _marginal_ms(decode1, runs)
    return {
        "verify_ms": verify_ms,
        "decode_ms": decode_ms,
        "k": k,
        "ms_per_token_full_accept": verify_ms / (k + 1),
        "breakeven_accept": max(verify_ms / decode_ms - 1.0, 0.0) / k,
    }


def bench_batch_decode(cfg, params, batch: int, context: int, steps: int,
                       runs: int, max_seq: int, kv8: bool = False):
    """Batched decode throughput (continuous-batching steady state): all
    rows decode in lockstep at per-row lengths; weights stream once per
    step for the whole batch."""
    import functools

    import jax
    import jax.numpy as jnp

    from awq_tpu.models import forward, init_kv_cache
    from awq_tpu.models.llama import decode_step_batched
    from awq_tpu.runtime.generate import cache_bucket

    # cache is threaded CONTINUOUSLY through all bursts (the decode step
    # donates its cache argument, so a kept-around "initial" cache would
    # be a deleted buffer); size the bucket for the full run
    bucket = cache_bucket(max_seq, context + steps * (runs + 1) + 4)
    if kv8:
        from awq_tpu.models.llama import init_kv_cache8

        cache = init_kv_cache8(cfg, batch, bucket)
    else:
        cache = init_kv_cache(cfg, batch, bucket, jnp.bfloat16)
    toks = jnp.zeros((batch, context), jnp.int32)
    logits, cache = forward(params, cfg, toks, cache, jnp.int32(0))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    lengths0 = jnp.full((batch,), context, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def one(params, tok, cache, lens):
        # params as an ARGUMENT: a closure would capture the multi-GB
        # pytree as compile-time constants (hours of XLA lowering).
        # cache donated HERE: the inner step's donation is ignored when
        # inlined, and an undonated multi-GB cache is copied every step
        logits, cache = decode_step_batched(params, cfg, tok, cache, lens)
        return jnp.argmax(logits, -1).astype(jnp.int32), cache, lens + 1

    tok, lens = first, lengths0

    def burst(n):
        nonlocal tok, cache, lens
        for _ in range(n):
            tok, cache, lens = one(params, tok, cache, lens)  # pipelines
        return tok

    _sync(burst(2))  # compile
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(burst(steps))
        times.append(time.perf_counter() - t0)
    step_ms = np.mean(times) / steps * 1e3
    return {"ms_per_step": step_ms,
            "tokens_per_s": batch * 1e3 / step_ms}


def bench_batch_decode_paged(cfg, params, batch: int, context: int,
                             steps: int, runs: int, max_seq: int,
                             page: int = 256):
    """Paged batched decode throughput: the page-pool sibling of
    :func:`bench_batch_decode` (pool sized for the run; per-row block
    tables; decode reads the same bytes as the contiguous engine —
    correctness is covered by tests/test_paged.py's bit-exactness)."""
    import functools
    import math

    import jax
    import jax.numpy as jnp

    from awq_tpu.models.llama import decode_step_paged

    need = context + steps * (runs + 1) + 4
    per_row = math.ceil(need / page)
    n_pages = batch * per_row + 1            # +1 trash page
    pool = jnp.zeros((cfg.num_layers, 2, n_pages, cfg.num_kv_heads, page,
                      cfg.head_dim), jnp.bfloat16)
    tables = np.zeros((batch, per_row), np.int32)
    pid = 1
    for b in range(batch):
        for j in range(per_row):
            tables[b, j] = pid
            pid += 1
    tables = jnp.asarray(tables)
    tok0 = jnp.zeros((batch,), jnp.int32)
    lengths0 = jnp.full((batch,), context, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def one(params, tok, pool, tables, lens):
        logits, pool = decode_step_paged(params, cfg, tok, pool, tables,
                                         lens)
        return jnp.argmax(logits, -1).astype(jnp.int32), pool, lens + 1

    tok, lens = tok0, lengths0

    def burst(n):
        nonlocal tok, pool, lens
        for _ in range(n):
            tok, pool, lens = one(params, tok, pool, tables, lens)
        return tok

    _sync(burst(2))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _sync(burst(steps))
        times.append(time.perf_counter() - t0)
    step_ms = np.mean(times) / steps * 1e3
    return {"ms_per_step": step_ms, "tokens_per_s": batch * 1e3 / step_ms,
            "n_pages": n_pages}


def bench_batch_spec(cfg, params, batch: int, context: int, steps: int,
                     max_seq: int, spec_k: int = 7,
                     temperature: float = 0.0):
    """Continuous batching WITH speculative verify vs without, through
    the actual BatchEngine (round-4: spec moved into the batched
    engine, where accepted tokens multiply across slots). A cyclic
    prompt so prompt-lookup has structure to draft from; reports
    aggregate tok/s. ``temperature > 0`` exercises the rejection-
    sampling acceptance path (round-5: spec no longer greedy-only)."""
    import time as _time

    import jax

    from awq_tpu.config import GenConfig
    from awq_tpu.runtime.batch_engine import BatchEngine

    from awq_tpu.runtime.generate import cache_bucket

    prompt = (list(range(7, 7 + 24)) * (context // 24 + 1))[:context]
    gen = GenConfig(greedy=temperature <= 0, temperature=temperature,
                    max_new_tokens=steps)
    # size the engine cache for THIS run (a full-max_seq B-slot cache is
    # ~17 GB at B=8/T=4096 — more than the chip)
    max_seq = min(max_seq,
                  cache_bucket(max_seq, context + steps + spec_k + 4))
    out = {}
    for mode, k in (("plain", 0), ("spec", spec_k)):
        eng = BatchEngine(cfg, params, n_slots=batch, max_seq_len=max_seq,
                          spec_k=k)
        # warmup burst (compiles prefill + step shapes)
        eng.submit(prompt, GenConfig(greedy=True, max_new_tokens=4))
        eng.run()
        for _ in range(batch):
            eng.submit(prompt, gen)
        t0 = _time.perf_counter()
        done = eng.run()
        dt = _time.perf_counter() - t0
        n_tok = sum(len(r.out_ids) for r in done.values()
                    if len(r.out_ids) > 4)
        out[mode] = dict(tokens_per_s=n_tok / dt, wall_s=dt, k=k)
    out["speedup"] = (out["spec"]["tokens_per_s"]
                      / out["plain"]["tokens_per_s"])
    return out


def _marginal_ms(fn, runs: int, n_hi: int = 6):
    """On-device latency of ``fn`` by burst-slope timing: the tunneled
    platform adds a ~30 ms fixed dispatch+fetch cost to every single-shot
    measurement (absent on local hardware and in the reference's
    cuda-event timings); chaining n async dispatches before one fetch
    amortizes it out: (t(n_hi) - t(1)) / (n_hi - 1)."""
    import jax.numpy as jnp

    def burst(n):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            acc = acc + fn()
        return _sync(acc)

    burst(1)
    burst(n_hi)  # compile both burst shapes
    ts = {}
    for n in (1, n_hi):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            burst(n)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return max((ts[n_hi] - ts[1]) / (n_hi - 1) * 1e3, 0.0)


def bench_ttft(cfg, params, cache, seq_lens, runs: int, mesh=None):
    import jax
    import jax.numpy as jnp

    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import cache_bucket

    out = {}
    for s in seq_lens:
        bucket = cache_bucket(cache.shape[4], s + 1)
        c = jax.lax.slice_in_dim(cache, 0, bucket, axis=4)
        toks = jnp.zeros((1, s), jnp.int32)

        def prefill():
            if mesh is not None:
                from awq_tpu.parallel import tp_forward

                logits, _ = tp_forward(params, cfg, toks, c, jnp.int32(0),
                                       mesh)
            else:
                logits, _ = forward(params, cfg, toks, c, jnp.int32(0))
            return logits[0, -1, 0].astype(jnp.float32)

        out[s] = _marginal_ms(prefill, runs)
    return out


def bench_chunk_prefill(cfg, params, cache, history_lens, question_len: int,
                        runs: int):
    """Multi-round TTFT with history KV reuse (reference
    ``tinychat/benchmark.py`` chunk-prefill mode; table at
    ``tinychat/README.md:229-234``)."""
    import jax
    import jax.numpy as jnp

    from awq_tpu.models import forward

    out = {}
    q = jnp.zeros((1, question_len), jnp.int32)
    for h in history_lens:
        # fill history KV once
        hist = jnp.zeros((1, h), jnp.int32)
        _, c = forward(params, cfg, hist, cache, jnp.int32(0))

        def round_ttft():
            logits, _ = forward(params, cfg, q, c, jnp.int32(h))
            return logits[0, -1, 0].astype(jnp.float32)

        out[h] = _marginal_ms(round_ttft, runs)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser("awq_tpu.benchmark")
    p.add_argument("--geometry", default="llama2-7b", choices=GEOMETRIES)
    p.add_argument("--precision", default="W4A16",
                   choices=["W4A16", "W3A16", "W16A16"])
    p.add_argument("--load_quant", default=None)
    p.add_argument("--mode", default="decode",
                   choices=["decode", "ttft", "chunk_prefill",
                            "batch_decode", "spec_decode", "scaling",
                            "all"])
    p.add_argument("--mesh", type=str, default=None,
                   help="'dp,tp' (or 'tp'): run decode/ttft through the "
                        "sharded TP deploy layout")
    p.add_argument("--tp_max", type=int, default=0,
                   help="scaling mode: largest tp to measure (default: "
                        "all devices)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_seq_len", type=int, default=4096)
    p.add_argument("--context", type=int, default=4,
                   help="decode context (reference uses 4)")
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--runs", type=int, default=3,
                   help="(reference uses 10-run means)")
    p.add_argument("--seq_lens", type=str, default="256,512,1024,2048,4096")
    p.add_argument("--history_lens", type=str, default="16,64,256,1024")
    p.add_argument("--question_len", type=int, default=32)
    p.add_argument("--prefill_a8", action="store_true",
                   help="int8-activation prefill matmuls (W4A8, 2x MXU)")
    p.add_argument("--prefill_w8", action="store_true",
                   help="int8 prefill WEIGHT cache: no in-kernel requant "
                        "and no min-length a8 gate (costs IC*OC bytes of "
                        "HBM per layer; implies --prefill_a8)")
    p.add_argument("--prefill_w8_budget_gb", type=float, default=0.0,
                   help="HBM cap for the prefill_w8 cache (GiB): builds "
                        "the deepest-IC linears first under the budget, "
                        "the rest stay on the in-kernel-requant path")
    p.add_argument("--kv8", action="store_true",
                   help="int8 KV cache (halved cache bytes -> 2x batch "
                        "slots at the same HBM footprint)")
    p.add_argument("--spec", action="store_true",
                   help="batch_decode: BatchEngine with speculative "
                        "verify (spec_k=7) vs without")
    p.add_argument("--temp", type=float, default=0.0,
                   help="batch_decode --spec: sampling temperature "
                        "(0 = greedy; >0 rides rejection-sampling "
                        "speculative acceptance)")
    p.add_argument("--paged", action="store_true",
                   help="batch_decode: page-pool cache (block tables) "
                        "instead of per-slot static rows")
    args = p.parse_args(argv)

    name = f"{args.geometry}/{args.precision}"
    if args.mode == "scaling":
        import jax

        tp_max = args.tp_max or len(jax.devices())
        r = bench_scaling(args.geometry, args.precision, args.load_quant,
                          args.max_seq_len, args.context, args.steps,
                          args.runs, tp_max)
        for tp, rate in r["tokens_per_s"].items():
            print(f"[{name}] scaling tp={tp}: {rate:.1f} tok/s "
                  f"(efficiency {r['efficiency'][tp] * 100:.0f}%)")
        return 0

    from awq_tpu.parallel import parse_mesh_arg

    mesh = parse_mesh_arg(args.mesh)
    cfg, params, cache = build_model(
        args.geometry, args.precision, args.load_quant, args.max_seq_len,
        mesh=mesh, prefill_w8=args.prefill_w8,
        prefill_w8_budget_gb=args.prefill_w8_budget_gb,
    )
    if args.prefill_a8 or args.prefill_w8:
        import dataclasses

        cfg = dataclasses.replace(cfg, prefill_a8=True)
    if args.mode in ("decode", "all"):
        r = bench_decode(cfg, params, cache, args.context, args.steps,
                         args.runs, mesh=mesh)
        print(f"[{name}] decode: {r['ms_per_token']:.2f} ms/token "
              f"({r['tokens_per_s']:.1f} tok/s)")
    if args.mode == "batch_decode" and args.spec:
        r = bench_batch_spec(cfg, params, args.batch, max(args.context, 64),
                             args.steps, args.max_seq_len,
                             temperature=args.temp)
        print(f"[{name}] batch={args.batch} engine decode (temp "
              f"{args.temp:g}): "
              f"plain {r['plain']['tokens_per_s']:.1f} tok/s vs "
              f"spec(k={r['spec']['k']}) "
              f"{r['spec']['tokens_per_s']:.1f} tok/s "
              f"({r['speedup']:.2f}x)")
    elif args.mode == "batch_decode" and args.paged:
        r = bench_batch_decode_paged(cfg, params, args.batch, args.context,
                                     args.steps, args.runs,
                                     args.max_seq_len)
        print(f"[{name}] batch={args.batch} PAGED decode: "
              f"{r['ms_per_step']:.2f} ms/step "
              f"({r['tokens_per_s']:.1f} tok/s aggregate, "
              f"{r['n_pages']} pages)")
    elif args.mode == "batch_decode":
        r = bench_batch_decode(cfg, params, args.batch, args.context,
                               args.steps, args.runs, args.max_seq_len,
                               kv8=args.kv8)
        print(f"[{name}] batch={args.batch} decode: "
              f"{r['ms_per_step']:.2f} ms/step "
              f"({r['tokens_per_s']:.1f} tok/s aggregate)")
    if args.mode in ("ttft", "all"):
        seqs = [int(s) for s in args.seq_lens.split(",")
                if int(s) <= args.max_seq_len]
        r = bench_ttft(cfg, params, cache, seqs, args.runs, mesh=mesh)
        for s, t in r.items():
            print(f"[{name}] ttft seq={s}: {t:.1f} ms (on-device, tunnel overhead excluded)")
    if args.mode == "spec_decode":
        r = bench_spec_decode(cfg, params, cache, 64, args.runs)
        print(f"[{name}] spec verify k={r['k']}: {r['verify_ms']:.2f} ms "
              f"vs decode {r['decode_ms']:.2f} ms/tok -> "
              f"{r['ms_per_token_full_accept']:.2f} ms/tok at full accept, "
              f"break-even accept {r['breakeven_accept']:.2f}")
    if args.mode in ("chunk_prefill", "all"):
        hist = [int(s) for s in args.history_lens.split(",")]
        r = bench_chunk_prefill(cfg, params, cache, hist,
                                args.question_len, args.runs)
        for h, t in r.items():
            print(f"[{name}] chunk-prefill history={h}: {t:.1f} ms (on-device, tunnel overhead excluded)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
