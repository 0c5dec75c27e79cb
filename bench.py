#!/usr/bin/env python
"""Headline benchmark: W4A16 decode latency (Llama-3-8B geometry default —
the metric BASELINE.json names; --geometry llama2-7b for the round-1/2
continuity number).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "ms/token", "vs_baseline": ...}

Baseline: the reference's published AWQ-W4A16 decode latency on A100
(Llama-2-7B 5.71 ms/token, `tinychat/README.md:157`; Llama-3-8B 6.29,
`:156` — the closest datacenter-class hardware to a TPU chip in its
tables). ``vs_baseline`` is the speedup ratio (baseline / measured; >1
means faster than the reference system).

Methodology mirrors ``tinychat/benchmark.py``: warm up, then time decode
bursts and average per token. Decode runs as one jitted ``lax.scan``
(sampling included) over a 2048-token static KV cache — a harsher setting
than the reference's 4-context-token decode bench. The cache holds zeros
instead of real prefill output: decode reads exactly the same bytes and
runs exactly the same compute either way, and skipping the separate
prefill program cuts ~30 s of cold-start compile (the driver runs this
under a wall-clock budget on a shared chip).

Robustness (the driver records whatever this prints; a timeout records
nothing): the process supervises a CHILD that does the actual work. The
parent never imports jax, so it cannot be wedged by a hung TPU client
init (a C-level block that SIGALRM cannot interrupt — observed on this
tunneled chip). The child logs stage progress to a status file and
stderr, keeps the best measurement so far there, and runs a degrade
ladder (smaller cache bucket -> megakernel off -> fewer steps) on
OOM/compile failures. If the child hangs or dies the parent kills that
exact PID, reports the child's best-so-far measurement if one exists,
else re-runs on CPU-tiny so the driver always records SOMETHING
parseable. Wall-clock budget: ``AWQ_TPU_BENCH_BUDGET_S`` (default 480).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import json
import signal
import subprocess
import sys
import tempfile
import time

_T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("AWQ_TPU_BENCH_BUDGET_S", "480"))
# if the child shows no life past jax-client init for this long, the
# tunneled TPU is wedged (client creation blocks in C, uninterruptible)
INIT_STALL_S = float(os.environ.get("AWQ_TPU_BENCH_INIT_S", "150"))

_STATUS_PATH = os.environ.get("AWQ_TPU_BENCH_STATUS")

# best measurement so far: filled in as soon as ANY timed burst finishes
# so the alarm handler / top-level failure path can still report it
_BEST: dict = {}


def _log(msg: str) -> None:
    """Stage-progress line on stderr + status file (the parent watches the
    status file for liveness; the driver records the stderr tail)."""
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)
    if _STATUS_PATH:
        tmp = _STATUS_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": msg, "t": time.time(),
                       "best": _BEST or None}, f)
        os.replace(tmp, _STATUS_PATH)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _emit(record: dict) -> None:
    print(json.dumps(record), flush=True)


class _BenchTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _BenchTimeout(f"wall-clock budget ({BUDGET_S:.0f}s) exhausted")


def _parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default=None,
                    choices=["llama2-7b", "llama3-8b", "qwen2-7b", "tiny"],
                    help="model geometry (default llama3-8b — the "
                         "BASELINE.json headline metric — on TPU, tiny "
                         "elsewhere)")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--context", type=int, default=4,
                    help="decode burst start position (reference uses 4 "
                         "context tokens, tinychat/README.md:93)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry (smoke test)")
    ap.add_argument("--kv8", action="store_true",
                    help="int8 KV cache (halved cache traffic)")
    return ap.parse_args(argv)


# --------------------------------------------------------------------------
# supervisor (no jax in this half of the process tree)
# --------------------------------------------------------------------------

def _spawn_child(extra_env, argv, status_path):
    env = dict(os.environ)
    env.update(extra_env)
    env["AWQ_TPU_BENCH_CHILD"] = "1"
    env["AWQ_TPU_BENCH_STATUS"] = status_path
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), *argv],
        env=env, stdout=subprocess.PIPE, text=True,
    )


def _drain_json(proc) -> dict | None:
    """Last stdout line that parses as a JSON object."""
    record = None
    try:
        out, _ = proc.communicate(timeout=10)
    except subprocess.TimeoutExpired:
        return None
    for line in (out or "").splitlines():
        try:
            obj = json.loads(line)
            if isinstance(obj, dict) and "metric" in obj:
                record = obj
        except ValueError:
            continue
    return record


def _stop(proc) -> None:
    """Stop this exact child (graceful first: a SIGKILLed mid-execution
    TPU client leaks server-side HBM on the shared chip)."""
    if proc.poll() is not None:
        return
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            pass


_INIT_STAGE = "importing jax / creating device client"


def supervise() -> None:
    _parse_args()  # fail fast on bad flags before spawning
    status_path = tempfile.mktemp(prefix="awq_tpu_bench_status_")

    child_budget = max(BUDGET_S - 45, 60)
    proc = _spawn_child({"AWQ_TPU_BENCH_BUDGET_S": str(child_budget)},
                        sys.argv[1:], status_path)
    _log(f"supervisor: child pid={proc.pid} budget={child_budget:.0f}s")

    # The driver runs this under its own (unknown) timeout; `timeout`
    # sends SIGTERM before SIGKILL. Emit the child's best-so-far
    # measurement (stashed in the status file after every burst) on the
    # way out so the driver still records a parseable line.
    def _terminated(signum, frame):
        st = _read_status_at(status_path)
        if st and st.get("best"):
            record = dict(st["best"])
            record["degraded"] = f"supervisor killed (signal {signum})"
            _emit(record)
        else:
            _emit({"metric": "w4a16_decode_latency", "value": -1.0,
                   "unit": "ms/token", "vs_baseline": 0.0,
                   "error": f"killed (signal {signum}) before any burst; "
                            f"last stage: {(st or {}).get('stage')}"})
        _stop(proc)
        sys.exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _terminated)

    kill_at = _T0 + BUDGET_S - 35          # leave time for the fallback
    stall_at = _T0 + INIT_STALL_S
    reason = None
    while proc.poll() is None:
        now = time.perf_counter()
        st = _read_status_at(status_path)
        if st is not None and st.get("stage") != _INIT_STAGE:
            # past client init: later long silences are legitimate remote
            # compiles, bounded by kill_at instead
            stall_at = None
        if stall_at is not None and now > stall_at:
            reason = (f"no progress past jax client init after "
                      f"{INIT_STALL_S:.0f}s (tunneled TPU wedged)")
            break
        if now > kill_at:
            reason = f"supervisor budget ({BUDGET_S:.0f}s) nearly exhausted"
            break
        time.sleep(2)

    if reason is None:
        record = _drain_json(proc)
        if proc.returncode == 0 and record is not None:
            _emit(record)
            return
        reason = f"child exited rc={proc.returncode} without a record"
    else:
        _log(f"supervisor: {reason}; stopping child")
        _stop(proc)

    # child failed: best-so-far from the status file beats re-running
    st = _read_status_at(status_path)
    if st and st.get("best"):
        record = dict(st["best"])
        record["degraded"] = reason
        _emit(record)
        return

    # nothing measured at all: CPU-tiny fallback so the driver still
    # records a parseable line (honestly labeled)
    _log("supervisor: no measurement; running cpu-tiny fallback")
    fb_budget = max(min(BUDGET_S - (time.perf_counter() - _T0) - 5, 120), 30)
    fb = _spawn_child(
        {"AWQ_TPU_BENCH_BUDGET_S": str(fb_budget),
         "AWQ_TPU_BENCH_FORCE_CPU": "1"},
        ["--tiny", "--steps", "8"], status_path + ".fb")
    try:
        fb.wait(timeout=fb_budget + 10)
    except subprocess.TimeoutExpired:
        _stop(fb)
    record = _drain_json(fb)
    if record is None:
        st = _read_status_at(status_path + ".fb")
        record = (st or {}).get("best")
    if record is not None:
        record["degraded"] = f"{reason}; cpu tiny fallback"
        _emit(record)
        return
    _emit({"metric": "w4a16_decode_latency", "value": -1.0,
           "unit": "ms/token", "vs_baseline": 0.0, "error": reason})


def _read_status_at(path):
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


# --------------------------------------------------------------------------
# child (the actual benchmark)
# --------------------------------------------------------------------------

def _sync(x):
    """Force completion by fetching to host.

    On the tunneled TPU platform ``block_until_ready`` returns before the
    computation finishes; only a device->host copy synchronizes. ``x`` must
    be small (token ids) so the copy itself is negligible.
    """
    import numpy as np
    return np.asarray(x)


GEOMETRIES = {
    # (model dims, reference baseline ms/token, metric name)
    "llama2-7b": (dict(
        arch="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, max_position_embeddings=4096,
        rope_theta=10000.0,
    ), 5.71, "llama2_7b_w4a16_decode_latency"),
    # BASELINE.json's named metric geometry: GQA (8 kv heads) + 128k vocab
    "llama3-8b": (dict(
        arch="llama", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, head_dim=128, max_position_embeddings=8192,
        rope_theta=500000.0,
    ), 6.29, "llama3_8b_w4a16_decode_latency"),
    # Qwen2.5-7B: QKV biases ride the megakernel (reference parity:
    # tinychat/models/qwen2.py:118-283; no published qwen2 decode number
    # in its READMEs, so no vs_baseline ratio)
    "qwen2-7b": (dict(
        arch="qwen2", vocab_size=152064, hidden_size=3584,
        intermediate_size=18944, num_layers=28, num_heads=28,
        num_kv_heads=4, head_dim=128, max_position_embeddings=8192,
        rope_theta=1000000.0, qkv_bias=True,
    ), 0.0, "qwen2_7b_w4a16_decode_latency"),
    "tiny": (dict(
        arch="llama", vocab_size=1024, hidden_size=512,
        intermediate_size=1024, num_layers=4, num_heads=8, num_kv_heads=8,
        head_dim=64, max_position_embeddings=2048,
    ), 0.0, "tiny_w4a16_decode_latency"),
}


def _build_params(cfg, qcfg):
    """Random quantized params directly in the deploy layout (fused QKV/
    gate-up, folded block-contiguous tiles, quantized lm_head), built by
    ONE compiled program.

    Round 2 ran init -> quantize head -> fuse -> fold -> strip as eager
    stages: ~30 separately dispatched XLA programs (~100 s of compile on
    a cold cache) plus repack peaks that tripped the shared chip's OOM.
    Under one jit there is ONE compile, XLA owns the intermediate
    buffers, and the only live output is the final folded pytree.
    """
    import jax
    import jax.numpy as jnp
    from awq_tpu.models.llama import fuse_linears, init_qparams
    from awq_tpu.ops.w4a16 import quantize_linear, strip_unfolded_qparams

    def build(key):
        params = init_qparams(cfg, qcfg, key)
        params["lm_head"] = quantize_linear(
            params["lm_head"].astype(jnp.float32), n_bit=qcfg.w_bit,
            group_size=qcfg.group_size,
        )
        params = fuse_linears(params, cfg)
        if jax.default_backend() == "tpu":
            # folded TPU kernels read quant params from the packed rows;
            # the CPU/XLA fallback path still needs the f32 fields
            params = strip_unfolded_qparams(params)
        return params

    return jax.jit(build)(jax.random.PRNGKey(0))


def _measure(args, cfg, max_seq, steps, metric, baseline_ms):
    import jax
    import jax.numpy as jnp
    from awq_tpu.config import GenConfig, QuantConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.runtime.generate import decode_scan

    qcfg = QuantConfig(w_bit=4, group_size=128)
    _log(f"build params start (geometry={args.geometry}, max_seq={max_seq}, "
         f"steps={steps})")
    params = _build_params(cfg, qcfg)
    jax.block_until_ready(params)
    _log("build params done")

    # decode streams every packed weight byte once per token; record the
    # per-token byte volume and the implied HBM rate alongside the
    # latency so runs on differently-contended chips can be normalized
    # (same-geometry runs vary +-15% with co-tenant load; the quiet-chip
    # peak is ~820 GB/s, see PERF.md)
    from awq_tpu.ops.w4a16 import QLinear

    stream_gb = sum(
        leaf.qweight.size * leaf.qweight.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QLinear))
        if isinstance(leaf, QLinear)) / 1e9

    if args.kv8:
        from awq_tpu.models.llama import init_kv_cache8

        cache = init_kv_cache8(cfg, 1, max_seq)
    else:
        cache = init_kv_cache(cfg, 1, max_seq, jnp.bfloat16)
    gen = GenConfig(greedy=True, temperature=1.0, repetition_penalty=1.0)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((1, cfg.vocab_size), bool)
    first = jnp.ones((1,), jnp.int32)

    def burst(cache):
        toks, dones, c2 = decode_scan(
            params, cfg, cache, first, jnp.int32(args.context),
            jax.random.PRNGKey(0), stop, seen, gen, steps,
            cfg.vocab_size,
        )
        return toks, c2

    # warmup (compile)
    toks, _ = burst(cache)
    _sync(toks)
    _log("decode burst compile+warmup done")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        toks, _ = burst(cache)
        _sync(toks)
        times.append(time.perf_counter() - t0)
        ms = min(times) / steps * 1e3
        # stash immediately: the first timed burst already yields a
        # reportable number if the budget expires mid-run
        _BEST.update({
            "metric": metric,
            "value": round(ms, 3),
            "unit": "ms/token",
            "vs_baseline": round(baseline_ms / ms, 3) if baseline_ms else 0.0,
            "stream_gb_per_token": round(stream_gb, 3),
            "effective_gbps": round(stream_gb / ms * 1e3, 1),
        })
        _log(f"burst {i + 1}/3 done ({ms:.3f} ms/token)")
        if i < 2 and _remaining() < 10:
            _log(f"budget nearly spent after burst {i + 1}; reporting early")
            break
    return dict(_BEST)


def child_main():
    if os.environ.get("AWQ_TPU_BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    args = _parse_args()
    _log("importing jax / creating device client")
    import jax

    from awq_tpu.config import ModelConfig

    on_tpu = jax.default_backend() == "tpu"
    _log(f"backend up: {jax.default_backend()}")
    if args.geometry is None:
        args.geometry = "tiny" if (args.tiny or not on_tpu) else "llama3-8b"
    if args.tiny or not on_tpu:
        args.geometry = "tiny"
    shape, baseline_ms, metric = GEOMETRIES[args.geometry]
    cfg = ModelConfig(**shape, dtype="bfloat16")

    if hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(BUDGET_S), 10))

    # degrade ladder: the shared chip's free HBM fluctuates with
    # co-tenants, and cold compiles are remote (seconds to minutes).
    # A smaller cache bucket does NOT change the measured decode work
    # (attention reads only `length` positions); megakernel-off falls
    # back to the 5-kernel/layer decode path (slower but still a real
    # number); fewer steps shortens the bursts. Report a degraded
    # number rather than record nothing.
    ladder = []
    for max_seq in [m for m in dict.fromkeys((args.max_seq, 1024, 512))
                    if m <= args.max_seq]:
        ladder.append(dict(max_seq=max_seq, steps=args.steps, mega=True))
    ladder.append(dict(max_seq=512, steps=min(args.steps, 32), mega=False))

    record = None
    err = None
    for i, rung in enumerate(ladder):
        if i > 0 and _remaining() < 60:
            _log("not enough budget left to retry a lower rung")
            break
        if not rung["mega"]:
            os.environ["AWQ_TPU_DISABLE_MEGAKERNEL"] = "1"
        try:
            record = _measure(args, cfg, rung["max_seq"], rung["steps"],
                              metric, baseline_ms)
            break
        except _BenchTimeout as e:
            err = e
            _log(str(e))
            break
        except Exception as e:  # jax RESOURCE_EXHAUSTED surfaces lazily
            err = e
            msg = str(e)
            _log(f"rung {rung} failed: {msg.splitlines()[0][:200]}")
            if "RESOURCE_EXHAUSTED" not in msg and i + 1 < len(ladder):
                # not OOM: a compile/runtime failure — jump straight to
                # the megakernel-off rung rather than shrink the cache
                ladder[i + 1:] = [r for r in ladder[i + 1:] if not r["mega"]]

    signal.alarm(0)
    if record is None and _BEST:
        record = dict(_BEST)  # timed at least one burst before dying
        record["degraded"] = True
    if record is None:
        raise err if err is not None else RuntimeError("no rung ran")
    _emit(record)


if __name__ == "__main__":
    if os.environ.get("AWQ_TPU_BENCH_CHILD"):
        child_main()
    else:
        supervise()
