"""Kernel warmup + block-size autotuning.

Counterpart of ``tinychat/utils/tune.py``: ``device_warmup`` (``:10-14``)
and the per-(IC,OC) latency autotuner (``tune_wqlinear`` sweeping
``split_k_iters``, ``:51-81``). On TPU the tunable knob is the kernel's
output-block width ``block_n``; results are cached on disk per shape and
device kind, and consulted by ``qlinear_apply_stacked``.

Timing uses chained in-jit calls with slope correction: the tunneled TPU
platform has a ~27 ms fixed dispatch+fetch cost per execution.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_CACHE_PATH = os.environ.get(
    "AWQ_TPU_TUNE_CACHE",
    os.path.expanduser("~/.cache/awq_tpu/tune.json"),
)
_tuned: Optional[Dict[str, int]] = None


def _key(ic: int, oc: int, m_bucket: int) -> str:
    kind = jax.devices()[0].device_kind.replace(" ", "_")
    return f"{kind}:{ic}x{oc}:m{m_bucket}"


def _load() -> Dict[str, int]:
    global _tuned
    if _tuned is None:
        try:
            with open(_CACHE_PATH) as f:
                _tuned = json.load(f)
        except Exception:
            _tuned = {}
    return _tuned


def _save() -> None:
    os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
    with open(_CACHE_PATH, "w") as f:
        json.dump(_tuned, f)


def get_block_n(ic: int, oc: int, m: int = 1, default: int = 512) -> int:
    """Tuned block_n for a (IC, OC) stacked matmul, else ``default``."""
    mb = 1 << max(0, (m - 1)).bit_length()
    return _load().get(_key(ic, oc, min(mb, 256)), default)


def device_warmup(n: int = 20) -> None:
    """Spin the chip to escape power-gating before timing
    (``tune.py:10-14`` runs 100 8192^2 matmuls)."""
    x = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def spin(x):
        def body(c, _):
            return jnp.tanh(c @ x * 1e-3), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y)

    np.asarray(spin(x))


def _slope_time(run1, run2, n1, n2, reps=2) -> float:
    np.asarray(run1())
    np.asarray(run2())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(run1()); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(run2()); t2 = time.perf_counter() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def tune_wqlinear_stacked(
    qweight: jax.Array,      # [L, IC/8, OC]
    scales: jax.Array,
    szeros: jax.Array,
    group_size: int,
    m: int = 1,
    candidates: Tuple[int, ...] = (512, 1024, 256),
    n1: int = 8,
    n2: int = 40,
) -> int:
    """Pick the fastest ``block_n`` for this stacked shape; caches to disk."""
    from awq_tpu.ops.w4a16 import w4a16_matmul_stacked

    _, icp, oc = qweight.shape
    ic = icp * 8
    key = _key(ic, oc, 1 << max(0, (m - 1)).bit_length())
    cache = _load()
    if key in cache:
        return cache[key]
    L = qweight.shape[0]
    x = jnp.ones((m, ic), jnp.bfloat16)
    best_bn, best_t = 512, np.inf
    for bn in candidates:
        if oc % bn != 0:
            continue

        def chain(n, bn=bn):
            @jax.jit
            def run(x):
                def body(c, i):
                    out = w4a16_matmul_stacked(
                        c, qweight, scales, szeros, i % L, group_size,
                        block_n=bn,
                    )
                    return c + jnp.sum(out).astype(c.dtype) * 1e-30, ()
                f, _ = jax.lax.scan(body, x, jnp.arange(n))
                return jnp.sum(f)
            return lambda: run(x)

        try:
            t = _slope_time(chain(n1), chain(n2), n1, n2)
        except Exception:
            continue
        if t < best_t:
            best_bn, best_t = bn, t
    cache[key] = best_bn
    _save()
    return best_bn


def tune_model(params, group_size: int = 128, m: int = 1) -> Dict[str, int]:
    """Tune every stacked QLinear in a params pytree (cached per shape)."""
    from awq_tpu.ops.w4a16 import QLinear

    out: Dict[str, int] = {}
    for name, p in params.get("layers", {}).items():
        if isinstance(p, QLinear):
            out[name] = tune_wqlinear_stacked(
                p.qweight, p.scales, p.szeros, p.group_size, m=m
            )
    return out
