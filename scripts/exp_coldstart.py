"""Where does bench cold-start time go? Time each stage of the exact
bench.py llama2-7b path separately: trace/lower, XLA compile (local
persistent-cache visible), and FIRST execution (server-side program
load / Mosaic compile on the tunneled chip).

Usage: python scripts/exp_coldstart.py [--no-mega] [--steps N]
"""
import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

ap = argparse.ArgumentParser()
ap.add_argument("--no-mega", action="store_true")
ap.add_argument("--steps", type=int, default=128)
ap.add_argument("--geometry", default="llama2-7b")
args = ap.parse_args()
if args.no_mega:
    os.environ["AWQ_TPU_DISABLE_MEGAKERNEL"] = "1"

t0 = time.perf_counter()


def stamp(msg):
    print(f"[+{time.perf_counter() - t0:6.1f}s] {msg}", flush=True)


import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

stamp(f"jax up: {jax.default_backend()}")

import bench
from awq_tpu.config import GenConfig, ModelConfig, QuantConfig
from awq_tpu.models import init_kv_cache
from awq_tpu.runtime.generate import decode_scan

shape, baseline_ms, metric = bench.GEOMETRIES[args.geometry]
cfg = ModelConfig(**shape, dtype="bfloat16")
qcfg = QuantConfig(w_bit=4, group_size=128)

params = bench._build_params(cfg, qcfg)
jax.block_until_ready(params)
stamp("params built")

cache = init_kv_cache(cfg, 1, 2048, jnp.bfloat16)
gen = GenConfig(greedy=True, temperature=1.0, repetition_penalty=1.0)
stop = jnp.asarray([-1], jnp.int32)
seen = jnp.zeros((1, cfg.vocab_size), bool)
first = jnp.ones((1,), jnp.int32)
steps = args.steps

lowered = decode_scan.lower(
    params, cfg, cache, first, jnp.int32(4), jax.random.PRNGKey(0),
    stop, seen, gen, steps, cfg.vocab_size)
stamp("traced+lowered")
compiled = lowered.compile()
stamp("XLA compile returned (persistent cache may have hit)")

toks, dones, c2 = compiled(params, cache, first, jnp.int32(4),
                           jax.random.PRNGKey(0), stop, seen)
np.asarray(toks)
stamp("first exec + sync done")

for i in range(2):
    tA = time.perf_counter()
    toks, dones, c2 = compiled(params, cache, first, jnp.int32(4),
                               jax.random.PRNGKey(0), stop, seen)
    np.asarray(toks)
    stamp(f"exec {i + 2}: {(time.perf_counter() - tA) / steps * 1e3:.3f} "
          f"ms/token")
