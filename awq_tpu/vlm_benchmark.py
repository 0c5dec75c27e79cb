"""VLM benchmark (counterpart of ``tinychat/nvila_benchmark.py`` /
``internvl_benchmark.py``): vision-encode latency, spliced-prefill TTFT,
and decode throughput on random weights.

  python -m awq_tpu.vlm_benchmark --llm llama2-7b --vision siglip-l \
      --precision W4A16 --vision_int8
"""

from __future__ import annotations

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import argparse
import time

import numpy as np

VISION_GEOMETRIES = {
    "siglip-l": dict(image_size=384, patch_size=14, hidden_size=1152,
                     intermediate_size=4304, num_layers=27, num_heads=16),
    "clip-l": dict(image_size=336, patch_size=14, hidden_size=1024,
                   intermediate_size=4096, num_layers=24, num_heads=16,
                   use_class_token=True, post_norm_full=False,
                   act="quick_gelu"),
    "tiny": dict(image_size=56, patch_size=14, hidden_size=128,
                 intermediate_size=256, num_layers=2, num_heads=4),
}


def _sync(x):
    return np.asarray(x)


def main(argv=None) -> int:
    from awq_tpu.benchmark import GEOMETRIES

    ap = argparse.ArgumentParser("awq_tpu.vlm_benchmark")
    ap.add_argument("--llm", default="llama2-7b", choices=GEOMETRIES)
    ap.add_argument("--vision", default="siglip-l",
                    choices=VISION_GEOMETRIES)
    ap.add_argument("--precision", default="W4A16",
                    choices=["W4A16", "W16A16"])
    ap.add_argument("--vision_int8", action="store_true")
    ap.add_argument("--prefill_w8", action="store_true",
                    help="int8 prefill weight cache for the LLM's spliced "
                         "prefill (W4A16 only)")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--prompt_len", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from awq_tpu.config import ModelConfig, QuantConfig
    from awq_tpu.models import forward, init_kv_cache, init_params, init_qparams
    from awq_tpu.models.llama import fuse_linears
    from awq_tpu.models.vision import (
        VisionConfig, init_vision_params, vision_forward,
        vision_forward_w8a8, w8a8_quantize_vision,
    )
    from awq_tpu.runtime.generate import cache_bucket, decode_scan
    from awq_tpu.config import GenConfig

    vcfg = VisionConfig(**VISION_GEOMETRIES[args.vision], dtype="bfloat16")
    vparams = init_vision_params(vcfg, jax.random.PRNGKey(0))
    if args.vision_int8:
        vparams = w8a8_quantize_vision(vparams)
    lcfg = ModelConfig(**GEOMETRIES[args.llm], dtype="bfloat16")
    qcfg = QuantConfig(w_bit=4, group_size=128)
    if args.precision == "W4A16":
        # same deploy layout as bench.py::_build_params (quantized lm_head
        # + fused QKV/gate-up + folded tiles, one compiled build program)
        # so VLM decode rides the whole-token megakernel with the
        # in-kernel head — production VLM serving quantizes the head too
        from awq_tpu.ops.w4a16 import quantize_linear, strip_unfolded_qparams

        def build(key):
            p = init_qparams(lcfg, qcfg, key)
            p["lm_head"] = quantize_linear(
                p["lm_head"].astype(jnp.float32), n_bit=qcfg.w_bit,
                group_size=qcfg.group_size)
            return fuse_linears(p, lcfg)

        lparams = jax.jit(build)(jax.random.PRNGKey(1))
        if args.prefill_w8:
            # int8 prefill weight cache: the SPLICED prefill (text +
            # image tokens, S in the hundreds) is exactly the m-range
            # where the requant-free int8 path pays
            import dataclasses

            from awq_tpu.ops.w4a16 import attach_w8_caches

            lparams = {**lparams,
                       "layers": attach_w8_caches(lparams["layers"])}
            lcfg = dataclasses.replace(lcfg, prefill_a8=True)
        if jax.default_backend() == "tpu":
            lparams = strip_unfolded_qparams(lparams)
    else:
        lparams = init_params(lcfg, jax.random.PRNGKey(1))

    name = f"{args.llm}+{args.vision}/{args.precision}" \
        + ("+vt-int8" if args.vision_int8 else "")
    px = jax.random.normal(jax.random.PRNGKey(2),
                           (1, vcfg.image_size, vcfg.image_size, 3),
                           jnp.bfloat16)
    vfwd = vision_forward_w8a8 if args.vision_int8 else vision_forward

    @jax.jit
    def encode(vparams, px):
        # params as ARGUMENTS: closures embed them as giant HLO constants
        return jnp.sum(vfwd(vparams, vcfg, px).astype(jnp.float32))

    _sync(encode(vparams, px))
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        _sync(encode(vparams, px))
        times.append(time.perf_counter() - t0)
    n_tok = (vcfg.image_size // vcfg.patch_size) ** 2
    print(f"[{name}] vision encode: {np.mean(times) * 1e3:.1f} ms "
          f"({n_tok} tokens)")

    # spliced prefill TTFT: prompt + image tokens as inputs_embeds
    s = args.prompt_len + n_tok
    bucket = cache_bucket(4096, s + args.steps + 1)
    cache = init_kv_cache(lcfg, 1, bucket, jnp.bfloat16)
    embeds = jax.random.normal(jax.random.PRNGKey(3),
                               (1, s, lcfg.hidden_size), jnp.bfloat16) * 0.02
    toks = jnp.zeros((1, s), jnp.int32)

    def prefill():
        logits, c = forward(lparams, lcfg, toks, cache, jnp.int32(0),
                            inputs_embeds=embeds)
        return jnp.argmax(logits[:, -1], -1), c

    first, cache2 = prefill()
    _sync(first)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        f, _ = prefill()
        _sync(f)
        times.append(time.perf_counter() - t0)
    print(f"[{name}] spliced prefill (text {args.prompt_len} + "
          f"image {n_tok}): {np.mean(times) * 1e3:.1f} ms")

    gen = GenConfig(greedy=True)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((1, lcfg.vocab_size), bool)

    def burst():
        t, _, _ = decode_scan(
            lparams, lcfg, cache2, first.astype(jnp.int32), jnp.int32(s),
            jax.random.PRNGKey(0), stop, seen, gen, args.steps,
            lcfg.vocab_size,
        )
        return t

    _sync(burst())
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        _sync(burst())
        times.append(time.perf_counter() - t0)
    ms = np.mean(times) / args.steps * 1e3
    print(f"[{name}] decode: {ms:.2f} ms/token")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
