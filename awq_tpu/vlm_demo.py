"""VLM chat REPL (counterpart of ``tinychat/vila15_demo.py`` /
``nvila_demo.py``): LLaVA-style checkpoint, optional W4A16 LLM + W8A8
vision tower, ``<image>`` placeholders in prompts, images loaded per turn.

  python -m awq_tpu.vlm_demo --model_path <llava_hf_dir> \
      --precision W4A16 --vision_int8 --image photo.jpg
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def load_image(path: str, size: int) -> np.ndarray:
    """[H, W, 3] float32 in CLIP normalization."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size))
    x = np.asarray(img, np.float32) / 255.0
    mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)
    return (x - mean) / std


def load_media(path: str, size: int) -> np.ndarray:
    """Image file -> [H, W, 3]; directory of frames or .npy stack ->
    [T, H, W, 3] (video; frame extraction from containers is host-side
    preprocessing out of scope, as the reference delegates it to decord)."""
    import os

    if os.path.isdir(path):
        frames = sorted(
            f for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        return np.stack([load_image(os.path.join(path, f), size)
                         for f in frames])
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    return load_image(path, size)


def _fuse_llm(model, prefill_w8: bool = False):
    """Fuse+fold the LLM params so decode rides the whole-token
    megakernel (ops/megakernel.py); optionally attach the int8 prefill
    weight cache for the spliced (text+image) prefill."""
    import dataclasses

    from awq_tpu.models.llama import fuse_linears

    lp = fuse_linears(model.llm_params, model.llm_cfg)
    lcfg = model.llm_cfg
    if prefill_w8:
        from awq_tpu.ops.w4a16 import attach_w8_caches

        lp = {**lp, "layers": attach_w8_caches(lp["layers"])}
        lcfg = dataclasses.replace(lcfg, prefill_a8=True)
    return dataclasses.replace(model, llm_params=lp, llm_cfg=lcfg)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("awq_tpu.vlm_demo")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--arch", default="llava",
                    choices=["llava", "nvila", "internvl"],
                    help="checkpoint layout: HF llava dir, VILA-layout "
                         "NVILA dir (llm/ vision_tower/ mm_projector/), "
                         "or an InternVL3 HF dir")
    ap.add_argument("--precision", default="W4A16",
                    choices=["W4A16", "W16A16"])
    ap.add_argument("--q_group_size", type=int, default=128)
    ap.add_argument("--vision_int8", action="store_true")
    ap.add_argument("--prefill_w8", action="store_true",
                    help="int8 prefill weight cache for the spliced "
                         "text+image prefill (W4A16 only)")
    ap.add_argument("--image", default=None, help="default image path")
    ap.add_argument("--video", default=None,
                    help="default video (frame dir or .npy stack)")
    ap.add_argument("--max_seq_len", type=int, default=2048)
    ap.add_argument("--max_new_tokens", type=int, default=256)
    ap.add_argument("--greedy", action="store_true")
    args = ap.parse_args(argv)

    if args.arch == "internvl":
        return _internvl_repl(args)
    if args.arch == "nvila":
        return _nvila_repl(args)

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from awq_tpu.config import GenConfig, QuantConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.models.vlm import IMAGE_TOKEN, vlm_generate
    from awq_tpu.models.vlm_import import import_llava_model
    from awq_tpu.runtime.prompts import get_stop_token_ids

    quant = (QuantConfig(w_bit=4, group_size=args.q_group_size)
             if args.precision == "W4A16" else None)
    t0 = time.perf_counter()
    vlm = import_llava_model(
        args.model_path, quantize=quant, vision_int8=args.vision_int8
    )
    vlm = _fuse_llm(vlm, args.prefill_w8)
    print(f"[vlm] loaded in {time.perf_counter() - t0:.1f}s "
          f"(llm {vlm.llm_cfg.arch}, vision {vlm.vis_cfg.image_size}px"
          f"{', int8 tower' if args.vision_int8 else ''})")
    tok = AutoTokenizer.from_pretrained(args.model_path, use_fast=True,
                                        trust_remote_code=True)
    gen = GenConfig(max_new_tokens=args.max_new_tokens, greedy=args.greedy)
    stop_ids = get_stop_token_ids(args.model_path, tok)
    image_path = args.image

    print(f"[vlm] type a prompt; include {IMAGE_TOKEN} to attach the "
          "current image; '/image <path>' to switch images.")
    while True:
        try:
            user = input("USER: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if user in ("exit", "quit"):
            break
        if user.startswith("/image "):
            image_path = user.split(" ", 1)[1].strip()
            print(f"[vlm] image -> {image_path}")
            # terminal preview (reference shows images via termvisage,
            # llava_image_processing.py:45-67; here a dependency-free
            # ANSI half-block renderer)
            try:
                from PIL import Image

                from awq_tpu.utils.term_image import show_image

                show_image(Image.open(image_path), max_width=60)
            except Exception:
                pass
            continue
        if not user:
            continue
        pixels = None
        if IMAGE_TOKEN in user:
            if not image_path:
                print("[vlm] no image set; use '/image <path>'")
                continue
            pixels = jnp.asarray(
                load_image(image_path, vlm.vis_cfg.image_size)[None]
            )
        cache = init_kv_cache(vlm.llm_cfg, 1, args.max_seq_len)
        out = vlm_generate(vlm, user, tok, pixels, cache, gen,
                           stop_ids=stop_ids)
        t = out["timing"]
        print(f"ASSISTANT: {out['text']}")
        print(f"  [TTFT {t['ttft_s'] * 1e3:.0f} ms | "
              f"{t['ms_per_token']:.2f} ms/tok]")
    return 0


def _nvila_repl(args) -> int:
    """NVILA chat loop (counterpart of ``tinychat/nvila_demo.py:64-200``):
    dynamic-S2 images via <image>, videos via <vila/video>."""
    import os

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from awq_tpu.config import GenConfig, QuantConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.models.nvila import (
        MEDIA_TOKENS, import_nvila_model, nvila_generate,
    )

    quant = (QuantConfig(w_bit=4, group_size=args.q_group_size)
             if args.precision == "W4A16" else None)
    t0 = time.perf_counter()
    model = import_nvila_model(
        args.model_path, quantize=quant, vision_int8=args.vision_int8,
    )
    model = _fuse_llm(model, args.prefill_w8)
    print(f"[nvila] loaded in {time.perf_counter() - t0:.1f}s "
          f"(llm {model.llm_cfg.arch}, scales {model.s2_scales}"
          f"{', int8 tower' if args.vision_int8 else ''})")
    tok = AutoTokenizer.from_pretrained(
        os.path.join(args.model_path, "llm"), use_fast=True,
        trust_remote_code=True,
    )
    gen = GenConfig(max_new_tokens=args.max_new_tokens, greedy=args.greedy)
    image_path, video_path = args.image, args.video

    print(f"[nvila] include {MEDIA_TOKENS['image']} or "
          f"{MEDIA_TOKENS['video']} in prompts; '/image <path>' and "
          f"'/video <path>' switch media.")
    while True:
        try:
            user = input("USER: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if user in ("exit", "quit"):
            break
        if user.startswith("/image "):
            image_path = user.split(" ", 1)[1].strip()
            continue
        if user.startswith("/video "):
            video_path = user.split(" ", 1)[1].strip()
            continue
        if not user:
            continue
        media = {"image": [], "video": []}
        sz = model.vis_cfg.image_size
        if MEDIA_TOKENS["image"] in user:
            if not image_path:
                print("[nvila] no image set; use '/image <path>'")
                continue
            media["image"].append(jnp.asarray(load_media(image_path, sz)))
        if MEDIA_TOKENS["video"] in user:
            if not video_path:
                print("[nvila] no video set; use '/video <path>'")
                continue
            media["video"].append(jnp.asarray(load_media(video_path, sz)))
        cache = init_kv_cache(model.llm_cfg, 1, args.max_seq_len)
        out = nvila_generate(model, user, tok, media, cache, gen,
                             stop_ids=[tok.eos_token_id]
                             if tok.eos_token_id is not None else [])
        t = out["timing"]
        print(f"ASSISTANT: {out['text']}")
        print(f"  [TTFT {t['ttft_s'] * 1e3:.0f} ms | "
              f"{t['ms_per_token']:.2f} ms/tok]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

def _internvl_repl(args) -> int:
    """InternVL3 chat loop (counterpart of the reference's InternVL demo
    path, ``tinychat/models/internvl3.py:199+``): dynamic-res tiles via
    <image>, sampled frames via <video>."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from awq_tpu.config import GenConfig, QuantConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.models.internvl import (
        import_internvl3_model, internvl_generate,
    )

    quant = (QuantConfig(w_bit=4, group_size=args.q_group_size)
             if args.precision == "W4A16" else None)
    t0 = time.perf_counter()
    model = import_internvl3_model(
        args.model_path, quantize=quant, vision_int8=args.vision_int8,
    )
    model = _fuse_llm(model, args.prefill_w8)
    print(f"[internvl] loaded in {time.perf_counter() - t0:.1f}s "
          f"(llm {model.llm_cfg.arch}, {model.num_image_token} tok/tile"
          f"{', int8 tower' if args.vision_int8 else ''})")
    tok = AutoTokenizer.from_pretrained(args.model_path, use_fast=True,
                                        trust_remote_code=True)
    gen = GenConfig(max_new_tokens=args.max_new_tokens, greedy=args.greedy)
    image_path, video_path = args.image, args.video

    print("[internvl] include <image> or <video> in prompts; "
          "'/image <path>' and '/video <path>' switch media.")
    while True:
        try:
            user = input("USER: ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if user in ("exit", "quit"):
            break
        if user.startswith("/image "):
            image_path = user.split(None, 1)[1]
            continue
        if user.startswith("/video "):
            video_path = user.split(None, 1)[1]
            continue
        if not user:
            continue
        media = {"image": [], "video": []}
        if "<image>" in user:
            if not image_path:
                print("[internvl] no image set — use '/image <path>'")
                continue
            media["image"] = [jnp.asarray(
                load_image(image_path, model.vit_cfg.image_size))]
        if "<video>" in user:
            if not video_path:
                print("[internvl] no video set — use '/video <path>'")
                continue
            media["video"] = [jnp.asarray(
                load_media(video_path, model.vit_cfg.image_size))]
        cache = init_kv_cache(model.llm_cfg, 1, args.max_seq_len,
                              jnp.bfloat16)
        t0 = time.perf_counter()
        out = internvl_generate(model, user, tok, media, cache, gen)
        n = len(out["output_ids"])
        text = tok.decode(out["output_ids"])
        dt = time.perf_counter() - t0
        print(f"ASSISTANT: {text}")
        print(f"[{n} tok in {dt:.2f}s, "
              f"{n / max(dt, 1e-9):.1f} tok/s]")
    return 0
