"""NVILA: dynamic-S2 SigLIP tower + downsample projector + Qwen2 LLM.

TPU-native counterpart of the reference NVILA stack
(``tinychat/models/nvila_qwen2.py:49-157``, meta-arch
``tinychat/models/nvila/llava_arch.py:261-392,446+``, builder
``tinychat/models/nvila/builder.py:66-242``, stream generator
``tinychat/stream_generators/NVILA_stream_gen.py:15-176``). Design is
functional JAX: the tower/projector/LLM are param pytrees, media embedding
happens host-side, and prefill/decode reuse the text engine's jitted
functions (the reference instead patches torch modules in place).

Checkpoint layout (VILA convention, what ``builder.py`` reads):
    <dir>/config.json          — image_aspect_ratio, s2_scales, ...
    <dir>/llm/                 — HF Qwen2 checkpoint
    <dir>/vision_tower/        — HF SigLIP checkpoint
    <dir>/mm_projector/        — config.json (mm_projector_type) + weights
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models.projector import Projector
from awq_tpu.models.s2 import (
    area_resize,
    dynamic_s2_multiscale_preprocess,
    merge_chessboard_hw,
    split_chessboard_hw,
)
from awq_tpu.models.vision import (
    VisionConfig,
    vision_forward,
    vision_forward_w8a8,
)

# media sentinels inside token-id streams (MEDIA_TOKENS counterpart,
# llava/constants.py usage at nvila/llava_arch.py:446+)
MEDIA_TOKENS = {"image": "<image>", "video": "<vila/video>"}
MEDIA_TOKEN_IDS = {"image": -200, "video": -201}


@dataclasses.dataclass
class NVILA:
    """Vision tower + projector + LLM bundle with dynamic-S2 encoding."""

    vis_cfg: VisionConfig
    vis_params: Dict[str, Any]
    projector: Projector
    llm_cfg: ModelConfig
    llm_params: Dict[str, Any]
    s2_scales: Tuple[int, ...] = (448, 896, 1344)
    resize_output_to_scale_idx: int = -1
    max_tiles: int = 12
    num_video_frames: int = 8
    dynamic_s2: bool = True
    vision_int8: bool = False

    # -- tower ---------------------------------------------------------------
    def _tower(self, pixels: jax.Array) -> jax.Array:
        fwd = vision_forward_w8a8 if self.vision_int8 else vision_forward
        return fwd(self.vis_params, self.vis_cfg, pixels)

    # -- encoders ------------------------------------------------------------
    def encode_image_dynamic_s2(self, image: jax.Array) -> jax.Array:
        """One image ``[H, W, 3]`` -> ``[tokens, llm_hidden]`` via the full
        NVILA recipe (``merge_features_for_dynamic_s2`` +
        ``encode_images``, ``nvila/llava_arch.py:311-392``):

        1. multi-scale tiling (square chessboards + aspect-fit last scale)
        2. batched tower forward over all tiles
        3. per-scale chessboard merge, area-resize to the output scale's
           grid, channel concat
        4. chessboard split to last-scale blocks, projector (which holds the
           3x3 spatial downsample), merge back
        """
        tiles, (ht, wt) = dynamic_s2_multiscale_preprocess(
            image, self.s2_scales, self.vis_cfg.image_size, self.max_tiles
        )
        feats = self._tower(tiles)                       # [N, P, C]
        side = self.vis_cfg.image_size // self.vis_cfg.patch_size
        n_sc = len(self.s2_scales)

        grids: List[jax.Array] = []
        off = 0
        for scale in self.s2_scales[:-1]:
            r = scale // self.s2_scales[0]
            g = feats[off:off + r * r].reshape(r * r, side, side, -1)
            grids.append(merge_chessboard_hw(g, r, r))
            off += r * r
        g = feats[off:off + ht * wt].reshape(ht * wt, side, side, -1)
        grids.append(merge_chessboard_hw(g, ht, wt))

        out_idx = (self.resize_output_to_scale_idx % n_sc)
        oh, ow = grids[out_idx].shape[1], grids[out_idx].shape[2]
        merged = jnp.concatenate(
            [area_resize(g, oh, ow) for g in grids], axis=-1
        )                                                # [1, oh, ow, C*n]
        if out_idx == n_sc - 1:
            nh, nw = ht, wt
        else:
            r = self.s2_scales[out_idx] // self.s2_scales[0]
            nh = nw = r
        blocks = split_chessboard_hw(merged, nh, nw)     # [nh*nw, s, s, C*n]
        bs = blocks.shape[0]
        proj = self.projector(blocks.reshape(bs, -1, blocks.shape[-1]))
        ps = int(round(proj.shape[1] ** 0.5))
        pgrid = merge_chessboard_hw(
            proj.reshape(bs, ps, ps, -1), nh, nw
        )                                                # [1, nh*ps, nw*ps, H]
        return pgrid.reshape(-1, pgrid.shape[-1])        # [tokens, H]

    def encode_images_basic(self, pixels: jax.Array) -> jax.Array:
        """Base-resolution encode ``[N, S, S, 3]`` -> ``[N, P', H]``.

        With dynamic_s2 on, channel-tiles the single-scale features
        ``len(scales)`` times so the same projector applies (the reference's
        ``block_size=None`` path, ``nvila/llava_arch.py:318-327``)."""
        feats = self._tower(pixels)
        if self.dynamic_s2:
            feats = jnp.tile(feats, (1, 1, len(self.s2_scales)))
        return self.projector(feats)

    def encode_video(self, frames: jax.Array) -> jax.Array:
        """``[T, H, W, 3]`` -> ``[T * P', llm_hidden]``: uniform frame
        subsample to ``num_video_frames``, per-frame base-scale encode,
        temporal concat (BasicVideoEncoder behavior)."""
        t = frames.shape[0]
        n = min(self.num_video_frames, t)
        idx = np.linspace(0, t - 1, n).round().astype(np.int32)
        sz = self.vis_cfg.image_size
        sel = jnp.stack([
            jax.image.resize(frames[i], (sz, sz, 3), "bilinear") for i in idx
        ])
        feats = self.encode_images_basic(sel)            # [n, P', H]
        return feats.reshape(-1, feats.shape[-1])

    # -- media embedding -----------------------------------------------------
    def embed_media(
        self,
        token_ids: Sequence[int],
        media: Dict[str, List[jax.Array]],
    ) -> jax.Array:
        """Token ids with media sentinels + media dict -> ``inputs_embeds``
        ``[1, S', H]`` (the ``_embed`` splice, ``nvila/llava_arch.py:446+``).

        media["image"]: list of [H, W, 3]; media["video"]: list of
        [T, H, W, 3]."""
        queues = {k: list(v) for k, v in media.items()}
        dt = jnp.dtype(self.llm_cfg.dtype)
        embed_table = self.llm_params["embed"]
        id2name = {v: k for k, v in MEDIA_TOKEN_IDS.items()}

        parts: List[jax.Array] = []
        run: List[int] = []

        def flush():
            nonlocal run
            if run:
                parts.append(embed_table[jnp.asarray(run, jnp.int32)])
                run = []

        for t in token_ids:
            name = id2name.get(int(t))
            if name is None:
                run.append(int(t))
                continue
            flush()
            if not queues.get(name):
                raise ValueError(f"prompt has more {name} tokens than media")
            item = queues[name].pop(0)
            if name == "image":
                if self.dynamic_s2:
                    parts.append(self.encode_image_dynamic_s2(item))
                else:
                    sz = self.vis_cfg.image_size
                    px = jax.image.resize(item, (sz, sz, 3), "bilinear")
                    parts.append(self.encode_images_basic(px[None])[0])
            else:
                parts.append(self.encode_video(item))
        flush()
        for name, q in queues.items():
            if q:
                raise ValueError(f"not all {name} media consumed")
        return jnp.concatenate(parts, axis=0).astype(dt)[None]


def tokenize_with_media(prompt: str, tokenizer) -> List[int]:
    """Tokenize text containing ``<image>`` / ``<vila/video>`` placeholders
    into ids with media sentinels."""
    # split on either token, longest-first to avoid partial overlap
    marks = sorted(MEDIA_TOKENS.items(), key=lambda kv: -len(kv[1]))
    ids: List[int] = []
    rest = prompt
    bos = getattr(tokenizer, "bos_token_id", None)
    first_chunk = True
    while rest:
        nxt = None
        for name, tok in marks:
            p = rest.find(tok)
            if p >= 0 and (nxt is None or p < nxt[0]):
                nxt = (p, name, tok)
        if nxt is None:
            chunk, rest = rest, ""
            media_name = None
        else:
            chunk, rest = rest[:nxt[0]], rest[nxt[0] + len(nxt[2]):]
            media_name = nxt[1]
        if chunk:
            part = tokenizer.encode(chunk)
            if not first_chunk and bos is not None and part and part[0] == bos:
                part = part[1:]
            ids.extend(part)
            first_chunk = False
        if media_name is not None:
            ids.append(MEDIA_TOKEN_IDS[media_name])
            first_chunk = False
    return ids


# -----------------------------------------------------------------------------
# importer (builder.py counterpart)
# -----------------------------------------------------------------------------


def import_nvila_model(
    path: str,
    dtype: str = "bfloat16",
    quantize: Optional[QuantConfig] = None,
    vision_int8: bool = False,
) -> NVILA:
    """Load a VILA-layout NVILA checkpoint directory.

    ``quantize`` real-quantizes the LLM linears (W4A16); ``vision_int8``
    converts the tower to the W8A8 pipeline (QuantSiglipEncoder
    counterpart, ``tinychat/nvila_demo.py:106-113``)."""
    from awq_tpu.config import model_config_from_hf
    from awq_tpu.models.hf_import import (
        _build_llama_params, _load_dir_state_dict,
    )
    from awq_tpu.models.projector import build_projector
    from awq_tpu.models.vision import (
        build_vision_params, vision_config_from_hf,
    )

    with open(os.path.join(path, "config.json")) as f:
        top = json.load(f)

    # --- LLM (qwen2 via the generic decoder) --------------------------------
    llm_dir = os.path.join(path, "llm")
    with open(os.path.join(llm_dir, "config.json")) as f:
        llm_raw = json.load(f)
    llm_cfg = model_config_from_hf(llm_raw)
    llm_cfg = ModelConfig(**{**llm_cfg.__dict__, "dtype": dtype})
    llm_params = _build_llama_params(llm_cfg, _load_dir_state_dict(llm_dir))
    if quantize is not None:
        from awq_tpu.models.llama import quantize_params

        llm_params = quantize_params(llm_params, quantize)

    # --- vision tower (SigLIP) ----------------------------------------------
    vt_dir = os.path.join(path, "vision_tower")
    with open(os.path.join(vt_dir, "config.json")) as f:
        vt_raw = json.load(f)
    if "vision_config" in vt_raw:
        vt_raw = vt_raw["vision_config"]
    vis_cfg = VisionConfig(**{**vision_config_from_hf(vt_raw).__dict__,
                              "dtype": "float32"})
    vt_sd = _load_dir_state_dict(vt_dir)
    if not any(k.startswith("vision_model.") for k in vt_sd):
        # tower saved bare (no "vision_model." root): re-root it
        vt_sd = {"vision_model." + k: v for k, v in vt_sd.items()}
    vis_params = build_vision_params(vis_cfg, vt_sd)
    if vision_int8:
        from awq_tpu.models.vision import w8a8_quantize_vision

        vis_params = w8a8_quantize_vision(vis_params)

    # --- projector -----------------------------------------------------------
    mp_dir = os.path.join(path, "mm_projector")
    with open(os.path.join(mp_dir, "config.json")) as f:
        mp_raw = json.load(f)
    mm_type = mp_raw.get("mm_projector_type", "mlp_downsample_3x3_fix")
    projector = build_projector(
        mm_type, _load_dir_state_dict(mp_dir), dtype=dtype
    )

    scales = top.get("s2_scales", "448,896,1344")
    if isinstance(scales, str):
        scales = tuple(int(s) for s in scales.split(","))
    else:
        scales = tuple(scales)
    return NVILA(
        vis_cfg=vis_cfg,
        vis_params=vis_params,
        projector=projector,
        llm_cfg=llm_cfg,
        llm_params=llm_params,
        s2_scales=scales,
        resize_output_to_scale_idx=top.get("s2_resize_output_to_scale_idx",
                                           -1),
        max_tiles=top.get("s2_max_split_size", 12) if isinstance(
            top.get("s2_max_split_size", 12), int) else 12,
        num_video_frames=top.get("num_video_frames", 8),
        dynamic_s2=top.get("image_aspect_ratio", "dynamic_s2") == "dynamic_s2",
        vision_int8=vision_int8,
    )


def nvila_generate(
    model: NVILA,
    prompt: str,
    tokenizer,
    media: Dict[str, List[jax.Array]],
    cache: jax.Array,
    gen,
    stop_ids: Sequence[int] = (),
    key=None,
) -> Dict[str, Any]:
    """generate_content counterpart (``nvila/llava_arch.py:601+``): embed
    media, prefill with inputs_embeds, scan-decode."""
    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import decode_scan
    from awq_tpu.runtime.sampling import sample_logits
    import time

    key = jax.random.PRNGKey(0) if key is None else key
    ids = tokenize_with_media(prompt, tokenizer)

    t0 = time.perf_counter()
    embeds = model.embed_media(ids, media)
    s = embeds.shape[1]
    logits, cache = forward(
        model.llm_params, model.llm_cfg, jnp.zeros((1, s), jnp.int32),
        cache, jnp.int32(0), inputs_embeds=embeds,
    )
    seen = jnp.zeros((1, model.llm_cfg.vocab_size), bool)
    key, sub = jax.random.split(key)
    first = sample_logits(logits[:, -1], sub, gen, seen)
    np.asarray(first)
    ttft = time.perf_counter() - t0

    n = max(gen.max_new_tokens - 1, 0)
    stop = jnp.asarray(list(stop_ids) or [-1], jnp.int32)
    t1 = time.perf_counter()
    toks, dones, cache = decode_scan(
        model.llm_params, model.llm_cfg, cache, first, jnp.int32(s), key,
        stop, seen, gen, n, model.llm_cfg.vocab_size,
    )
    toks = np.asarray(jnp.concatenate([first[:, None], toks], axis=1))
    decode_s = time.perf_counter() - t1
    dones = np.asarray(jnp.concatenate(
        [jnp.isin(first, stop)[:, None], dones], axis=1))
    n_valid = int(dones.argmax(1) + 1) if dones.any() else toks.shape[1]
    out_ids = [int(t) for t in toks[0, :n_valid]]
    if out_ids and out_ids[-1] in set(map(int, np.asarray(stop))):
        out_ids = out_ids[:-1]
    return {
        "output_ids": out_ids,
        "text": tokenizer.decode(out_ids) if tokenizer else None,
        "cache": cache,
        "timing": {"ttft_s": ttft, "decode_s": decode_s,
                   "ms_per_token": decode_s / max(n, 1) * 1e3},
    }
