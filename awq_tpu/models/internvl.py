"""InternVL3: InternViT tower + pixel-shuffle + mlp1 projector + LLM.

TPU-native counterpart of ``tinychat/models/internvl3.py:55-383`` (model
wrapper: pixel shuffle, ``extract_features``, ``_embed`` IMG_CONTEXT
splicing, chat/generate) and ``tinychat/stream_generators/
internvl_stream_gen.py:15-204``. Supports both checkpoint layouts:

- OpenGVLab ``InternVLChatModel`` dirs: ``vision_model.*``, ``mlp1.{0,1,3}``,
  ``language_model.*``
- HF ``InternVLForConditionalGeneration`` dirs: ``model.vision_tower.*``,
  ``model.multi_modal_projector.{layer_norm,linear_1,linear_2}``,
  ``model.language_model.*`` + ``lm_head``
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
from awq_tpu.models.internvit import (
    InternViTConfig,
    build_internvit_params,
    internvit_config_from_hf,
    internvit_forward,
    internvit_forward_w8a8,
)
from awq_tpu.models.projector import Projector
from awq_tpu.models.s2 import find_closest_aspect_ratio

IMG_CONTEXT_TOKEN = "<IMG_CONTEXT>"
IMAGE_SENTINEL = -200  # embed-level splice marker (when the tokenizer has
# no IMG_CONTEXT special token; the reference always uses the token id)


def internvl_pixel_shuffle(x: jax.Array, scale_factor: float = 0.5,
                           ps_version: str = "v2") -> jax.Array:
    """``[N, W, H, C] -> [N, W*sf, H*sf, C/sf^2]`` — bit-exact port of the
    view/permute dance in ``internvl3.py:114-130`` (and HF
    ``InternVLModel.pixel_shuffle``). ``v1`` omits the final transpose."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(n, int(h * scale_factor), int(w * scale_factor),
                  int(c / (scale_factor * scale_factor)))
    if ps_version != "v1":
        x = jnp.transpose(x, (0, 2, 1, 3))
    return x


def internvl_dynamic_preprocess(
    image: jax.Array,                  # [H, W, 3] float
    image_size: int,
    min_num: int = 1,
    max_num: int = 12,
    use_thumbnail: bool = True,
) -> jax.Array:
    """InternVL tiling (``load_image``/``dynamic_preprocess`` used by
    ``internvl3.py::prepare_media``): aspect-fit (w, h) tile grid with
    ``min_num <= w*h <= max_num``; a whole-image thumbnail is APPENDED when
    more than one tile is used. Returns ``[n_tiles(+1), S, S, 3]``."""
    h, w = image.shape[:2]
    ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda r: r[0] * r[1],
    )
    wt, ht = find_closest_aspect_ratio(w / h, ratios, w, h, image_size)
    big = jax.image.resize(image, (ht * image_size, wt * image_size, 3),
                           "bilinear")
    tiles = big.reshape(ht, image_size, wt, image_size, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, image_size,
                                                   image_size, 3)
    if use_thumbnail and tiles.shape[0] > 1:
        thumb = jax.image.resize(image, (image_size, image_size, 3),
                                 "bilinear")
        tiles = jnp.concatenate([tiles, thumb[None]], axis=0)
    return tiles


@dataclasses.dataclass
class InternVL3:
    vit_cfg: InternViTConfig
    vit_params: Dict[str, Any]
    projector: Projector               # internvl_mlp1
    llm_cfg: ModelConfig
    llm_params: Dict[str, Any]
    downsample_ratio: float = 0.5
    select_layer: int = -1
    ps_version: str = "v2"
    max_tiles: int = 12
    num_video_frames: int = 8
    img_context_token_id: Optional[int] = None
    vision_int8: bool = False

    @property
    def num_image_token(self) -> int:
        side = self.vit_cfg.image_size // self.vit_cfg.patch_size
        return int(side * side * self.downsample_ratio ** 2)

    def _n_layers(self) -> int:
        if self.select_layer == -1:
            return 0
        return self.vit_cfg.num_layers + self.select_layer + 1

    def extract_features(self, pixels: jax.Array) -> jax.Array:
        """[N, S, S, 3] -> [N, num_image_token, llm_hidden]
        (``internvl3.py::extract_features:147-163``)."""
        fwd = internvit_forward_w8a8 if self.vision_int8 else internvit_forward
        hidden = fwd(self.vit_params, self.vit_cfg, pixels,
                     n_layers=self._n_layers())
        vit = hidden[:, 1:, :]                           # drop CLS
        n, p, c = vit.shape
        side = int(round(p ** 0.5))
        grid = vit.reshape(n, side, side, c)
        grid = internvl_pixel_shuffle(grid, self.downsample_ratio,
                                      self.ps_version)
        feats = grid.reshape(n, -1, grid.shape[-1])
        return self.projector(feats)

    def encode_image(self, image: jax.Array) -> jax.Array:
        """Dynamic-res encode of one [H, W, 3] image -> [tokens, H]."""
        tiles = internvl_dynamic_preprocess(
            image, self.vit_cfg.image_size, max_num=self.max_tiles)
        feats = self.extract_features(tiles)
        return feats.reshape(-1, feats.shape[-1])

    def encode_video(self, frames: jax.Array) -> jax.Array:
        """[T, H, W, 3] -> per-frame single-tile encode, temporal concat
        (``load_video`` samples frames; each uses max_num=1)."""
        t = frames.shape[0]
        n = min(self.num_video_frames, t)
        idx = np.linspace(0, t - 1, n).round().astype(np.int32)
        sz = self.vit_cfg.image_size
        sel = jnp.stack([
            jax.image.resize(frames[i], (sz, sz, 3), "bilinear") for i in idx
        ])
        feats = self.extract_features(sel)
        return feats.reshape(-1, feats.shape[-1])

    def embed_media(
        self,
        token_ids: Sequence[int],
        vit_embeds: jax.Array,           # [total_rows, llm_hidden]
    ) -> jax.Array:
        """Replace IMG_CONTEXT positions (or IMAGE_SENTINEL markers, which
        expand to ``rows`` consecutive embeddings) with vision rows —
        the ``_embed`` scatter (``internvl3.py:165-197``)."""
        dt = jnp.dtype(self.llm_cfg.dtype)
        table = self.llm_params["embed"]
        ctx = self.img_context_token_id
        rows_used = 0
        parts: List[jax.Array] = []
        run: List[int] = []

        def flush():
            nonlocal run
            if run:
                parts.append(table[jnp.asarray(run, jnp.int32)])
                run = []

        n_ctx = sum(1 for t in token_ids
                    if ctx is not None and int(t) == ctx)
        for t in token_ids:
            t = int(t)
            if ctx is not None and t == ctx:
                flush()
                parts.append(vit_embeds[rows_used:rows_used + 1])
                rows_used += 1
            elif t == IMAGE_SENTINEL:
                flush()
                parts.append(vit_embeds)
                rows_used += vit_embeds.shape[0]
            else:
                run.append(t)
        flush()
        if ctx is not None and n_ctx and rows_used != vit_embeds.shape[0]:
            raise ValueError(
                f"{n_ctx} IMG_CONTEXT tokens but {vit_embeds.shape[0]} "
                "vision rows"
            )
        return jnp.concatenate(parts, axis=0).astype(dt)[None]


def import_internvl3_model(
    model_or_path,
    dtype: str = "bfloat16",
    quantize: Optional[QuantConfig] = None,
    vision_int8: bool = False,
) -> InternVL3:
    """Build from an HF dir (either layout) or an in-memory HF
    ``InternVLForConditionalGeneration``."""
    from awq_tpu.config import model_config_from_hf
    from awq_tpu.models.hf_import import (
        _build_llama_params, _load_dir_state_dict, _to_numpy,
    )
    from awq_tpu.models.projector import build_projector

    if isinstance(model_or_path, str):
        with open(os.path.join(model_or_path, "config.json")) as f:
            raw = json.load(f)
        sd = _load_dir_state_dict(model_or_path)
    else:
        raw = model_or_path.config.to_dict()
        sd = {k: _to_numpy(v)
              for k, v in model_or_path.state_dict().items()}

    hf_layout = any(k.startswith("model.vision_tower.") for k in sd)
    vraw = raw["vision_config"]
    traw = raw.get("text_config") or raw["llm_config"]

    llm_cfg = model_config_from_hf(traw)
    llm_cfg = ModelConfig(**{**llm_cfg.__dict__, "dtype": dtype})

    def strip(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    if hf_layout:
        lm_sd = {"model." + k: v
                 for k, v in strip("model.language_model.").items()}
        if "lm_head.weight" in sd:
            lm_sd["lm_head.weight"] = sd["lm_head.weight"]
        vt_sd = strip("model.vision_tower.")
        mp = strip("model.multi_modal_projector.")
        proj_sd = {
            "layers.0.weight": mp["layer_norm.weight"],
            "layers.0.bias": mp["layer_norm.bias"],
            "layers.1.weight": mp["linear_1.weight"],
            "layers.1.bias": mp["linear_1.bias"],
            "layers.3.weight": mp["linear_2.weight"],
            "layers.3.bias": mp["linear_2.bias"],
        }
    else:
        lm_sd = strip("language_model.")
        vt_sd = strip("vision_model.")
        proj_sd = {
            "layers.0.weight": sd["mlp1.0.weight"],
            "layers.0.bias": sd["mlp1.0.bias"],
            "layers.1.weight": sd["mlp1.1.weight"],
            "layers.1.bias": sd["mlp1.1.bias"],
            "layers.3.weight": sd["mlp1.3.weight"],
            "layers.3.bias": sd["mlp1.3.bias"],
        }

    llm_params = _build_llama_params(llm_cfg, lm_sd)
    if quantize is not None:
        from awq_tpu.models.llama import quantize_params

        llm_params = quantize_params(llm_params, quantize)

    vit_cfg = InternViTConfig(
        **{**internvit_config_from_hf(vraw).__dict__, "dtype": "float32"})
    vit_params = build_internvit_params(vit_cfg, vt_sd)
    if vision_int8:
        from awq_tpu.models.internvit import w8a8_quantize_internvit

        vit_params = w8a8_quantize_internvit(vit_params)

    projector = build_projector("internvl_mlp1", proj_sd, dtype=dtype)
    return InternVL3(
        vit_cfg=vit_cfg,
        vit_params=vit_params,
        projector=projector,
        llm_cfg=llm_cfg,
        llm_params=llm_params,
        downsample_ratio=raw.get("downsample_ratio", 0.5),
        select_layer=raw.get("select_layer",
                             raw.get("vision_feature_layer", -1)),
        ps_version=raw.get("ps_version", "v2"),
        max_tiles=raw.get("max_dynamic_patch", 12),
        img_context_token_id=raw.get("image_token_id")
        or raw.get("img_context_token_id"),
        vision_int8=vision_int8,
    )


def internvl_generate(
    model: InternVL3,
    prompt: str,
    tokenizer,
    media: Dict[str, List[jax.Array]],
    cache: jax.Array,
    gen,
    stop_ids: Sequence[int] = (),
    key=None,
) -> Dict[str, Any]:
    """chat() counterpart (``internvl3.py:199+`` / internvl_stream_gen):
    ``<image>`` in the prompt becomes the encoded dynamic-res tiles,
    ``<video>`` becomes sampled frames."""
    from awq_tpu.models import forward
    from awq_tpu.runtime.generate import decode_scan
    from awq_tpu.runtime.sampling import sample_logits
    import time

    key = jax.random.PRNGKey(0) if key is None else key

    feats_list: List[jax.Array] = []
    for img in media.get("image", []):
        feats_list.append(model.encode_image(img))
    for vid in media.get("video", []):
        feats_list.append(model.encode_video(vid))

    # tokenize with a single sentinel per media item
    ids: List[int] = []
    rest = prompt
    n_media = 0
    t0 = time.perf_counter()
    for marker in ("<image>", "<video>"):
        rest = rest.replace(marker, "\x00")
    for i, chunk in enumerate(rest.split("\x00")):
        if i > 0:
            ids.append(IMAGE_SENTINEL)
            n_media += 1
        if chunk:
            ids.extend(tokenizer.encode(chunk))
    if n_media != len(feats_list):
        raise ValueError(f"{n_media} media markers vs {len(feats_list)} media")
    if feats_list:
        # one sentinel per item: splice each item's rows in order
        parts: List[jax.Array] = []
        fi = 0
        run: List[int] = []
        table = model.llm_params["embed"]
        dt = jnp.dtype(model.llm_cfg.dtype)
        for t in ids:
            if t == IMAGE_SENTINEL:
                if run:
                    parts.append(table[jnp.asarray(run, jnp.int32)])
                    run = []
                parts.append(feats_list[fi])
                fi += 1
            else:
                run.append(t)
        if run:
            parts.append(table[jnp.asarray(run, jnp.int32)])
        embeds = jnp.concatenate(parts, axis=0).astype(dt)[None]
    else:
        embeds = model.llm_params["embed"][
            jnp.asarray(ids, jnp.int32)][None].astype(
                jnp.dtype(model.llm_cfg.dtype))

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
