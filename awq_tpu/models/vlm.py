"""VLM assembly: vision tower + projector + decoder with image splicing.

Counterpart of the reference VLM stack (P11): ``VilaLlamaForCausalLM``
(``tinychat/models/vila_llama.py:20-109``), LLaVA's
``prepare_inputs_labels_for_multimodal`` image-token splicing
(``llava_base/llava_arch.py:102-120+``), and the VLM stream generators
(``llava_stream_gen.py:50-80``). Splicing happens host-side (prompt
processing is host work); the spliced ``inputs_embeds`` prefill and the
token decode loop are the same jitted functions as the text path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import forward
from awq_tpu.models.layers import Linear, linear_apply
from awq_tpu.models.vision import (
    VisionConfig,
    vision_forward,
    vision_forward_w8a8,
)

IMAGE_TOKEN = "<image>"
IMAGE_TOKEN_ID = -200  # sentinel inside id streams (llava convention)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MMProjector:
    """LLaVA-style 2-layer MLP projector (mm_projector 'mlp2x_gelu')."""

    fc1: Linear
    fc2: Optional[Linear] = None

    def __call__(self, feats: jax.Array) -> jax.Array:
        h = linear_apply(self.fc1, feats)
        if self.fc2 is not None:
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False
                            ).astype(h.dtype)
            h = linear_apply(self.fc2, h)
        return h


@dataclasses.dataclass
class VLM:
    """Bundle of (vision tower, projector, language model)."""

    vis_cfg: VisionConfig
    vis_params: Dict[str, Any]
    projector: MMProjector
    llm_cfg: ModelConfig
    llm_params: Dict[str, Any]
    vision_int8: bool = False  # W8A8 tower (QuantSiglipEncoder counterpart)

    def encode_images(self, pixels: jax.Array) -> jax.Array:
        """[N, H, W, 3] -> projected features [N, n_patches, llm_hidden]."""
        fwd = vision_forward_w8a8 if self.vision_int8 else vision_forward
        feats = fwd(self.vis_params, self.vis_cfg, pixels)
        return self.projector(feats)

    def encode_image_s2(self, image: jax.Array, max_tiles: int = 12,
                        downsample: int = 1) -> jax.Array:
        """NVILA-style dynamic-resolution encode of ONE image [H, W, 3]:
        aspect-matched chessboard tiling at base resolution, tile-batched
        tower forward, multi-scale merge (thumbnail + tiles), optional
        pixel-shuffle downsample, projector. Returns [1, P, llm_hidden]
        (counterpart of ``nvila/llava_arch.py:261-392`` + ``_embed``)."""
        from awq_tpu.models.s2 import (
            dynamic_s2_preprocess,
            feats_to_grid,
            grid_to_feats,
            merge_chessboard,
            pixel_shuffle_downsample,
        )

        tiles, (nx, ny) = dynamic_s2_preprocess(
            image, self.vis_cfg.image_size, max_tiles
        )
        fwd = vision_forward_w8a8 if self.vision_int8 else vision_forward
        feats = fwd(self.vis_params, self.vis_cfg, tiles)  # [1+nx*ny, P, C]
        side = self.vis_cfg.image_size // self.vis_cfg.patch_size
        thumb = feats_to_grid(feats[:1])                   # [1, s, s, C]
        big = feats[1:].reshape(ny * nx, side, side, -1)
        # rows of tiles -> one [1, ny*s, nx*s, C] grid
        big = big.reshape(ny, nx, side, side, -1)
        big = big.transpose(0, 2, 1, 3, 4).reshape(
            1, ny * side, nx * side, -1)
        big = jax.image.resize(
            big, (1, side, side, big.shape[-1]), method="bilinear"
        )
        grid = jnp.concatenate([thumb, big], axis=-1)      # channel concat
        if downsample > 1:
            grid = pixel_shuffle_downsample(grid, downsample)
        return self.projector(grid_to_feats(grid))


def tokenizer_image_token(prompt: str, tokenizer) -> List[int]:
    """Tokenize text with ``<image>`` placeholders -> ids with
    IMAGE_TOKEN_ID sentinels (counterpart of ``tokenizer_image_token``,
    ``llava_stream_gen.py:50-80``)."""
    chunks = prompt.split(IMAGE_TOKEN)
    ids: List[int] = []
    for i, chunk in enumerate(chunks):
        part = tokenizer.encode(chunk) if chunk else []
        if i > 0:
            # drop a re-emitted BOS on non-first chunks
            bos = getattr(tokenizer, "bos_token_id", None)
            if bos is not None and part and part[0] == bos:
                part = part[1:]
            ids.append(IMAGE_TOKEN_ID)
        ids.extend(part)
    return ids


def splice_image_embeds(
    token_ids: Sequence[int],
    embed_table: jax.Array,          # [V, H]
    image_feats: jax.Array,          # [n_images, n_patches, H]
    dtype=None,
) -> jax.Array:
    """Replace each IMAGE_TOKEN_ID with its image's patch embeddings.

    Returns ``inputs_embeds [1, S', H]`` (counterpart of
    ``prepare_inputs_labels_for_multimodal``)."""
    dtype = dtype or image_feats.dtype
    parts: List[jax.Array] = []
    img_idx = 0
    run: List[int] = []

    def flush():
        nonlocal run
        if run:
            parts.append(embed_table[jnp.asarray(run, jnp.int32)])
            run = []

    for t in token_ids:
        if t == IMAGE_TOKEN_ID:
            flush()
            parts.append(image_feats[img_idx])
            img_idx += 1
        else:
            run.append(int(t))
    flush()
    if img_idx != image_feats.shape[0]:
        raise ValueError(
            f"{image_feats.shape[0]} images but {img_idx} <image> tokens"
        )
    return jnp.concatenate(parts, axis=0).astype(dtype)[None]


def vlm_stream(
    vlm: VLM,
    prompt: str,
    tokenizer,
    pixels: Optional[jax.Array],
    cache: jax.Array,
    gen: GenConfig,
    stop_ids: Sequence[int] = (),
    stream_interval: int = 2,
    key=None,
):
    """Streaming VLM generation (counterpart of the reference's VLM stream
    generators, ``llava_stream_gen.py:82`` / ``NVILA_stream_gen.py:15``):
    yields dicts with the text so far; the final dict carries timing."""
    import time

    from awq_tpu.runtime.sampling import sample_logits

    key = jax.random.PRNGKey(0) if key is None else key
    ids = tokenizer_image_token(prompt, tokenizer)
    dt = jnp.dtype(vlm.llm_cfg.dtype)

    t0 = time.perf_counter()
    if pixels is not None:
        feats = vlm.encode_images(pixels)
        embeds = splice_image_embeds(ids, vlm.llm_params["embed"], feats,
                                     dtype=dt)
    else:
        embeds = vlm.llm_params["embed"][
            jnp.asarray(ids, jnp.int32)][None].astype(dt)
    s = embeds.shape[1]
    logits, cache = forward(
        vlm.llm_params, vlm.llm_cfg, jnp.zeros((1, s), jnp.int32), cache,
        jnp.int32(0), inputs_embeds=embeds,
    )
    seen = jnp.zeros((1, vlm.llm_cfg.vocab_size), bool)
    key, sub = jax.random.split(key)
    tok = sample_logits(logits[:, -1], sub, gen, seen)
    tok_i = int(tok[0])
    ttft = time.perf_counter() - t0

    out_ids = [tok_i]
    token_times = []
    pos = s
    stops = set(int(t) for t in stop_ids)
    for i in range(gen.max_new_tokens - 1):
        if tok_i in stops:
            break
        t1 = time.perf_counter()
        logits, cache = forward(
            vlm.llm_params, vlm.llm_cfg, tok[:, None], cache, jnp.int32(pos)
        )
        key, sub = jax.random.split(key)
        tok = sample_logits(logits[:, -1], sub, gen, seen)
        tok_i = int(tok[0])
        token_times.append(time.perf_counter() - t1)
        out_ids.append(tok_i)
        pos += 1
        if (i + 1) % stream_interval == 0:
            yield {"text": tokenizer.decode(out_ids), "ids": list(out_ids),
                   "finished": False}
    if out_ids and out_ids[-1] in stops:
        out_ids.pop()
    yield {
        "text": tokenizer.decode(out_ids), "ids": list(out_ids),
        "finished": True,
        "timing": {
            "ttft_s": ttft,
            "ms_per_token": (sum(token_times)
                             / max(len(token_times), 1) * 1e3),
        },
    }


def vlm_generate(
    vlm: VLM,
    prompt: str,
    tokenizer,
    pixels: Optional[jax.Array],     # [n_images, H, W, 3] or None
    cache: jax.Array,
    gen: GenConfig,
    stop_ids: Sequence[int] = (),
    key=None,
) -> Dict[str, Any]:
    """Encode media -> splice -> prefill(inputs_embeds) -> scan decode.

    Mirrors the reference VLM generation flow (``NVILA_stream_gen.py:15+``):
    TTFT includes the vision encode, as in their benchmarks."""
    from awq_tpu.runtime.generate import decode_scan
    import time

    key = jax.random.PRNGKey(0) if key is None else key
    ids = tokenizer_image_token(prompt, tokenizer)

    t0 = time.perf_counter()
    if pixels is not None:
        feats = vlm.encode_images(pixels)
        embeds = splice_image_embeds(
            ids, vlm.llm_params["embed"], feats,
            dtype=jnp.dtype(vlm.llm_cfg.dtype),
        )
    else:
        embeds = vlm.llm_params["embed"][
            jnp.asarray([list(ids)], jnp.int32)[0]
        ][None].astype(jnp.dtype(vlm.llm_cfg.dtype))
    s = embeds.shape[1]
    dummy_tokens = jnp.zeros((1, s), jnp.int32)
    logits, cache = forward(
        vlm.llm_params, vlm.llm_cfg, dummy_tokens, cache, jnp.int32(0),
        inputs_embeds=embeds,
    )
    from awq_tpu.runtime.sampling import sample_logits

    key, sub = jax.random.split(key)
    seen = jnp.zeros((1, vlm.llm_cfg.vocab_size), bool)
    first = sample_logits(logits[:, -1], sub, gen, seen)
    np.asarray(first)
    ttft = time.perf_counter() - t0

    n = max(gen.max_new_tokens - 1, 0)
    stop = jnp.asarray(list(stop_ids) or [-1], jnp.int32)
    t1 = time.perf_counter()
    toks, dones, cache = decode_scan(
        vlm.llm_params, vlm.llm_cfg, cache, first, jnp.int32(s), key,
        stop, seen, gen, n, vlm.llm_cfg.vocab_size,
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
