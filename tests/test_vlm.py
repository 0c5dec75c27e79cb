"""VLM assembly tests: splicing, projector, end-to-end generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import init_kv_cache, init_params
from awq_tpu.models.layers import Linear
from awq_tpu.models.vision import VisionConfig, init_vision_params
from awq_tpu.models.vlm import (
    IMAGE_TOKEN_ID,
    MMProjector,
    VLM,
    splice_image_embeds,
    tokenizer_image_token,
    vlm_generate,
)


class FakeTokenizer:
    bos_token_id = 1
    eos_token_id = 0

    def encode(self, text):
        return [self.bos_token_id] + [min(ord(c), 127) for c in text]

    def decode(self, ids):
        return "".join(chr(max(i, 32)) for i in ids)


@pytest.fixture(scope="module")
def vlm():
    vis_cfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2,
    )
    vis_params = init_vision_params(vis_cfg, jax.random.PRNGKey(0))
    llm_cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=256, dtype="float32",
    )
    llm_params = init_params(llm_cfg, jax.random.PRNGKey(1))
    proj = MMProjector(
        fc1=Linear(w=jnp.ones((32, 48), jnp.float32) * 0.05),
        fc2=Linear(w=jnp.ones((48, 64), jnp.float32) * 0.05),
    )
    return VLM(vis_cfg, vis_params, proj, llm_cfg, llm_params)


def test_tokenizer_image_token():
    tok = FakeTokenizer()
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids.count(IMAGE_TOKEN_ID) == 1
    # BOS from the second chunk is stripped
    assert ids[0] == tok.bos_token_id
    assert sum(1 for t in ids if t == tok.bos_token_id) == 1


def test_splice_image_embeds(vlm):
    table = vlm.llm_params["embed"]
    feats = jnp.ones((1, 4, 64), jnp.float32) * 0.5
    ids = [1, 5, IMAGE_TOKEN_ID, 9]
    emb = splice_image_embeds(ids, table, feats)
    assert emb.shape == (1, 3 + 4, 64)
    np.testing.assert_allclose(np.asarray(emb[0, 2:6]), 0.5)
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(table[1]))
    with pytest.raises(ValueError):
        splice_image_embeds([1, 2], table, feats)  # image count mismatch


def test_vlm_generate_end_to_end(vlm):
    tok = FakeTokenizer()
    cache = init_kv_cache(vlm.llm_cfg, 1, 64, jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 28, 28, 3), jnp.float32)
    out = vlm_generate(
        vlm, "what is <image> showing", tok, px, cache,
        GenConfig(greedy=True, max_new_tokens=8),
    )
    assert 1 <= len(out["output_ids"]) <= 8
    assert isinstance(out["text"], str)
    assert out["timing"]["ttft_s"] > 0


def test_vlm_generate_text_only(vlm):
    tok = FakeTokenizer()
    cache = init_kv_cache(vlm.llm_cfg, 1, 64, jnp.float32)
    out = vlm_generate(
        vlm, "hello", tok, None, cache, GenConfig(greedy=True,
                                                  max_new_tokens=4),
    )
    assert len(out["output_ids"]) >= 1


def test_encode_image_s2(vlm):
    """Dynamic-res S2 encode: thumbnail+tiles, channel concat, projector."""
    from awq_tpu.models.layers import Linear
    from awq_tpu.models.vlm import VLM

    # S2 concat doubles the channel dim into the projector
    proj = MMProjector(
        fc1=Linear(w=jnp.ones((64, 48), jnp.float32) * 0.02),
        fc2=Linear(w=jnp.ones((48, 64), jnp.float32) * 0.02),
    )
    v2 = VLM(vlm.vis_cfg, vlm.vis_params, proj, vlm.llm_cfg, vlm.llm_params)
    img = jax.random.normal(jax.random.PRNGKey(5), (56, 56, 3), jnp.float32)
    out = v2.encode_image_s2(img, max_tiles=4)
    side = vlm.vis_cfg.image_size // vlm.vis_cfg.patch_size
    assert out.shape == (1, side * side, 64)

    # pixel-shuffle downsample: 4x fewer tokens, 4x channels into the proj
    proj4 = MMProjector(
        fc1=Linear(w=jnp.ones((256, 48), jnp.float32) * 0.02),
        fc2=Linear(w=jnp.ones((48, 64), jnp.float32) * 0.02),
    )
    v3 = VLM(vlm.vis_cfg, vlm.vis_params, proj4, vlm.llm_cfg, vlm.llm_params)
    out2 = v3.encode_image_s2(img, max_tiles=4, downsample=2)
    assert out2.shape[1] == (side // 2) ** 2


def test_vlm_stream(vlm):
    from awq_tpu.models.vlm import vlm_stream

    tok = FakeTokenizer()
    cache = init_kv_cache(vlm.llm_cfg, 1, 64, jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(6), (1, 28, 28, 3), jnp.float32)
    chunks = list(vlm_stream(
        vlm, "see <image> now", tok, px, cache,
        GenConfig(greedy=True, max_new_tokens=6), stream_interval=1,
    ))
    assert chunks[-1]["finished"] and "timing" in chunks[-1]
    assert len(chunks) >= 2  # streamed intermediate chunks
    # streaming matches non-streaming greedy output
    cache2 = init_kv_cache(vlm.llm_cfg, 1, 64, jnp.float32)
    ref = vlm_generate(vlm, "see <image> now", tok, px, cache2,
                       GenConfig(greedy=True, max_new_tokens=6))
    assert chunks[-1]["ids"] == ref["output_ids"]
