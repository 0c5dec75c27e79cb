"""LLaVA checkpoint import: build a tiny HF LlavaForConditionalGeneration,
import, and compare the vision+projector+decoder pipeline end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from awq_tpu.config import QuantConfig
from awq_tpu.models import init_kv_cache
from awq_tpu.models.vlm_import import import_llava_model

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


@pytest.fixture(scope="module")
def hf_llava():
    vcfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    tcfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    cfg = transformers.LlavaConfig(
        vision_config=vcfg, text_config=tcfg, image_token_index=32,
        vision_feature_layer=-1, vision_feature_select_strategy="full",
    )
    torch.manual_seed(0)
    return transformers.LlavaForConditionalGeneration(cfg).eval().float()


def test_import_llava_structure(hf_llava):
    vlm = import_llava_model(hf_llava, dtype="float32")
    assert vlm.llm_cfg.hidden_size == 128
    assert vlm.vis_cfg.use_class_token
    assert vlm.projector.fc2 is not None
    # projected image features land in llm hidden size
    px = jnp.zeros((1, 28, 28, 3), jnp.float32)
    feats = vlm.encode_images(px)
    assert feats.shape[-1] == 128


def test_import_llava_feature_parity(hf_llava):
    """Projected image features match HF's get_image_features."""
    vlm = import_llava_model(hf_llava, dtype="float32")
    px = np.random.RandomState(0).randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf_llava.get_image_features(
            torch.from_numpy(px), vision_feature_layer=-1,
            vision_feature_select_strategy="full",
        )
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        ref = ref.numpy()
    ours = vlm.encode_images(jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref.reshape(ours.shape),
                               rtol=3e-3, atol=3e-3)


def test_import_llava_quantized_generates(hf_llava):
    from awq_tpu.config import GenConfig
    from awq_tpu.models.vlm import vlm_generate

    vlm = import_llava_model(
        hf_llava, dtype="float32", quantize=QuantConfig(w_bit=4, group_size=32)
    )

    class Tok:
        bos_token_id = 1
        eos_token_id = 2

        def encode(self, t):
            return [1] + [min(ord(c), 255) for c in t]

        def decode(self, ids):
            return "".join(chr(max(i, 32)) for i in ids)

    cache = init_kv_cache(vlm.llm_cfg, 1, 64, jnp.float32)
    px = jnp.zeros((1, 28, 28, 3), jnp.float32)
    out = vlm_generate(vlm, "hi <image> there", Tok(), px, cache,
                       GenConfig(greedy=True, max_new_tokens=4))
    assert len(out["output_ids"]) >= 1
