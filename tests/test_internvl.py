"""InternVL3 track: InternViT tower parity vs HF, pixel-shuffle +
projector feature parity, full-logits parity, W8A8 pipeline, generation.

HF ``InternVLForConditionalGeneration`` (transformers >= 4.52) implements
the same architecture as the reference's ``tinychat/models/internvl3.py`` /
``internvl/internvit.py`` and serves as the parity oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

transformers = pytest.importorskip("transformers")
if not hasattr(transformers, "InternVLForConditionalGeneration"):
    pytest.skip("transformers lacks InternVL", allow_module_level=True)
import torch  # noqa: E402

from awq_tpu.models.internvit import (  # noqa: E402
    InternViTConfig,
    build_internvit_params,
    init_internvit_params,
    internvit_config_from_hf,
    internvit_forward,
    internvit_forward_w8a8,
    w8a8_quantize_internvit,
)
from awq_tpu.models.internvl import (  # noqa: E402
    import_internvl3_model,
    internvl_dynamic_preprocess,
    internvl_generate,
    internvl_pixel_shuffle,
)


def _tiny_hf_internvl(qk_norm=True, seed=0, hidden=48):
    vc = transformers.InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        use_qk_norm=qk_norm, hidden_act="gelu",
    )
    tc = transformers.Qwen2Config(
        vocab_size=128, hidden_size=hidden, intermediate_size=2 * hidden,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    cfg = transformers.InternVLConfig(
        vision_config=vc, text_config=tc, image_token_id=120,
        downsample_ratio=0.5,
    )
    torch.manual_seed(seed)
    return transformers.InternVLForConditionalGeneration(cfg).eval().float()


def _nhwc(pixels_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(pixels_nchw.transpose(0, 2, 3, 1))


def test_internvit_tower_parity():
    hf = _tiny_hf_internvl()
    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.vision_tower(
            pixel_values=torch.from_numpy(px)).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in hf.model.vision_tower.state_dict().items()}
    vcfg = internvit_config_from_hf(hf.config.vision_config.to_dict())
    assert vcfg.qk_norm
    params = build_internvit_params(vcfg, sd)
    ours = np.asarray(internvit_forward(params, vcfg, _nhwc(px)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_internvl_feature_parity():
    """pixel shuffle + mlp1 projector vs HF get_image_features."""
    hf = _tiny_hf_internvl(seed=1)
    px = np.random.RandomState(1).randn(3, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(
            torch.from_numpy(px), vision_feature_layer=-1,
            vision_feature_select_strategy="default").numpy()
    model = import_internvl3_model(hf, dtype="float32")
    ours = np.asarray(model.extract_features(_nhwc(px)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_internvl_full_logits_parity():
    """ids with IMG_CONTEXT runs + pixels -> logits match HF end to end."""
    hf = _tiny_hf_internvl(seed=2)
    model = import_internvl3_model(hf, dtype="float32")
    assert model.img_context_token_id == 120
    n_tok = model.num_image_token            # (28/14)^2 * 0.25 = 1
    px = np.random.RandomState(2).randn(1, 3, 28, 28).astype(np.float32)
    ids = [5, 6] + [120] * n_tok + [7, 8, 9]
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.from_numpy(px),
        ).logits.numpy()

    feats = model.extract_features(_nhwc(px)).reshape(-1, 48)
    embeds = model.embed_media(ids, feats)
    from awq_tpu.models import forward, init_kv_cache

    cache = init_kv_cache(model.llm_cfg, 1, 32, jnp.float32)
    ours, _ = forward(model.llm_params, model.llm_cfg,
                      jnp.zeros((1, len(ids)), jnp.int32), cache,
                      jnp.int32(0), inputs_embeds=embeds, last_only=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=4e-4, atol=4e-4)


def test_internvl_pixel_shuffle_matches_torch():
    x = np.random.RandomState(3).randn(2, 4, 4, 8).astype(np.float32)

    def torch_ps(t, sf=0.5):
        n, w, h, c = t.size()
        t = t.view(n, w, int(h * sf), int(c / sf))
        t = t.permute(0, 2, 1, 3).contiguous()
        t = t.view(n, int(h * sf), int(w * sf), int(c / (sf * sf)))
        return t.permute(0, 2, 1, 3).contiguous()

    ours = np.asarray(internvl_pixel_shuffle(jnp.asarray(x), 0.5))
    ref = torch_ps(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref)


def test_internvit_w8a8_close_to_fp():
    cfg = InternViTConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, qk_norm=True,
    )
    params = init_internvit_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    px = jnp.asarray(np.random.RandomState(4).rand(2, 28, 28, 3),
                     jnp.float32)
    fp = np.asarray(internvit_forward(params, cfg, px))
    q8 = np.asarray(internvit_forward_w8a8(
        w8a8_quantize_internvit(params), cfg, px))
    rel = np.abs(q8 - fp).mean() / (np.abs(fp).mean() + 1e-9)
    assert rel < 0.05, rel


def test_internvl_dynamic_preprocess_thumbnail():
    img = jnp.asarray(np.random.RandomState(5).rand(60, 30, 3), jnp.float32)
    tiles = internvl_dynamic_preprocess(img, 28, max_num=12)
    # aspect 0.5 -> (1, 2) grid = 2 tiles + thumbnail
    assert tiles.shape[0] == 3 and tiles.shape[1:] == (28, 28, 3)
    sq = jnp.asarray(np.random.RandomState(6).rand(28, 28, 3), jnp.float32)
    tiles = internvl_dynamic_preprocess(sq, 28, max_num=12)
    assert tiles.shape[0] == 1  # single tile: no thumbnail


def test_internvl_generate_media(tmp_path):
    from awq_tpu.config import GenConfig
    from awq_tpu.models import init_kv_cache

    hf = _tiny_hf_internvl(seed=3)
    model = import_internvl3_model(hf, dtype="float32")

    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(i): i for i in range(32, 127)}
    vocab["<unk>"] = 127
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<unk>")

    img = jnp.asarray(np.random.RandomState(7).rand(40, 56, 3), jnp.float32)
    vid = jnp.asarray(np.random.RandomState(8).rand(5, 28, 28, 3),
                      jnp.float32)
    cache = init_kv_cache(model.llm_cfg, 1, 256, jnp.float32)
    out = internvl_generate(
        model, "a <image> b <video> c", fast,
        {"image": [img], "video": [vid]}, cache,
        GenConfig(greedy=True, max_new_tokens=3),
    )
    assert len(out["output_ids"]) >= 1
    with pytest.raises(ValueError):
        internvl_generate(model, "<image>", fast, {"image": []},
                          init_kv_cache(model.llm_cfg, 1, 64, jnp.float32),
                          GenConfig(greedy=True, max_new_tokens=2))


def test_internvl_w4a16_llm(tmp_path):
    from awq_tpu.config import QuantConfig
    from awq_tpu.ops.w4a16 import QLinear

    hf = _tiny_hf_internvl(seed=4, hidden=64)
    model = import_internvl3_model(
        hf, dtype="float32", quantize=QuantConfig(w_bit=4, group_size=32),
        vision_int8=True,
    )
    assert isinstance(model.llm_params["layers"]["wq"], QLinear)
    px = jnp.asarray(np.random.RandomState(9).rand(28, 28, 3), jnp.float32)
    feats = model.encode_image(px)
    assert feats.shape == (model.num_image_token, 64)
