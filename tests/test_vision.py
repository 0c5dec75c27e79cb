"""Vision tower tests: HF SigLIP/CLIP parity + W8A8 pipeline accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from awq_tpu.models.vision import (
    VisionConfig,
    import_hf_vision,
    init_vision_params,
    vision_forward,
    vision_forward_w8a8,
    w8a8_quantize_vision,
)

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def test_parity_siglip():
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    torch.manual_seed(0)
    hf = transformers.SiglipVisionModel(hf_cfg).eval().float()
    cfg, params = import_hf_vision(hf)
    assert not cfg.use_class_token

    px = np.random.RandomState(0).randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(px)).last_hidden_state.numpy()
    ours = vision_forward(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_parity_clip():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
    )
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(hf_cfg).eval().float()
    cfg, params = import_hf_vision(hf)
    assert cfg.use_class_token

    px = np.random.RandomState(1).randn(1, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(px), output_hidden_states=True)
    # CLIP applies post_layernorm only to the pooled CLS; VLM towers consume
    # the raw encoder output (LLaVA: hidden_states[-2]) — compare that.
    ref = out.hidden_states[-1].numpy()
    ours = vision_forward(params, cfg, jnp.asarray(px.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_w8a8_vision_close_to_fp():
    cfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4,
    )
    params = init_vision_params(cfg, jax.random.PRNGKey(0))
    qparams = w8a8_quantize_vision(params)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 3), jnp.float32)
    fp = vision_forward(params, cfg, px)
    q8 = vision_forward_w8a8(qparams, cfg, px)
    rel = (np.abs(np.asarray(q8 - fp)).max()
           / (np.abs(np.asarray(fp)).max() + 1e-9))
    assert rel < 0.1, rel
