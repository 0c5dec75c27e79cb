"""NVILA stack tests: projector math parity vs torch, dynamic-S2 merge,
full checkpoint import + generation over image and video media.

Reference behavior: ``tinychat/models/nvila/llava_arch.py:261-392,446+``
(merge/split chessboard, area-interpolated multi-scale concat, media
splicing) and the VILA mm_projector family the reference loads via
``tinychat/models/nvila/builder.py``.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from awq_tpu.models.projector import (  # noqa: E402
    Projector, build_projector, flat_square, init_projector,
)
from awq_tpu.models.s2 import area_resize  # noqa: E402


# ---------------------------------------------------------------------------
# torch oracles (transcribed from the VILA architecture spec, used only to
# validate our functional implementations)
# ---------------------------------------------------------------------------


def torch_flat_square(x: torch.Tensor, f: int) -> torch.Tensor:
    n, w, h, c = x.size()
    if w % f != 0:
        x = torch.cat([x, torch.zeros((n, f - w % f, h, c), dtype=x.dtype)],
                      dim=1).contiguous()
        n, w, h, c = x.size()
    if h % f != 0:
        x = torch.cat([x, torch.zeros((n, w, f - h % f, c), dtype=x.dtype)],
                      dim=2).contiguous()
        n, w, h, c = x.size()
    x = x.view(n, w, h // f, c * f)
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.view(n, h // f, w // f, c * f * f)
    x = x.permute(0, 2, 1, 3).contiguous()
    return x


@pytest.mark.parametrize("f,hw", [(2, 6), (2, 5), (3, 6), (3, 4)])
def test_flat_square_matches_torch(f, hw):
    x = np.random.RandomState(0).randn(2, hw, hw, 3).astype(np.float32)
    ours = np.asarray(flat_square(jnp.asarray(x), f))
    ref = torch_flat_square(torch.from_numpy(x), f).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape,out", [((1, 4, 4, 3), (8, 8)),
                                       ((1, 6, 6, 2), (4, 4)),
                                       ((2, 6, 9, 2), (4, 6)),
                                       ((1, 5, 5, 2), (3, 7))])
def test_area_resize_matches_torch(shape, out):
    x = np.random.RandomState(1).randn(*shape).astype(np.float32)
    ours = np.asarray(area_resize(jnp.asarray(x), *out))
    # torch area-interpolate works on NCHW
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out,
                        mode="area").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_projector_mlp_downsample_3x3_fix_matches_torch():
    """Build the NVILA projector from a torch Sequential's state dict and
    compare outputs (weight-layout compatibility check)."""
    mm, hid = 8, 16
    seq = torch.nn.Sequential(
        torch.nn.Identity(),                      # DownSample3x3BlockFix slot
        torch.nn.LayerNorm(mm * 9),
        torch.nn.Linear(mm * 9, mm * 3),
        torch.nn.GELU(),
        torch.nn.LayerNorm(mm * 3),
        torch.nn.Linear(mm * 3, hid),
        torch.nn.GELU(),
        torch.nn.Linear(hid, hid),
    ).eval()
    torch.manual_seed(0)
    for m in seq:
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.normal_(m.weight, std=0.2)
            torch.nn.init.normal_(m.bias, std=0.2)
    sd = {f"layers.{i}.{p}": t.detach().numpy()
          for i, m in enumerate(seq) for p, t in m.state_dict().items()}
    proj = build_projector("mlp_downsample_3x3_fix", sd)

    x = np.random.RandomState(2).randn(2, 36, mm).astype(np.float32)  # 6x6
    ours = np.asarray(proj(jnp.asarray(x)))

    with torch.no_grad():
        g = torch_flat_square(torch.from_numpy(x).reshape(2, 6, 6, mm), 3)
        ref = seq(g.reshape(2, -1, mm * 9)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# full checkpoint import + generate
# ---------------------------------------------------------------------------


def _make_tokenizer(tmp):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(i): i for i in range(32, 127)}
    vocab["<unk>"] = 127
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<unk>"
    )
    fast.save_pretrained(tmp)
    return fast


def _make_nvila_ckpt(tmp_path) -> str:
    """Tiny VILA-layout checkpoint: llm/ (qwen2) + vision_tower/ (siglip) +
    mm_projector/ (mlp_downsample_3x3_fix)."""
    from safetensors.numpy import save_file

    root = str(tmp_path / "nvila")
    os.makedirs(root)

    # llm: tiny qwen2
    llm_dir = os.path.join(root, "llm")
    qcfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    transformers.Qwen2ForCausalLM(qcfg).save_pretrained(llm_dir)
    _make_tokenizer(llm_dir)

    # vision tower: tiny siglip, 28px / patch 14 -> 2x2 patches
    vt_dir = os.path.join(root, "vision_tower")
    vcfg = transformers.SiglipVisionConfig(
        image_size=28, patch_size=14, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2,
    )
    torch.manual_seed(1)
    transformers.SiglipVisionModel(vcfg).save_pretrained(vt_dir)

    # projector: mlp_downsample_3x3_fix over mm_hidden = 24 * 3 scales
    mp_dir = os.path.join(root, "mm_projector")
    os.makedirs(mp_dir)
    mm = 24 * 3  # channel-concat of 3 scales
    rng = np.random.RandomState(3)
    sd = {
        "layers.1.weight": np.ones(mm * 9, np.float32),
        "layers.1.bias": np.zeros(mm * 9, np.float32),
        "layers.2.weight": rng.randn(mm * 3, mm * 9).astype(np.float32) * .05,
        "layers.2.bias": np.zeros(mm * 3, np.float32),
        "layers.4.weight": np.ones(mm * 3, np.float32),
        "layers.4.bias": np.zeros(mm * 3, np.float32),
        "layers.5.weight": rng.randn(64, mm * 3).astype(np.float32) * .05,
        "layers.5.bias": np.zeros(64, np.float32),
        "layers.7.weight": rng.randn(64, 64).astype(np.float32) * .05,
        "layers.7.bias": np.zeros(64, np.float32),
    }
    save_file(sd, os.path.join(mp_dir, "model.safetensors"))
    with open(os.path.join(mp_dir, "config.json"), "w") as f:
        json.dump({"mm_projector_type": "mlp_downsample_3x3_fix"}, f)

    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump({
            "model_type": "llava_llama",
            "image_aspect_ratio": "dynamic_s2",
            "s2_scales": "28,56,84",
            "s2_max_split_size": 12,
            "num_video_frames": 4,
        }, f)
    return root


def test_nvila_import_and_generate(tmp_path):
    from awq_tpu.config import GenConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.models.nvila import (
        import_nvila_model, nvila_generate, tokenize_with_media,
    )

    root = _make_nvila_ckpt(tmp_path)
    model = import_nvila_model(root, dtype="float32")
    assert model.llm_cfg.arch == "qwen2"
    assert model.s2_scales == (28, 56, 84)
    assert model.projector.mm_type == "mlp_downsample_3x3_fix"

    tok = transformers.AutoTokenizer.from_pretrained(
        os.path.join(root, "llm"))

    # dynamic-S2 single image encode: token count from the last-scale grid
    img = jnp.asarray(np.random.RandomState(0).rand(50, 40, 3),
                      jnp.float32)
    feats = model.encode_image_dynamic_s2(img)
    # last scale 84 -> min 9 tiles; side=2 patches; 3x3 blocks of 2x2 grid,
    # ds3 pads 2->3 so each block gives 1 token
    assert feats.ndim == 2 and feats.shape[1] == 64
    assert feats.shape[0] >= 9

    # full generate over an image
    ids = tokenize_with_media("look: <image> describe", tok)
    assert ids.count(-200) == 1
    cache = init_kv_cache(model.llm_cfg, 1, 128, jnp.float32)
    gen = GenConfig(greedy=True, max_new_tokens=4)
    out = nvila_generate(model, "look: <image> describe", tok,
                         {"image": [img]}, cache, gen)
    assert len(out["output_ids"]) >= 1
    assert out["timing"]["ttft_s"] > 0

    # video: frames spliced via <vila/video>
    video = jnp.asarray(np.random.RandomState(1).rand(6, 30, 30, 3),
                        jnp.float32)
    emb = model.embed_media(
        tokenize_with_media("v: <vila/video> ok", tok), {"video": [video]}
    )
    # 4 sampled frames x 1 token each (2x2 padded to 3x3 -> 1) + text
    n_text = len(tokenize_with_media("v:  ok", tok))
    assert emb.shape[1] == n_text + 4 * 1

    # over/under-supplied media must fail loudly
    with pytest.raises(ValueError):
        model.embed_media([32, -200, 33], {"image": []})
    with pytest.raises(ValueError):
        model.embed_media([32, 33], {"image": [img]})


def test_nvila_quantized_llm(tmp_path):
    """W4A16-quantized NVILA import runs the same pipeline."""
    from awq_tpu.config import GenConfig, QuantConfig
    from awq_tpu.models import init_kv_cache
    from awq_tpu.models.nvila import import_nvila_model, nvila_generate

    root = _make_nvila_ckpt(tmp_path)
    model = import_nvila_model(
        root, dtype="float32", quantize=QuantConfig(w_bit=4, group_size=32),
    )
    from awq_tpu.ops.w4a16 import QLinear

    assert isinstance(model.llm_params["layers"]["wq"], QLinear)
    tok = transformers.AutoTokenizer.from_pretrained(
        os.path.join(root, "llm"))
    img = jnp.asarray(np.random.RandomState(2).rand(28, 28, 3), jnp.float32)
    cache = init_kv_cache(model.llm_cfg, 1, 128, jnp.float32)
    out = nvila_generate(model, "<image> hi", tok, {"image": [img]}, cache,
                         GenConfig(greedy=True, max_new_tokens=3))
    assert len(out["output_ids"]) >= 1
