"""AutoAWQ checkpoint import: build a synthetic autoawq dir, load, and
check logits against a directly-quantized model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_params
from awq_tpu.models.llama import quantize_params
from awq_tpu.quant.core import quantize_groupwise
from awq_tpu.utils.load_quant import load_autoawq_checkpoint


def _pack_autoawq(codes: np.ndarray) -> np.ndarray:
    """[K, N] codes -> int32 [K, N/8] with nibble order 0,2,4,6,1,3,5,7."""
    order = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    k, n = codes.shape
    nib = codes.reshape(k, n // 8, 8)[:, :, order].astype(np.uint32)
    out = np.zeros((k, n // 8), np.uint32)
    for s in range(8):
        out |= nib[:, :, s] << (4 * s)
    return out.view(np.int32)


def test_autoawq_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=128, dtype="float32",
    )
    qcfg = QuantConfig(w_bit=4, group_size=64)
    params = init_params(cfg, jax.random.PRNGKey(0))

    # build the autoawq-format state dict from the same fp weights
    sd = {}
    names = {
        "wq": "model.layers.{i}.self_attn.q_proj",
        "wk": "model.layers.{i}.self_attn.k_proj",
        "wv": "model.layers.{i}.self_attn.v_proj",
        "wo": "model.layers.{i}.self_attn.o_proj",
        "gate": "model.layers.{i}.mlp.gate_proj",
        "up": "model.layers.{i}.mlp.up_proj",
        "down": "model.layers.{i}.mlp.down_proj",
    }
    for i in range(cfg.num_layers):
        for ours, fmt in names.items():
            w = np.asarray(params["layers"][ours].w[i], np.float32)  # [IC, OC]
            q, s, z = quantize_groupwise(jnp.asarray(w), 4, 64)
            sd[fmt.format(i=i) + ".qweight"] = _pack_autoawq(np.asarray(q))
            sd[fmt.format(i=i) + ".qzeros"] = _pack_autoawq(
                np.asarray(z).astype(np.uint8)
            )
            sd[fmt.format(i=i) + ".scales"] = np.asarray(s, np.float32)
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            params["layers"]["ln1"][i], np.float32
        )
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            params["layers"]["ln2"][i], np.float32
        )
    sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
    sd["model.norm.weight"] = np.asarray(params["norm"], np.float32)
    sd["lm_head.weight"] = np.ascontiguousarray(
        np.asarray(params["lm_head"], np.float32).T
    )

    d = str(tmp_path / "autoawq")
    os.makedirs(d)
    save_file(sd, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "model_type": "llama", "vocab_size": 256, "hidden_size": 128,
            "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": False,
            "quantization_config": {"bits": 4, "group_size": 64,
                                    "zero_point": True, "version": "gemm"},
        }, f)

    lcfg, lparams, lqcfg = load_autoawq_checkpoint(d, dtype="float32")
    assert lqcfg.group_size == 64

    # must match quantizing the fp params directly
    ref_q = quantize_params(params, qcfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 256)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(ref_q, cfg, tokens, cache, jnp.int32(0), last_only=False)
    got, _ = forward(lparams, lcfg, tokens, cache, jnp.int32(0),
                     last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tinychat_v2_roundtrip(tmp_path):
    """Pack fp weights TinyChat-v2-style with torch, load, compare logits."""
    import torch

    from awq_tpu.config import ModelConfig, QuantConfig
    from awq_tpu.utils.load_quant import load_tinychat_v2_checkpoint
    from tests.test_native import _pack_v2_reference

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=128, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    qcfg = QuantConfig(w_bit=4, group_size=64)

    names = {
        "wq": "model.layers.{i}.self_attn.q_proj",
        "wk": "model.layers.{i}.self_attn.k_proj",
        "wv": "model.layers.{i}.self_attn.v_proj",
        "wo": "model.layers.{i}.self_attn.o_proj",
        "gate": "model.layers.{i}.mlp.gate_proj",
        "up": "model.layers.{i}.mlp.up_proj",
        "down": "model.layers.{i}.mlp.down_proj",
    }
    def _pad_groups(a):
        # TinyChat pads the group axis to calculate_zeros_width(ic, G) *
        # pack_num rows (qmodule.py:11-23); G=64 -> multiple of 16 here.
        rows = -(-a.shape[0] // 16) * 16
        out = np.zeros((rows, a.shape[1]), a.dtype)
        out[: a.shape[0]] = a
        return out

    sd = {}
    for i in range(cfg.num_layers):
        for ours, fmt in names.items():
            w = np.asarray(params["layers"][ours].w[i], np.float32)  # [IC,OC]
            q, s, z = quantize_groupwise(jnp.asarray(w), 4, 64)
            codes_nk = np.ascontiguousarray(np.asarray(q).T)         # [OC,IC]
            sd[fmt.format(i=i) + ".qweight"] = torch.from_numpy(
                _pack_v2_reference(codes_nk).copy()
            )
            sd[fmt.format(i=i) + ".scales"] = torch.from_numpy(
                _pad_groups(np.asarray(s, np.float32))
            )
            sd[fmt.format(i=i) + ".scaled_zeros"] = torch.from_numpy(
                _pad_groups(-(np.asarray(s) * np.asarray(z)).astype(np.float32))
            )
        sd[f"model.layers.{i}.input_layernorm.weight"] = torch.from_numpy(
            np.asarray(params["layers"]["ln1"][i], np.float32))
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = \
            torch.from_numpy(np.asarray(params["layers"]["ln2"][i], np.float32))
    sd["model.embed_tokens.weight"] = torch.from_numpy(
        np.asarray(params["embed"], np.float32))
    sd["model.norm.weight"] = torch.from_numpy(
        np.asarray(params["norm"], np.float32))
    sd["lm_head.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(params["lm_head"], np.float32).T))

    import json as _json
    d = str(tmp_path / "tc2")
    os.makedirs(d)
    torch.save(sd, os.path.join(d, "model-v2.pt"))
    with open(os.path.join(d, "config.json"), "w") as f:
        _json.dump({
            "model_type": "llama", "vocab_size": 256, "hidden_size": 128,
            "intermediate_size": 256, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 4,
            "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
            "tie_word_embeddings": False,
        }, f)

    lcfg, lparams, _ = load_tinychat_v2_checkpoint(
        os.path.join(d, "model-v2.pt"), d, dtype="float32", group_size=64,
    )
    ref_q = quantize_params(params, qcfg)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 10), 0, 256)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(ref_q, cfg, tokens, cache, jnp.int32(0), last_only=False)
    got, _ = forward(lparams, lcfg, tokens, cache, jnp.int32(0),
                     last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_autoawq_export_roundtrip(tmp_path):
    """Our packed checkpoint -> AutoAWQ HF dir -> load -> identical logits
    (convert_to_hf counterpart)."""
    from awq_tpu.config import ModelConfig, QuantConfig
    from awq_tpu.utils.load_quant import save_autoawq_checkpoint

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=128, dtype="float32",
    )
    qcfg = QuantConfig(w_bit=4, group_size=64)
    params = init_params(cfg, jax.random.PRNGKey(9))
    qp = quantize_params(params, qcfg)

    d = str(tmp_path / "export")
    save_autoawq_checkpoint(qp, cfg, qcfg, d)
    lcfg, lparams, lqcfg = load_autoawq_checkpoint(d, dtype="float32")
    assert lqcfg.group_size == 64

    tokens = jax.random.randint(jax.random.PRNGKey(10), (1, 10), 0, 256)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    a, _ = forward(qp, cfg, tokens, cache, jnp.int32(0), last_only=False)
    b, _ = forward(lparams, lcfg, tokens, cache, jnp.int32(0),
                   last_only=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
