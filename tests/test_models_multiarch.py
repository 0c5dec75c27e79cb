"""HF logit parity for the non-llama families (tiny random models, f32).

Covers every family the reference ships TinyChat models or AWQ scale
tables for: OPT, Falcon (7b-style MQA + parallel block), MPT (ALiBi),
BigCode/StarCoder (MQA + learned pos), GPT-NeoX (partial rope + parallel
residual).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.hf_import import import_hf_model

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _parity(hf_model, seed=0, n_tok=9, rtol=3e-3, atol=3e-3):
    cfg, params = import_hf_model(hf_model, dtype="float32")
    tokens = np.random.RandomState(seed).randint(
        0, cfg.vocab_size, (1, n_tok)
    ).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens).long()).logits.numpy()
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    ours, _ = forward(params, cfg, jnp.asarray(tokens), cache, jnp.int32(0),
                      last_only=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=rtol, atol=atol)
    return cfg


def test_parity_opt():
    hf_cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=128, ffn_dim=256, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=128, activation_function="relu",
        do_layer_norm_before=True,
    )
    torch.manual_seed(0)
    cfg = _parity(transformers.OPTForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "opt" and cfg.pos_embed == "learned"


def test_parity_falcon_7b_style():
    hf_cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, parallel_attn=True, bias=False,
        multi_query=True, alibi=False, new_decoder_architecture=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(1)
    cfg = _parity(transformers.FalconForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "falcon" and cfg.num_kv_heads == 1
    assert cfg.parallel_block and cfg.single_ln


def test_parity_falcon_40b_style():
    # new_decoder_architecture: grouped QKV [n_kv, g+2, hd] + ln_attn/ln_mlp
    hf_cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, parallel_attn=True,
        bias=False, multi_query=False, alibi=False,
        new_decoder_architecture=True, max_position_embeddings=128,
    )
    torch.manual_seed(5)
    cfg = _parity(transformers.FalconForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "falcon" and cfg.num_kv_heads == 2
    assert cfg.grouped_qkv and cfg.parallel_block and not cfg.single_ln


def test_parity_mpt_alibi():
    hf_cfg = transformers.MptConfig(
        vocab_size=256, d_model=128, n_heads=4, n_layers=2,
        expansion_ratio=2, max_seq_len=128,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            alibi=True, qk_ln=False,
        ),
        no_bias=True,
    )
    torch.manual_seed(2)
    cfg = _parity(transformers.MptForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "mpt" and cfg.pos_embed == "alibi"


def test_parity_bigcode_mqa():
    hf_cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_positions=128, n_embd=128, n_layer=2, n_head=4,
        n_inner=256, multi_query=True,
        activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(3)
    cfg = _parity(transformers.GPTBigCodeForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "bigcode" and cfg.num_kv_heads == 1


def test_parity_bloom():
    # bloom: ALiBi + per-head qkv interleave + word_embeddings_layernorm
    # (the reference's last AWQ-search family, auto_scale.py:258-295)
    hf_cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=128, n_head=4, n_layer=2,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(6)
    cfg = _parity(transformers.BloomForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "bloom" and cfg.pos_embed == "alibi"
    assert cfg.embed_ln and cfg.act == "gelu_tanh"


def test_parity_gpt_neox():
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=128, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=256, rotary_pct=0.25,
        use_parallel_residual=True, max_position_embeddings=128,
    )
    torch.manual_seed(4)
    cfg = _parity(transformers.GPTNeoXForCausalLM(hf_cfg).eval().float())
    assert cfg.arch == "neox" and cfg.rotary_pct == 0.25
    assert cfg.parallel_block and not cfg.single_ln
