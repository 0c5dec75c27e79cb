import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import init_params, init_kv_cache, forward, quantize_params
from awq_tpu.models.hf_import import import_hf_model


def tiny_cfg(**kw):
    base = dict(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position_embeddings=128, dtype="float32", rope_theta=10000.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_forward_shapes_and_decode_consistency():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 256)
    cache = init_kv_cache(cfg, 2, 32, jnp.float32)

    # full-sequence logits
    logits_all, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    assert logits_all.shape == (2, 12, 256)

    # prefill 8 + decode 4 must reproduce the full-forward logits
    logits_p, cache_p = forward(params, cfg, tokens[:, :8], cache, jnp.int32(0))
    np.testing.assert_allclose(
        np.asarray(logits_p[:, 0]), np.asarray(logits_all[:, 7]),
        rtol=2e-4, atol=2e-4,
    )
    c = cache_p
    for i in range(8, 12):
        step_logits, c = forward(params, cfg, tokens[:, i:i + 1], c, jnp.int32(i))
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(logits_all[:, i]),
            rtol=2e-4, atol=2e-4,
        )


def test_chunked_prefill_matches_whole_prefill():
    """Multi-round KV reuse: prefilling in chunks (history + new tokens) is
    identical to one-shot prefill — the reference's chunk-prefill feature
    (tinychat/models/llama.py:342-350)."""
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 256)
    cache = init_kv_cache(cfg, 1, 32, jnp.float32)

    one, _ = forward(params, cfg, tokens, cache, jnp.int32(0))
    _, c = forward(params, cfg, tokens[:, :5], cache, jnp.int32(0))
    _, c = forward(params, cfg, tokens[:, 5:11], c, jnp.int32(5))
    chunked, _ = forward(params, cfg, tokens[:, 11:], c, jnp.int32(11))
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(one), rtol=2e-4, atol=2e-4
    )


def test_parity_with_hf_llama():
    """Logit parity against transformers' LlamaForCausalLM on a tiny
    random-weight model (f32)."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_cfg).eval().float()

    cfg, params = import_hf_model(hf_model, dtype="float32")
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2

    tokens = np.random.RandomState(0).randint(0, 256, (2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens).long()).logits.numpy()

    cache = init_kv_cache(cfg, 2, 16, jnp.float32)
    ours, _ = forward(params, cfg, jnp.asarray(tokens), cache, jnp.int32(0),
                      last_only=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_parity_with_hf_qwen2():
    """Qwen2 = llama + qkv bias; parity check covers the bias path."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf_model = transformers.Qwen2ForCausalLM(hf_cfg).eval().float()
    cfg, params = import_hf_model(hf_model, dtype="float32")
    assert cfg.qkv_bias and params["layers"]["wq"].b is not None

    tokens = np.random.RandomState(1).randint(0, 256, (1, 9)).astype(np.int32)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens).long()).logits.numpy()
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    ours, _ = forward(params, cfg, jnp.asarray(tokens), cache, jnp.int32(0),
                      last_only=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)


def test_quantized_forward_runs_and_approximates_fp():
    cfg = tiny_cfg(hidden_size=256, intermediate_size=512, num_heads=4,
                   num_kv_heads=4, head_dim=64, vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(3))
    qparams = quantize_params(params, QuantConfig(w_bit=4, group_size=64))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, 128)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    fp, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    q, _ = forward(qparams, cfg, tokens, cache, jnp.int32(0), last_only=False)
    # same argmax on most positions and bounded drift
    agree = (np.asarray(fp.argmax(-1)) == np.asarray(q.argmax(-1))).mean()
    assert agree >= 0.7, agree
    rel = np.abs(np.asarray(q - fp)).max() / (np.abs(np.asarray(fp)).max() + 1e-9)
    assert rel < 0.35, rel


def test_fused_linears_match_unfused():
    """wqkv / wgateup fusion is a pure repacking: logits identical."""
    from awq_tpu.models.llama import fuse_linears

    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(5))
    fused = fuse_linears(params, cfg)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 10), 0, 256)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    a, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    b, _ = forward(fused, cfg, tokens, cache, jnp.int32(0), last_only=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)

    qparams = quantize_params(params, QuantConfig(w_bit=4, group_size=32))
    qfused = fuse_linears(qparams, cfg)
    a, _ = forward(qparams, cfg, tokens, cache, jnp.int32(0), last_only=False)
    b, _ = forward(qfused, cfg, tokens, cache, jnp.int32(0), last_only=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_int3_real_quant_forward():
    """W3A16 runtime (the reference ships INT3 only as pseudo-quant;
    qmodule.py:82 hard-asserts w_bit==4 — here the same packed container
    runs 3-bit codes end to end)."""
    cfg = tiny_cfg(hidden_size=256, intermediate_size=512, num_heads=4,
                   num_kv_heads=4, head_dim=64, vocab_size=128)
    params = init_params(cfg, jax.random.PRNGKey(7))
    qparams = quantize_params(params, QuantConfig(w_bit=3, group_size=64))
    assert qparams["layers"]["wq"].w_bit == 3
    tokens = jax.random.randint(jax.random.PRNGKey(8), (1, 8), 0, 128)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    fp, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    q, _ = forward(qparams, cfg, tokens, cache, jnp.int32(0), last_only=False)
    agree = (np.asarray(fp.argmax(-1)) == np.asarray(q.argmax(-1))).mean()
    assert agree >= 0.5, agree  # int3 is lossier than int4


def test_quantized_lm_head():
    """Opt-in lm_head quantization (>1 GB/token at 128k vocab in fp16)."""
    from awq_tpu.ops.w4a16 import QLinear

    cfg = tiny_cfg(hidden_size=256, intermediate_size=512, num_heads=4,
                   num_kv_heads=4, head_dim=64, vocab_size=256)
    params = init_params(cfg, jax.random.PRNGKey(11))
    qp = quantize_params(params, QuantConfig(w_bit=4, group_size=64),
                         quantize_lm_head=True)
    assert isinstance(qp["lm_head"], QLinear)
    tokens = jax.random.randint(jax.random.PRNGKey(12), (1, 8), 0, 256)
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    fp, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    q, _ = forward(qp, cfg, tokens, cache, jnp.int32(0), last_only=False)
    agree = (np.asarray(fp.argmax(-1)) == np.asarray(q.argmax(-1))).mean()
    assert agree >= 0.6, agree
