"""AWQ search on non-llama architectures (gelu act-scale fold, falcon
single-LN joint group, MQA skip rules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_params
from awq_tpu.quant.awq import apply_awq, run_awq


def _cfg(**kw):
    base = dict(
        arch="opt", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=128, dtype="float32",
        norm="layernorm", act="gelu", pos_embed="learned",
        attn_bias=True, mlp_bias=True, tie_word_embeddings=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def _run(cfg, qcfg=QuantConfig(w_bit=4, group_size=32)):
    params = init_params(cfg, jax.random.PRNGKey(0))
    samples = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0,
                                 cfg.vocab_size)
    new_params, result = run_awq(params, cfg, samples, qcfg)
    return params, new_params, result


def _logits(params, cfg, tokens):
    cache = init_kv_cache(cfg, 1, 64, jnp.float32)
    out, _ = forward(params, cfg, tokens, cache, jnp.int32(0),
                     last_only=False)
    return np.asarray(out)


def test_awq_opt_gelu_act_scale():
    cfg = _cfg()
    params, new_params, result = _run(cfg)
    # act-scale fold must be recorded and materialized
    kinds = {tag.split(":")[0] for _, tag, _, _ in result.scale}
    assert "act" in kinds and "ln" in kinds
    assert "act_scale" in new_params["layers"]
    # fold is an equivalence transform: fp forward unchanged
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 128)
    np.testing.assert_allclose(
        _logits(params, cfg, tokens), _logits(new_params, cfg, tokens),
        rtol=2e-3, atol=2e-3,
    )


def test_awq_falcon_single_ln_joint_group():
    cfg = _cfg(
        arch="falcon", parallel_block=True, single_ln=True,
        num_kv_heads=1, pos_embed="rope", attn_bias=False, mlp_bias=False,
    )
    params, new_params, result = _run(cfg)
    # single joint ln group scaling qkv+up together; no v->o (MQA)
    tags = [(tag, names) for _, tag, names, _ in result.scale]
    assert ("ln:ln1", ("wq", "wk", "wv", "up")) in tags
    assert all(n != ("wo",) or not t.startswith("fc") for t, n in tags)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, 128)
    np.testing.assert_allclose(
        _logits(params, cfg, tokens), _logits(new_params, cfg, tokens),
        rtol=2e-3, atol=2e-3,
    )


def test_awq_mpt_alibi():
    cfg = _cfg(arch="mpt", pos_embed="alibi", attn_bias=False,
               mlp_bias=False)
    params, new_params, result = _run(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 16), 0, 128)
    np.testing.assert_allclose(
        _logits(params, cfg, tokens), _logits(new_params, cfg, tokens),
        rtol=2e-3, atol=2e-3,
    )


def test_awq_bloom():
    """Bloom (alibi + embed-LN + gelu_tanh + per-head qkv): the search
    folds are equivalence transforms; the v->o fc group IS searched here
    (split wq/wk/wv storage — the reference skips it only because its
    fused qkv buffer can't scale v channels alone, auto_scale.py:270-277)."""
    cfg = _cfg(arch="bloom", pos_embed="alibi", act="gelu_tanh",
               embed_ln=True)
    params, new_params, result = _run(cfg)
    kinds = {tag.split(":")[0] for _, tag, _, _ in result.scale}
    assert kinds == {"ln", "fc", "act"}
    tags = [(tag, names) for _, tag, names, _ in result.scale]
    assert ("fc:wv", ("wo",)) in tags
    tokens = jax.random.randint(jax.random.PRNGKey(5), (1, 16), 0, 128)
    np.testing.assert_allclose(
        _logits(params, cfg, tokens), _logits(new_params, cfg, tokens),
        rtol=2e-3, atol=2e-3,
    )


def test_bloom_engine_generate():
    """Quantized Bloom end-to-end through the InferenceEngine: embed-LN
    + alibi + gelu_tanh + per-head interleave survive quantize ->
    fuse_linears -> generate (greedy)."""
    from awq_tpu.config import GenConfig, RuntimeConfig
    from awq_tpu.models.llama import quantize_params
    from awq_tpu.models import init_params
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = _cfg(arch="bloom", pos_embed="alibi", act="gelu_tanh",
               embed_ln=True, num_layers=2)
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(9)),
                             QuantConfig(w_bit=4, group_size=32))
    eng = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=64),
                          cache_dtype=jnp.float32)
    out = eng.generate([5, 6, 7, 8], GenConfig(greedy=True,
                                               max_new_tokens=6))
    ids = np.asarray(out["output_ids"]).reshape(-1)
    assert ids.shape[0] >= 1
    assert ((0 <= ids) & (ids < cfg.vocab_size)).all()


def test_awq_apply_reproduces_search_transform():
    cfg = _cfg()
    params, new_params, result = _run(cfg)
    reapplied = apply_awq(init_params(cfg, jax.random.PRNGKey(0)), cfg, result)
    for name in ("wq", "up", "down"):
        np.testing.assert_allclose(
            np.asarray(new_params["layers"][name].w),
            np.asarray(reapplied["layers"][name].w),
            rtol=1e-5, atol=1e-5,
        )
    if "act_scale" in new_params["layers"]:
        np.testing.assert_allclose(
            np.asarray(new_params["layers"]["act_scale"]),
            np.asarray(reapplied["layers"]["act_scale"]),
            rtol=1e-5, atol=1e-5,
        )
