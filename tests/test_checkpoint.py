"""Checkpoint round-trip + CLI driver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache, init_params
from awq_tpu.models.llama import pseudo_quantize_params, quantize_params
from awq_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=128, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_checkpoint_roundtrip_fp(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "ckpt-fp")
    save_checkpoint(path, params, cfg)
    p2, cfg2, qcfg2 = load_checkpoint(path)
    assert cfg2 == cfg and qcfg2 is None
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    l1, _ = forward(params, cfg, tokens, cache, jnp.int32(0))
    l2, _ = forward(p2, cfg2, tokens, cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_checkpoint_roundtrip_quantized(tiny, tmp_path):
    cfg, params = tiny
    qcfg = QuantConfig(w_bit=4, group_size=64)
    qp = quantize_params(params, qcfg)
    path = str(tmp_path / "ckpt-q")
    save_checkpoint(path, qp, cfg, qcfg)
    p2, cfg2, qcfg2 = load_checkpoint(path)
    assert qcfg2 == qcfg
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    l1, _ = forward(qp, cfg, tokens, cache, jnp.int32(0))
    l2, _ = forward(p2, cfg2, tokens, cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_checkpoint_bf16_roundtrip(tmp_path):
    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=128, dtype="bfloat16",
    )
    params = init_params(cfg, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt-bf16")
    save_checkpoint(path, params, cfg)
    p2, _, _ = load_checkpoint(path)
    assert p2["embed"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(params["embed"].astype(jnp.float32)),
        np.asarray(p2["embed"].astype(jnp.float32)),
    )


def test_checkpoint_version_gate(tiny, tmp_path):
    import json

    cfg, params = tiny
    path = str(tmp_path / "ckpt-ver")
    save_checkpoint(path, params, cfg)
    meta = json.load(open(path + ".json"))
    meta["pack_layout_version"] = 99
    json.dump(meta, open(path + ".json", "w"))
    with pytest.raises(ValueError, match="pack layout"):
        load_checkpoint(path)


def test_pseudo_quantize_params_close(tiny):
    cfg, params = tiny
    qcfg = QuantConfig(w_bit=8, group_size=64)
    fq = pseudo_quantize_params(params, qcfg)
    w0 = np.asarray(params["layers"]["wq"].w)
    w1 = np.asarray(fq["layers"]["wq"].w)
    assert not np.array_equal(w0, w1)
    assert np.abs(w0 - w1).max() < 0.01  # 8-bit is near-lossless


def test_cli_quantize_and_reload(tiny, tmp_path):
    """entry.py end-to-end: save HF-style dir -> quantize -> reload."""
    from awq_tpu.entry import main

    cfg, params = tiny
    qp = quantize_params(params, QuantConfig(w_bit=4, group_size=64))
    path = str(tmp_path / "cli-ckpt")
    save_checkpoint(path, qp, cfg, QuantConfig(w_bit=4, group_size=64))
    assert main(["--load_quant", path]) == 0


def test_split_checkpoint_roundtrip(tiny, tmp_path):
    from awq_tpu.utils.checkpoint import (
        load_split_checkpoint,
        split_checkpoint,
    )

    cfg, params = tiny
    qp = quantize_params(params, QuantConfig(w_bit=4, group_size=64))
    path = str(tmp_path / "ckpt-split-src")
    save_checkpoint(path, qp, cfg, QuantConfig(w_bit=4, group_size=64))
    n = split_checkpoint(path, str(tmp_path / "split"))
    assert n > 10
    p2, cfg2, qcfg2 = load_split_checkpoint(str(tmp_path / "split"))
    assert cfg2 == cfg and qcfg2.w_bit == 4
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    l1, _ = forward(qp, cfg, tokens, cache, jnp.int32(0))
    l2, _ = forward(p2, cfg2, tokens, cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
