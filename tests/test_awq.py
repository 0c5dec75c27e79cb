import pytest

pytestmark = pytest.mark.heavy

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import init_params, init_kv_cache, forward, quantize_params
from awq_tpu.quant.awq import (
    AwqResult,
    apply_awq,
    clips_by_layer,
    run_awq,
    _clip_layer,
    _search_scale,
    _single_fn,
)
from awq_tpu.models.layers import Linear
from awq_tpu.quant.core import pseudo_quantize
from awq_tpu.utils.calib import get_calib_dataset


def outlier_cfg():
    return ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=32,
        max_position_embeddings=128, dtype="float32",
    )


def outlier_params(cfg, key, outlier_scale=30.0):
    """Random params whose activations have a few large channels — the
    regime AWQ is designed for."""
    params = init_params(cfg, key)
    params["embed"] = params["embed"].at[:, :4].multiply(outlier_scale)
    return params


def test_scale_search_reduces_quant_error():
    key = jax.random.PRNGKey(0)
    ic, oc, g = 64, 64, 32
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (512, ic), jnp.float32)
    x = x.at[:, :4].multiply(50.0)  # activation outliers
    qcfg = QuantConfig(w_bit=3, group_size=32)
    lin = {"w": Linear(w=w)}
    fn = _single_fn("w")
    s = _search_scale(fn, lin, x, qcfg)
    assert s.shape == (ic,)

    ref = x @ w
    wq_plain = pseudo_quantize(w, qcfg.w_bit, qcfg.group_size)
    err_plain = float(jnp.mean((x @ wq_plain - ref) ** 2))
    ws = pseudo_quantize(w * s[:, None], qcfg.w_bit, qcfg.group_size) / s[:, None]
    err_awq = float(jnp.mean((x @ ws - ref) ** 2))
    assert err_awq <= err_plain * 1.001, (err_awq, err_plain)
    # scales should up-weight the salient (outlier-activation) channels
    assert float(s[:4].mean()) > float(s[4:].mean())


def test_clip_layer_bounds_and_improvement():
    key = jax.random.PRNGKey(2)
    ic, oc = 64, 64
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.1
    # heavy-tailed weights so clipping helps
    w = w.at[0, 0].set(3.0)
    x = jax.random.normal(jax.random.PRNGKey(3), (600, ic), jnp.float32)
    qcfg = QuantConfig(w_bit=3, group_size=32)
    mv = _clip_layer(w, x, qcfg)
    assert mv.shape == (ic // 32, oc)
    wg = np.abs(np.asarray(w)).reshape(2, 32, oc).max(1)
    assert (np.asarray(mv) <= wg + 1e-6).all()
    assert (np.asarray(mv) >= wg * 0.549).all()  # max shrink 0.45 of 20-grid


def test_run_awq_and_apply_awq_roundtrip():
    cfg = outlier_cfg()
    params = outlier_params(cfg, jax.random.PRNGKey(0))
    samples = get_calib_dataset("synthetic", n_samples=4, block_size=32,
                                vocab_size=cfg.vocab_size)
    qcfg = QuantConfig(w_bit=4, group_size=32)
    new_params, result = run_awq(params, cfg, jnp.asarray(samples), qcfg)

    n_groups_per_layer = 4  # ln1->qkv, v->o, ln2->gate/up, up->down
    assert len(result.scale) == cfg.num_layers * n_groups_per_layer
    assert len(result.clip) == cfg.num_layers * 5  # v,o,gate,up,down

    # applying cached results to fresh params reproduces the transform
    replay = apply_awq(params, cfg, result)
    a = jax.tree_util.tree_leaves(new_params["layers"])
    b = jax.tree_util.tree_leaves(replay["layers"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)

    # save/load roundtrip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "awq.pkl")
        result.save(p)
        r2 = AwqResult.load(p)
        assert len(r2.scale) == len(result.scale)
        np.testing.assert_array_equal(r2.scale[0][3], result.scale[0][3])


def test_awq_transform_preserves_fp_function():
    """Scale folding must leave the *unquantized* model function unchanged
    (LN/prev-op division cancels the linear multiplication)."""
    cfg = outlier_cfg()
    params = outlier_params(cfg, jax.random.PRNGKey(1))
    samples = get_calib_dataset("synthetic", n_samples=2, block_size=16,
                                vocab_size=cfg.vocab_size)
    qcfg = QuantConfig(w_bit=4, group_size=32)
    new_params, _ = run_awq(params, cfg, jnp.asarray(samples), qcfg,
                            mse_range=False)
    toks = jnp.asarray(samples[:1, :16].astype(np.int32))
    cache = init_kv_cache(cfg, 1, 16, jnp.float32)
    ref, _ = forward(params, cfg, toks, cache, jnp.int32(0), last_only=False)
    got, _ = forward(new_params, cfg, toks, cache, jnp.int32(0), last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_awq_improves_quantized_model():
    cfg = outlier_cfg()
    params = outlier_params(cfg, jax.random.PRNGKey(4), outlier_scale=40.0)
    samples = jnp.asarray(get_calib_dataset(
        "synthetic", n_samples=4, block_size=32, vocab_size=cfg.vocab_size))
    qcfg = QuantConfig(w_bit=3, group_size=32)

    toks = samples[:2, :32].astype(jnp.int32)
    cache = init_kv_cache(cfg, 2, 32, jnp.float32)
    ref, _ = forward(params, cfg, toks, cache, jnp.int32(0), last_only=False)

    def quant_err(p, clips=None):
        qp = quantize_params(p, qcfg, clips=clips)
        out, _ = forward(qp, cfg, toks, cache, jnp.int32(0), last_only=False)
        return float(jnp.mean((out - ref) ** 2))

    err_plain = quant_err(params)
    awq_params, result = run_awq(params, cfg, samples, qcfg)
    err_awq = quant_err(awq_params, clips=clips_by_layer(result, cfg))
    assert err_awq < err_plain, (err_awq, err_plain)


def test_poisoned_calibration_fails_loudly():
    """A NaN in the calibration stream must raise, not silently produce
    garbage scales (reference guard: auto_scale.py:47-51,155)."""
    import pytest

    cfg = outlier_cfg()
    params = outlier_params(cfg, jax.random.PRNGKey(5))
    params["embed"] = params["embed"].at[0, 0].set(jnp.nan)
    samples = np.zeros((2, 16), np.int32)  # token 0 -> NaN embedding row
    qcfg = QuantConfig(w_bit=4, group_size=32)
    with pytest.raises(FloatingPointError):
        run_awq(params, cfg, jnp.asarray(samples), qcfg)
