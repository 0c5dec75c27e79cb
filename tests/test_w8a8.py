"""W8A8 ops + SmoothQuant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.models.layers import Linear, layer_norm
from awq_tpu.ops.w8a8 import (
    W8A8Linear,
    fake_quant_w8a8,
    gelu_quant,
    layer_norm_quant,
    quant_per_token,
    silu_and_mul,
    w8a8_matmul,
)
from awq_tpu.quant.smooth import collect_act_stats, smooth_ln_fcs


def test_quant_per_token_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)
    q, s = quant_per_token(x)
    deq = q.astype(jnp.float32) * s
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(deq), np.asarray(x),
                               atol=float(np.abs(np.asarray(x)).max()) / 100)


def test_w8a8_matmul_close_to_fp():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (8, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 96), jnp.float32) * 0.05
    lin = W8A8Linear.from_linear(w)
    q_x, sx = quant_per_token(x)
    out = lin(q_x, sx, out_dtype=jnp.float32)
    ref = x @ w
    rel = np.abs(np.asarray(out) - np.asarray(ref)).max() / np.abs(ref).max()
    assert rel < 0.03, rel
    # fused bias variant (w8a8_gemm_fuse_bias counterpart)
    bias = jnp.ones((96,), jnp.float32)
    out_b = w8a8_matmul(q_x, sx, lin.qweight, lin.scale, bias, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out) + 1.0,
                               atol=1e-3)


def test_layer_norm_quant_matches_separate_ops():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64), jnp.float32)
    w = jnp.ones((64,)) * 1.5
    b = jnp.ones((64,)) * 0.1
    q, s = layer_norm_quant(x, w, b, 1e-5)
    ref = layer_norm(x, w, b, 1e-5)
    np.testing.assert_allclose(
        np.asarray(q.astype(jnp.float32) * s), np.asarray(ref), atol=0.05
    )


def test_gelu_quant_and_silu_mul():
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 32), jnp.float32)
    q, s = gelu_quant(x)
    ref = jax.nn.gelu(x, approximate=True)
    np.testing.assert_allclose(np.asarray(q.astype(jnp.float32) * s),
                               np.asarray(ref), atol=0.05)
    gu = jax.random.normal(jax.random.PRNGKey(5), (4, 64), jnp.float32)
    out = silu_and_mul(gu)
    ref = jax.nn.silu(gu[..., :32]) * gu[..., 32:]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fake_quant_matches_real_w8a8():
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(7), (64, 32), jnp.float32) * 0.1
    fake = fake_quant_w8a8(x, w)
    lin = W8A8Linear.from_linear(w)
    q_x, sx = quant_per_token(x)
    real = lin(q_x, sx, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(fake), np.asarray(real),
                               rtol=1e-4, atol=1e-4)


def test_smooth_ln_fcs_preserves_function():
    """Smoothing is a no-op on the fp function ln->fc."""
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (16, 64), jnp.float32)
    x = x.at[:, 3].multiply(30.0)  # outlier channel
    ln_w = jnp.ones((64,))
    ln_b = jnp.zeros((64,))
    fc = Linear(w=jax.random.normal(jax.random.PRNGKey(9), (64, 32)) * 0.1)

    def fwd(ln_w, ln_b, fc, x):
        return layer_norm(x, ln_w, ln_b, 1e-5) @ fc.w

    stats = collect_act_stats(
        lambda b: {"fc": layer_norm(b, ln_w, ln_b, 1e-5)}, [x]
    )
    nw, nb, (nfc,), s = smooth_ln_fcs(ln_w, ln_b, [fc], stats["fc"])
    assert float(s[3]) > float(jnp.median(s))  # outlier got scaled down
    np.testing.assert_allclose(
        np.asarray(fwd(ln_w, ln_b, fc, x)), np.asarray(fwd(nw, nb, nfc, x)),
        rtol=2e-4, atol=2e-4,
    )
    # and int8 quantization after smoothing is more accurate
    ref = fwd(ln_w, ln_b, fc, x)
    err_raw = np.abs(np.asarray(
        fake_quant_w8a8(layer_norm(x, ln_w, ln_b, 1e-5), fc.w)) - ref).mean()
    err_smooth = np.abs(np.asarray(
        fake_quant_w8a8(layer_norm(x, nw, nb, 1e-5), nfc.w)) - ref).mean()
    assert err_smooth < err_raw
