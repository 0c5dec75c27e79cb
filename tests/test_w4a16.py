import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.ops import QLinear, quantize_linear, qlinear_apply, w4a16_matmul
from awq_tpu.ops.w4a16 import w4a16_matmul_pallas, w4a16_matmul_xla
from awq_tpu.quant import quantize_groupwise, pack_int4, dequantize_groupwise


def _setup(ic, oc, g, n_bit=4, seed=0):
    kw, kx = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(kw, (ic, oc), jnp.float32) * 0.1
    q, s, z = quantize_groupwise(w, n_bit=n_bit, group_size=g)
    return pack_int4(q), s, s * z, dequantize_groupwise(q, s, z)


@pytest.mark.parametrize("m,ic,oc,g", [
    (1, 256, 128, 128),      # decode GEMV shape
    (7, 256, 128, 64),       # small-batch decode
    (64, 512, 256, 128),     # prefill GEMM
    (100, 512, 256, 128),    # non-tile-aligned M
    (16, 256, 128, 256),     # group spanning multiple chunks
    (4, 256, 128, -1),       # per-channel (whole-IC group)
])
def test_matmul_matches_dequant(m, ic, oc, g):
    gg = ic if g == -1 else g
    qw, s, sz, w_deq = _setup(ic, oc, gg)
    x = jax.random.normal(jax.random.PRNGKey(1), (m, ic), jnp.float32) * 0.5
    expect = x @ w_deq
    got = w4a16_matmul(x, qw, s, sz, group_size=gg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-2, atol=2e-2)


def test_pallas_interpret_matches_xla():
    """The Pallas kernel (interpreter mode on CPU) must agree with the XLA
    reference implementation to bf16-dot tolerance."""
    qw, s, sz, w_deq = _setup(512, 256, 128, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 512), jnp.bfloat16)
    ref = w4a16_matmul_xla(x, qw, s, sz, 128)
    got = w4a16_matmul_pallas(x, qw, s, sz, 128)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_qlinear_pytree_and_bias():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128), jnp.float32)
    b = jnp.ones((128,), jnp.float32)
    ql = quantize_linear(w, n_bit=4, group_size=128, bias=b)
    assert isinstance(jax.tree_util.tree_leaves(ql)[0], jax.Array)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256), jnp.float32)
    out = qlinear_apply(ql, x)
    assert out.shape == (4, 128)
    # bias actually applied
    out0 = qlinear_apply(QLinear(ql.qweight, ql.scales, ql.szeros, None,
                                 ql.w_bit, ql.group_size), x)
    np.testing.assert_allclose(np.asarray(out - out0), 1.0, rtol=1e-5)


def test_int3_runtime_same_container():
    qw, s, sz, w_deq = _setup(256, 128, 128, n_bit=3, seed=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 256), jnp.float32)
    got = w4a16_matmul(x, qw, s, sz, group_size=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w_deq),
                               rtol=2e-2, atol=2e-2)


def test_jit_under_vmap_batch_dims():
    qw, s, sz, w_deq = _setup(256, 128, 128, seed=6)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 256), jnp.float32)
    got = w4a16_matmul(x, qw, s, sz, group_size=128)
    assert got.shape == (2, 5, 128)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x @ w_deq), rtol=2e-2, atol=2e-2
    )


def test_w4a8_prefill_matmul_close_to_w4a16():
    """Int8-activation folded kernel == bf16 folded kernel within the
    int8 quantization budget (per-token act quant + per-column weight
    requant, each ~1/127 relative)."""
    import jax

    from awq_tpu.ops.w4a16 import (
        qlinear_apply_stacked, quantize_linear, tile_qlinear,
        w4a8_matmul_stacked_tiled_folded,
    )

    ic, oc, L = 256, 512, 2
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05)
        for k in jax.random.split(ks[0], L)]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    ql = tile_qlinear(ql, block_n=256, fold_scales=True)
    x = (jax.random.normal(ks[1], (96, ic), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)

    got = w4a8_matmul_stacked_tiled_folded(
        x, ql.qweight, jnp.int32(1), 128, 256)
    ref = qlinear_apply_stacked(ql, jnp.int32(1), x)
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    scale = np.abs(r).max()
    np.testing.assert_allclose(g / scale, r / scale, atol=0.04)
