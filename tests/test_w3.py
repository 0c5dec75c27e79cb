"""True 3-bit runtime layout: packing, kernels, model integration.

The reference has NO INT3 runtime (``awq/quantize/qmodule.py:82`` asserts
w_bit==4); W3 decode streaming 0.75x of W4 bytes is a new capability.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.ops.w4a16 import (
    QLinear,
    qlinear_apply,
    qlinear_apply_stacked,
    quantize_linear,
    tile_qlinear,
    w3a16_matmul_stacked,
    w4a16_matmul_xla,
)
from awq_tpu.quant.packing import pack_int3, pack_int4, unpack_int3


def test_pack_int3_roundtrip():
    q = np.random.RandomState(0).randint(0, 8, (768, 256)).astype(np.uint8)
    p = pack_int3(jnp.asarray(q))
    assert p.shape == (768 * 3 // 32, 256)
    assert p.nbytes == pack_int4(jnp.asarray(q)).nbytes * 3 // 4
    assert (np.asarray(unpack_int3(p)) == q).all()


def test_pack_int3_requires_chunk_alignment():
    with pytest.raises(ValueError, match="256"):
        pack_int3(jnp.zeros((128, 8), jnp.uint8))


def test_quantize_linear_w3_dense_layout():
    w = jax.random.normal(jax.random.PRNGKey(0), (512, 256), jnp.float32)
    ql = quantize_linear(w, n_bit=3, group_size=128)
    assert ql.dense3 and ql.w_bit == 3
    assert ql.in_features == 512 and ql.out_features == 256
    assert ql.qweight.shape == (512 * 3 // 32, 256)

    # apply == explicit dequant matmul
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 512), jnp.float32)
    out = qlinear_apply(ql, x)
    codes = unpack_int3(ql.qweight, out_dtype=jnp.float32)
    wd = (codes.reshape(4, 128, 256) * ql.scales[:, None]
          - ql.szeros[:, None]).reshape(512, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ wd),
                               rtol=2e-5, atol=2e-5)


def test_quantize_linear_w3_nibble_fallback():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    ql = quantize_linear(w, n_bit=3, group_size=64)
    assert not ql.dense3                       # IC % 256 != 0
    assert ql.qweight.shape == (8, 128)        # nibble container
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64), jnp.float32)
    out = qlinear_apply(ql, x)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("group_size", [64, 128, 256, 512])
def test_w3_stacked_kernel_matches_xla(group_size):
    """Interpret-mode Pallas W3 kernel == XLA dequant reference, across
    the chunk/group alignment cases (groups per chunk and chunks per
    group)."""
    L, ic, oc = 2, 512, 256
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qw = jax.random.randint(k1, (L, ic * 3 // 32, oc), -(2 ** 31),
                            2 ** 31 - 1, jnp.int32)
    n_g = ic // group_size
    scales = jax.random.uniform(k2, (L, n_g, oc), jnp.float32, 0.1, 1.0)
    szeros = jax.random.uniform(k3, (L, n_g, oc), jnp.float32, -1.0, 1.0)
    x = jax.random.normal(k4, (3, ic), jnp.float32)
    for layer in range(L):
        out = w3a16_matmul_stacked(x, qw, scales, szeros,
                                   jnp.int32(layer), group_size,
                                   block_n=128)
        ref = w4a16_matmul_xla(x, qw[layer], scales[layer], szeros[layer],
                               group_size, dense3=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-3, atol=3e-3)


def test_w3_stacked_apply_and_tile_guard():
    w = jax.random.normal(jax.random.PRNGKey(3), (2, 512, 256), jnp.float32)
    qls = [quantize_linear(w[i], n_bit=3, group_size=128) for i in range(2)]
    stacked = QLinear(
        qweight=jnp.stack([q.qweight for q in qls]),
        scales=jnp.stack([q.scales for q in qls]),
        szeros=jnp.stack([q.szeros for q in qls]),
        w_bit=3, group_size=128, dense3=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 512), jnp.float32)
    for i in range(2):
        out = qlinear_apply_stacked(stacked, jnp.int32(i), x)
        ref = qlinear_apply(qls[i], x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    # plain (non-folded) tiling has no dense-3 layout — unchanged
    assert tile_qlinear(stacked, block_n=128, fold_scales=False) is stacked
    # the folded/tiled repack blockifies the bitplane rows + appends the
    # packed qparam band; results must match the plain path bit-for-bit
    folded = tile_qlinear(stacked, block_n=128, fold_scales=True)
    assert folded.folded and folded.dense3 and folded.tiled_bn == 128
    # w3x rows for n_g=4: no full chunk, 4 W4-nibble trailer groups
    # (16 rows each) + 4 qparam rows, padded to 72
    assert folded.qweight.shape == (2, 2, 72, 128)
    assert folded.in_features == 512 and folded.n_groups == 4
    for i in range(2):
        out = qlinear_apply_stacked(folded, jnp.int32(i), x)
        ref = qlinear_apply(qls[i], x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ic", [512, 768, 1280])
def test_w3_folded_kernel_matches_xla(ic):
    """Interpret-mode folded w3x Pallas kernel == XLA dequant (the TPU
    decode path for W3: ~0.82x of the W4 stream bytes at W4-equal unpack
    compute). 512 = trailer-only, 768 = one full 5-group chunk + one
    trailer group, 1280 = two full chunks."""
    from awq_tpu.ops.w4a16 import (untile_qweight,
                                   w3a16_matmul_stacked_tiled_folded)

    L, oc = 2, 256
    n_g = ic // 128
    w = jax.random.normal(jax.random.PRNGKey(6), (L, ic, oc), jnp.float32)
    qls = [quantize_linear(w[i], n_bit=3, group_size=128) for i in range(L)]
    stacked = QLinear(
        qweight=jnp.stack([q.qweight for q in qls]),
        scales=jnp.stack([q.scales for q in qls]),
        szeros=jnp.stack([q.szeros for q in qls]),
        w_bit=3, group_size=128, dense3=True,
    )
    folded = tile_qlinear(stacked, block_n=128, fold_scales=True)
    # byte check: w3x code rows = 64/5-group chunk + 16/trailer group —
    # always below the W4 nibble layout's 16 rows/group
    assert folded.qweight.shape[-2] < n_g * 16 + n_g + 8 or n_g < 5
    # the fold must invert back to the dense bitplane storage codec
    rt = untile_qweight(folded.qweight, 128, icp=ic * 3 // 32, dense3=True)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(stacked.qweight))
    for m in (1, 3):
        x = jax.random.normal(jax.random.PRNGKey(7 + m), (m, ic),
                              jnp.float32)
        for i in range(L):
            out = w3a16_matmul_stacked_tiled_folded(
                x, folded.qweight, jnp.int32(i), 128)
            # bf16 qparam rows in the folded band + bf16-rounded x in
            # the kernel: compare against the matching-rounded dequant
            codes = unpack_int3(qls[i].qweight, out_dtype=jnp.float32)
            s = qls[i].scales.astype(jnp.bfloat16).astype(jnp.float32)
            z = qls[i].szeros.astype(jnp.bfloat16).astype(jnp.float32)
            wd = (codes.reshape(n_g, 128, oc) * s[:, None]).reshape(ic, oc)
            xb = x.astype(jnp.bfloat16).astype(jnp.float32)
            ref = xb @ wd - (xb.reshape(m, n_g, 128).sum(2) @ z)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=5e-3, atol=5e-3)


def test_w3_folded_shard_specs_roundtrip():
    """param_pspecs must preserve ALL QLinear statics (n_groups!) or
    device_put fails on pytree aux-data mismatch — this broke multi-chip
    W3 until the spec builder switched to dataclasses.replace."""
    from awq_tpu.parallel.shard import param_pspecs

    w = jax.random.normal(jax.random.PRNGKey(11), (2, 512, 256),
                          jnp.float32)
    qls = [quantize_linear(w[i], n_bit=3, group_size=128)
           for i in range(2)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    folded = tile_qlinear(stacked, block_n=128, fold_scales=True)
    assert folded.n_groups == 4
    params = {"layers": {"wqkv": folded}}
    specs = param_pspecs(params, tp=2)
    # identical treedef (statics live in aux_data) is the property that
    # device_put(params, NamedSharding-tree) needs
    t1 = jax.tree_util.tree_structure(
        params, is_leaf=lambda x: x is None)
    t2 = jax.tree_util.tree_structure(
        specs, is_leaf=lambda x: x is None)
    assert t1 == t2


def test_w3_model_end_to_end(tmp_path):
    """quantize_params(w_bit=3) -> forward -> checkpoint roundtrip."""
    from awq_tpu.models import forward, init_kv_cache
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(5)),
                             QuantConfig(w_bit=3, group_size=128))
    assert params["layers"]["wq"].dense3
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    cache = init_kv_cache(cfg, 1, 32, jnp.float32)
    logits, cache = forward(params, cfg, tokens, cache, jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()

    path = str(tmp_path / "w3_ckpt")
    save_checkpoint(path, params, cfg)
    params2, cfg2, _ = load_checkpoint(path)
    assert params2["layers"]["wq"].dense3
    logits2, _ = forward(params2, cfg2, tokens,
                         init_kv_cache(cfg2, 1, 32, jnp.float32),
                         jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-5, atol=1e-5)
