"""Whole-layer decode megakernel vs a composed XLA reference (interpret
mode). Geometry uses the kernel's constraints: head_dim=128, group 128."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models.layers import rms_norm
from awq_tpu.ops.megakernel import (
    megakernel_supported,
    w4a16_llama_layer_step,
    w4a16_llama_token_step,
)
from awq_tpu.ops.w4a16 import (
    QLinear, qlinear_apply, quantize_linear, tile_qlinear, untile_qweight,
    w4a16_matmul_xla,
)


def _mk_qlin(key, ic, oc, bn):
    w = jax.random.normal(key, (ic, oc), jnp.float32) * 0.05
    return tile_qlinear(
        jax.tree_util.tree_map(lambda a: a[None], quantize_linear(w)),
        block_n=bn, fold_scales=True,
    )


def _apply(ql: QLinear, x):
    qw = untile_qweight(ql.qweight[0], ql.tiled_bn,
                        icp=ql.in_features // 8)
    # the folded layout stores bf16 scales/szeros — round the oracle's
    # the same way so tolerances stay tight
    rnd = lambda a: a[0].astype(jnp.bfloat16).astype(jnp.float32)
    return w4a16_matmul_xla(x, qw, rnd(ql.scales), rnd(ql.szeros), 128)


@pytest.mark.parametrize("nq,nkv,length", [(2, 2, 37), (4, 2, 200),
                                           (2, 2, 0)])
def test_megakernel_matches_xla_reference(nq, nkv, length):
    hd, L, T = 128, 2, 256
    H = nq * hd
    I = 256
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    wqkv = _mk_qlin(ks[0], H, (nq + 2 * nkv) * hd, 128)
    wo = _mk_qlin(ks[1], H, H, 128)
    wgu = _mk_qlin(ks[2], H, 2 * I, 128)
    wdn = _mk_qlin(ks[3], I, H, 128)
    ln1 = jnp.ones((L, H), jnp.float32) * 1.1
    ln2 = jnp.ones((L, H), jnp.float32) * 0.9
    cache = jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd),
                              jnp.float32) * 0.2
    h = jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
    cos = jnp.cos(jnp.arange(hd, dtype=jnp.float32))[None] * 0.0 + 0.8
    sin = jnp.sqrt(1 - cos * cos)
    layer, pos = jnp.int32(1), jnp.int32(length)

    got_h, got_k, got_v = w4a16_llama_layer_step(
        h, wqkv, wo, wgu, wdn, ln1, ln2, cos[0], sin[0], cache,
        layer, pos, nq=nq, nkv=nkv, eps=1e-5, interpret=True,
    )

    # ---- reference: composed XLA ops -------------------------------------
    x = rms_norm(h, ln1[1], 1e-5)
    qkv = _apply(wqkv, x)[0]
    q = qkv[: nq * hd].reshape(nq, hd)
    kk = qkv[nq * hd: (nq + nkv) * hd].reshape(nkv, hd)
    v = qkv[(nq + nkv) * hd:].reshape(nkv, hd)

    def rot(a):
        half = hd // 2
        r = jnp.concatenate([-a[:, half:], a[:, :half]], axis=-1)
        return a * cos + r * sin

    q, kk = rot(q), rot(kk)
    # kernel dots run in bf16 (MXU) and the folded layout stores bf16
    # scales/szeros; the XLA oracle is all-f32
    np.testing.assert_allclose(np.asarray(got_k[0]), np.asarray(kk),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_v[0]), np.asarray(v),
                               rtol=2e-2, atol=2e-2)

    grp = nq // nkv
    kc = jnp.concatenate([cache[1, 0, 0, :, :length, :], kk[:, None]],
                         axis=1)                     # [nkv, len+1, hd]
    vc = jnp.concatenate([cache[1, 1, 0, :, :length, :], v[:, None]], axis=1)
    qg = q.reshape(nkv, grp, hd) / jnp.sqrt(hd)
    s = jnp.einsum("kgh,kth->kgt", qg, kc)
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("kgt,kth->kgh", p, vc).reshape(1, H)
    h1 = h + _apply(wo, attn)
    xm = rms_norm(h1, ln2[1], 1e-5)
    gu = _apply(wgu, xm)[0]
    gate, up = gu[:I], gu[I:]
    hm = (jax.nn.silu(gate) * up)[None]
    ref = h1 + _apply(wdn, hm)

    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_token_step_matches_sequential_layer_steps():
    """The whole-token kernel == composing the per-layer kernel over all
    layers with per-layer cache appends (both interpret mode)."""
    nq = nkv = 2
    hd, L, T, I = 128, 3, 256, 256
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    wqkv = _mk_qlin_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = _mk_qlin_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin_l(ks[3], I, H, 128, L)
    ln1 = jax.random.uniform(ks[6], (L, H), jnp.float32, 0.8, 1.2)
    ln2 = jax.random.uniform(ks[7], (L, H), jnp.float32, 0.8, 1.2)
    length = 65
    cache = (jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.6, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)

    got_h, got_k, got_v = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln1, ln2, cos, sin, cache,
        jnp.int32(length), nq=nq, nkv=nkv, eps=1e-5, interpret=True,
    )

    hh = h
    ref_k, ref_v = [], []
    for l in range(L):
        hh, kn, vn = w4a16_llama_layer_step(
            hh, wqkv, wo, wgu, wdn, ln1, ln2, cos, sin, cache,
            jnp.int32(l), jnp.int32(length), nq=nq, nkv=nkv, eps=1e-5,
            interpret=True,
        )
        hh = hh.astype(jnp.bfloat16)
        ref_k.append(kn[0])
        ref_v.append(vn[0])

    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(hh, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_k, np.float32),
                               np.asarray(jnp.stack(ref_k), np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_v, np.float32),
                               np.asarray(jnp.stack(ref_v), np.float32),
                               rtol=2e-2, atol=2e-2)


def _mk_qlin_l(key, ic, oc, bn, L):
    # distinct weights per layer — catches cross-layer indexing bugs
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05)
        for k in jax.random.split(key, L)]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


def test_megakernel_supported_gate():
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
        max_position_embeddings=512,
    )
    k = jax.random.PRNGKey(1)
    layers = {
        "wqkv": _mk_qlin(k, 256, 768, 128),
        "wo": _mk_qlin(k, 256, 256, 128),
        "wgateup": _mk_qlin(k, 256, 512, 128),
        "down": _mk_qlin(k, 256, 256, 128),
    }
    cache = jnp.zeros((2, 2, 1, 2, 256, 128), jnp.bfloat16)
    assert megakernel_supported(cfg, layers, cache)
    # int8 caches are supported (round 2: in-kernel dequant read path)
    assert megakernel_supported(
        cfg, layers, jnp.zeros((2, 2, 1, 2, 256, 128), jnp.int8))
    # batch>1, untiled weights, odd head_dim disqualify
    assert not megakernel_supported(
        cfg, layers, jnp.zeros((2, 2, 3, 2, 256, 128), jnp.bfloat16))
    import dataclasses

    cfg64 = dataclasses.replace(cfg, head_dim=64)
    assert not megakernel_supported(cfg64, layers, cache)
    untiled = dict(layers)
    untiled["down"] = QLinear(
        qweight=untile_qweight(layers["down"].qweight, 128,
                               icp=layers["down"].in_features // 8),
        scales=layers["down"].scales, szeros=layers["down"].szeros,
    )
    assert not megakernel_supported(cfg, untiled, cache)
    # unfolded tiled weights also disqualify (kernel reads bitcast rows)
    import awq_tpu.ops.w4a16 as w4
    plain = {k: w4.tile_qlinear(QLinear(
        qweight=untile_qweight(v.qweight, v.tiled_bn,
                               icp=v.in_features // 8),
        scales=v.scales, szeros=v.szeros), block_n=128)
        for k, v in layers.items()}
    assert not megakernel_supported(cfg, plain, cache)


def test_token_step_with_qkv_bias():
    """qwen2-style QKV bias flows through the token kernel (added before
    rope, HF order)."""
    nq = nkv = 2
    hd, L, T, I = 128, 2, 256, 256
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(9), 9)
    wqkv = _mk_qlin_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    bias = jax.random.normal(ks[8], (L, (nq + 2 * nkv) * hd),
                             jnp.float32) * 0.1
    import dataclasses as _dc

    wqkv = _dc.replace(wqkv, bias=bias)
    wo = _mk_qlin_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin_l(ks[3], I, H, 128, L)
    ln = jnp.ones((L, H), jnp.float32)
    cache = (jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)

    got_h, got_k, got_v = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
        jnp.int32(17), nq=nq, nkv=nkv, eps=1e-5, interpret=True,
    )
    # reference: same kernel with zero bias + manual bias effect on v only
    # is nontrivial; instead compare vs per-layer XLA composition
    x = rms_norm(h, ln[0], 1e-5)
    qkv = _apply(wqkv, x)[0] + bias[0]
    v_ref = qkv[(nq + nkv) * hd:].reshape(nkv, hd)
    np.testing.assert_allclose(np.asarray(got_v[0], np.float32),
                               np.asarray(v_ref), rtol=2e-2, atol=2e-2)
    # k gets rope after bias
    kk = qkv[nq * hd:(nq + nkv) * hd].reshape(nkv, hd)
    half = hd // 2
    rot = jnp.concatenate([-kk[:, half:], kk[:, :half]], axis=-1)
    k_ref = kk * cos + rot * sin
    np.testing.assert_allclose(np.asarray(got_k[0], np.float32),
                               np.asarray(k_ref), rtol=2e-2, atol=2e-2)


def test_token_step_int8_cache_matches_fp():
    """int8-KV token step == fp16-cache run on the dequantized values
    (within int8 quantization error)."""
    from awq_tpu.models.llama import quantize_kv

    nq = nkv = 2
    hd, L, T, I = 128, 2, 256, 256
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(21), 8)
    wqkv = _mk_qlin_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = _mk_qlin_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin_l(ks[3], I, H, 128, L)
    ln = jnp.ones((L, H), jnp.float32)
    kv = jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32) * 0.2
    kvq, kvs = quantize_kv(kv)
    kv_deq = (kvq.astype(jnp.float32) * kvs[..., None]).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    args = dict(nq=nq, nkv=nkv, eps=1e-5, interpret=True)

    got = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, kvq,
        jnp.int32(100), cache_scales=kvs, **args)
    ref = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, kv_deq,
        jnp.int32(100), **args)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-2, atol=2e-2)


def _mk_qlin3_l(key, ic, oc, bn, L):
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05, n_bit=3)
        for k in jax.random.split(key, L)]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    assert ql.dense3
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


def _apply3(ql: QLinear, x, layer=0):
    qw = untile_qweight(ql.qweight[layer], ql.tiled_bn,
                        icp=ql.in_features * 3 // 32, dense3=True)
    rnd = lambda a: a[layer].astype(jnp.bfloat16).astype(jnp.float32)
    return w4a16_matmul_xla(x, qw, rnd(ql.scales), rnd(ql.szeros), 128,
                            dense3=True)


def test_layer_step_dense3_matches_xla():
    """The dense-3 (w3x) megakernel phase == composed XLA ops. I=768
    makes the down matmul's IC span one full 5-group chunk AND a W4
    trailer group (n_g=6); the H=256 matmuls are trailer-only."""
    nq = nkv = 2
    hd, L, T, I = 128, 2, 256, 768
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(41), 8)
    wqkv = _mk_qlin3_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = _mk_qlin3_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin3_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin3_l(ks[3], I, H, 128, L)
    ln1 = jnp.ones((L, H), jnp.float32) * 1.1
    ln2 = jnp.ones((L, H), jnp.float32) * 0.9
    cache = jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd),
                              jnp.float32) * 0.2
    h = jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    length = 37

    got_h, got_k, got_v = w4a16_llama_layer_step(
        h, wqkv, wo, wgu, wdn, ln1, ln2, cos, sin, cache,
        jnp.int32(1), jnp.int32(length), nq=nq, nkv=nkv, eps=1e-5,
        interpret=True,
    )

    x = rms_norm(h, ln1[1], 1e-5)
    qkv = _apply3(wqkv, x, 1)[0]
    q = qkv[: nq * hd].reshape(nq, hd)
    kk = qkv[nq * hd: (nq + nkv) * hd].reshape(nkv, hd)
    v = qkv[(nq + nkv) * hd:].reshape(nkv, hd)
    half = hd // 2
    rot = lambda a: (a * cos + jnp.concatenate(
        [-a[:, half:], a[:, :half]], axis=-1) * sin)
    q, kk = rot(q), rot(kk)
    np.testing.assert_allclose(np.asarray(got_k[0]), np.asarray(kk),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_v[0]), np.asarray(v),
                               rtol=2e-2, atol=2e-2)
    kc = jnp.concatenate([cache[1, 0, 0, :, :length, :], kk[:, None]],
                         axis=1)
    vc = jnp.concatenate([cache[1, 1, 0, :, :length, :], v[:, None]],
                         axis=1)
    qg = q.reshape(nkv, nq // nkv, hd) / jnp.sqrt(hd)
    p = jax.nn.softmax(jnp.einsum("kgh,kth->kgt", qg, kc), axis=-1)
    attn = jnp.einsum("kgt,kth->kgh", p, vc).reshape(1, H)
    h1 = h + _apply3(wo, attn, 1)
    xm = rms_norm(h1, ln2[1], 1e-5)
    gu = _apply3(wgu, xm, 1)[0]
    hm = (jax.nn.silu(gu[:I]) * gu[I:])[None]
    ref = h1 + _apply3(wdn, hm, 1)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_token_step_dense3_matches_layer_steps():
    """Whole-token kernel in dense-3 mode == sequential dense-3 layer
    steps, including an in-kernel dense-3 lm_head phase."""
    nq = nkv = 2
    hd, L, T, I, V = 128, 2, 256, 256, 512
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(43), 9)
    wqkv = _mk_qlin3_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = _mk_qlin3_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin3_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin3_l(ks[3], I, H, 128, L)
    whead = _mk_qlin3_l(ks[6], H, V, 128, 1)     # stacked L=1, ndim 4
    norm_w = jax.random.uniform(ks[7], (H,), jnp.float32, 0.8, 1.2)
    ln = jnp.ones((L, H), jnp.float32)
    cache = (jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.6, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    length = 65
    kw = dict(nq=nq, nkv=nkv, eps=1e-5, interpret=True)

    got_h, got_k, got_v, logits = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
        jnp.int32(length), whead=whead, norm_w=norm_w, **kw)

    hh = h
    for l in range(L):
        hh, _, _ = w4a16_llama_layer_step(
            hh, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
            jnp.int32(l), jnp.int32(length), **kw)
        hh = hh.astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(hh, np.float32),
                               rtol=2e-2, atol=2e-2)
    xf = rms_norm(hh, norm_w, 1e-5)
    ref_logits = _apply3(whead, xf)
    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_megakernel_gate_dense3():
    """dense3 qualifies only uniformly (body+head same layout) and with
    even group counts (the kernel unpacks 256-IC chunks)."""
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
        max_position_embeddings=512,
    )
    k = jax.random.PRNGKey(2)
    mk3 = lambda key, ic, oc: _mk_qlin3_l(key, ic, oc, 128, 1)
    layers3 = {
        "wqkv": mk3(k, 256, 768), "wo": mk3(k, 256, 256),
        "wgateup": mk3(k, 256, 512), "down": mk3(k, 256, 256),
    }
    cache = jnp.zeros((2, 2, 1, 2, 256, 128), jnp.bfloat16)
    assert megakernel_supported(cfg, layers3, cache)
    # mixed W4 body / dense3 member disqualifies
    mixed = dict(layers3)
    mixed["down"] = _mk_qlin(k, 256, 256, 128)
    assert not megakernel_supported(cfg, mixed, cache)


def test_token_step_with_inkernel_head():
    """The in-kernel final-norm + lm_head phase == XLA norm + head."""
    nq = nkv = 2
    hd, L, T, I, V = 128, 2, 256, 256, 512
    H = nq * hd
    ks = jax.random.split(jax.random.PRNGKey(31), 9)
    wqkv = _mk_qlin_l(ks[0], H, (nq + 2 * nkv) * hd, 128, L)
    wo = _mk_qlin_l(ks[1], H, H, 128, L)
    wgu = _mk_qlin_l(ks[2], H, 2 * I, 128, L)
    wdn = _mk_qlin_l(ks[3], I, H, 128, L)
    whead = _mk_qlin(ks[6], H, V, 128)
    norm_w = jax.random.uniform(ks[7], (H,), jnp.float32, 0.8, 1.2)
    ln = jnp.ones((L, H), jnp.float32)
    cache = (jax.random.normal(ks[4], (L, 2, 1, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[5], (1, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    cos = jnp.full((hd,), 0.8, jnp.float32)
    sin = jnp.sqrt(1 - cos * cos)
    kw = dict(nq=nq, nkv=nkv, eps=1e-5, interpret=True)

    got_h, _, _, logits = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
        jnp.int32(40), whead=whead, norm_w=norm_w, **kw)
    ref_h, _, _ = w4a16_llama_token_step(
        h, wqkv, wo, wgu, wdn, ln, ln, cos, sin, cache,
        jnp.int32(40), **kw)
    np.testing.assert_allclose(np.asarray(got_h, np.float32),
                               np.asarray(ref_h, np.float32),
                               rtol=2e-2, atol=2e-2)
    xf = rms_norm(ref_h.astype(jnp.bfloat16), norm_w, 1e-5)
    ref_logits = _apply(whead, xf)
    np.testing.assert_allclose(np.asarray(logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=3e-2, atol=3e-2)
