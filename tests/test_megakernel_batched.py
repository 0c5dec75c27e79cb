"""Batched whole-token megakernel (interpret mode) vs the single-token
megakernel run per row — same weights, per-row lengths/rope.

The reference serves batch 1 only; the batched kernel is what takes the
continuous-batching engine from ~160 Pallas launches/step to 1 (measured
B=8: 16.6 -> 7.8 ms/step, B=16: 26.1 -> 10.3 on the v5e chip).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig
from awq_tpu.models.layers import rms_norm
from awq_tpu.ops.megakernel import w4a16_llama_token_step
from awq_tpu.ops.megakernel_batched import (
    megakernel_batched_supported,
    w4a16_llama_token_step_batched,
)
from awq_tpu.ops.w4a16 import QLinear, quantize_linear, tile_qlinear


def _mk(key, ic, oc, L, n_bit=4):
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05, n_bit=n_bit)
        for k in jax.random.split(key, L)]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    return tile_qlinear(ql, block_n=128, fold_scales=True)


def _setup(n_bit=4):
    B, nq, nkv, hd, L, T, I = 8, 2, 2, 128, 2, 256, 256
    H = nq * hd
    if n_bit == 3:
        I = 512            # dense3 needs IC % 256 == 0 for the down proj
    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    parts = dict(
        wqkv=_mk(ks[0], H, (nq + 2 * nkv) * hd, L, n_bit),
        wo=_mk(ks[1], H, H, L, n_bit),
        wgu=_mk(ks[2], H, 2 * I, L, n_bit),
        wdn=_mk(ks[3], I, H, L, n_bit),
        ln1=jax.random.uniform(ks[4], (L, H), jnp.float32, 0.8, 1.2),
        ln2=jax.random.uniform(ks[5], (L, H), jnp.float32, 0.8, 1.2),
    )
    cache = (jax.random.normal(ks[6], (L, 2, B, nkv, T, hd), jnp.float32)
             * 0.2).astype(jnp.bfloat16)
    h = (jax.random.normal(ks[7], (B, H), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)
    lengths = jnp.array([37, 0, 65, 200, 5, 255, 128, 17], jnp.int32)
    base = jnp.arange(hd // 2, dtype=jnp.float32)
    inv = 1.0 / (10000.0 ** (2 * base / hd))
    ang = lengths[:, None].astype(jnp.float32) * inv[None, :]
    cos = jnp.concatenate([jnp.cos(ang)] * 2, axis=1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, axis=1)
    return B, nq, nkv, parts, cache, h, lengths, cos, sin


@pytest.mark.parametrize("n_bit", [4, 3])
def test_batched_token_step_matches_per_row(n_bit):
    """Batched kernel == single-token kernel per row (both interpret),
    for the W4 nibble AND the w3x dense3 layouts."""
    B, nq, nkv, p, cache, h, lengths, cos, sin = _setup(n_bit)
    got_h, got_k, got_v = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, cache, lengths, nq=nq, nkv=nkv, eps=1e-5,
        interpret=True)
    for b in range(0, B, 3):
        rh, rk, rv = w4a16_llama_token_step(
            h[b:b + 1], p["wqkv"], p["wo"], p["wgu"], p["wdn"],
            p["ln1"], p["ln2"], cos[b], sin[b], cache[:, :, b:b + 1],
            lengths[b], nq=nq, nkv=nkv, eps=1e-5, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_h[b:b + 1], np.float32),
            np.asarray(rh, np.float32), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got_k[:, b], np.float32),
            np.asarray(rk, np.float32), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(got_v[:, b], np.float32),
            np.asarray(rv, np.float32), rtol=2e-2, atol=2e-2)


def test_batched_token_step_with_head():
    """In-kernel final rmsnorm + quantized lm_head for all B rows."""
    B, nq, nkv, p, cache, h, lengths, cos, sin = _setup()
    H, V = h.shape[1], 512
    whead = _mk(jax.random.PRNGKey(9), H, V, 1)
    norm_w = jax.random.uniform(jax.random.PRNGKey(10), (H,),
                                jnp.float32, 0.8, 1.2)
    got_h, _, _, logits = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, cache, lengths, nq=nq, nkv=nkv, eps=1e-5,
        interpret=True, whead=whead, norm_w=norm_w)
    assert logits.shape == (B, V)
    for b in (1, 6):
        rh, _, _, rl = w4a16_llama_token_step(
            h[b:b + 1], p["wqkv"], p["wo"], p["wgu"], p["wdn"],
            p["ln1"], p["ln2"], cos[b], sin[b], cache[:, :, b:b + 1],
            lengths[b], nq=nq, nkv=nkv, eps=1e-5, interpret=True,
            whead=whead, norm_w=norm_w)
        np.testing.assert_allclose(
            np.asarray(logits[b], np.float32),
            np.asarray(rl[0], np.float32), rtol=3e-2, atol=3e-2)


def test_batched_token_step_int8_cache_matches_fp():
    """int8-KV batched step == fp-cache run on the dequantized values
    (within int8 quantization error)."""
    from awq_tpu.models.llama import quantize_kv

    B, nq, nkv, p, cache, h, lengths, cos, sin = _setup()
    kv = cache.astype(jnp.float32)
    kvq, kvs = quantize_kv(kv)
    kv_deq = (kvq.astype(jnp.float32) * kvs[..., None]).astype(
        jnp.bfloat16)
    T = cache.shape[4]
    args = dict(nq=nq, nkv=nkv, eps=1e-5, interpret=True)
    got = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, kvq, lengths,
        cache_scales=kvs.reshape(*kvs.shape[:4], T // 256, 256), **args)
    ref = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, kv_deq, lengths, **args)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_batched_token_step_paged_matches_contiguous():
    """Paged mode (block-table DMA over a shuffled page pool) == the
    contiguous cache run, bit for bit."""
    B, nq, nkv, p, cache, h, lengths, cos, sin = _setup()
    L, _, _, _, T, hd = cache.shape
    page = 256
    npg = T // page                                 # pages per row
    n_pages = 1 + B * npg                           # + trash page 0
    # scatter each row's cache blocks to shuffled physical pages
    rng = np.random.RandomState(0)
    perm = rng.permutation(B * npg) + 1
    tables = np.zeros((B, npg), np.int32)
    pool = np.zeros((L, 2, n_pages, nkv, page, hd), np.float32)
    cnp = np.asarray(cache, np.float32)
    for b in range(B):
        for i in range(npg):
            pid = perm[b * npg + i]
            tables[b, i] = pid
            pool[:, :, pid] = cnp[:, :, b, :, i * page:(i + 1) * page]
    pool = jnp.asarray(pool).astype(cache.dtype)
    args = dict(nq=nq, nkv=nkv, eps=1e-5, interpret=True)

    got = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, pool, lengths, tables=jnp.asarray(tables), **args)
    ref = w4a16_llama_token_step_batched(
        h, p["wqkv"], p["wo"], p["wgu"], p["wdn"], p["ln1"], p["ln2"],
        cos, sin, cache, lengths, **args)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_batched_supported_gate():
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=512,
    )
    k = jax.random.PRNGKey(1)
    layers = {
        "wqkv": _mk(k, 256, 768, 1), "wo": _mk(k, 256, 256, 1),
        "wgateup": _mk(k, 256, 512, 1), "down": _mk(k, 256, 256, 1),
    }
    mk_cache = lambda b, dt: jnp.zeros((2, 2, b, 2, 256, 128), dt)
    assert megakernel_batched_supported(cfg, layers, mk_cache(8, jnp.bfloat16), 8)
    assert megakernel_batched_supported(cfg, layers, mk_cache(16, jnp.bfloat16), 16)
    # aliased bf16 scratch pool + per-kernel raised scoped-vmem limit
    # admit B=24..64 (measured on-chip at the 7B geometry)
    assert megakernel_batched_supported(cfg, layers, mk_cache(24, jnp.bfloat16), 24)
    assert megakernel_batched_supported(cfg, layers, mk_cache(32, jnp.bfloat16), 32)
    assert megakernel_batched_supported(cfg, layers, mk_cache(64, jnp.bfloat16), 64)
    # int8 caches ride the kernel too (scale DMAs + in-kernel dequant)
    assert megakernel_batched_supported(cfg, layers, mk_cache(8, jnp.int8), 8)
    # B must be a multiple of 8 (row stores land on sublane tiles) and
    # <=64, the cache slot axis must match
    assert not megakernel_batched_supported(cfg, layers, mk_cache(4, jnp.bfloat16), 4)
    assert not megakernel_batched_supported(cfg, layers, mk_cache(72, jnp.bfloat16), 72)
    assert not megakernel_batched_supported(cfg, layers, mk_cache(8, jnp.bfloat16), 16)
