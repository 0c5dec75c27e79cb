"""Flash-decode kernel vs jnp reference equivalence (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.models.layers import attention
from awq_tpu.ops.decode_attn import flash_decode


def _ref(q, k_cache, v_cache, length):
    """Masked softmax attention over the cache prefix, f32."""
    b, n_q, hd = q.shape
    n_kv, t = k_cache.shape[1], k_cache.shape[2]
    g = n_q // n_kv
    qf = q.reshape(b, n_kv, g, hd).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    s = jnp.einsum("bkgh,bkth->bkgt", qf, kf) / np.sqrt(hd)
    mask = jnp.arange(t)[None, None, None, :] < length
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgt,bkth->bkgh", p, v_cache.astype(jnp.float32))
    return o.reshape(b, n_q, hd)


@pytest.mark.parametrize("n_q,n_kv", [(8, 8), (8, 4), (8, 1)])
@pytest.mark.parametrize("length", [1, 255, 256, 300, 512])
def test_flash_decode_matches_reference(n_q, n_kv, length):
    b, t, hd = 2, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(length + n_kv), 3)
    q = jax.random.normal(ks[0], (b, n_q, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, n_kv, t, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, n_kv, t, hd), jnp.float32)

    out = flash_decode(q, k, v, jnp.int32(length), interpret=True)
    ref = _ref(q, k, v, length)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_decode_ignores_stale_cache_suffix():
    """Positions >= length must not affect the result."""
    b, n_q, n_kv, t, hd = 1, 4, 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, n_q, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, n_kv, t, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, n_kv, t, hd), jnp.float32)
    out1 = flash_decode(q, k, v, jnp.int32(100), interpret=True)
    # poison everything past position 100
    k2 = k.at[:, :, 100:].set(1e9)
    v2 = v.at[:, :, 100:].set(-1e9)
    out2 = flash_decode(q, k2, v2, jnp.int32(100), interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_flash_decode_stacked_selects_layer():
    """stacked-cache kernel == masked attention over (prefix + current
    in-register token) of the selected layer."""
    from awq_tpu.ops.decode_attn import flash_decode_stacked

    L, b, n_q, n_kv, t, hd = 3, 2, 4, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, n_q, hd), jnp.float32)
    k_new = jax.random.normal(ks[2], (b, n_kv, hd), jnp.float32)
    v_new = jax.random.normal(ks[3], (b, n_kv, hd), jnp.float32)
    for layer in (0, 2):
        for prefix in (0, 100, 256):
            out = flash_decode_stacked(
                q, k_new, v_new, cache, jnp.int32(layer), jnp.int32(prefix),
                interpret=True,
            )
            # reference: prefix entries + current token appended
            kc = jnp.concatenate(
                [cache[layer, 0, :, :, :prefix], k_new[:, :, None]], axis=2)
            vc = jnp.concatenate(
                [cache[layer, 1, :, :, :prefix], v_new[:, :, None]], axis=2)
            ref = _ref(q, kc, vc, prefix + 1)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)


def test_flash_decode_stacked_per_row_lengths():
    """per-row prefix lengths (continuous batching)."""
    from awq_tpu.ops.decode_attn import flash_decode_stacked

    L, b, n_q, n_kv, t, hd = 2, 2, 4, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(8), 4)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, n_q, hd), jnp.float32)
    k_new = jax.random.normal(ks[2], (b, n_kv, hd), jnp.float32)
    v_new = jax.random.normal(ks[3], (b, n_kv, hd), jnp.float32)
    lengths = jnp.asarray([7, 200], jnp.int32)
    out = flash_decode_stacked(q, k_new, v_new, cache, jnp.int32(1),
                               lengths, interpret=True)
    for i, pre in enumerate([7, 200]):
        kc = jnp.concatenate(
            [cache[1, 0, i:i+1, :, :pre], k_new[i:i+1, :, None]], axis=2)
        vc = jnp.concatenate(
            [cache[1, 1, i:i+1, :, :pre], v_new[i:i+1, :, None]], axis=2)
        ref = _ref(q[i:i+1], kc, vc, pre + 1)
        np.testing.assert_allclose(np.asarray(out[i:i+1]), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_attention_decode_path_consistency():
    """attention() S=1 (XLA path on CPU) agrees with flash_decode."""
    b, n_q, n_kv, t, hd = 1, 8, 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, 1, n_q, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, n_kv, t, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, n_kv, t, hd), jnp.float32)
    start_pos = jnp.int32(99)  # 100 valid positions
    ref = attention(q, k, v, start_pos)
    out = flash_decode(q[:, 0], k, v, start_pos + 1, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.reshape(b, 1, n_q * hd)), np.asarray(ref),
        atol=2e-5, rtol=2e-5,
    )


def test_flash_decode_stacked8_matches_fp(jit_disabled=None):
    """int8-KV kernel == fp reference within int8 tolerance."""
    from awq_tpu.ops.decode_attn import flash_decode_stacked8

    L, b, n_q, n_kv, t, hd = 2, 1, 4, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    kv_fp = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    # quantize the cache per (pos, head)
    absmax = jnp.max(jnp.abs(kv_fp), axis=-1)
    scales = jnp.maximum(absmax, 1e-6) / 127.0
    data = jnp.clip(jnp.round(kv_fp / scales[..., None]), -127, 127
                    ).astype(jnp.int8)
    deq = data.astype(jnp.float32) * scales[..., None]

    q = jax.random.normal(ks[1], (b, n_q, hd), jnp.float32)
    k_new = jax.random.normal(ks[2], (b, n_kv, hd), jnp.float32)
    v_new = jax.random.normal(ks[3], (b, n_kv, hd), jnp.float32)
    prefix = 100
    out = flash_decode_stacked8(
        q, k_new, v_new, data,
        scales.reshape(L, 2, b, n_kv, t // 256, 256),
        jnp.int32(1), jnp.int32(prefix), interpret=True,
    )
    kc = jnp.concatenate([deq[1, 0, :, :, :prefix], k_new[:, :, None]],
                         axis=2)
    vc = jnp.concatenate([deq[1, 1, :, :, :prefix], v_new[:, :, None]],
                         axis=2)
    ref = _ref(q, kc, vc, prefix + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("start_pos,s", [(0, 256), (0, 300), (100, 156),
                                         (5, 64)])
def test_flash_prefill_stacked_matches_masked_attention(start_pos, s):
    """flash prefill == chunk-offset masked attention (incl. chunked
    prefill on reused history KV and non-multiple-of-block lengths)."""
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    L, b, n_q, n_kv, t, hd = 2, 1, 4, 2, 512, 128
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, s, n_q, hd), jnp.float32)

    out = flash_prefill_stacked(q, cache, jnp.int32(1), jnp.int32(start_pos),
                                interpret=True)
    ref = attention(q, cache[1, 0], cache[1, 1], jnp.int32(start_pos))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def _ref_alibi(q, k_cache, v_cache, length, slopes):
    """Masked attention + per-head ALiBi key-position bias slope*j."""
    b, n_q, hd = q.shape
    n_kv, t = k_cache.shape[1], k_cache.shape[2]
    g = n_q // n_kv
    qf = q.reshape(b, n_kv, g, hd).astype(jnp.float32)
    s = jnp.einsum("bkgh,bkth->bkgt", qf,
                   k_cache.astype(jnp.float32)) / np.sqrt(hd)
    s = s + (slopes.reshape(n_kv, g)[None, :, :, None]
             * jnp.arange(t, dtype=jnp.float32)[None, None, None, :])
    mask = jnp.arange(t)[None, None, None, :] < length
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgt,bkth->bkgh", p, v_cache.astype(jnp.float32))
    return o.reshape(b, n_q, hd)


@pytest.mark.parametrize("hd,n_q,n_kv", [(64, 4, 4), (128, 4, 2),
                                         (64, 8, 2)])
def test_flash_decode_stacked_alibi_hd(hd, n_q, n_kv):
    """ALiBi slopes inside the flash decode loop (reference MMHA's ALiBi
    path) at head_dim 64 AND 128 — falcon/mpt/bloom geometries ride the
    kernel instead of the XLA fallback."""
    from awq_tpu.models.layers import alibi_slopes
    from awq_tpu.ops.decode_attn import flash_decode_stacked

    L, b, t = 2, 2, 256
    ks = jax.random.split(jax.random.PRNGKey(hd + n_kv), 4)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, n_q, hd), jnp.float32)
    k_new = jax.random.normal(ks[2], (b, n_kv, hd), jnp.float32)
    v_new = jax.random.normal(ks[3], (b, n_kv, hd), jnp.float32)
    sl = alibi_slopes(n_q)
    lengths = jnp.asarray([5, 190], jnp.int32)
    out = flash_decode_stacked(q, k_new, v_new, cache, jnp.int32(1),
                               lengths, interpret=True, slopes=sl)
    for i, pre in enumerate([5, 190]):
        kc = jnp.concatenate(
            [cache[1, 0, i:i+1, :, :pre], k_new[i:i+1, :, None]], axis=2)
        vc = jnp.concatenate(
            [cache[1, 1, i:i+1, :, :pre], v_new[i:i+1, :, None]], axis=2)
        # the appended current token sits at key position `pre`
        ref = _ref_alibi(q[i:i+1], kc, vc, pre + 1, sl)
        np.testing.assert_allclose(np.asarray(out[i:i+1]),
                                   np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)


def test_flash_decode_stacked_hd64_no_bias():
    """head_dim 64 without ALiBi (falcon-7b rope geometry)."""
    from awq_tpu.ops.decode_attn import flash_decode_stacked

    L, b, n_q, n_kv, t, hd = 2, 1, 8, 1, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(64), 4)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, n_q, hd), jnp.float32)
    k_new = jax.random.normal(ks[2], (b, n_kv, hd), jnp.float32)
    v_new = jax.random.normal(ks[3], (b, n_kv, hd), jnp.float32)
    out = flash_decode_stacked(q, k_new, v_new, cache, jnp.int32(0),
                               jnp.int32(100), interpret=True)
    kc = jnp.concatenate([cache[0, 0, :, :, :100], k_new[:, :, None]],
                         axis=2)
    vc = jnp.concatenate([cache[0, 1, :, :, :100], v_new[:, :, None]],
                         axis=2)
    ref = _ref(q, kc, vc, 101)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("hd", [64, 128])
def test_flash_prefill_stacked_alibi(hd):
    """ALiBi bias in the prefill flash kernel (exp2-domain slopes) ==
    attention() with the [n_q, 1, T] bias forward() builds."""
    from awq_tpu.models.layers import alibi_slopes
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    L, b, n_q, n_kv, t, s = 2, 1, 4, 4, 512, 200
    ks = jax.random.split(jax.random.PRNGKey(hd), 2)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd),
                              jnp.float32) * 0.5
    q = jax.random.normal(ks[1], (b, s, n_q, hd), jnp.float32) * 0.5
    sl = alibi_slopes(n_q)
    out = flash_prefill_stacked(q, cache, jnp.int32(1), jnp.int32(30),
                                interpret=True, slopes=sl)
    bias = sl[:, None, None] * jnp.arange(t, dtype=jnp.float32)
    ref = attention(q, cache[1, 0], cache[1, 1], jnp.int32(30), bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("fm", [0.0, 16.0])
def test_flash_prefill_fixed_max_matches_online(fm):
    """Fixed-max softmax (no running max / no rescale) is mathematically
    identical to the online-softmax path inside its exactness window —
    same outputs within f32 rounding, with and without ALiBi."""
    from awq_tpu.models.layers import alibi_slopes
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    L, b, n_q, n_kv, t, s, hd = 2, 1, 4, 2, 512, 300, 128
    ks = jax.random.split(jax.random.PRNGKey(21), 2)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, s, n_q, hd), jnp.float32)
    ref = flash_prefill_stacked(q, cache, jnp.int32(0), jnp.int32(100),
                                interpret=True)
    out = flash_prefill_stacked(q, cache, jnp.int32(0), jnp.int32(100),
                                interpret=True, fixed_max=fm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)
    sl = alibi_slopes(n_q)[:n_q]
    ref2 = flash_prefill_stacked(q, cache, jnp.int32(1), jnp.int32(0),
                                 interpret=True, slopes=sl)
    out2 = flash_prefill_stacked(q, cache, jnp.int32(1), jnp.int32(0),
                                 interpret=True, slopes=sl, fixed_max=fm)
    # bf16 probability rounding differs between the two softmax forms
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-2, rtol=1e-2)


def test_flash_prefill_block_t_falls_back_for_odd_caches():
    """T a multiple of 256 but not of the default block_t=512 (e.g.
    max_seq_len=768) must still trace: block_t falls back to a divisor
    (round-2 regression: the 256->512 default bump broke these)."""
    from awq_tpu.ops.decode_attn import flash_prefill_stacked

    L, b, n_q, n_kv, t, hd = 1, 1, 2, 2, 768, 128
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    cache = jax.random.normal(ks[0], (L, 2, b, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(ks[1], (b, 64, n_q, hd), jnp.float32)

    out = flash_prefill_stacked(q, cache, jnp.int32(0), jnp.int32(0),
                                interpret=True)
    ref = attention(q, cache[0, 0], cache[0, 1], jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
