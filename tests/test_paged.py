"""Paged KV cache: allocator, paged flash kernel, engine equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig
from awq_tpu.models.llama import init_params, quantize_params
from awq_tpu.runtime.batch_engine import BatchEngine
from awq_tpu.runtime.paged import PageAllocator, PagedBatchEngine


def _cfg(hd=32, max_pos=512):
    return ModelConfig(
        arch="llama", vocab_size=512, hidden_size=4 * hd,
        intermediate_size=8 * hd, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=hd, max_position_embeddings=max_pos,
        dtype="float32",
    )


def _params(cfg, seed=0):
    return quantize_params(
        init_params(cfg, jax.random.PRNGKey(seed)),
        QuantConfig(w_bit=4, group_size=64),
    )


def test_page_allocator():
    a = PageAllocator(8)           # page 0 reserved (trash)
    assert a.n_free == 7
    got = a.alloc(3)
    assert len(got) == 3 and 0 not in got
    assert a.alloc(5) is None      # only 4 left
    a.free(got)
    assert a.n_free == 7
    with pytest.raises(AssertionError):
        a.free([0])                # reserved page is never freeable


def test_flash_decode_paged_matches_reference():
    """Interpret-mode paged kernel vs dense attention over the same data,
    with pages deliberately scattered/permuted in the pool."""
    from awq_tpu.ops.decode_attn import flash_decode_paged

    key = jax.random.PRNGKey(0)
    L, B, n_kv, n_q, hd, page, mp = 2, 3, 2, 4, 128, 256, 3
    n_pages = 1 + B * mp  # + trash page
    t = mp * page
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # contiguous ground-truth cache [L, 2, B, n_kv, T, hd]
    cache = jax.random.normal(k1, (L, 2, B, n_kv, t, hd), jnp.float32)
    q = jax.random.normal(k2, (B, n_q, hd), jnp.float32)
    kn = jax.random.normal(k3, (B, n_kv, hd), jnp.float32)
    vn = jax.random.normal(k4, (B, n_kv, hd), jnp.float32)
    lengths = jnp.asarray([5, page + 7, t - 1], jnp.int32)

    # scatter the cache into a permuted pool
    rng = np.random.RandomState(1)
    perm = rng.permutation(np.arange(1, n_pages))
    tables = perm.reshape(B, mp).astype(np.int32)
    pool = np.zeros((L, 2, n_pages, n_kv, page, hd), np.float32)
    for b in range(B):
        for j in range(mp):
            pool[:, :, tables[b, j]] = np.moveaxis(
                np.asarray(cache[:, :, b, :, j * page:(j + 1) * page]),
                2, 2)
    out = flash_decode_paged(
        q, kn, vn, jnp.asarray(pool), jnp.asarray(tables), jnp.int32(1),
        lengths, interpret=True)

    # dense reference with the current token appended
    g = n_q // n_kv
    qg = np.asarray(q).reshape(B, n_kv, g, hd)
    expect = np.zeros((B, n_q, hd), np.float32)
    for b in range(B):
        ln = int(lengths[b])
        for h in range(n_kv):
            kc = np.concatenate(
                [np.asarray(cache[1, 0, b, h, :ln]),
                 np.asarray(kn[b, h])[None]], 0)
            vc = np.concatenate(
                [np.asarray(cache[1, 1, b, h, :ln]),
                 np.asarray(vn[b, h])[None]], 0)
            s = qg[b, h] @ kc.T / np.sqrt(hd)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            expect[b, h * g:(h + 1) * g] = p @ vc
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-5,
                               rtol=2e-5)


def _run_engine(engine, prompts, max_new=6):
    gen = GenConfig(greedy=True, max_new_tokens=max_new)
    rids = [engine.submit(p, gen) for p in prompts]
    done = engine.run()
    return [done[r].out_ids for r in rids]


def test_paged_engine_matches_slot_engine():
    cfg = _cfg()
    params = _params(cfg)
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(0, cfg.vocab_size, n))
               for n in (5, 37, 12, 20, 9, 31)]

    slot_out = _run_engine(
        BatchEngine(cfg, params, n_slots=3, max_seq_len=256,
                    cache_dtype=jnp.float32), prompts)
    paged_out = _run_engine(
        PagedBatchEngine(cfg, params, n_slots=3, max_seq_len=256,
                         cache_dtype=jnp.float32, page_size=64),
        prompts)
    assert paged_out == slot_out


def test_paged_engine_preemption():
    """A pool too small for all slots forces preempt-with-recompute; every
    request still completes with the same greedy output."""
    cfg = _cfg()
    params = _params(cfg)
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(0, cfg.vocab_size, n))
               for n in (60, 50, 55)]

    slot_out = _run_engine(
        BatchEngine(cfg, params, n_slots=3, max_seq_len=256,
                    cache_dtype=jnp.float32), prompts, max_new=12)
    # 5 usable pages of 64 = 320 positions for ~3x(60..72): forces churn
    eng = PagedBatchEngine(cfg, params, n_slots=3, max_seq_len=256,
                           cache_dtype=jnp.float32, page_size=64,
                           n_pages=6)
    paged_out = _run_engine(eng, prompts, max_new=12)
    assert paged_out == slot_out


def test_paged_engine_memory_footprint():
    """The point of paging: pool bytes << slot-static bytes."""
    cfg = _cfg()
    params = _params(cfg)
    slot = BatchEngine(cfg, params, n_slots=8, max_seq_len=256,
                       cache_dtype=jnp.float32)
    paged = PagedBatchEngine(cfg, params, n_slots=8, max_seq_len=256,
                             cache_dtype=jnp.float32, page_size=64)
    assert paged.cache.nbytes <= slot.cache.nbytes // 2 + 1
