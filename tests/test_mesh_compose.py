"""Round-5 composition: speculation, paged KV, and int8 KV under the
tp mesh (round-4 verdict weak #3 — the throughput features and the
multi-chip product were pairwise exclusive).

All on the 8-device virtual CPU mesh, kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
from awq_tpu.models.llama import init_params, quantize_params
from awq_tpu.parallel import MeshConfig, TPParams, make_mesh
from awq_tpu.runtime.batch_engine import BatchEngine
from awq_tpu.runtime.paged import PagedBatchEngine


def _cfg():
    # flash gate: head_dim % 128 == 0, cache T % 256 == 0
    return ModelConfig(
        arch="llama",
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=128,
        max_position_embeddings=256,
        dtype="float32",
    )


def _qparams(cfg, seed=0):
    return quantize_params(
        init_params(cfg, jax.random.PRNGKey(seed)),
        QuantConfig(w_bit=4, group_size=128),
    )


def _tp_mesh(tp=2):
    return make_mesh(MeshConfig(dp=1, tp=tp), devices=jax.devices()[:tp])


# repetitive prompts give the n-gram drafter something to accept
PROMPTS = [[3, 4, 5, 3, 4, 5, 3, 4], [7, 8, 7, 8, 7, 8]]


def _run(engine, gen):
    for p in PROMPTS:
        engine.submit(p, gen)
    done = engine.run()
    return {rid: done[rid].out_ids for rid in done}


def test_spec_on_tp_mesh(monkeypatch):
    """spec_k > 0 on a tp=2 mesh (tp_verify_step_batched) emits the same
    greedy tokens as the plain single-chip engine."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=11)
    gen = GenConfig(greedy=True, max_new_tokens=8)

    ref = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype=jnp.float32)
    ref_out = _run(ref, gen)

    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype=jnp.float32, spec_k=3,
                      runtime=RuntimeConfig(mesh=_tp_mesh()))
    assert isinstance(eng.params, TPParams)
    assert eng._spec_eligible([])      # mesh no longer disqualifies
    out = _run(eng, gen)
    assert out == ref_out


def test_spec_with_int8_kv(monkeypatch):
    """spec_k > 0 over a KVCache8: verify-window rows quantize on append
    (same per-position symmetric int8 as the decode path); greedy tokens
    match the plain int8 engine."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=12)
    gen = GenConfig(greedy=True, max_new_tokens=8)

    ref = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype="int8")
    ref_out = _run(ref, gen)

    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype="int8", spec_k=3)
    from awq_tpu.models.llama import KVCache8

    assert isinstance(eng.cache, KVCache8)
    assert eng._spec_eligible([])
    out = _run(eng, gen)
    assert out == ref_out


def test_spec_int8_kv_on_tp_mesh(monkeypatch):
    """All three at once: spec + int8 KV + tp=2 mesh."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=13)
    gen = GenConfig(greedy=True, max_new_tokens=6)

    ref = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype="int8")
    ref_out = _run(ref, gen)

    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype="int8", spec_k=2,
                      runtime=RuntimeConfig(mesh=_tp_mesh()))
    out = _run(eng, gen)
    assert out == ref_out


def test_engine_speculative_on_mesh():
    """InferenceEngine.generate_speculative on a tp=2 mesh (the host
    verify loop routes every window through tp_forward) emits the same
    greedy tokens as the single-chip engine; round 4 raised
    NotImplementedError here."""
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = _cfg()
    params = _qparams(cfg, seed=15)
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]

    e1 = InferenceEngine(cfg, params,
                         RuntimeConfig(max_seq_len=256),
                         cache_dtype=jnp.float32)
    ref = e1.generate_speculative(prompt, 8, k=3, device_loop=False)

    e2 = InferenceEngine(cfg, params,
                         RuntimeConfig(max_seq_len=256, mesh=_tp_mesh()),
                         cache_dtype=jnp.float32)
    got = e2.generate_speculative(prompt, 8, k=3)
    assert list(map(int, got["output_ids"])) == \
        list(map(int, ref["output_ids"]))


def test_paged_on_tp_mesh(monkeypatch):
    """Paged admission + decode on a tp=2 mesh (tp_decode_step_paged,
    KV-head-sharded page pool) matches the single-chip paged engine."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=14)
    gen = GenConfig(greedy=True, max_new_tokens=6)

    ref = PagedBatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                           cache_dtype=jnp.float32, page_size=256)
    ref_out = _run(ref, gen)

    eng = PagedBatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                           cache_dtype=jnp.float32, page_size=256,
                           runtime=RuntimeConfig(mesh=_tp_mesh()))
    assert isinstance(eng.params, TPParams)
    # the pool shards on kv-heads, never on the page axis
    shd = eng.cache.sharding.spec
    assert shd[3] == "tp" and shd[2] is None, shd
    out = _run(eng, gen)
    assert out == ref_out
