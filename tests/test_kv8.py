"""int8 KV cache tests (new capability; the reference cache is fp16-only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import forward, init_kv_cache, init_params
from awq_tpu.models.llama import KVCache8, init_kv_cache8, quantize_kv
from awq_tpu.runtime.engine import InferenceEngine
from awq_tpu.config import RuntimeConfig
from awq_tpu.runtime.generate import generate


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=512, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_quantize_kv_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 16), jnp.float32)
    q, s = quantize_kv(k)
    deq = q.astype(jnp.float32) * s[..., None]
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(deq), np.asarray(k), atol=0.02)


def test_forward_q8_close_to_fp_cache(model):
    cfg, params = model
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, 128)
    fp_cache = init_kv_cache(cfg, 1, 32, jnp.float32)
    q8_cache = init_kv_cache8(cfg, 1, 32)

    ref, fp_cache = forward(params, cfg, tokens, fp_cache, jnp.int32(0))
    out, q8_cache = forward(params, cfg, tokens, q8_cache, jnp.int32(0))
    assert isinstance(q8_cache, KVCache8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    # decode steps stay close
    tok = jnp.argmax(ref[:, -1], -1).astype(jnp.int32)[:, None]
    for i in range(12, 15):
        ref, fp_cache = forward(params, cfg, tok, fp_cache, jnp.int32(i))
        out, q8_cache = forward(params, cfg, tok, q8_cache, jnp.int32(i))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        tok = jnp.argmax(ref[:, -1], -1).astype(jnp.int32)[:, None]


def test_generate_with_q8_cache(model):
    cfg, params = model
    cache = init_kv_cache8(cfg, 1, 64)
    out = generate(
        params, cfg, jnp.asarray([[3, 5, 7, 11]], jnp.int32), cache,
        GenConfig(greedy=True, max_new_tokens=6),
    )
    assert int(out["n_valid"][0]) >= 1
    assert isinstance(out["cache"], KVCache8)
    # greedy tokens match the fp-cache run (tiny model, margins are wide)
    fp = generate(
        params, cfg, jnp.asarray([[3, 5, 7, 11]], jnp.int32),
        init_kv_cache(cfg, 1, 64, jnp.float32),
        GenConfig(greedy=True, max_new_tokens=6),
    )
    n = int(out["n_valid"][0])
    assert out["output_ids"][0, :n].tolist() == \
        fp["output_ids"][0, :int(fp["n_valid"][0])].tolist()


def test_engine_with_q8_cache(model):
    cfg, params = model
    eng = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=128),
                          cache_dtype="int8")
    assert isinstance(eng.cache, KVCache8)
    out = eng.generate([3, 5, 7], GenConfig(greedy=True, max_new_tokens=4))
    assert len(out["output_ids"]) >= 1
    eng.reset()
    assert float(jnp.sum(jnp.abs(eng.cache.scales))) == 0.0


def test_batch_engine_with_q8_cache(model):
    """Continuous batching over the int8 cache: greedy rows match the
    fp-cache single-request reference on the test model."""
    from awq_tpu.runtime.batch_engine import BatchEngine

    cfg, params = model
    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=64,
                      cache_dtype="int8")
    assert isinstance(eng.cache, KVCache8)
    gen = GenConfig(greedy=True, max_new_tokens=5)
    prompts = [[3, 5, 7], [11, 13, 17, 19]]
    rids = [eng.submit(p, gen) for p in prompts]
    done = eng.run()
    for rid, p in zip(rids, prompts):
        ref = generate(
            params, cfg, jnp.asarray([p], jnp.int32),
            init_kv_cache(cfg, 1, 64, jnp.float32),
            GenConfig(greedy=True, max_new_tokens=5),
        )
        n = int(ref["n_valid"][0])
        assert done[rid].out_ids == \
            [int(t) for t in ref["output_ids"][0, :n]], rid


def test_deferred_flash_append_matches_xla_paths(monkeypatch):
    """Forced-flash decode (interpret kernels + DEFERRED single append)
    == the default XLA attention path, for fp16 and int8 caches."""
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=128,
        max_position_embeddings=512, dtype="float32",
    )
    from awq_tpu.models import init_params

    params = init_params(cfg, jax.random.PRNGKey(3))
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0, 64)
    tok = jnp.asarray([[7]], jnp.int32)

    def run(cache):
        logits, cache = forward(params, cfg, prompt, cache, jnp.int32(0))
        logits, cache = forward(params, cfg, tok, cache, jnp.int32(5))
        return np.asarray(logits), cache

    for mk in (lambda: init_kv_cache(cfg, 1, 256, jnp.float32),
               lambda: init_kv_cache8(cfg, 1, 256)):
        monkeypatch.delenv("AWQ_TPU_FORCE_FLASH", raising=False)
        ref_logits, ref_cache = run(mk())
        monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
        got_logits, got_cache = run(mk())
        np.testing.assert_allclose(got_logits, ref_logits,
                                   rtol=2e-2, atol=2e-2)
        ref_leaves = jax.tree_util.tree_leaves(ref_cache)
        got_leaves = jax.tree_util.tree_leaves(got_cache)
        for a, b in zip(got_leaves, ref_leaves):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-2, atol=2e-2)
