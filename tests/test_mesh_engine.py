"""Multi-chip product surface: engines + worker on a tp mesh.

Round-3 verdict item 1 — a mesh must be consumable at the PRODUCT level
(RuntimeConfig.mesh -> InferenceEngine/BatchEngine/ModelWorker), riding
the sharded TP deploy layout, not just the tp_* library functions. These
run on the 8-device virtual CPU mesh (kernels in interpret mode)."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
from awq_tpu.models.llama import init_params, quantize_params
from awq_tpu.parallel import MeshConfig, TPParams, make_mesh
from awq_tpu.runtime.batch_engine import BatchEngine
from awq_tpu.runtime.engine import InferenceEngine


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


def test_inference_engine_mesh_generate(monkeypatch):
    """engine.generate() on a tp=2 mesh (deploy layout, quantized head)
    emits the same greedy tokens as the single-chip engine."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg)
    gen = GenConfig(greedy=True, max_new_tokens=6)

    ref = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=256, quantize_head=True),
        cache_dtype=jnp.float32)
    ref_out = ref.generate([5, 6, 7, 8], gen)

    eng = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=256, quantize_head=True,
                      mesh=_tp_mesh()),
        cache_dtype=jnp.float32)
    assert isinstance(eng.params, TPParams)
    assert eng.params.params["layers"]["wqkv"].folded  # fast layout kept
    out = eng.generate([5, 6, 7, 8], gen)
    assert list(map(int, out["output_ids"])) == \
        list(map(int, ref_out["output_ids"]))

    # dialogue round 2 reuses the sharded history KV (chunked prefill)
    ref2 = ref.generate([9, 10], gen)
    out2 = eng.generate([9, 10], gen)
    assert eng.start_pos == ref.start_pos
    assert list(map(int, out2["output_ids"])) == \
        list(map(int, ref2["output_ids"]))


def test_inference_engine_rejects_dp_mesh():
    cfg = _cfg()
    params = _qparams(cfg)
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="dp=1"):
        InferenceEngine(cfg, params, RuntimeConfig(mesh=mesh),
                        cache_dtype=jnp.float32)


def test_batch_engine_mesh(monkeypatch):
    """BatchEngine on a tp=2 mesh: continuous batching through
    tp_decode_step_batched matches the single-chip engine's outputs."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=1)
    gen = GenConfig(greedy=True, max_new_tokens=5)
    prompts = [[3, 4, 5], [7, 8, 9, 10]]

    ref = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype=jnp.float32)
    for p in prompts:
        ref.submit(p, gen)
    ref_done = ref.run()

    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                      cache_dtype=jnp.float32,
                      runtime=RuntimeConfig(mesh=_tp_mesh()))
    assert isinstance(eng.params, TPParams)
    for p in prompts:
        eng.submit(p, gen)
    done = eng.run()
    assert set(done) == set(ref_done)
    for rid in done:
        assert done[rid].out_ids == ref_done[rid].out_ids, (
            rid, done[rid].out_ids, ref_done[rid].out_ids)


def test_worker_serves_through_mesh(monkeypatch):
    """A chat request served end-to-end through ModelWorker on the
    virtual mesh: HTTP -> engine.stream -> tp_forward per token."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    from awq_tpu.serve import ModelWorker
    from awq_tpu.serve.http import post_stream

    class FakeTokenizer:
        eos_token_id = 0

        def encode(self, text):
            return [min(ord(c), 255) for c in text]

        def decode(self, ids):
            return "".join(chr(max(int(i) % 256, 32)) for i in ids)

    cfg = _cfg()
    params = _qparams(cfg, seed=2)
    eng = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=256, mesh=_tp_mesh()),
        tokenizer=FakeTokenizer(), cache_dtype=jnp.float32)
    w = ModelWorker(eng, "tiny-mesh", None, port=0)
    w.start()
    try:
        chunks = list(post_stream(w.url + "/worker_generate_stream", {
            "prompt": "hi", "max_new_tokens": 4, "greedy": True,
            "stream_interval": 1,
        }))
        assert chunks and chunks[-1]["finished"]
        assert all(ch["error_code"] == 0 for ch in chunks)
        assert 1 <= len(chunks[-1]["ids"]) <= 4
    finally:
        w.stop()


def test_inference_engine_mesh_int8_kv(monkeypatch):
    """int8 KV cache under the tp mesh: data + scale planes shard on
    kv-heads; greedy output matches the single-chip int8 engine."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    cfg = _cfg()
    params = _qparams(cfg, seed=3)
    gen = GenConfig(greedy=True, max_new_tokens=5)

    ref = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=256),
                          cache_dtype="int8")
    ref_out = ref.generate([11, 12, 13], gen)

    eng = InferenceEngine(
        cfg, params, RuntimeConfig(max_seq_len=256, mesh=_tp_mesh()),
        cache_dtype="int8")
    from awq_tpu.models.llama import KVCache8

    assert isinstance(eng.cache, KVCache8)
    out = eng.generate([11, 12, 13], gen)
    assert list(map(int, out["output_ids"])) == \
        list(map(int, ref_out["output_ids"]))
