"""Serving stack tests: controller registry/dispatch + worker streaming."""

import time

import jax
import pytest

from awq_tpu.config import ModelConfig, RuntimeConfig
from awq_tpu.models import init_params
from awq_tpu.runtime.engine import InferenceEngine
from awq_tpu.serve import Controller, DispatchMethod, ModelWorker
from awq_tpu.serve.http import post_json, post_stream


class FakeTokenizer:
    eos_token_id = 0

    def encode(self, text):
        return [min(ord(c), 127) for c in text]

    def decode(self, ids):
        return "".join(chr(max(i, 32)) for i in ids)


@pytest.fixture(scope="module")
def engine():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=256, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=128),
                           tokenizer=FakeTokenizer())


@pytest.fixture()
def stack(engine):
    c = Controller(port=0)
    c.start()
    w = ModelWorker(engine, "tiny-llama", c.url, port=0)
    w.start()
    yield c, w
    w.stop()
    c.stop()


def test_register_and_list_models(stack):
    c, w = stack
    models = post_json(c.url + "/list_models", {})["models"]
    assert "tiny-llama" in models
    addr = post_json(c.url + "/get_worker_address",
                     {"model": "tiny-llama"})["address"]
    assert addr == w.url
    assert post_json(c.url + "/get_worker_address",
                     {"model": "nope"})["address"] == ""


def test_worker_stream_generation(stack):
    c, w = stack
    addr = post_json(c.url + "/get_worker_address",
                     {"model": "tiny-llama"})["address"]
    chunks = list(post_stream(addr + "/worker_generate_stream", {
        "prompt": "hello", "max_new_tokens": 8, "greedy": True,
        "stream_interval": 1,
    }))
    assert chunks, "no chunks received"
    assert all(ch["error_code"] == 0 for ch in chunks)
    assert chunks[-1]["finished"]
    assert "timing" in chunks[-1]
    assert len(chunks[-1]["ids"]) <= 8


def test_worker_status_and_heartbeat(stack):
    c, w = stack
    st = post_json(w.url + "/worker_get_status", {})
    assert st["model_names"] == ["tiny-llama"]
    # heartbeat for an unknown worker asks it to re-register
    r = post_json(c.url + "/receive_heart_beat",
                  {"worker_name": "http://ghost"})
    assert r["exist"] is False
    r = post_json(c.url + "/receive_heart_beat", {"worker_name": w.url})
    assert r["exist"] is True


def test_controller_expires_silent_workers(engine):
    import awq_tpu.serve.controller as cmod

    c = Controller(port=0)
    c.start()
    try:
        post_json(c.url + "/register_worker", {
            "worker_name": "http://dead-worker", "model_names": ["m"],
        })
        assert post_json(c.url + "/list_models", {})["models"] == ["m"]
        old = cmod.HEART_BEAT_EXPIRATION
        cmod.HEART_BEAT_EXPIRATION = 0.05
        try:
            time.sleep(0.1)
            assert post_json(c.url + "/list_models", {})["models"] == []
        finally:
            cmod.HEART_BEAT_EXPIRATION = old
    finally:
        c.stop()


def test_shortest_queue_dispatch(engine):
    c = Controller(port=0, dispatch=DispatchMethod.SHORTEST_QUEUE)
    c.start()
    try:
        for name, q in [("http://w1", 5), ("http://w2", 0)]:
            post_json(c.url + "/register_worker", {
                "worker_name": name, "model_names": ["m"],
                "queue_length": q,
            })
        addr = post_json(c.url + "/get_worker_address", {"model": "m"})
        assert addr["address"] == "http://w2"
    finally:
        c.stop()
