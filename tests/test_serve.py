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


# ---------------------------------------------------------------------------
# VLM worker: base64 image -> streamed generation (the reference serving
# layer is fundamentally a VLM server, model_worker_new.py:258-336)
# ---------------------------------------------------------------------------


class VLMFakeTokenizer(FakeTokenizer):
    bos_token_id = 1

    def encode(self, text):
        return [self.bos_token_id] + [min(ord(c), 127) for c in text]


def _tiny_vlm():
    import jax.numpy as jnp

    from awq_tpu.models.layers import Linear
    from awq_tpu.models.vision import VisionConfig, init_vision_params
    from awq_tpu.models.vlm import MMProjector, VLM

    vis_cfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2,
    )
    vis_params = init_vision_params(vis_cfg, jax.random.PRNGKey(0))
    llm_cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=256, dtype="float32",
    )
    llm_params = init_params(llm_cfg, jax.random.PRNGKey(1))
    proj = MMProjector(
        fc1=Linear(w=jnp.ones((32, 48), jnp.float32) * 0.05),
        fc2=Linear(w=jnp.ones((48, 64), jnp.float32) * 0.05),
    )
    return VLM(vis_cfg, vis_params, proj, llm_cfg, llm_params)


def _png_b64(size=8):
    import base64
    import io

    import numpy as np
    from PIL import Image

    img = Image.fromarray(
        (np.linspace(0, 255, size * size * 3).reshape(size, size, 3)
         ).astype("uint8"))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture()
def vlm_stack():
    from awq_tpu.serve.vlm_worker import VLMWorker

    c = Controller(port=0)
    c.start()
    w = VLMWorker(_tiny_vlm(), VLMFakeTokenizer(), "tiny-llava",
                  arch="llava", controller_url=c.url, port=0,
                  max_seq_len=128)
    w.start()
    yield c, w
    w.stop()
    c.stop()


def test_vlm_worker_streams_image_generation(vlm_stack):
    c, w = vlm_stack
    addr = post_json(c.url + "/get_worker_address",
                     {"model": "tiny-llava"})["address"]
    assert addr == w.url
    chunks = list(post_stream(addr + "/worker_generate_stream", {
        "prompt": "<image>\ndescribe", "images": [_png_b64()],
        "max_new_tokens": 6, "greedy": True, "stream_interval": 1,
    }))
    assert chunks and chunks[-1]["finished"]
    assert all(ch["error_code"] == 0 for ch in chunks)
    assert "timing" in chunks[-1]


def test_vlm_worker_rejects_token_mismatch(vlm_stack):
    c, w = vlm_stack
    chunks = list(post_stream(w.url + "/worker_generate_stream", {
        "prompt": "no image token here", "images": [_png_b64()],
        "max_new_tokens": 4,
    }))
    assert chunks[-1]["error_code"] == 1
    assert "does not match" in chunks[-1]["text"]


def test_vlm_worker_text_only(vlm_stack):
    c, w = vlm_stack
    chunks = list(post_stream(w.url + "/worker_generate_stream", {
        "prompt": "hello", "max_new_tokens": 4, "greedy": True,
    }))
    assert chunks[-1]["finished"]
    assert chunks[-1]["error_code"] == 0
