"""Web chat UI: page serves, /chat proxies controller->worker stream."""

import jax
import pytest
import requests

from awq_tpu.config import ModelConfig, RuntimeConfig
from awq_tpu.models import init_params
from awq_tpu.runtime.engine import InferenceEngine
from awq_tpu.serve import Controller, ModelWorker
from awq_tpu.serve.http import post_stream
from awq_tpu.serve.web import WebServer


class FakeTokenizer:
    eos_token_id = 0

    def encode(self, text):
        return [min(ord(c), 127) for c in text]

    def decode(self, ids):
        return "".join(chr(max(i, 32)) for i in ids)


@pytest.fixture(scope="module")
def stack():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=256, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=128),
                             tokenizer=FakeTokenizer())
    c = Controller(port=0)
    c.start()
    w = ModelWorker(engine, "tiny", c.url, port=0)
    w.start()
    web = WebServer(c.url, "tiny", port=0)
    web.start()
    yield c, w, web
    web.stop()
    w.stop()
    c.stop()


def test_page_serves_html(stack):
    _, _, web = stack
    r = requests.get(web.url + "/", timeout=10)
    assert r.status_code == 200
    assert "text/html" in r.headers["Content-Type"]
    assert "awq_tpu chat" in r.text


def test_chat_proxies_stream(stack):
    _, _, web = stack
    chunks = list(post_stream(web.url + "/chat", {
        "prompt": "hi", "max_new_tokens": 6, "greedy": True,
        "stream_interval": 1,
    }))
    assert chunks and chunks[-1]["finished"]
    assert all(ch["error_code"] == 0 for ch in chunks)
