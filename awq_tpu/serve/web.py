"""Browser chat UI served from stdlib HTTP (gradio is not in this image).

Counterpart of ``tinychat/serve/gradio_web_server.py:363-630``: a
single-page chat client that asks the controller for a worker address and
streams tokens from ``/worker_generate_stream``, with conversation state
kept client-side and chunked-prefill handled worker-side.
"""

from __future__ import annotations

import time
from typing import Iterator

from awq_tpu.serve.http import JsonHTTPServer, post_json, post_stream

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>awq_tpu chat</title>
<style>
 body { font-family: system-ui, sans-serif; max-width: 780px; margin: 2em auto; }
 #log { border: 1px solid #ccc; border-radius: 8px; padding: 1em;
        min-height: 300px; white-space: pre-wrap; }
 .u { color: #14508c; margin-top: .6em; } .a { color: #111; }
 .meta { color: #888; font-size: .8em; }
 #row { display: flex; gap: .5em; margin-top: 1em; }
 #msg { flex: 1; padding: .5em; } button { padding: .5em 1.2em; }
</style></head><body>
<h2>awq_tpu chat</h2>
<div id="log"></div>
<div id="row"><input id="msg" placeholder="Say something..." autofocus>
<button id="send">Send</button><button id="clear">Clear</button></div>
<div id="row"><input type="file" id="img" accept="image/*" multiple>
<span class="meta">attach image(s) — sent as &lt;image&gt; to VLM
workers (gradio_web_server.py:363-630 counterpart)</span></div>
<script>
const log = document.getElementById('log');
const msg = document.getElementById('msg');
const img = document.getElementById('img');
let first = true;
function readB64(f) {
  return new Promise(res => { const r = new FileReader();
    r.onload = () => res(r.result.split(',')[1]); r.readAsDataURL(f); });
}
async function send() {
  const text = msg.value.trim(); if (!text) return;
  msg.value = '';
  const images = [];
  for (const f of img.files) images.push(await readB64(f));
  img.value = '';
  let prompt = text;
  if (images.length && !prompt.includes('<image>'))
    prompt = '<image>'.repeat(images.length) + '\\n' + prompt;
  log.innerHTML += `<div class="u">USER: ${text}` +
    (images.length ? ` [${images.length} image(s)]` : '') + `</div>`;
  const div = document.createElement('div'); div.className = 'a';
  div.textContent = 'ASSISTANT: '; log.appendChild(div);
  const body = {prompt, continue_dialogue: !first};
  if (images.length) body.images = images;
  const r = await fetch('/chat', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify(body)});
  first = false;
  const reader = r.body.getReader();
  const dec = new TextDecoder();
  let buf = '';
  for (;;) {
    const {done, value} = await reader.read(); if (done) break;
    buf += dec.decode(value, {stream: true});
    let i;
    while ((i = buf.indexOf('\\0')) >= 0) {
      const chunk = JSON.parse(buf.slice(0, i)); buf = buf.slice(i + 1);
      if (chunk.error_code) { div.textContent += ' [error] ' + chunk.text; break; }
      div.textContent = 'ASSISTANT: ' + (chunk.text || '');
      if (chunk.finished && chunk.timing) {
        const t = chunk.timing;
        const m = document.createElement('div'); m.className = 'meta';
        m.textContent = `ttft ${(t.ttft_s*1000).toFixed(0)} ms · ` +
                        `${t.ms_per_token.toFixed(1)} ms/token`;
        log.appendChild(m);
      }
    }
  }
  window.scrollTo(0, document.body.scrollHeight);
}
document.getElementById('send').onclick = send;
msg.addEventListener('keydown', e => { if (e.key === 'Enter') send(); });
document.getElementById('clear').onclick = () => { log.innerHTML = ''; first = true; };
</script></body></html>"""


class WebServer:
    def __init__(self, controller_url: str, model: str,
                 host: str = "127.0.0.1", port: int = 0,
                 log_dir: str = "", moderate: bool = False):
        self.controller_url = controller_url
        self.model = model
        self.log_dir = log_dir      # dated-JSON conversation logging
        self.moderate = moderate    # content-moderation hook
        self.server = JsonHTTPServer(host, port)
        self.server.route("/", lambda p: {"__html__": PAGE})
        self.server.route("/chat", self.chat)

    @property
    def url(self) -> str:
        return f"http://{self.server.host}:{self.server.port}"

    def chat(self, p: dict) -> Iterator[dict]:
        if self.moderate:
            from awq_tpu.utils.log import violates_moderation

            if violates_moderation(p.get("prompt", "")):
                # same refusal shape as the reference
                # (gradio_web_server.py moderation_msg path)
                yield {"error_code": 4, "finished": True,
                       "text": "YOUR INPUT VIOLATES OUR CONTENT "
                               "MODERATION GUIDELINES. PLEASE TRY "
                               "AGAIN."}
                return
        addr = post_json(
            self.controller_url + "/get_worker_address",
            {"model": self.model},
        )["address"]
        if not addr:
            yield {"error_code": 3, "text": "no worker for model"}
            return
        last = {}
        for chunk in post_stream(addr + "/worker_generate_stream", p):
            last = chunk
            yield chunk
        if self.log_dir:
            from awq_tpu.utils.log import log_conversation

            log_conversation(self.log_dir, {
                "tstamp": time.time(),
                "model": self.model,
                "prompt": p.get("prompt"),
                "n_images": len(p.get("images", []) or []),
                "response": last.get("text"),
                "timing": last.get("timing"),
            })

    def start(self) -> None:
        self.server.start()

    def stop(self) -> None:
        self.server.stop()


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser("awq_tpu.serve.web")
    ap.add_argument("--controller", default="http://127.0.0.1:21001")
    ap.add_argument("--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--log_dir", default="",
                    help="append dated JSON conversation logs here")
    ap.add_argument("--moderate", action="store_true",
                    help="moderation hook (OPENAI_API_KEY) on user text")
    args = ap.parse_args(argv)
    w = WebServer(args.controller, args.model, args.host, args.port,
                  log_dir=args.log_dir, moderate=args.moderate)
    w.start()
    print(f"[web] chat UI at {w.url}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        w.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
