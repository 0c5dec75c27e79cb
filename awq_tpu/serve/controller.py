"""Serving controller: worker registry, heartbeats, dispatch.

Counterpart of ``tinychat/serve/controller.py:43-296`` — same REST surface
and semantics: workers register and heartbeat (15 s interval,
``tinychat/utils/constants.py:24-26``); the controller expires silent
workers (30 s, ``controller.py:66-69,204``) and dispatches by LOTTERY
(speed-weighted random) or SHORTEST_QUEUE (``controller.py:43-54,141-192``).
"""

from __future__ import annotations

import dataclasses
import enum
import threading
import time
from typing import Dict, List, Optional

import numpy as np

from awq_tpu.serve.http import JsonHTTPServer, post_json

HEART_BEAT_EXPIRATION = 30.0  # constants.py:24-26 / controller.py:66


class DispatchMethod(enum.Enum):
    LOTTERY = "lottery"
    SHORTEST_QUEUE = "shortest_queue"


@dataclasses.dataclass
class WorkerInfo:
    model_names: List[str]
    speed: float
    queue_length: int
    last_heart_beat: float


class Controller:
    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 dispatch: DispatchMethod = DispatchMethod.SHORTEST_QUEUE):
        self.workers: Dict[str, WorkerInfo] = {}
        self.dispatch = dispatch
        self._lock = threading.Lock()
        self.server = JsonHTTPServer(host, port)
        s = self.server
        s.route("/register_worker", self.register_worker)
        s.route("/receive_heart_beat", self.receive_heart_beat)
        s.route("/refresh_all_workers", self.refresh_all_workers)
        s.route("/list_models", self.list_models)
        s.route("/get_worker_address", self.get_worker_address)

    # ---- lifecycle --------------------------------------------------------

    @property
    def url(self) -> str:
        return f"http://{self.server.host}:{self.server.port}"

    def start(self) -> None:
        self.server.start()

    def stop(self) -> None:
        self.server.stop()

    # ---- endpoints --------------------------------------------------------

    def register_worker(self, p: dict) -> dict:
        with self._lock:
            self.workers[p["worker_name"]] = WorkerInfo(
                model_names=p["model_names"],
                speed=p.get("speed", 1.0),
                queue_length=p.get("queue_length", 0),
                last_heart_beat=time.time(),
            )
        return {"exist": True}

    def receive_heart_beat(self, p: dict) -> dict:
        with self._lock:
            w = self.workers.get(p["worker_name"])
            if w is None:
                return {"exist": False}  # worker must re-register
            w.queue_length = p.get("queue_length", w.queue_length)
            w.last_heart_beat = time.time()
        return {"exist": True}

    def _expire(self) -> None:
        now = time.time()
        with self._lock:
            dead = [n for n, w in self.workers.items()
                    if w.last_heart_beat < now - HEART_BEAT_EXPIRATION]
            for n in dead:
                del self.workers[n]

    def refresh_all_workers(self, p: dict) -> dict:
        self._expire()
        alive = {}
        for name in list(self.workers):
            try:
                st = post_json(name + "/worker_get_status", {}, timeout=5)
                alive[name] = st
            except Exception:
                with self._lock:
                    self.workers.pop(name, None)
        return {"workers": list(alive)}

    def list_models(self, p: dict) -> dict:
        self._expire()
        models: List[str] = []
        with self._lock:
            for w in self.workers.values():
                models.extend(w.model_names)
        return {"models": sorted(set(models))}

    def get_worker_address(self, p: dict) -> dict:
        self._expire()
        model = p["model"]
        with self._lock:
            cands = [(n, w) for n, w in self.workers.items()
                     if model in w.model_names]
            if not cands:
                return {"address": ""}
            if self.dispatch == DispatchMethod.LOTTERY:
                speeds = np.asarray([w.speed for _, w in cands], np.float64)
                speeds /= speeds.sum()
                idx = int(np.random.choice(len(cands), p=speeds))
            else:
                qs = [w.queue_length / max(w.speed, 1e-6) for _, w in cands]
                idx = int(np.argmin(qs))
                cands[idx][1].queue_length += 1
            return {"address": cands[idx][0]}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser("awq_tpu.serve.controller")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21001)
    ap.add_argument("--dispatch", default="shortest_queue",
                    choices=[m.value for m in DispatchMethod])
    args = ap.parse_args(argv)
    c = Controller(args.host, args.port, DispatchMethod(args.dispatch))
    c.start()
    print(f"[controller] listening on {c.url}")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        c.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
