"""Logging utilities.

Counterpart of ``tinychat/utils/log_utils.py:36-113``: per-component
rotating daily file logs with optional stdout/stderr capture.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Dict, Optional

_handlers: Dict[str, logging.Handler] = {}

LOG_DIR = os.environ.get("AWQ_TPU_LOG_DIR", "logs")


def build_logger(
    logger_name: str,
    logger_filename: str,
    log_dir: Optional[str] = None,
    redirect_std: bool = False,
) -> logging.Logger:
    """Logger with a midnight-rotating file handler + stderr echo."""
    d = log_dir or LOG_DIR
    os.makedirs(d, exist_ok=True)
    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    if logger_filename not in _handlers:
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(d, logger_filename), when="D", utc=True
        )
        fh.setFormatter(logging.Formatter(
            "%(asctime)s | %(levelname)s | %(name)s | %(message)s"
        ))
        _handlers[logger_filename] = fh
    if _handlers[logger_filename] not in logger.handlers:
        logger.addHandler(_handlers[logger_filename])
    if not any(isinstance(h, logging.StreamHandler)
               for h in logger.handlers):
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(logging.Formatter("%(asctime)s | %(message)s"))
        logger.addHandler(sh)
    if redirect_std:
        sys.stdout = StreamToLogger(logger, logging.INFO)
        sys.stderr = StreamToLogger(logger, logging.ERROR)
    return logger


class StreamToLogger:
    """File-like that forwards writes to a logger
    (``log_utils.py:80-113``)."""

    def __init__(self, logger: logging.Logger, level: int = logging.INFO):
        self.logger = logger
        self.level = level
        self._buf = ""

    def write(self, buf: str) -> None:
        self._buf += buf
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            if line:
                self.logger.log(self.level, line)

    def flush(self) -> None:
        if self._buf:
            self.logger.log(self.level, self._buf)
            self._buf = ""

    def isatty(self) -> bool:
        return False


def violates_moderation(text: str) -> bool:
    """Content-moderation hook for the web demo (counterpart of the
    reference's OpenAI moderation call,
    ``tinychat/utils/log_utils.py:124-146``): POSTs ``text`` to the
    moderation endpoint when ``OPENAI_API_KEY`` is set, else no-op.
    ``AWQ_TPU_MODERATION_URL`` overrides the endpoint (tests point it at
    a local server; this environment has no egress). Fails OPEN on any
    error, like the reference."""
    key = os.environ.get("OPENAI_API_KEY")
    url = os.environ.get("AWQ_TPU_MODERATION_URL",
                         "https://api.openai.com/v1/moderations")
    if not key and "AWQ_TPU_MODERATION_URL" not in os.environ:
        return False
    import json
    import urllib.request

    try:
        req = urllib.request.Request(
            url,
            data=json.dumps(
                {"input": text.replace("\n", "")}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {key or ''}"},
        )
        with urllib.request.urlopen(req, timeout=5) as r:
            out = json.loads(r.read())
        return bool(out["results"][0]["flagged"])
    except Exception:
        return False


def log_conversation(log_dir: str, record: dict) -> None:
    """Append one JSON conversation record to the dated log file
    (counterpart of ``serve/gradio_web_server.py:67-71``)."""
    import datetime
    import json

    os.makedirs(log_dir, exist_ok=True)
    name = datetime.datetime.now().strftime("%Y-%m-%d") + "-conv.json"
    with open(os.path.join(log_dir, name), "a") as f:
        f.write(json.dumps(record) + "\n")
