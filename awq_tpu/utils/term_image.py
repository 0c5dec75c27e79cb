"""Terminal image display via ANSI half-block characters.

Counterpart of the reference's termvisage-based display
(``tinychat/utils/llava_image_processing.py:45-67``) — termvisage is not
in this image, so this renders directly: each character cell shows two
vertically-stacked pixels using '▀' with 24-bit foreground (top pixel)
and background (bottom pixel) colors. Pure PIL/numpy, no extra deps.
"""

from __future__ import annotations

import os
import shutil
import sys
from typing import Optional

import numpy as np


def render_ansi(img, max_width: Optional[int] = None) -> str:
    """PIL image (or [H, W, 3] uint8 array) -> ANSI half-block string."""
    if max_width is None:
        max_width = min(shutil.get_terminal_size((80, 24)).columns, 100)
    arr = np.asarray(img.convert("RGB") if hasattr(img, "convert") else img)
    h, w = arr.shape[:2]
    # each output char is 1 px wide, 2 px tall; terminal cells are ~2:1
    ow = min(max_width, w)
    oh = max((h * ow) // w, 2)
    oh += oh % 2
    ys = (np.arange(oh) * h // oh).clip(0, h - 1)
    xs = (np.arange(ow) * w // ow).clip(0, w - 1)
    small = arr[ys][:, xs]                       # [oh, ow, 3]
    lines = []
    for r in range(0, oh, 2):
        top, bot = small[r], small[r + 1]
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
            f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(top, bot)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def show_image(img, max_width: Optional[int] = None, file=None) -> None:
    """Print an image to the terminal (no-op when stdout is not a tty
    unless ``AWQ_TPU_FORCE_TERM_IMAGE=1``)."""
    out = file or sys.stdout
    if not (getattr(out, "isatty", lambda: False)()
            or os.environ.get("AWQ_TPU_FORCE_TERM_IMAGE") == "1"):
        return
    print(render_ansi(img, max_width), file=out)
