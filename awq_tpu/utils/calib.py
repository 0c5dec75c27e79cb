"""Calibration datasets.

Counterpart of ``awq/utils/calib_data.py:5-32`` (pile-val, 512-token
blocks). Adds two network-free sources: a local text/jsonl file and a
deterministic synthetic stream (for tests and air-gapped machines).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def get_calib_dataset(
    data: str = "pileval",
    tokenizer=None,
    n_samples: int = 512,
    block_size: int = 512,
    vocab_size: Optional[int] = None,
    seed: int = 42,
) -> np.ndarray:
    """Returns int32 token blocks ``[n_blocks, block_size]``.

    ``data`` may be "pileval" (HF hub, needs network), a path to a local
    .txt/.jsonl file, or "synthetic" (requires vocab_size).
    """
    if data == "synthetic":
        assert vocab_size is not None, "synthetic calib needs vocab_size"
        rng = np.random.RandomState(seed)
        total = n_samples * block_size
        # zipf-ish marginal so activations see realistic token imbalance
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        probs = 1.0 / ranks
        probs /= probs.sum()
        toks = rng.choice(vocab_size, size=total, p=probs).astype(np.int32)
        return toks.reshape(n_samples, block_size)

    texts = []
    if data == "pileval":
        from datasets import load_dataset

        ds = load_dataset("mit-han-lab/pile-val-backup", split="validation")
        ds = ds.shuffle(seed=seed)
        texts = (row["text"] for row in ds)
    else:  # local file
        import json
        import os

        assert os.path.exists(data), f"calib file not found: {data}"
        with open(data) as f:
            if data.endswith(".jsonl"):
                texts = [json.loads(line).get("text", "") for line in f]
            else:
                texts = f.read().split("\n\n")

    # mirror the reference: skip >512-token lines, concat, split into blocks
    assert tokenizer is not None
    samples, n_run = [], 0
    for line in texts:
        line = line.strip()
        enc = tokenizer.encode(line)
        if len(enc) > 512 or len(enc) == 0:
            continue
        samples.append(enc)
        n_run += 1
        if n_run == n_samples:
            break
    cat = np.concatenate([np.asarray(s, np.int32) for s in samples])
    n_split = len(cat) // block_size
    return cat[: n_split * block_size].reshape(n_split, block_size)
