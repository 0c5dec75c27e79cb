"""WikiText-2 style perplexity evaluation.

Counterpart of the CLI ppl loop at ``awq/entry.py:301-333`` (itself adopted
from GPTQ): concatenate the corpus, split into fixed windows, sum token NLL
over all windows, report ``exp(mean)``. Here each window's NLL is one jitted
call returning two scalars, so only bytes cross the host link.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.config import ModelConfig
from awq_tpu.models import forward, init_kv_cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, cfg: ModelConfig, tokens, cache) -> Tuple[jax.Array, jax.Array]:
    """Sum NLL (f32) + token count of next-token prediction in one window."""
    logits, _ = forward(
        params, cfg, tokens, cache, jnp.int32(0), last_only=False
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    lp = jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)[..., 0]
    return -jnp.sum(lp), jnp.asarray(tgt.size, jnp.float32)


def perplexity(
    params,
    cfg: ModelConfig,
    token_ids: np.ndarray,
    seqlen: int = 2048,
    max_windows: Optional[int] = None,
    cache_dtype=jnp.bfloat16,
    verbose: bool = False,
) -> float:
    """Windowed perplexity over a 1-D token stream (``entry.py:301-327``)."""
    ids = np.asarray(token_ids, np.int32).reshape(-1)
    n_win = len(ids) // seqlen
    if max_windows is not None:
        n_win = min(n_win, max_windows)
    if n_win == 0:
        raise ValueError(f"need at least {seqlen} tokens, got {len(ids)}")
    cache = init_kv_cache(cfg, 1, seqlen, cache_dtype)
    tot_nll, tot_cnt = 0.0, 0.0
    for i in range(n_win):
        w = jnp.asarray(ids[i * seqlen:(i + 1) * seqlen][None])
        nll, cnt = _window_nll(params, cfg, w, cache)
        tot_nll += float(nll)
        tot_cnt += float(cnt)
        if verbose:
            import math

            print(f"[ppl] window {i + 1}/{n_win}: "
                  f"running ppl {math.exp(tot_nll / tot_cnt):.4f}")
    import math

    return math.exp(tot_nll / tot_cnt)


def load_text_tokens(
    source: str, tokenizer, split: str = "test"
) -> np.ndarray:
    """Tokenize an evaluation corpus into one 1-D stream.

    ``source`` may be "wikitext2" (HF hub) or a local text file. Mirrors the
    reference's ``wikitext`` branch (``awq/entry.py:301-305``:
    ``"\\n\\n".join(text)``).
    """
    if source == "wikitext2":
        from datasets import load_dataset

        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        text = "\n\n".join(ds["text"])
    else:
        with open(source) as f:
            text = f.read()
    return np.asarray(tokenizer.encode(text), np.int32)
