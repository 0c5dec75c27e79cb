"""lm-eval harness adaptor.

Counterpart of ``awq/utils/lm_eval_adaptor.py:7-116`` (which wraps a torch
model for lm-eval v0.3). This targets the lm-eval v0.4 ``LM`` interface but
is written duck-typed so it imports (and is unit-testable) without lm_eval
installed; ``evaluate_tasks`` performs the gated import.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import forward, init_kv_cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def _score_window(params, cfg: ModelConfig, tokens, cache):
    """Per-position target logprob + greedy-match flags for one window."""
    logits, _ = forward(params, cfg, tokens, cache, jnp.int32(0), last_only=False)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    lp = jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(logits[:, :-1], axis=-1) == tgt
    return lp, greedy


class LMEvalAdaptor:
    """Minimal LM-interface implementation over an awq_tpu model.

    Methods mirror lm-eval's ``LM``: ``loglikelihood``,
    ``loglikelihood_rolling``, ``generate_until`` (each taking either raw
    (context, continuation) string pairs or lm-eval Instance objects).
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        tokenizer,
        max_length: int = 2048,
        batch_size: int = 1,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = min(max_length, cfg.max_position_embeddings)
        self.batch_size = batch_size
        self._cache = init_kv_cache(cfg, 1, self.max_length, jnp.bfloat16)

    # -- helpers ----------------------------------------------------------

    def _encode_pair(self, context: str, continuation: str) -> Tuple[List[int], List[int]]:
        # whitespace goes with the continuation (lm-eval convention)
        n_spaces = len(context) - len(context.rstrip())
        if n_spaces > 0:
            continuation = context[-n_spaces:] + continuation
            context = context[:-n_spaces]
        whole = self.tokenizer.encode(context + continuation)
        ctx = self.tokenizer.encode(context)
        return ctx, whole[len(ctx):]

    def _score(self, ids: Sequence[int], ctx_len: int) -> Tuple[float, bool]:
        """Loglikelihood of ids[ctx_len:] given ids[:ctx_len]."""
        ids = list(ids)[-self.max_length:]
        ctx_len = max(1, ctx_len - max(0, len(ids) - self.max_length))
        pad = self.max_length - len(ids)
        arr = np.full((1, self.max_length), self.tokenizer.eos_token_id
                      if getattr(self.tokenizer, "eos_token_id", None) is not None
                      else 0, np.int32)
        arr[0, :len(ids)] = ids
        lp, greedy = _score_window(
            self.params, self.cfg, jnp.asarray(arr), self._cache
        )
        lp = np.asarray(lp)[0]
        greedy = np.asarray(greedy)[0]
        # positions predicting tokens ctx_len..len(ids)-1 are ctx_len-1..len(ids)-2
        sl = slice(ctx_len - 1, len(ids) - 1)
        return float(lp[sl].sum()), bool(greedy[sl].all())

    # -- LM interface ------------------------------------------------------

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            context, continuation = (
                req.args if hasattr(req, "args") else req
            )
            ctx, cont = self._encode_pair(context, continuation)
            out.append(self._score(ctx + cont, len(ctx)))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            args = req.args if hasattr(req, "args") else req
            (text,) = args if isinstance(args, (tuple, list)) else (args,)
            ids = self.tokenizer.encode(text)
            total = 0.0
            for i in range(0, max(len(ids) - 1, 1), self.max_length - 1):
                window = ids[i:i + self.max_length]
                lp, _ = self._score(window, 1)
                total += lp
            out.append(total)
        return out

    def generate_until(self, requests) -> List[str]:
        """Generative requests run through the continuous-batching engine
        (``batch_size`` slots decode in lockstep) — a sequential
        batch-1 burst per request made generative acceptance suites
        (AIME / Math-500, ``tinychat/README.md``) impractically slow."""
        from awq_tpu.runtime.batch_engine import BatchEngine

        parsed = []
        for req in requests:
            context, kwargs = req.args if hasattr(req, "args") else req
            parsed.append((context, kwargs.get("until", []),
                           kwargs.get("max_gen_toks", 128)))
        engine = BatchEngine(
            self.cfg, self.params, n_slots=max(1, self.batch_size),
            max_seq_len=self.max_length,
        )
        eos = getattr(self.tokenizer, "eos_token_id", None)
        rids = []
        for context, _until, max_new in parsed:
            ids = self.tokenizer.encode(context)[-self.max_length // 2:]
            rids.append(engine.submit(
                ids, GenConfig(greedy=True, max_new_tokens=max_new),
                stop_ids=[eos] if eos is not None else [],
            ))
        finished = engine.run()
        out = []
        for rid, (_context, until, _max_new) in zip(rids, parsed):
            text = self.tokenizer.decode(
                [int(t) for t in finished[rid].out_ids])
            for stop in until:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            out.append(text)
        return out


def evaluate_tasks(
    adaptor: LMEvalAdaptor, tasks: Sequence[str], **kwargs
) -> Dict[str, Any]:
    """Run lm-eval tasks (counterpart of ``awq/entry.py:335-346``).

    Requires the ``lm_eval`` package (not bundled in every image)."""
    import lm_eval  # gated: optional dependency

    return lm_eval.simple_evaluate(
        model=adaptor, tasks=list(tasks), **kwargs
    )
