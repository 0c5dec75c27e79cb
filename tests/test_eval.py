"""Eval harness tests (ppl loop + lm-eval adaptor) on a tiny model."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.config import ModelConfig
from awq_tpu.eval import LMEvalAdaptor, perplexity
from awq_tpu.models import init_params


class FakeTokenizer:
    """Char-level tokenizer: token = min(ord(c), vocab-1)."""

    eos_token_id = 0

    def __init__(self, vocab):
        self.vocab = vocab

    def encode(self, text):
        return [min(ord(c), self.vocab - 1) for c in text]

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        max_position_embeddings=256, dtype="float32",
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_perplexity_bounded_by_vocab(tiny):
    cfg, params = tiny
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, 4 * 64)
    ppl = perplexity(params, cfg, ids, seqlen=64)
    # near-uniform logits on a random init: ppl close to vocab size
    assert 0.2 * cfg.vocab_size < ppl < 5 * cfg.vocab_size


def test_perplexity_window_invariance(tiny):
    cfg, params = tiny
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, 2 * 64)
    p1 = perplexity(params, cfg, ids, seqlen=64)
    p2 = perplexity(params, cfg, ids, seqlen=64, max_windows=2)
    assert math.isclose(p1, p2, rel_tol=1e-6)


def test_lm_eval_adaptor_loglikelihood(tiny):
    cfg, params = tiny
    tok = FakeTokenizer(cfg.vocab_size)
    lm = LMEvalAdaptor(params, cfg, tok, max_length=64)
    (ll, greedy), = lm.loglikelihood([("abc def", " ghi")])
    assert np.isfinite(ll) and ll < 0
    assert isinstance(greedy, bool)
    # identical continuation scores identically
    (ll2, _), = lm.loglikelihood([("abc def", " ghi")])
    assert math.isclose(ll, ll2, rel_tol=1e-6)


def test_lm_eval_adaptor_rolling_and_generate(tiny):
    cfg, params = tiny
    tok = FakeTokenizer(cfg.vocab_size)
    lm = LMEvalAdaptor(params, cfg, tok, max_length=64)
    (r,) = lm.loglikelihood_rolling([("hello world",)])
    assert np.isfinite(r) and r < 0

    class Req:
        args = ("hi", {"until": ["\n"], "max_gen_toks": 8})

    (text,) = lm.generate_until([Req()])
    assert isinstance(text, str)


def test_lm_eval_generate_until_batched_matches_batch1(tiny):
    """Requests batched through the engine == one-at-a-time results
    (greedy decode is order/batch invariant)."""
    cfg, params = tiny
    tok = FakeTokenizer(cfg.vocab_size)

    def reqs():
        class A:
            args = ("hello there", {"until": [], "max_gen_toks": 6})

        class B:
            args = ("general kenobi you are", {"until": [],
                                               "max_gen_toks": 6})

        class C:
            args = ("short", {"until": [], "max_gen_toks": 4})

        return [A(), B(), C()]

    lm1 = LMEvalAdaptor(params, cfg, tok, max_length=64, batch_size=1)
    one_by_one = [lm1.generate_until([r])[0] for r in reqs()]
    lm3 = LMEvalAdaptor(params, cfg, tok, max_length=64, batch_size=3)
    batched = lm3.generate_until(reqs())
    assert batched == one_by_one


def test_evaluate_tasks_through_vendored_harness(tiny, monkeypatch):
    """evaluate_tasks meets a (vendored) lm_eval with the real v0.4 call
    shape: Instance objects with .args tuples in, lists out, results
    dict back — pins the integration surface the real harness uses
    (reference runs it at awq/entry.py:335-346)."""
    import os
    import sys

    vend = os.path.join(os.path.dirname(__file__), "vendored")
    monkeypatch.syspath_prepend(vend)
    for m in [m for m in sys.modules if m.split(".")[0] == "lm_eval"]:
        del sys.modules[m]

    from awq_tpu.eval.lm_eval_adaptor import evaluate_tasks

    cfg, params = tiny
    tok = FakeTokenizer(cfg.vocab_size)
    lm = LMEvalAdaptor(params, cfg, tok, max_length=64, batch_size=2)
    out = evaluate_tasks(
        lm, ["fake_mc", "fake_ppl", "fake_gen"], num_fewshot=0,
        batch_size=2,
    )
    res = out["results"]
    assert set(res) == {"fake_mc", "fake_ppl", "fake_gen"}
    assert 0.0 <= res["fake_mc"]["acc"] <= 1.0
    assert res["fake_ppl"]["word_perplexity"] > 0
    assert 0.0 <= res["fake_gen"]["n_nonempty"] <= 1.0
