"""Rejection-sampling speculation (temperature > 0).

The acceptor (``sampling.spec_accept_sample``) must emit tokens
distributed EXACTLY as vanilla ancestral sampling from the processed
logits — the standard speculative-sampling guarantee, specialized to the
deterministic prompt-lookup drafter (point-mass q: accept draft d with
prob p(d), resample the residual p\\{d} on rejection). Greedy rows keep
the bit-identity contract. Reference has no speculation at all.
"""

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig
from awq_tpu.models.llama import init_params, quantize_params
from awq_tpu.runtime.sampling import process_logits, spec_accept_sample


def _tv(a, b):
    return float(np.abs(a - b).sum()) / 2


def test_spec_accept_sample_distribution():
    """Empirical emit distribution vs the analytic processed softmax:
    position-0 marginal and position-1 conditional (given the first
    draft was accepted) must both match within statistical tolerance."""
    V, k = 16, 3
    W = k + 1
    logits = jax.random.normal(jax.random.PRNGKey(0), (1, W, V)) * 2.0
    # draft each position's argmax so acceptance is common (the
    # conditional histogram below needs surviving samples)
    argm = np.asarray(jnp.argmax(logits, -1))[0]
    windows = jnp.asarray([[5, argm[0], argm[1], argm[2]]], jnp.int32)
    m_cap = jnp.asarray([k], jnp.int32)
    temps = jnp.asarray([0.8], jnp.float32)
    top_ks = jnp.asarray([0], jnp.int32)
    top_ps = jnp.asarray([1.0], jnp.float32)
    greedy = jnp.asarray([False])

    proc = process_logits(logits.astype(jnp.float32), temps[:, None],
                          top_ks[:, None], top_ps[:, None])
    p = np.asarray(jax.nn.softmax(proc, -1))[0]        # [W, V] analytic

    N = 40000
    keys = jax.random.split(jax.random.PRNGKey(42), N)
    emit, take = jax.vmap(lambda kk: spec_accept_sample(
        logits, windows, m_cap, kk, temps, top_ks, top_ps, greedy))(keys)
    emit = np.asarray(emit)[:, 0]                      # [N, W]
    take = np.asarray(take)[:, 0]                      # [N]

    # first emitted token ~ p_0 (accept d with p_0(d) + residual)
    hist0 = np.bincount(emit[:, 0], minlength=V) / N
    assert _tv(hist0, p[0]) < 0.02, _tv(hist0, p[0])
    # acceptance rate of the first draft == p_0(d_1)
    acc = float((take >= 2).mean())
    assert abs(acc - p[0, argm[0]]) < 0.02, (acc, p[0, argm[0]])
    # second emitted token | first draft accepted ~ p_1
    sel = take >= 2
    assert sel.sum() > 5000          # conditioning keeps enough samples
    hist1 = np.bincount(emit[sel][:, 1], minlength=V) / max(sel.sum(), 1)
    assert _tv(hist1, p[1]) < 0.03, _tv(hist1, p[1])
    # every accepted prefix is the draft verbatim
    assert (emit[sel][:, 0] == argm[0]).all()


def test_spec_accept_sample_top_k_top_p():
    """Processed-distribution path: top_k/top_p masks apply to both the
    acceptance probability and the residual; tokens outside the mask
    never emit."""
    V, k = 16, 2
    logits = jax.random.normal(jax.random.PRNGKey(1), (1, k + 1, V))
    windows = jnp.asarray([[0, 4, 9]], jnp.int32)
    m_cap = jnp.asarray([k], jnp.int32)
    temps = jnp.asarray([1.0], jnp.float32)
    top_ks = jnp.asarray([4], jnp.int32)
    top_ps = jnp.asarray([0.9], jnp.float32)
    greedy = jnp.asarray([False])

    proc = process_logits(logits.astype(jnp.float32), temps[:, None],
                          top_ks[:, None], top_ps[:, None])
    allowed = np.asarray(proc) > -np.inf               # [1, W, V]

    N = 4000
    keys = jax.random.split(jax.random.PRNGKey(7), N)
    emit, take = jax.vmap(lambda kk: spec_accept_sample(
        logits, windows, m_cap, kk, temps, top_ks, top_ps, greedy))(keys)
    emit, take = np.asarray(emit)[:, 0], np.asarray(take)[:, 0]
    for j in range(k + 1):
        sel = take >= j + 1
        toks = emit[sel][:, j]
        assert allowed[0, j][toks].all()


def test_spec_accept_sample_greedy_identity():
    """greedy=True rows reproduce the host accept loop exactly: longest
    argmax-matching draft prefix + the argmax at first disagreement."""
    V, k = 32, 4
    logits = jax.random.normal(jax.random.PRNGKey(3), (2, k + 1, V))
    argm = np.asarray(jnp.argmax(logits, -1))          # [2, W]
    # row 0: drafts match argmax for 2 positions then diverge
    w0 = [1, int(argm[0, 0]), int(argm[0, 1]), (int(argm[0, 2]) + 1) % V,
          int(argm[0, 3])]
    # row 1: first draft already disagrees
    w1 = [2, (int(argm[1, 0]) + 1) % V, 0, 0, 0]
    windows = jnp.asarray([w0, w1], jnp.int32)
    m_cap = jnp.asarray([k, k], jnp.int32)
    ones = jnp.ones(2, jnp.float32)
    emit, take = spec_accept_sample(
        logits, windows, m_cap, jax.random.PRNGKey(0),
        ones, jnp.zeros(2, jnp.int32), ones, jnp.asarray([True, True]))
    emit, take = np.asarray(emit), np.asarray(take)
    assert take[0] == 3
    assert list(emit[0, :3]) == [argm[0, 0], argm[0, 1], argm[0, 2]]
    assert take[1] == 1 and emit[1, 0] == argm[1, 0]


def test_spec_alibi_falls_back_to_plain_decode():
    """spec_k on an ALiBi arch (mpt/bloom): verify_step_batched has no
    alibi path, so eligibility must route to plain decode — the engine
    completes instead of crashing at trace time (review regression)."""
    from awq_tpu.runtime.batch_engine import BatchEngine

    cfg = ModelConfig(
        arch="mpt", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
        norm="layernorm", act="gelu", pos_embed="alibi",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(2)),
                             QuantConfig(w_bit=4, group_size=128))
    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=128, spec_k=3,
                      cache_dtype=jnp.float32)
    assert not eng._spec_eligible([])
    rid = eng.submit([7, 8, 7, 8, 7, 8],
                     GenConfig(greedy=True, max_new_tokens=6))
    done = eng.run()
    assert len(done[rid].out_ids) == 6


def test_engine_spec_mixed_batch():
    """A spec BatchEngine with one greedy and one temperature-0.7 row:
    the greedy row still matches the plain engine bit-for-bit (argmax
    acceptance is RNG-independent), and the sampled row completes with
    exactly max_new tokens — temperature>0 no longer disables the spec
    path (round-4 verdict weak #5)."""
    from awq_tpu.runtime.batch_engine import BatchEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(2)),
                             QuantConfig(w_bit=4, group_size=128))
    prompt_g = list(np.tile([7, 8, 9, 10], 4))
    prompt_s = [3, 4, 3, 4, 3, 4]
    gen_g = GenConfig(greedy=True, max_new_tokens=10)
    gen_s = GenConfig(greedy=False, temperature=0.7, top_k=20, top_p=0.9,
                      max_new_tokens=10)

    ref = BatchEngine(cfg, params, n_slots=2, max_seq_len=128,
                      cache_dtype=jnp.float32)
    r0 = ref.submit(prompt_g, gen_g)
    ref_done = ref.run()

    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=128,
                      cache_dtype=jnp.float32, spec_k=3)
    g0 = eng.submit(prompt_g, gen_g)
    g1 = eng.submit(prompt_s, gen_s)
    assert eng._spec_eligible([])
    done = eng.run()
    assert done[g0].out_ids == ref_done[r0].out_ids
    assert len(done[g1].out_ids) == 10
    assert all(0 <= t < 64 for t in done[g1].out_ids)
