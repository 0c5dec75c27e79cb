"""Speculative decoding (prompt-lookup drafting): the key invariant is
that greedy speculative output is token-for-token IDENTICAL to vanilla
greedy decoding, for any draft quality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.llama import fuse_linears, init_params, quantize_params
from awq_tpu.runtime.speculative import generate_speculative, ngram_propose


def test_ngram_propose():
    ctx = np.array([5, 6, 7, 8, 9, 1, 2, 5, 6, 7], np.int32)
    # trailing 3-gram (5,6,7) occurred at the start; the next tokens
    # there were 8, 9, 1, ...
    d = ngram_propose(ctx, k=3, n=3)
    assert list(d) == [8, 9, 1]
    # no earlier occurrence of any suffix gram -> empty draft
    assert len(ngram_propose(np.arange(10, dtype=np.int32), k=4)) == 0
    # shorter-gram fallback: only the 1-gram tail matches
    ctx2 = np.array([3, 9, 9, 4, 1, 3], np.int32)
    d2 = ngram_propose(ctx2, k=2, n=3)
    assert list(d2) == [9, 9]


def test_engine_generate_speculative():
    """Engine-level API: same output as Engine.generate(greedy), KV
    reuse across dialogue rounds."""
    from awq_tpu.config import GenConfig, RuntimeConfig
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(2)),
                             QuantConfig(w_bit=4, group_size=128))
    rt = RuntimeConfig(max_seq_len=128, max_batch_size=1)
    prompt = list(np.tile([7, 8, 9, 10], 4))

    e1 = InferenceEngine(cfg, params, rt, cache_dtype=jnp.float32)
    ref = e1.generate(prompt, GenConfig(greedy=True, max_new_tokens=12))
    e2 = InferenceEngine(cfg, params, rt, cache_dtype=jnp.float32)
    got = e2.generate_speculative(prompt, 12, k=5)
    assert list(map(int, got["output_ids"])) == \
        list(map(int, ref["output_ids"]))
    assert e2.start_pos == e1.start_pos
    # second round reuses history KV from the same start_pos
    got2 = e2.generate_speculative([3, 4, 5], 6, k=5)
    assert len(got2["output_ids"]) == 6


def test_speculative_matches_vanilla_greedy():
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(2)),
                             QuantConfig(w_bit=4, group_size=128))
    params = fuse_linears(params, cfg)
    # a repetitive prompt so the n-gram drafter actually proposes
    prompt = jnp.asarray(
        np.tile([7, 8, 9, 10], 6)[None].astype(np.int32))
    max_new = 24

    # vanilla greedy
    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    logits, cache = forward(params, cfg, prompt, cache, jnp.int32(0))
    nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
    ref = [nxt]
    length = prompt.shape[1]
    for _ in range(max_new - 1):
        logits, cache = forward(params, cfg,
                                jnp.asarray([[ref[-1]]], jnp.int32),
                                cache, jnp.int32(length))
        length += 1
        ref.append(int(np.asarray(jnp.argmax(logits[0, -1]))))

    got, stats = generate_speculative(
        params, cfg, prompt, init_kv_cache(cfg, 1, 128, jnp.float32),
        max_new, k=5, n=3)
    assert got == ref, (got, ref)
    # the drafter must have been exercised (repetitive prompt) and the
    # loop must have taken fewer forwards than tokens whenever any draft
    # was accepted
    assert stats["drafted"] > 0
    assert stats["steps"] <= max_new + 1


def test_device_spec_loop_matches_vanilla_greedy():
    """The fully device-side spec loop (one jitted while_loop, one host
    fetch) obeys the same greedy-identity contract as the host loop."""
    from awq_tpu.config import GenConfig
    from awq_tpu.runtime.generate import generate
    from awq_tpu.runtime.speculative import spec_decode_device

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(5)),
                             QuantConfig(w_bit=4, group_size=128))
    prompt = list(np.tile([7, 8, 9, 10], 4))
    toks = jnp.asarray([prompt], jnp.int32)

    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    ref = generate(params, cfg, toks, cache,
                   GenConfig(greedy=True, max_new_tokens=12))
    n = int(ref["n_valid"][0])
    ref_ids = [int(t) for t in ref["output_ids"][0][:n]]

    cache2 = init_kv_cache(cfg, 1, 128, jnp.float32)
    got, stats = spec_decode_device(params, cfg, toks, cache2, 12, k=5)
    assert got == ref_ids, (got, ref_ids)
    assert stats["steps"] >= 1

    # with an eos forced mid-stream: output truncates at (and includes)
    # the stop token, like the host loop
    if len(ref_ids) >= 4:
        eos = ref_ids[3]
        cache3 = init_kv_cache(cfg, 1, 128, jnp.float32)
        got3, _ = spec_decode_device(params, cfg, toks, cache3, 12, k=5,
                                     eos=eos)
        assert got3 == ref_ids[:ref_ids.index(eos) + 1]

    # engine API routes through the device loop when asked
    from awq_tpu.config import RuntimeConfig
    from awq_tpu.runtime.engine import InferenceEngine

    e = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=128),
                        cache_dtype=jnp.float32)
    out = e.generate_speculative(prompt, 12, k=5, device_loop=True)
    assert [int(t) for t in out["output_ids"]] == ref_ids


def test_device_spec_loop_batched():
    """b>1 device spec loop (round-5: the b==1 assert lifted): every
    row's greedy output matches its own single-stream vanilla greedy."""
    from awq_tpu.config import GenConfig
    from awq_tpu.runtime.generate import generate
    from awq_tpu.runtime.speculative import spec_decode_device

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(5)),
                             QuantConfig(w_bit=4, group_size=128))
    prompts = np.stack([np.tile([7, 8, 9, 10], 4),
                        np.tile([3, 4, 5, 6], 4),
                        np.tile([11, 12], 8)]).astype(np.int32)
    toks = jnp.asarray(prompts)
    max_new = 12

    refs = []
    for i in range(3):
        cache = init_kv_cache(cfg, 1, 128, jnp.float32)
        r = generate(params, cfg, toks[i:i + 1], cache,
                     GenConfig(greedy=True, max_new_tokens=max_new))
        nv = int(r["n_valid"][0])
        refs.append([int(t) for t in r["output_ids"][0][:nv]])

    cache = init_kv_cache(cfg, 3, 128, jnp.float32)
    got, stats = spec_decode_device(params, cfg, toks, cache, max_new,
                                    k=5)
    assert isinstance(got, list) and len(got) == 3
    for i in range(3):
        assert got[i][:len(refs[i])] == refs[i], (i, got[i], refs[i])
    assert stats["steps"] >= 1


def test_device_spec_loop_sampled():
    """Sampled (temperature>0) device spec loop through the engine API:
    completes with max_new in-vocab tokens; greedy path stays the
    default and bit-identical (covered above). Distribution exactness
    of the acceptance rule is proven in test_spec_sampling.py."""
    from awq_tpu.config import GenConfig, RuntimeConfig
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(5)),
                             QuantConfig(w_bit=4, group_size=128))
    prompt = list(np.tile([7, 8, 9, 10], 4))
    e = InferenceEngine(cfg, params, RuntimeConfig(max_seq_len=128),
                        cache_dtype=jnp.float32)
    out = e.generate_speculative(
        prompt, 10, k=5,
        gen=GenConfig(greedy=False, temperature=0.8, top_k=20,
                      top_p=0.95, max_new_tokens=10))
    ids = [int(t) for t in out["output_ids"]]
    assert len(ids) == 10 and all(0 <= t < 64 for t in ids)
    assert out["stats"]["steps"] >= 1


def test_device_spec_loop_near_capacity():
    """When prompt+max_new nearly fills the cache, the device loop must
    degrade to draft-less single-token windows (like the host loop)
    rather than stop up to ~k+1 tokens short of max_new."""
    from awq_tpu.runtime.speculative import spec_decode_device

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256,
        intermediate_size=256, num_layers=2, num_heads=2, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(5)),
                             QuantConfig(w_bit=4, group_size=128))
    prompt = list(np.tile([7, 8, 9, 10], 4))      # 16 tokens
    toks = jnp.asarray([prompt], jnp.int32)
    max_t = 36                                    # 16 + 20 tokens of room
    max_new = 19                                  # fills to max_t - 1

    got_host, _ = generate_speculative(
        params, cfg, toks, init_kv_cache(cfg, 1, max_t, jnp.float32),
        max_new, k=5, n=3)
    got_dev, stats = spec_decode_device(
        params, cfg, toks, init_kv_cache(cfg, 1, max_t, jnp.float32),
        max_new, k=5, n=3)
    assert got_dev == got_host, (got_dev, got_host)
    assert len(got_dev) == max_new
    # stats parity: drafted reflects real candidate windows, not steps*k
    assert 0 <= stats["accepted"] <= stats["drafted"]
