import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig, RuntimeConfig
from awq_tpu.models import init_params, init_kv_cache, forward
from awq_tpu.runtime import InferenceEngine, generate
from awq_tpu.runtime.sampling import apply_top_k, apply_top_p, sample_logits
from awq_tpu.runtime.prompts import Prompter, get_prompter


def tiny_cfg():
    return ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=32,
        max_position_embeddings=64, dtype="float32",
    )


def test_topk_topp():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    k = apply_top_k(logits, 2)
    assert np.isneginf(np.asarray(k))[0, [0, 2, 3]].all()
    assert np.isfinite(np.asarray(k))[0, [1, 4]].all()
    p = apply_top_p(logits, 0.5)
    # top1 always kept
    assert np.isfinite(np.asarray(p)[0, 1])


def test_greedy_scan_matches_stepwise():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    gen = GenConfig(greedy=True, max_new_tokens=8, repetition_penalty=1.0)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 128)
    cache = init_kv_cache(cfg, 1, 32, jnp.float32)

    out = generate(params, cfg, prompt, cache, gen)
    ids_scan = np.asarray(out["output_ids"])[0]

    # manual stepwise greedy
    logits, c = forward(params, cfg, prompt, cache, jnp.int32(0))
    tok = int(logits[:, -1].argmax(-1)[0])
    ids_ref = [tok]
    pos = 6
    for _ in range(7):
        logits, c = forward(params, cfg, jnp.asarray([[tok]]), c, jnp.int32(pos))
        tok = int(logits[:, -1].argmax(-1)[0])
        ids_ref.append(tok)
        pos += 1
    np.testing.assert_array_equal(ids_scan, np.asarray(ids_ref))
    assert out["timing"]["ttft_s"] > 0


def test_stop_token_truncates():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    gen = GenConfig(greedy=True, max_new_tokens=8)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 128)
    cache = init_kv_cache(cfg, 1, 32, jnp.float32)
    free = generate(params, cfg, prompt, cache, gen)
    ids = np.asarray(free["output_ids"])[0]
    # use the 2nd generated token as a stop token -> n_valid = 2
    out = generate(params, cfg, prompt, cache, gen, stop_ids=[int(ids[1])])
    assert int(out["n_valid"][0]) == 2


def test_engine_multiround_chunked_prefill():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(
        cfg, params, RuntimeConfig(max_seq_len=64, max_batch_size=1),
        cache_dtype=jnp.float32,
    )
    gen = GenConfig(greedy=True, max_new_tokens=4)
    r1 = eng.generate([1, 2, 3], gen)
    assert eng.start_pos == 3 + len(r1["output_ids"])
    r2 = eng.generate([4, 5], gen)
    assert len(r2["output_ids"]) >= 1

    # round-2 result must equal running the whole history in one engine
    eng2 = InferenceEngine(
        cfg, params, RuntimeConfig(max_seq_len=64, max_batch_size=1),
        cache_dtype=jnp.float32,
    )
    hist = [1, 2, 3] + list(map(int, r1["output_ids"])) + [4, 5]
    r2b = eng2.generate(hist, gen)
    np.testing.assert_array_equal(
        np.asarray(r2["output_ids"]), np.asarray(r2b["output_ids"])
    )


def test_repetition_penalty_discourages_repeat():
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((1, 16)).at[0, 3].set(5.0).at[0, 7].set(2.0)
    seen = jnp.zeros((1, 16), bool).at[0, 3].set(True)
    g_hi = GenConfig(greedy=True, repetition_penalty=100.0)
    tok = sample_logits(logits, key, g_hi, seen)
    assert int(tok[0]) == 7  # seen token 3 penalized 5.0 -> 0.05 < 2.0


def test_prompter_delta_mode():
    p = get_prompter("llama", "llama-3-8b")
    assert p.name == "llama3"
    p.insert_prompt("hi")
    d1 = p.delta_prompt()
    assert "hi" in d1 and d1.startswith("<|begin_of_text|>")
    p.update_template("hello!")
    p.insert_prompt("bye")
    d2 = p.delta_prompt()
    assert d2.startswith("hello!") and "bye" in d2 and "hi" not in d2
    assert p.full_prompt == d1 + d2


def test_vlm_prompter_routing():
    """VLM templates route by model path (prompt_templates.py:343-399 +
    llava_conv.py counterparts)."""
    assert get_prompter("llama", "llava-v1.5-7b").name == "llava"
    assert get_prompter("llama", "VILA-7b").name == "llava"
    assert get_prompter("llama", "llava-llama-3-8b").name == "llava-llama3"
    assert get_prompter("nvila", "NVILA-8B").name == "nvila"
    assert get_prompter("internvl3", "InternVL3-8B").name == "internvl"
    # VLM routing must not shadow the text families
    assert get_prompter("llama", "llama-3-8b").name == "llama3"
    assert get_prompter("llama", "vicuna-7b").name == "vicuna"

    p = get_prompter("nvila", "NVILA-8B")
    p.insert_prompt("<image>\nwhat is this?")
    t = p.full_prompt
    assert t.startswith("<|im_start|>system\n")
    assert "<|im_start|>user\n<image>" in t
    assert t.endswith("<|im_start|>assistant\n")


def test_engine_quantize_head():
    """RuntimeConfig.quantize_head: the fp lm_head is W4-quantized + tiled
    at engine construction; greedy output stays sensible and close to the
    fp-head engine (heads differ only by quantization error)."""
    from awq_tpu.config import QuantConfig
    from awq_tpu.models import init_qparams
    from awq_tpu.ops.w4a16 import QLinear

    cfg = tiny_cfg()
    qcfg = QuantConfig(w_bit=4, group_size=32)
    params = init_qparams(cfg, qcfg, jax.random.PRNGKey(0))
    assert not isinstance(params["lm_head"], QLinear)

    eng_q = InferenceEngine(
        cfg, params, RuntimeConfig(max_seq_len=64, quantize_head=True),
        cache_dtype=jnp.float32,
    )
    assert isinstance(eng_q.params["lm_head"], QLinear)
    # fuse_linears retiles the quantized head into the stacked-of-1
    # folded layout the megakernel's head phase reads
    assert eng_q.params["lm_head"].qweight.ndim == 4

    eng_f = InferenceEngine(
        cfg, params, RuntimeConfig(max_seq_len=64),
        cache_dtype=jnp.float32,
    )
    assert not isinstance(eng_f.params["lm_head"], QLinear)

    gen = GenConfig(greedy=True, max_new_tokens=6)
    rq = eng_q.generate([1, 2, 3], gen)
    assert len(rq["output_ids"]) >= 1   # generation runs end to end

    # the quantized head's logits track the fp head's (random tiny-model
    # logits are closely spaced, so argmax may flip — compare the vectors)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    cq = init_kv_cache(cfg, 1, 64, jnp.float32)
    lq, _ = forward(eng_q.params, cfg, toks, cq, jnp.int32(0))
    lf, _ = forward(eng_f.params, cfg, toks, cq, jnp.int32(0))
    a = np.asarray(lq[0, -1], np.float64)
    b = np.asarray(lf[0, -1], np.float64)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos
