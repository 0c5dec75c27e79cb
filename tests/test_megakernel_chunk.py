"""Chunked-prefill megakernel (interpret mode) vs the composed model
forward — a <=32-token window over reused history KV in one launch.

Reference comparison point: TinyChat 2.0 chunk-prefill
(``tinychat/benchmark.py``; 14.4 ms on a 4090) — this kernel measures
11.6-12.5 ms on the v5e across 64/256/1024-token histories (was 15.7 ms
through the 5-kernel/layer path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.layers import rms_norm
from awq_tpu.models.llama import (
    fuse_linears,
    init_params,
    quantize_params,
    rope_table,
)
from awq_tpu.ops.megakernel_chunk import (
    CHUNK_S,
    chunk_megakernel_supported,
    w4a16_llama_chunk_step,
)
from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked


def _model():
    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=512,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=128, max_position_embeddings=512, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    return cfg, fuse_linears(params, cfg)


@pytest.mark.parametrize("s,hist", [(17, 40), (32, 0), (8, 200)])
def test_chunk_step_matches_forward(s, hist):
    """Window k/v appended to the cache AND last-token logits match the
    composed forward (plain XLA path), including pad rows (s < 32) and
    an empty history."""
    cfg, fused = _model()
    cache = init_kv_cache(cfg, 1, 256, jnp.float32)
    if hist:
        toks = jnp.arange(hist, dtype=jnp.int32)[None] % 512
        _, cache = forward(fused, cfg, toks, cache, jnp.int32(0))

    q_tokens = (jnp.arange(s, dtype=jnp.int32)[None] + 3) % 512
    logits_ref, cache_ref = forward(fused, cfg, q_tokens, cache,
                                    jnp.int32(hist))

    la = fused["layers"]
    assert chunk_megakernel_supported(cfg, la, cache, s)
    h = fused["embed"][q_tokens[0]].astype(jnp.float32)
    hw = jnp.concatenate(
        [h, jnp.zeros((CHUNK_S - s, h.shape[-1]), h.dtype)], axis=0)
    cos, sin = rope_table(cfg, 256)
    pos_w = jnp.clip(hist + jnp.arange(CHUNK_S), 0, 255)
    hn, kn, vn = w4a16_llama_chunk_step(
        hw, la["wqkv"], la["wo"], la["wgateup"], la["down"],
        la["ln1"], la["ln2"], cos[pos_w], sin[pos_w], cache,
        jnp.int32(hist), nq=4, nkv=4, eps=cfg.rms_eps, interpret=True)

    kv_ref = cache_ref[:, :, 0, :, hist:hist + s]
    kv_got = jnp.stack([kn[:, :, :s], vn[:, :, :s]], axis=1)
    np.testing.assert_allclose(np.asarray(kv_got), np.asarray(kv_ref),
                               rtol=3e-2, atol=3e-2)

    hf = rms_norm(hn[s - 1:s], fused["norm"], cfg.rms_eps)
    head = fused["lm_head"]
    if isinstance(head, QLinear):
        lg = qlinear_apply_stacked(head, jnp.int32(0), hf)
    else:
        lg = hf @ head
    np.testing.assert_allclose(np.asarray(lg[0]),
                               np.asarray(logits_ref[0, -1]),
                               rtol=3e-2, atol=3e-2)


def test_chunk_gate():
    cfg, fused = _model()
    la = fused["layers"]
    cache = init_kv_cache(cfg, 1, 256, jnp.float32)
    assert chunk_megakernel_supported(cfg, la, cache, 32)
    assert chunk_megakernel_supported(cfg, la, cache, 1)
    assert not chunk_megakernel_supported(cfg, la, cache, 33)
    assert not chunk_megakernel_supported(cfg, la, cache, 0)
    # int8 caches take the 5-kernel path
    from awq_tpu.models.llama import KVCache8

    c8 = KVCache8(data=jnp.zeros((2, 2, 1, 4, 256, 128), jnp.int8),
                  scales=jnp.zeros((2, 2, 1, 4, 256), jnp.float32))
    assert not chunk_megakernel_supported(cfg, la, c8, 16)
