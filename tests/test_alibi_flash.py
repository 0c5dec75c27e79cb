"""ALiBi archs (mpt/bloom/falcon-alibi geometries) on the flash-kernel
and explicit-TP paths (round-4 verdict missing #3: the reference's MMHA
serves head dims 32..256 and ALiBi slopes; our flash gates excluded
falcon/mpt from kernels and explicit TP rejected ALiBi outright)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from awq_tpu.config import ModelConfig
from awq_tpu.models import forward, init_kv_cache, init_params


def _mpt_cfg(**kw):
    d = dict(
        arch="mpt", vocab_size=128, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=256, dtype="float32",
        norm="layernorm", act="gelu", pos_embed="alibi",
    )
    d.update(kw)
    return ModelConfig(**d)


def test_alibi_flash_forward_parity(monkeypatch):
    """forward() on an alibi hd=64 geometry: forced-flash (stacked +
    kernel) output == the XLA _layer_forward path, prefill AND decode."""
    cfg = _mpt_cfg()
    params = init_params(cfg, jax.random.PRNGKey(3))
    toks = jnp.asarray([[5, 9, 2, 7, 1, 4, 8, 3]], jnp.int32)

    cache = init_kv_cache(cfg, 1, 256, jnp.float32)
    ref_l, ref_cache = forward(params, cfg, toks, cache, jnp.int32(0),
                               last_only=False)
    ref_d, _ = forward(params, cfg, jnp.asarray([[6]], jnp.int32),
                       ref_cache, jnp.int32(8))

    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    jax.clear_caches()
    cache2 = init_kv_cache(cfg, 1, 256, jnp.float32)
    got_l, got_cache = forward(params, cfg, toks, cache2, jnp.int32(0),
                               last_only=False)
    got_d, _ = forward(params, cfg, jnp.asarray([[6]], jnp.int32),
                       got_cache, jnp.int32(8))
    # the prefill flash kernel runs its score dots in bf16 on the MXU
    # (PERF.md: f32 score dots were the measured TTFT bottleneck); the
    # XLA reference path is f32 — same tolerance as the kernel tests
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               atol=1e-2, rtol=1e-2)


def test_alibi_batched_decode_flash_parity(monkeypatch):
    """decode_step_batched per-row alibi flash == the xla_attn path."""
    from awq_tpu.models.llama import decode_step_batched

    cfg = _mpt_cfg()
    params = init_params(cfg, jax.random.PRNGKey(4))
    toks = jnp.asarray([[5, 9, 2, 7], [1, 4, 8, 3]], jnp.int32)
    cache = init_kv_cache(cfg, 2, 256, jnp.float32)
    # independent per-row prefills at different lengths
    for i, n in enumerate((4, 3)):
        row = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, i, i + 1, axis=2), cache)
        _, row = forward(params, cfg, toks[i:i + 1, :n], row, jnp.int32(0))
        cache = jax.tree_util.tree_map(
            lambda full, part: jax.lax.dynamic_update_slice(
                full, part, (0, 0, i, 0, 0, 0)), cache, row)
    lengths = jnp.asarray([4, 3], jnp.int32)
    tokens = jnp.asarray([6, 2], jnp.int32)

    # the step donates its cache: give each call its own copy
    ref, _ = decode_step_batched(params, cfg, tokens,
                                 jnp.array(cache), lengths)
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    jax.clear_caches()
    got, _ = decode_step_batched(params, cfg, tokens,
                                 jnp.array(cache), lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_mpt_megakernel_token_step_parity(monkeypatch):
    """The mpt-class whole-token megakernel variant (bias-free
    LayerNorm + in-kernel ALiBi slopes + exact-GELU plain MLP, round 5)
    matches the XLA path in interpret mode — one launch per token for
    mpt/bloom-shape models like llama's."""
    from awq_tpu.config import QuantConfig
    from awq_tpu.models.llama import fuse_linears, init_params, \
        quantize_params
    from awq_tpu.ops.megakernel import megakernel_supported

    cfg = ModelConfig(
        arch="mpt", vocab_size=256, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=128, max_position_embeddings=256, dtype="float32",
        norm="layernorm", norm_bias=False, act="gelu", pos_embed="alibi",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(7)),
                             QuantConfig(w_bit=4, group_size=128))
    toks = jnp.asarray([[5, 9, 2, 7, 1, 4, 8, 3]], jnp.int32)
    cache = init_kv_cache(cfg, 1, 256, jnp.float32)
    _, cache = forward(params, cfg, toks, cache, jnp.int32(0))
    ref, _ = forward(params, cfg, jnp.asarray([[6]], jnp.int32),
                     jnp.array(cache), jnp.int32(8))

    fused = fuse_linears({**params, "layers": dict(params["layers"])},
                         cfg)
    assert megakernel_supported(cfg, fused["layers"], cache)
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    monkeypatch.setenv("AWQ_TPU_FORCE_MEGAKERNEL", "1")
    jax.clear_caches()
    got, _ = forward(fused, cfg, jnp.asarray([[6]], jnp.int32),
                     jnp.array(cache), jnp.int32(8))
    # same tolerance class as the llama megakernel tests (the kernel
    # rounds the residual stream to bf16 between layers by design)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
    # greedy argmax agreement is the semantic bar
    assert int(jnp.argmax(got[0, -1])) == int(jnp.argmax(ref[0, -1]))


def test_alibi_explicit_tp_parity():
    """ALiBi under explicit-shard TP (tp=2): per-rank slopes ride a
    P('tp') operand; tp_forward logits == single-device forward.
    parallel/tp.py used to reject ALiBi outright."""
    from awq_tpu.parallel import MeshConfig, make_mesh, tp_forward
    from awq_tpu.parallel.shard import cache_pspec
    from jax.sharding import NamedSharding

    cfg = _mpt_cfg()
    params = init_params(cfg, jax.random.PRNGKey(5))
    toks = jnp.asarray([[5, 9, 2, 7, 1, 4]], jnp.int32)

    cache = init_kv_cache(cfg, 1, 256, jnp.float32)
    ref, _ = forward(params, cfg, toks, cache, jnp.int32(0))

    mesh = make_mesh(MeshConfig(dp=1, tp=2), devices=jax.devices()[:2])
    cache2 = jax.device_put(
        init_kv_cache(cfg, 1, 256, jnp.float32),
        NamedSharding(mesh, cache_pspec(shard_kv=True)))
    got, _ = tp_forward(params, cfg, toks, cache2, jnp.int32(0), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
