"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy
from jax.sharding import PartitionSpec as P

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.llama import init_params, quantize_params
from awq_tpu.parallel import (
    MeshConfig,
    make_mesh,
    param_pspecs,
    pick_mesh_shape,
    shard_cache,
    shard_params,
)


def _cfg(num_kv_heads=4):
    return ModelConfig(
        arch="llama",
        vocab_size=512,
        hidden_size=256,
        intermediate_size=512,
        num_layers=2,
        num_heads=8,
        num_kv_heads=num_kv_heads,
        head_dim=32,
        max_position_embeddings=128,
        dtype="float32",
    )


def test_pick_mesh_shape():
    assert pick_mesh_shape(7, n_devices=8).tp >= 1
    ms = pick_mesh_shape(70, n_devices=8)
    assert ms.dp * ms.tp == 8
    assert ms.tp > 1  # 70B needs tensor parallelism


def test_param_pspecs_roles():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    assert specs["layers"]["wq"].w == P(None, None, "tp")
    assert specs["layers"]["wo"].w == P(None, "tp", None)
    assert specs["layers"]["ln1"] == P()
    assert specs["embed"] == P("tp", None)


@pytest.mark.parametrize("quantized", [False, True])
def test_sharded_forward_matches_single_device(quantized):
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    if quantized:
        params = quantize_params(params, QuantConfig(w_bit=4, group_size=128))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, 2, 32, jnp.float32)

    ref_logits, ref_cache = forward(params, cfg, tokens, cache, jnp.int32(0))

    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    with mesh:
        sp = shard_params(params, mesh)
        sc = shard_cache(cache, mesh)
        out_logits, out_cache = forward(params, cfg, tokens, sc, jnp.int32(0))
        out_logits, out_cache = forward(sp, cfg, tokens, sc, jnp.int32(0))
    assert jnp.allclose(ref_logits, out_logits, atol=2e-3, rtol=2e-3)
    # decode step on the sharded cache
    with mesh:
        tok = jnp.argmax(out_logits[:, -1], axis=-1).astype(jnp.int32)
        logits2, _ = forward(sp, cfg, tok[:, None], out_cache, jnp.int32(16))
    ref2, _ = forward(params, cfg, tok[:, None], ref_cache, jnp.int32(16))
    assert jnp.allclose(ref2, logits2, atol=2e-3, rtol=2e-3)


def _flash_cfg():
    # geometry satisfying the flash-kernel gate (head_dim % 128 == 0,
    # cache T % 256 == 0) so the TP test exercises the Pallas path
    return ModelConfig(
        arch="llama",
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=128,
        max_position_embeddings=256,
        dtype="float32",
    )


def test_tp_shardmap_kernel_parity(monkeypatch):
    """shard_map TP runs the PALLAS kernel path (interpret mode on CPU)
    and matches the single-device kernel path bit-for-bit-ish.

    This is the coverage GSPMD tests can't give: pallas_call does not
    partition under GSPMD, so multi-chip kernels only exist inside
    shard_map (parallel/tp.py) — here each of the 4 devices runs
    flash_decode_stacked / flash_prefill_stacked / qlinear stacked on
    its local (head-, vocab-, IC-) shard with explicit psums."""
    monkeypatch.setenv("AWQ_TPU_FORCE_FLASH", "1")
    from awq_tpu.config import GenConfig
    from awq_tpu.parallel import tp_decode_scan, tp_forward
    from awq_tpu.runtime.generate import decode_scan

    cfg = _flash_cfg()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(3)),
        QuantConfig(w_bit=4, group_size=128),
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(4), (2, 16), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, 2, 256, jnp.float32)

    # single-device reference, SAME kernels (force-flash interpret)
    ref_logits, ref_cache = forward(params, cfg, tokens, cache, jnp.int32(0))

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    tp_logits, tp_cache = tp_forward(
        params, cfg, tokens, cache, jnp.int32(0), mesh)
    assert tp_logits.shape == ref_logits.shape
    assert jnp.allclose(ref_logits, tp_logits, atol=2e-3, rtol=2e-3)
    ref_k = jax.lax.dynamic_slice_in_dim(ref_cache, 0, 16, axis=4)
    tp_k = jax.lax.dynamic_slice_in_dim(tp_cache, 0, 16, axis=4)
    assert jnp.allclose(ref_k, tp_k, atol=2e-3, rtol=2e-3)

    # decode burst: flash_decode_stacked under the mesh, sampling inside
    gen = GenConfig(greedy=True)
    first = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((2, cfg.vocab_size), bool)
    ref_toks, ref_done, _ = decode_scan(
        params, cfg, ref_cache, first, jnp.int32(16), jax.random.PRNGKey(0),
        stop, seen, gen, 4, cfg.vocab_size)
    tp_toks, tp_done, _ = tp_decode_scan(
        params, cfg, tp_cache, first, jnp.int32(16), jax.random.PRNGKey(0),
        stop, seen, gen, 4, mesh)
    assert (jnp.asarray(ref_toks) == jnp.asarray(tp_toks)).all(), (
        ref_toks, tp_toks)


def test_tp_rejects_incompatible_layouts():
    from awq_tpu.models.llama import fuse_linears
    from awq_tpu.parallel import check_tp_compatible

    cfg = _flash_cfg()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(3)),
        QuantConfig(w_bit=4, group_size=128),
    )
    fused = fuse_linears(params, cfg)
    with pytest.raises(ValueError, match="unfused|plain stacked"):
        check_tp_compatible(fused, cfg, 2)
    check_tp_compatible(params, cfg, 2)  # plain layout passes
    with pytest.raises(ValueError, match="num_heads"):
        check_tp_compatible(params, cfg, 8)


def test_graft_entry_and_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape[-1] == 512

    mod.dryrun_multichip(8)


def test_tp_sequence_parallel_prefill_parity():
    """tp_prefill_sp (token-sharded residual, all-gather -> column-
    parallel, reduce-scatter <- row-parallel) matches tp_forward and the
    single-device forward on logits and cache."""
    from awq_tpu.parallel import tp_forward
    from awq_tpu.parallel.tp import tp_prefill_sp

    cfg = _cfg()
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(7)),
        QuantConfig(w_bit=4, group_size=128),
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(8), (2, 16), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, 2, 64, jnp.float32)

    ref_logits, ref_cache = forward(params, cfg, tokens, cache, jnp.int32(0))

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    sp_logits, sp_cache = tp_prefill_sp(
        params, cfg, tokens, cache, jnp.int32(0), mesh)
    assert sp_logits.shape == ref_logits.shape
    assert jnp.allclose(ref_logits, sp_logits, atol=2e-3, rtol=2e-3), (
        jnp.abs(ref_logits - sp_logits).max())
    ref_k = jax.lax.dynamic_slice_in_dim(ref_cache, 0, 16, axis=4)
    sp_k = jax.lax.dynamic_slice_in_dim(sp_cache, 0, 16, axis=4)
    assert jnp.allclose(ref_k, sp_k, atol=2e-3, rtol=2e-3)

    # and against the psum TP path (same mesh, same shards)
    tp_logits, _ = tp_forward(params, cfg, tokens, cache, jnp.int32(0), mesh)
    assert jnp.allclose(tp_logits, sp_logits, atol=2e-3, rtol=2e-3)

    # different mesh shape (dp=4, tp=2): batch sharding independent of
    # the token sharding (tp=4 would split wo's 2 quant groups)
    mesh4 = make_mesh(MeshConfig(dp=4, tp=2))
    tokens4 = jnp.tile(tokens, (2, 1))
    cache4 = init_kv_cache(cfg, 4, 64, jnp.float32)
    sp4_logits, _ = tp_prefill_sp(
        params, cfg, tokens4, cache4, jnp.int32(0), mesh4)
    assert jnp.allclose(ref_logits, sp4_logits[:2], atol=2e-3, rtol=2e-3)
