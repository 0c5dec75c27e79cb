"""int8 prefill weight cache (W8Stack): the precomputed requant must be
bit-identical to the W4A8 kernel's in-VMEM requant, and the engine-level
opt-in must plumb through params/config."""

import jax
import jax.numpy as jnp
import numpy as np


def _stacked_folded_ql(ic=256, oc=512, L=2, seed=11, bn=256):
    from awq_tpu.ops.w4a16 import quantize_linear, tile_qlinear

    ks = jax.random.split(jax.random.PRNGKey(seed), L)
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05)
        for k in ks]
    ql = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)
    return tile_qlinear(ql, block_n=bn, fold_scales=True)


def test_w8_cache_matches_in_kernel_requant():
    """w8a8_matmul_stacked_tiled over build_w8_stack == the a8 kernel's
    in-kernel requant path, layer by layer (same int8 codes, same
    epilogue order)."""
    from awq_tpu.ops.w4a16 import (
        build_w8_stack, w4a8_matmul_stacked_tiled_folded,
        w8a8_matmul_stacked_tiled,
    )

    ql = _stacked_folded_ql()
    w8 = build_w8_stack(ql)
    assert w8.w8.shape == (2, 2, 256, 256)
    assert w8.scol.shape == (2, 2, 1, 256)
    x = (jax.random.normal(jax.random.PRNGKey(3), (96, 256), jnp.float32)
         * 0.3).astype(jnp.bfloat16)
    for layer in range(2):
        got = w8a8_matmul_stacked_tiled(x, w8.w8, w8.scol, jnp.int32(layer))
        ref = w4a8_matmul_stacked_tiled_folded(
            x, ql.qweight, jnp.int32(layer), 128, 256)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=0)


def test_w8_cache_close_to_bf16_path():
    """Accuracy sanity vs the exact-dequant bf16 folded kernel: within
    the documented int8 budget (per-token act + per-column weight
    requant, each ~1/127 relative)."""
    from awq_tpu.ops.w4a16 import (
        build_w8_stack, qlinear_apply_stacked, w8a8_matmul_stacked_tiled,
    )

    ql = _stacked_folded_ql()
    w8 = build_w8_stack(ql)
    x = (jax.random.normal(jax.random.PRNGKey(5), (64, 256), jnp.float32)
         * 0.3).astype(jnp.bfloat16)
    got = np.asarray(
        w8a8_matmul_stacked_tiled(x, w8.w8, w8.scol, jnp.int32(1)),
        np.float32)
    ref = np.asarray(qlinear_apply_stacked(ql, jnp.int32(1), x), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=0.04)


def test_engine_prefill_w8_plumbing():
    """RuntimeConfig.prefill_w8 builds *_w8 cache entries next to each
    stacked folded QLinear and flips cfg.prefill_a8; generation still
    runs (on CPU the dispatch stays on the XLA path — numerics parity is
    the kernel test above)."""
    from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.ops.w4a16 import W8Stack
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    eng = InferenceEngine(cfg, params,
                          RuntimeConfig(max_seq_len=64, prefill_w8=True),
                          cache_dtype=jnp.float32)
    assert eng.cfg.prefill_a8
    la = eng.params["layers"]
    w8_keys = [k for k in la if k.endswith("_w8")]
    from awq_tpu.ops.w4a16 import QLinear

    eligible = [k for k, v in la.items()
                if isinstance(v, QLinear) and v.folded and v.tiled_bn
                and v.qweight.ndim == 4 and not v.dense3]
    assert sorted(w8_keys) == sorted(k + "_w8" for k in eligible)
    assert all(isinstance(la[k], W8Stack) for k in w8_keys)
    if eligible:
        k0 = eligible[0]
        assert la[k0 + "_w8"].w8.shape[2] == la[k0].in_features
    out = eng.generate([1, 2, 3, 4], GenConfig(greedy=True,
                                               max_new_tokens=3))
    assert out["output_ids"].shape[-1] >= 1


def test_engine_prefill_w8_budget_partial():
    """prefill_w8_budget_gb caps the cache to the deepest-IC linears:
    with room for exactly one stack, only the deepest-IC name gets a
    *_w8 entry; generation output is identical to the full-cache engine
    (the cached requant is bit-identical to the in-kernel one)."""
    from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, \
        RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.ops.w4a16 import QLinear, w8_cache_cost
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    full = InferenceEngine(cfg, params,
                           RuntimeConfig(max_seq_len=64, prefill_w8=True),
                           cache_dtype=jnp.float32)
    costs = w8_cache_cost({k: v for k, v in full.params["layers"].items()
                           if isinstance(v, QLinear)})
    # budget = exactly the most expensive (deepest-IC) stack
    deepest = max(costs, key=lambda n: full.params["layers"][n].in_features)
    budget_gb = costs[deepest] / 2**30
    eng = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=64, prefill_w8=True,
                      prefill_w8_budget_gb=budget_gb),
        cache_dtype=jnp.float32)
    got_keys = [k for k in eng.params["layers"] if k.endswith("_w8")]
    assert got_keys == [deepest + "_w8"], got_keys
    gen = GenConfig(greedy=True, max_new_tokens=4)
    ref = full.generate([1, 2, 3, 4], gen)
    out = eng.generate([1, 2, 3, 4], gen)
    np.testing.assert_array_equal(np.asarray(out["output_ids"]),
                                  np.asarray(ref["output_ids"]))


def test_engine_prefill_w8_fit_refusal(monkeypatch):
    """Without a budget, a platform that reports memory stats refuses
    cleanly at engine init when the cache cannot fit free HBM."""
    from awq_tpu.config import ModelConfig, QuantConfig, RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.runtime.engine import InferenceEngine
    import awq_tpu.ops.w4a16 as w4a16
    import pytest

    monkeypatch.setattr(w4a16, "_device_free_bytes", lambda: 1 << 20)
    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    with pytest.raises(ValueError, match="prefill_w8"):
        InferenceEngine(cfg, params,
                        RuntimeConfig(max_seq_len=64, prefill_w8=True),
                        cache_dtype=jnp.float32)


def test_batch_engine_prefill_w8_plumbing():
    """BatchEngine wires RuntimeConfig.prefill_w8 the same way."""
    from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.ops.w4a16 import W8Stack
    from awq_tpu.runtime.batch_engine import BatchEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    eng = BatchEngine(cfg, params, n_slots=2, max_seq_len=64,
                      cache_dtype=jnp.float32,
                      runtime=RuntimeConfig(prefill_w8=True))
    assert eng.cfg.prefill_a8
    w8_keys = [k for k in eng.params["layers"] if k.endswith("_w8")]
    assert w8_keys and all(
        isinstance(eng.params["layers"][k], W8Stack) for k in w8_keys)
    rid = eng.submit([1, 2, 3], GenConfig(greedy=True, max_new_tokens=3))
    for _ in range(8):
        eng.step()
    assert rid in eng.finished
    assert len(eng.finished[rid].out_ids) >= 1


def test_paged_engine_prefill_w8_plumbing():
    """PagedBatchEngine forwards runtime (prefill_w8) to BatchEngine."""
    from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.runtime.paged import PagedBatchEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=256,
        intermediate_size=512, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=64, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    eng = PagedBatchEngine(cfg, params, n_slots=2, max_seq_len=256,
                           cache_dtype=jnp.float32, page_size=64,
                           runtime=RuntimeConfig(prefill_w8=True))
    assert eng.cfg.prefill_a8
    assert any(k.endswith("_w8") for k in eng.params["layers"])
    rid = eng.submit([1, 2, 3], GenConfig(greedy=True, max_new_tokens=2))
    for _ in range(6):
        eng.step()
    assert rid in eng.finished


def test_mesh_engine_prefill_w8_plumbing():
    """TP deploy layout with prefill_w8: per-rank int8 caches ride the
    sharded params (column-parallel on the N-block axis, row-parallel on
    the IC axis with per-rank scol planes) and engine.generate() still
    runs on the virtual mesh."""
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (virtual CPU mesh)")
    from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
    from awq_tpu.models.llama import init_params, quantize_params
    from awq_tpu.ops.w4a16 import W8Stack
    from awq_tpu.parallel import MeshConfig, TPParams, make_mesh
    from awq_tpu.runtime.engine import InferenceEngine

    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=128, max_position_embeddings=256, dtype="float32",
    )
    params = quantize_params(init_params(cfg, jax.random.PRNGKey(0)),
                             QuantConfig(w_bit=4, group_size=128))
    mesh = make_mesh(MeshConfig(dp=1, tp=2), devices=jax.devices()[:2])
    eng = InferenceEngine(
        cfg, params,
        RuntimeConfig(max_seq_len=256, quantize_head=True, mesh=mesh,
                      prefill_w8=True),
        cache_dtype=jnp.float32)
    assert isinstance(eng.params, TPParams)
    assert eng.cfg.prefill_a8
    la = eng.params.params["layers"]
    for name in ("wqkv", "wgateup", "wo", "down"):
        assert isinstance(la[name + "_w8"], W8Stack), name
    # column-parallel: global NB is 2 ranks' worth; row-parallel: scol
    # carries one plane per rank
    assert la["wqkv_w8"].w8.shape[1] == la["wqkv"].qweight.shape[1]
    assert la["wo_w8"].scol.shape[2] == 2
    assert la["wo_w8"].w8.shape[2] == cfg.hidden_size
    out = eng.generate([5, 6, 7, 8], GenConfig(greedy=True,
                                               max_new_tokens=3))
    assert out["output_ids"].shape[-1] >= 1


def test_tp_row_parallel_w8_numerics():
    """The sharded row-parallel w8 construction computes the right
    answer: per-rank kernel outputs (rank slices taken from the GLOBAL
    assembled cache exactly as P(None,None,'tp',None) would) summed
    across ranks match the unsharded bf16 folded path within the int8
    budget. Catches wrong concat axes / scol plane selection that the
    CPU-mesh plumbing test cannot (forward's w8 dispatch is TPU-only;
    here the kernel runs in interpret mode directly)."""
    from awq_tpu.ops.w4a16 import (
        qlinear_apply_stacked, quantize_linear, tile_qlinear,
        w8a8_matmul_stacked_tiled,
    )
    from awq_tpu.parallel.deploy import _row_parallel

    ic, oc, L, tp = 256, 512, 2, 2
    ks = jax.random.split(jax.random.PRNGKey(7), L)
    qls = [quantize_linear(
        jax.random.normal(k, (ic, oc), jnp.float32) * 0.05) for k in ks]
    plain = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls)

    glob_ql, _spec, w8pack = _row_parallel(plain, tp, block_n=256,
                                           prefill_w8=True)
    w8glob, _w8spec = w8pack
    assert w8glob.w8.shape == (L, 2, ic, 256)
    assert w8glob.scol.shape == (L, 2, tp, 256)

    x = (jax.random.normal(jax.random.PRNGKey(9), (64, ic), jnp.float32)
         * 0.3).astype(jnp.bfloat16)
    icl = ic // tp
    for layer in range(L):
        # per-rank partial sums, rank slices as the NamedSharding takes
        parts = []
        for r in range(tp):
            w8_r = w8glob.w8[:, :, r * icl:(r + 1) * icl, :]
            scol_r = w8glob.scol[:, :, r:r + 1, :]
            parts.append(w8a8_matmul_stacked_tiled(
                x[:, r * icl:(r + 1) * icl], w8_r, scol_r,
                jnp.int32(layer)))
        got = np.asarray(sum(p.astype(jnp.float32) for p in parts))
        ref = np.asarray(qlinear_apply_stacked(
            tile_qlinear(plain, block_n=256, fold_scales=True),
            jnp.int32(layer), x), np.float32)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=0.05)


def test_tp_col_parallel_w8_numerics():
    """Column-parallel w8 shards: each rank's N-block slice of the
    global cache reproduces its own local fold's bf16 output within the
    int8 budget (rank column ORDER is the per-rank fused concat, so the
    oracle is the rank-local QLinear, not a slice of the unsharded
    fuse)."""
    from awq_tpu.ops.w4a16 import (
        qlinear_apply_stacked, quantize_linear, w8a8_matmul_stacked_tiled,
    )
    from awq_tpu.parallel.deploy import _col_parallel

    ic, oc, L, tp = 256, 512, 2, 2
    ks = jax.random.split(jax.random.PRNGKey(11), 3 * L).reshape(3, L, -1)
    parts = []
    for i in range(3):
        qls = [quantize_linear(
            jax.random.normal(k, (ic, oc), jnp.float32) * 0.05)
            for k in ks[i]]
        parts.append(jax.tree_util.tree_map(lambda *a: jnp.stack(a), *qls))

    glob_ql, _spec, w8pack = _col_parallel(parts, tp, block_n=256,
                                           prefill_w8=True)
    w8glob, _w8spec = w8pack
    nb = glob_ql.qweight.shape[1]
    nbl = nb // tp
    x = (jax.random.normal(jax.random.PRNGKey(13), (64, ic), jnp.float32)
         * 0.3).astype(jnp.bfloat16)
    for r in range(tp):
        w8_r = w8glob.w8[:, r * nbl:(r + 1) * nbl]
        scol_r = w8glob.scol[:, r * nbl:(r + 1) * nbl]
        # rank-local bf16 oracle: NB slice of the global qweight, OC
        # slice of the (rank-order concatenated) unfolded scales — the
        # CPU fallback path reads them
        import dataclasses as dc

        ocl = nbl * glob_ql.tiled_bn
        local_ql = dc.replace(
            glob_ql,
            qweight=glob_ql.qweight[:, r * nbl:(r + 1) * nbl],
            scales=glob_ql.scales[..., r * ocl:(r + 1) * ocl],
            szeros=glob_ql.szeros[..., r * ocl:(r + 1) * ocl],
        )
        got = np.asarray(w8a8_matmul_stacked_tiled(
            x, w8_r, scol_r, jnp.int32(1)), np.float32)
        ref = np.asarray(qlinear_apply_stacked(local_ql, jnp.int32(1), x),
                         np.float32)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=0.05)
