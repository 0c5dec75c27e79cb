"""Explicit-shard tensor parallelism: Pallas kernels under a mesh.

GSPMD ``NamedSharding`` (parallel/shard.py) auto-partitions the XLA
fallback path, but ``pallas_call`` does NOT partition under GSPMD — on a
real multi-chip mesh the custom calls would replicate their operands (or
fail to lower). This module runs the model INSIDE ``shard_map``, where
each device holds an explicit local shard and the Pallas kernels
(``qlinear_apply_stacked``, ``flash_decode_stacked``,
``flash_prefill_stacked``) see plain local arrays. The Megatron-TP
collectives live in ``models/llama.py::forward`` under its ``tp_axis``
argument: psum after the row-parallel wo/down contractions, masked
lookup + psum for the vocab-sharded embedding, all-gather of the
vocab-sharded logits before sampling (runtime/generate.py).

Replaces what the reference would need NCCL + per-module hooks for
(``awq/utils/parallel.py:6-28``) with mesh collectives riding ICI.

Layout requirements (asserted):
- plain stacked QLinear layout (``tiled_bn == 0``): the folded tile
  interleaves packed scale rows into the reduction axis, which cannot be
  split across devices. Folding is a single-chip HBM-streaming
  optimization; under TP each device's matmul is 1/tp-sized anyway.
- unfused linears (no ``wqkv``/``wgateup``): an OC shard of a fused
  concat mixes q|k|v (or gate|up) columns across devices.
- head counts and group counts divisible by ``tp``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exports it at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.parallel.shard import cache_pspec, param_pspecs


def tp_local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    """The per-device view of ``cfg``: head counts divided by ``tp``.

    Everything else (hidden size, vocab) stays global — the residual
    stream is replicated; only head-sharded tensors change shape."""
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
    )


def check_tp_compatible(params: Dict[str, Any], cfg: ModelConfig,
                        tp: int) -> None:
    from awq_tpu.ops.w4a16 import QLinear

    if tp == 1:
        return
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads} and "
            f"num_kv_heads={cfg.num_kv_heads}")
    if cfg.vocab_size % tp:
        raise ValueError(
            f"tp={tp} must divide vocab_size={cfg.vocab_size} "
            "(vocab-sharded embedding / output head)")
    if cfg.pos_embed == "alibi":
        raise ValueError("ALiBi archs: use the GSPMD NamedSharding path")
    layers = params.get("layers", {})
    for fused in ("wqkv", "wgateup"):
        if fused in layers:
            raise ValueError(
                f"explicit TP needs unfused linears (found {fused}); "
                "skip fuse_linears for multi-chip serving")
    if "act_scale" in layers:
        raise ValueError("per-channel act_scale not supported under tp")
    from awq_tpu.parallel.shard import ROW_PARALLEL

    for path, leaf in jax.tree_util.tree_flatten_with_path(
            params, is_leaf=lambda x: isinstance(x, QLinear))[0]:
        if not isinstance(leaf, QLinear):
            continue
        if leaf.tiled_bn:
            raise ValueError(
                "explicit TP needs the plain stacked QLinear layout "
                "(tiled/folded blocks can't split their reduction axis)")
        if any(f"'{n}'" in str(path) for n in ROW_PARALLEL):
            n_g = leaf.in_features // leaf.group_size
            if n_g % tp:
                raise ValueError(
                    f"tp={tp} must divide the group count {n_g} of "
                    f"row-parallel {path} (IC shards must hold whole "
                    "quantization groups)")
            if leaf.dense3 and (leaf.in_features // tp) % 256:
                raise ValueError(
                    f"dense-3-bit row-parallel {path}: IC/tp must be a "
                    "multiple of the 256-channel packing chunk")


def cache_specs(cache, shard_kv: bool = True):
    """Spec pytree for a plain [L,2,B,n_kv,T,hd] cache or a KVCache8."""
    kv = "tp" if shard_kv else None

    def spec(leaf):
        if leaf.ndim == 6:       # data [L,2,B,n_kv,T,hd]
            return P(None, None, "dp", kv, None, None)
        return P(None, None, "dp", kv, None)   # KVCache8 scales

    return jax.tree_util.tree_map(spec, cache)


def _mesh_tp(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)


def tp_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,           # [B, S] int32 (global batch)
    cache,
    start_pos: jax.Array,
    mesh: Mesh,
    last_only: bool = True,
) -> Tuple[jax.Array, Any]:
    """One forward step through shard_map; logits return as a GLOBAL
    [B, S(, 1), V] array (vocab-sharded across tp under the hood)."""
    tp = _mesh_tp(mesh)
    check_tp_compatible(params, cfg, tp)
    lcfg = tp_local_cfg(cfg, tp)
    pspecs = param_pspecs(params, tp)
    cspecs = cache_specs(cache, shard_kv=tp > 1)

    from awq_tpu.models import forward

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs, P()),
        out_specs=(P("dp", None, "tp"), cspecs),
        check_vma=False,
    )
    def run(params, tokens, cache, start_pos):
        return forward(params, lcfg, tokens, cache, start_pos,
                       last_only=last_only, tp_axis="tp")

    return run(params, tokens, cache, start_pos)


def tp_decode_scan(
    params: Dict[str, Any],
    cfg: ModelConfig,
    cache,
    first_token: jax.Array,      # [B]
    start_pos: jax.Array,
    key: jax.Array,
    stop_ids: jax.Array,
    seen0: jax.Array,            # [B, V] bool
    gen: GenConfig,
    num_steps: int,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array, Any]:
    """The whole decode burst (forward + sampling per step) inside ONE
    shard_map — no per-token re-entry, collectives inside the scan."""
    from awq_tpu.runtime.generate import decode_scan

    tp = _mesh_tp(mesh)
    check_tp_compatible(params, cfg, tp)
    lcfg = tp_local_cfg(cfg, tp)
    pspecs = param_pspecs(params, tp)
    cspecs = cache_specs(cache, shard_kv=tp > 1)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspecs, cspecs, P("dp"), P(), P(), P(), P("dp", None)),
        out_specs=(P("dp", None), P("dp", None), cspecs),
        check_vma=False,
    )
    def run(params, cache, first, start_pos, key, stop, seen):
        return decode_scan(
            params, lcfg, cache, first, start_pos, key, stop, seen,
            gen, num_steps, cfg.vocab_size, tp_axis="tp",
        )

    return run(params, cache, first_token, start_pos, key, stop_ids, seen0)
