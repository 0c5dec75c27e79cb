"""NamedSharding layout for model params and KV caches.

This replaces the reference's accelerate device maps / ``simple_dispatch_model``
hooks (``awq/utils/utils.py:11-51``, ``awq/entry.py:166-186``) with
Megatron-style tensor parallelism expressed purely as PartitionSpecs — XLA
GSPMD inserts the all-gathers/psums:

- ``wq/wk/wv/gate/up`` — column-parallel: output channels (attention heads /
  MLP hidden) sharded on ``tp``. The packed ``qweight [L, IC//8, OC]`` keeps
  OC as its lane dimension (see quant/packing.py), so it shards exactly like
  the fp16 weight would.
- ``wo/down`` — row-parallel: input channels sharded on ``tp``; the
  contraction ends with a psum over ``tp`` (inserted by GSPMD).
- ``embed`` — vocab-sharded on ``tp``; ``lm_head`` column-parallel.
- KV cache ``[L, 2, B, n_kv, T, hd]`` — batch on ``dp``, kv-heads on ``tp``
  (requires ``n_kv % tp == 0``; for MQA models keep tp on q-heads only by
  passing ``shard_kv=False``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("wq", "wk", "wv", "gate", "up", "fc1", "wqkv", "wgateup")
ROW_PARALLEL = ("wo", "down", "fc2")


def _spec_for(path: str, leaf, tp: int) -> P:
    nd = leaf.ndim

    def ok(axis: int) -> bool:
        return leaf.shape[axis] % tp == 0

    if any(f"'{n}'" in path for n in COLUMN_PARALLEL):
        if nd == 4:  # tiled qweight [L, NB, ICp, bn]: OC blocks on axis 1
            return P(None, "tp", None, None) if ok(1) else P()
        # [L, *, OC] / [L, OC]: shard the trailing output-channel axis
        if ok(nd - 1):
            return P(*([None] * (nd - 1) + ["tp"]))
        return P()
    if any(f"'{n}'" in path for n in ROW_PARALLEL):
        # w/qweight/scales/szeros [L, IC(/pack|/G), OC]: shard the reduction
        # axis; a scales array with fewer groups than tp stays replicated
        # (its footprint is negligible).
        if nd == 4:  # tiled qweight: reduction axis is 2
            return P(None, None, "tp", None) if ok(2) else P()
        if nd == 3 and ok(1):
            return P(None, "tp", None)
        return P()  # bias [L, OC] replicated (added after the psum)
    if "embed'" in path and nd == 2 and "pos" not in path:
        if ok(0):
            return P("tp", None)  # vocab-sharded token embedding
        return P()
    if "lm_head" in path and ok(nd - 1):
        return P(*([None] * (nd - 1) + ["tp"]))
    return P()  # norms, pos embeds: replicated


def _qlinear_specs(path: str, ql, tp: int):
    """Field-wise specs for a QLinear. A FOLDED tiled qweight carries each
    block's scales as trailing rows, so its reduction axis must never be
    split (row-parallel folded weights stay replicated); the OC-block axis
    still shards fine for column-parallel."""
    from awq_tpu.ops.w4a16 import QLinear

    col = (any(f"'{n}'" in path for n in COLUMN_PARALLEL)
           or "lm_head" in path)   # quantized output head shards on OC
    row = any(f"'{n}'" in path for n in ROW_PARALLEL)
    qw = ql.qweight
    if col:
        if qw.ndim == 4:
            qspec = P(None, "tp", None, None) if qw.shape[1] % tp == 0 \
                else P()
        else:
            qspec = (P(*([None] * (qw.ndim - 1) + ["tp"]))
                     if qw.shape[-1] % tp == 0 else P())
        sspec = (P(*([None] * (ql.scales.ndim - 1) + ["tp"]))
                 if ql.scales.shape[-1] % tp == 0 else P())
    elif row:
        if qw.ndim == 4:
            qspec = (P(None, None, "tp", None)
                     if not ql.folded and qw.shape[2] % tp == 0 else P())
        else:
            qspec = (P(None, "tp", None) if qw.ndim == 3
                     and qw.shape[1] % tp == 0 else P())
        sspec = (P(None, "tp", None) if ql.scales.ndim == 3
                 and ql.scales.shape[1] % tp == 0 else P())
    else:
        qspec, sspec = P(), P()
    # replace() copies ALL static fields: the spec pytree's aux_data must
    # match the param pytree's exactly or device_put raises a structure
    # mismatch (a hand-built QLinear silently dropped new statics like
    # n_groups, breaking multi-chip W3)
    import dataclasses

    return dataclasses.replace(
        ql, qweight=qspec, scales=sspec, szeros=sspec,
        bias=None if ql.bias is None else P(),
    )


def param_pspecs(params: Dict[str, Any], tp: int = 1) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``' structure.

    ``tp`` is the tensor-axis size, used to keep non-divisible (tiny) leaves
    replicated rather than erroring.
    """
    from awq_tpu.ops.w4a16 import QLinear

    def spec(path, leaf):
        if isinstance(leaf, QLinear):
            return _qlinear_specs(str(path), leaf, max(tp, 1))
        return _spec_for(str(path), leaf, max(tp, 1))

    return jax.tree_util.tree_map_with_path(
        spec, params, is_leaf=lambda x: isinstance(x, QLinear)
    )


def cache_pspec(shard_kv: bool = True) -> P:
    """Spec for the ``[L, 2, B, n_kv, T, hd]`` static KV cache."""
    return P(None, None, "dp", "tp" if shard_kv else None, None, None)


def _named(mesh: Mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place ``params`` on the mesh with tensor-parallel layout."""
    tp = mesh.shape.get("tp", 1)
    return jax.device_put(params, _named(mesh, param_pspecs(params, tp)))


def shard_cache(cache: jax.Array, mesh: Mesh, shard_kv: bool = True) -> jax.Array:
    tp = mesh.shape.get("tp", 1)
    n_kv = cache.shape[3]
    if n_kv % tp != 0:
        shard_kv = False
    return jax.device_put(cache, NamedSharding(mesh, cache_pspec(shard_kv)))
