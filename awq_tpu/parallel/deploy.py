"""TP *deploy* layout: the fast (fused + folded + tiled) weight layout,
sharded per device.

Round-3 state: explicit TP (``parallel/tp.py``) required the plain
unfused/untiled QLinear layout, because naively sharding a FOLDED tiled
``qweight [L, NB, rows, bn]`` along its row axis would split the
interleaved code/qparam rows at an arbitrary point. But the folded tile
is per-OC-block-local by construction, and a per-device fused qkv concat
is equally local — so instead of sharding the single-chip layout, this
module builds each device's local deploy layout FIRST and assembles the
global arrays as rank-order concatenations:

- column-parallel (``wqkv``/``wgateup``/quantized ``lm_head``): rank r's
  local array is the fuse+fold+tile of ITS OC shards (q_r|k_r|v_r), and
  the global array concatenates ranks along the OC-block axis (NB). A
  ``P(None, 'tp', None, None)`` sharding then hands every device exactly
  its own local fold.
- row-parallel (``wo``/``down``): rank r folds ITS contiguous IC-group
  shard (whole quantization groups); ranks concatenate along the folded
  row axis, ``P(None, None, 'tp', None)``. No fold ever straddles a
  device boundary.

The result: multi-chip decode/prefill keeps the block-contiguous
streaming kernels (``w4a16_matmul_stacked_tiled_folded``) that produce
every single-chip headline number, instead of forfeiting them for the
plain 5-kernel layout. The reference has no distributed backend at all
(SURVEY.md §2.3); this is the Megatron-sharded counterpart of its fused
layouts (``tinychat/modules/fused_attn.py:549-634``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from awq_tpu.config import ModelConfig
from awq_tpu.ops.w4a16 import QLinear, tile_qlinear


class TPParams(NamedTuple):
    """Mesh-sharded deploy-layout parameters + their PartitionSpecs.

    Built only by :func:`build_tp_params`; the tp entry points
    (``tp_forward``/``tp_decode_scan``/``tp_prefill_sp``) accept this in
    place of a raw params pytree and trust its specs (the raw-params path
    keeps the strict plain-layout validation)."""

    params: Any
    pspecs: Any
    tp: int


def _mesh_tp(mesh: Mesh) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)


def _pick_bn(oc: int, block_n: int) -> int:
    for b in (block_n, 512, 256, 128):
        if b <= 512 and oc % b == 0:
            return b
    raise ValueError(f"local OC {oc} not divisible by any tile width")


def _slice_oc(ql: QLinear, r: int, tp: int) -> QLinear:
    """Rank ``r``'s output-channel shard (column-parallel). OC is the lane
    (last) axis of every field in both the nibble and dense-3 layouts."""
    oc = ql.out_features
    lo, hi = r * oc // tp, (r + 1) * oc // tp
    return dataclasses.replace(
        ql,
        qweight=ql.qweight[..., lo:hi],
        scales=ql.scales[..., lo:hi],
        szeros=ql.szeros[..., lo:hi],
        bias=None if ql.bias is None else ql.bias[..., lo:hi],
    )


def _slice_ic(ql: QLinear, r: int, tp: int) -> QLinear:
    """Rank ``r``'s input-channel shard (row-parallel): whole quantization
    groups (validated upstream), contiguous packed rows. The bias is NOT
    sliced — it stays replicated and is added once after the psum
    (``models/llama.py::lin_row``)."""
    icp = ql.qweight.shape[-2]
    n_g = ql.in_features // ql.group_size
    assert icp % tp == 0 and n_g % tp == 0, (icp, n_g, tp)
    qlo, qhi = r * icp // tp, (r + 1) * icp // tp
    glo, ghi = r * n_g // tp, (r + 1) * n_g // tp
    return dataclasses.replace(
        ql,
        qweight=ql.qweight[..., qlo:qhi, :],
        scales=ql.scales[..., glo:ghi, :],
        szeros=ql.szeros[..., glo:ghi, :],
    )


def _cat_ql(parts) -> QLinear:
    """Fuse along OC (same op as ``fuse_linears``' cat, local to a rank)."""
    a = parts[0]
    return dataclasses.replace(
        a,
        qweight=jnp.concatenate([p.qweight for p in parts], axis=-1),
        scales=jnp.concatenate([p.scales for p in parts], axis=-1),
        szeros=jnp.concatenate([p.szeros for p in parts], axis=-1),
        bias=(jnp.concatenate([p.bias for p in parts], axis=-1)
              if a.bias is not None else None),
    )


def _stack_ranks(locals_, axis_qw: int, axis_s: int) -> QLinear:
    """Concatenate per-rank local (tiled) QLinears into the global array:
    rank order along the sharded axis, so ``P(..., 'tp', ...)`` hands each
    device back exactly its own local fold."""
    a = locals_[0]
    if len(locals_) == 1:
        return a
    return dataclasses.replace(
        a,
        qweight=jnp.concatenate([p.qweight for p in locals_], axis=axis_qw),
        scales=jnp.concatenate([p.scales for p in locals_], axis=axis_s),
        szeros=jnp.concatenate([p.szeros for p in locals_], axis=axis_s),
        bias=(jnp.concatenate([p.bias for p in locals_], axis=-1)
              if a.bias is not None else None),
    )


def _ql_spec(ql: QLinear, qw, s, bias) -> QLinear:
    """Spec pytree node matching a QLinear's structure (same trick as
    ``parallel/shard.py::_qlinear_specs`` — replace() keeps every static
    field so the spec tree's aux_data matches the param tree's)."""
    return dataclasses.replace(
        ql, qweight=qw, scales=s, szeros=s,
        bias=None if ql.bias is None else bias,
    )


def _w8_assemble(locals_, axis: int):
    """Per-rank W8Stacks assembled into the rank-order concat along
    ``axis`` with a DONATED accumulator: peak HBM = global + one rank
    shard. A plain jnp.concatenate holds global + every shard (~2x the
    ~6.6 GB cache at 7B — the contended-chip OOM class the
    build_w8_stack accumulator already avoids), and at tp=1 it is a
    pure full-size copy."""
    import functools as _ft

    from awq_tpu.ops.w4a16 import W8Stack, build_w8_stack

    first = build_w8_stack(locals_[0])
    n = len(locals_)
    if n == 1:
        return first

    @_ft.partial(jax.jit, donate_argnums=(0, 1))
    def setr(gw, gs, w8_r, scol_r, r):
        sw = [jnp.int32(0)] * gw.ndim
        sw[axis] = r * w8_r.shape[axis]
        ss = [jnp.int32(0)] * gs.ndim
        ss[axis] = r * scol_r.shape[axis]
        return (jax.lax.dynamic_update_slice(gw, w8_r, tuple(sw)),
                jax.lax.dynamic_update_slice(gs, scol_r, tuple(ss)))

    def gshape(a):
        s = list(a.shape)
        s[axis] *= n
        return tuple(s)

    gw = jnp.zeros(gshape(first.w8), first.w8.dtype)
    gs = jnp.zeros(gshape(first.scol), first.scol.dtype)
    gw, gs = setr(gw, gs, first.w8, first.scol, jnp.int32(0))
    del first
    for r in range(1, n):
        s = build_w8_stack(locals_[r])
        gw, gs = setr(gw, gs, s.w8, s.scol, jnp.int32(r))
        del s
    return W8Stack(w8=gw, scol=gs)


def _w8_col(locals_, tp: int):
    """Per-rank int8 prefill caches for column-parallel shards: rank r's
    W8Stack is built from ITS local fold, ranks concatenate along the
    N-block axis — the exact analogue of the qweight assembly, so
    ``P(None, 'tp', None, None)`` hands each device its own cache."""
    from awq_tpu.ops.w4a16 import W8Stack

    glob = _w8_assemble(locals_, axis=1)
    spec = W8Stack(
        w8=P(None, "tp", None, None) if tp > 1 else P(),
        scol=P(None, "tp", None, None) if tp > 1 else P(),
    )
    return glob, spec


def _w8_row(locals_, tp: int):
    """Row-parallel int8 caches: rank r's w8 covers ITS IC-group shard
    (concat on the IC axis), and its per-column scale is the max over
    ITS local groups only — so scol concatenates on a rank axis
    ([L, NB, tp, bn]) and ``P(None, None, 'tp', None)`` hands each
    device its own [L, NB, 1, bn]."""
    from awq_tpu.ops.w4a16 import W8Stack

    glob = _w8_assemble(locals_, axis=2)
    spec = W8Stack(
        w8=P(None, None, "tp", None) if tp > 1 else P(),
        scol=P(None, None, "tp", None) if tp > 1 else P(),
    )
    return glob, spec


def _col_parallel(parts, tp: int, block_n: int, prefill_w8: bool = False):
    """Fuse + fold + tile each rank's OC shards; assemble global + spec."""
    locals_ = []
    for r in range(tp):
        fused = _cat_ql([_slice_oc(p, r, tp) for p in parts])
        bn = _pick_bn(fused.out_features, block_n)
        tiled = tile_qlinear(fused, block_n=bn, fold_scales=True)
        assert tiled.tiled_bn, "deploy layout requires a tileable OC"
        locals_.append(tiled)
    glob = _stack_ranks(locals_, axis_qw=-3, axis_s=-1)
    spec = _ql_spec(
        glob,
        qw=P(None, "tp", None, None) if tp > 1 else P(),
        s=P(None, None, "tp") if tp > 1 else P(),
        bias=P(None, "tp") if tp > 1 else P(),
    )
    if prefill_w8 and glob.w_bit == 4 and not glob.dense3:
        return glob, spec, _w8_col(locals_, tp)
    return glob, spec, None


def _row_parallel(ql: QLinear, tp: int, block_n: int,
                  prefill_w8: bool = False):
    """Fold + tile each rank's IC-group shard; global concat on the folded
    row axis."""
    locals_ = []
    for r in range(tp):
        shard = _slice_ic(ql, r, tp)
        bn = _pick_bn(shard.out_features, block_n)
        tiled = tile_qlinear(shard, block_n=bn, fold_scales=True)
        assert tiled.tiled_bn, "deploy layout requires a tileable OC"
        locals_.append(tiled)
    glob = _stack_ranks(locals_, axis_qw=-2, axis_s=-2)
    spec = _ql_spec(
        glob,
        qw=P(None, None, "tp", None) if tp > 1 else P(),
        s=P(None, "tp", None) if tp > 1 else P(),
        bias=P(),       # replicated; added once after the psum
    )
    if prefill_w8 and glob.w_bit == 4 and not glob.dense3:
        return glob, spec, _w8_row(locals_, tp)
    return glob, spec, None


def _rep_spec(leaf):
    return P()


def build_tp_params(
    params: Any,
    cfg: ModelConfig,
    mesh: Mesh,
    block_n: int = 512,
    quantize_head: bool = False,
    prefill_w8: bool = False,
) -> TPParams:
    """Build the mesh-sharded deploy layout from PLAIN (unfused, untiled)
    quantized params.

    Validates the input with the same checks as the plain TP path, then
    constructs per-rank fused/folded/tiled shards and places the
    assembled global arrays on ``mesh`` with matching NamedShardings.
    ``quantize_head`` real-quantizes a fp ``lm_head`` to the body's
    format first (it then shards on vocab and streams as W4/W3)."""
    from awq_tpu.models.llama import quantize_head as _qhead
    from awq_tpu.parallel.tp import check_tp_compatible

    tp = _mesh_tp(mesh)
    if quantize_head:
        if tp > 1 and (cfg.vocab_size // tp) % 128:
            # e.g. llama-3's 128256 vocab at tp=8: local head OC 16032
            # has no 128-lane tile width — keep the head fp (it still
            # shards on vocab); only the head loses the W4 stream
            import warnings

            warnings.warn(
                f"quantize_head skipped: vocab {cfg.vocab_size} / tp={tp}"
                f" = {cfg.vocab_size // tp} columns per rank is not"
                " 128-tileable; the lm_head stays fp and vocab-sharded")
        else:
            params = _qhead(params, cfg)
    check_tp_compatible(params, cfg, tp)
    layers = dict(params["layers"])
    if "wqkv" in layers or "wq" not in layers:
        raise ValueError("build_tp_params takes the UNFUSED plain layout")

    out_layers: dict = {}
    specs_layers: dict = {}

    def put(name, res):
        out_layers[name], specs_layers[name] = res[0], res[1]
        if res[2] is not None:      # int8 prefill cache (prefill_w8)
            out_layers[name + "_w8"] = res[2][0]
            specs_layers[name + "_w8"] = res[2][1]

    qkv_parts = [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")]
    if all(isinstance(p, QLinear) for p in qkv_parts):
        put("wqkv", _col_parallel(qkv_parts, tp, block_n, prefill_w8))
    else:
        raise ValueError("deploy layout requires quantized q/k/v")
    if "gate" in layers:
        gu = [layers.pop("gate"), layers.pop("up")]
        if not all(isinstance(p, QLinear) for p in gu):
            raise ValueError("deploy layout requires quantized gate/up")
        put("wgateup", _col_parallel(gu, tp, block_n, prefill_w8))
    elif "up" in layers:
        put("up", _col_parallel([layers.pop("up")], tp, block_n,
                                prefill_w8))
    for name in ("wo", "down"):
        ql = layers.pop(name)
        if not isinstance(ql, QLinear):
            raise ValueError(f"deploy layout requires quantized {name}")
        put(name, _row_parallel(ql, tp, block_n, prefill_w8))
    for name, leaf in layers.items():          # norms, act_scale=None, ...
        if leaf is None:
            continue
        out_layers[name] = leaf
        specs_layers[name] = P()

    out = {"layers": out_layers}
    specs = {"layers": specs_layers}

    emb = params["embed"]
    if tp > 1 and emb.shape[0] % tp == 0:
        out["embed"], specs["embed"] = emb, P("tp", None)
    else:
        out["embed"], specs["embed"] = emb, P()
    for name in ("norm", "norm_b", "pos_embed", "embed_ln_w",
                 "embed_ln_b"):
        if params.get(name) is not None:
            out[name], specs[name] = params[name], P()

    head = params.get("lm_head")
    if head is not None:
        if isinstance(head, QLinear):
            if head.qweight.ndim != 2:
                raise ValueError("lm_head must be a plain 2D QLinear")
            stacked = jax.tree_util.tree_map(lambda a: a[None], head)
            # no w8 cache for the head: prefill computes last-token-only
            # logits (m <= B, under the kernel's m >= 32 gate)
            out["lm_head"], specs["lm_head"], _ = _col_parallel(
                [stacked], tp, block_n)
        else:
            out["lm_head"] = head
            specs["lm_head"] = (P(None, "tp")
                                if tp > 1 and head.shape[-1] % tp == 0
                                else P())

    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    out = jax.device_put(out, shardings)
    return TPParams(params=out, pspecs=specs, tp=tp)
