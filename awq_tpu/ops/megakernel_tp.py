"""Tensor-parallel decode half-layer megakernels.

The whole-token megakernel (ops/megakernel.py) fuses ALL layers into one
launch, so per-layer Megatron psums cannot be inserted — under explicit
TP (parallel/tp.py) decode previously fell back to the 5-kernel/layer
folded path (~30% off the single-chip headline). These kernels split one
decoder layer at its two collective points:

- :func:`w4a16_llama_attn_half`: rmsnorm -> fused QKV (rank-local heads)
  -> rope -> flash attention over the rank-local KV-cache shard ->
  o-proj against the rank's IC shard -> ``[1, H]`` f32 PARTIAL sum (no
  residual add — the caller psums it).
- :func:`w4a16_llama_mlp_half`: rmsnorm -> gate/up (rank-local I shard)
  -> SwiGLU -> down (IC shard) -> ``[1, H]`` f32 PARTIAL sum.

The caller (``models/llama.py::forward`` under ``tp_axis``) runs, per
layer: attn_half -> psum -> residual -> mlp_half -> psum -> residual —
2 Pallas launches + 2 collectives per layer instead of 5 launches + 2.
Each rank streams exactly its shard of the folded deploy layout
(``parallel/deploy.py``), so per-chip weight bytes are layer_bytes/tp
and the per-chip streaming rate matches the single-chip kernels.

The reference has no distributed decode at all (SURVEY.md §2.3); this is
the TPU counterpart of sharding its fused decode path
(``tinychat/modules/fused_attn.py:169-324``) Megatron-style.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.megakernel import (_attn_phases, _cost, _mlp_phases)
from awq_tpu.ops.w4a16 import QLinear


def _dims_attn(nq, nkv, hd, eps, wqkv: QLinear, wo: QLinear, cache):
    q8 = cache.dtype == jnp.int8
    bt = 256
    hc = max(1, min(nkv, (512 * 1024) // (bt * hd * cache.dtype.itemsize)))
    while nkv % hc:
        hc -= 1
    return dict(
        nq=nq, nkv=nkv, hd=hd, eps=eps,
        ngh=wqkv.in_features // 128,
        ngo=nq * hd // 128,
        NBQ=wqkv.out_features // wqkv.tiled_bn,
        NBO=wo.out_features // wo.tiled_bn,
        bnq=wqkv.tiled_bn, bno=wo.tiled_bn,
        rq=wqkv.qweight.shape[2], ro=wo.qweight.shape[2],
        bt=bt, hc=hc, T=cache.shape[4], q8=q8,
    )


def _dims_mlp(eps, wgu: QLinear, wdn: QLinear):
    return dict(
        eps=eps,
        ngh=wgu.in_features // 128,
        ngi=wdn.in_features // 128,
        NBG=wgu.out_features // wgu.tiled_bn,
        NBD=wdn.out_features // wdn.tiled_bn,
        bng=wgu.tiled_bn, bnd=wdn.tiled_bn,
        rg=wgu.qweight.shape[2], rd=wdn.qweight.shape[2],
    )


def _attn_half_kernel(
    scalars_ref,
    h_ref, ln1_ref, bq_ref, cs_ref,
    wq_hbm, wo_hbm, cache_ref, kvs_ref,
    opart_ref, kn_ref, vn_ref,
    xq_s, qkv_s, xo_s, xsum_s, p_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, unpack="pscratch3",
):
    layer = scalars_ref[0]
    length = scalars_ref[1]

    def kv_store(k, v):
        kn_ref[:, :] = k.astype(kn_ref.dtype)
        vn_ref[:, :] = v.astype(vn_ref.dtype)

    # prologue: start the QKV stream's block 0 while rmsnorm computes
    pltpu.make_async_copy(
        wq_hbm.at[layer, 0], wbuf.at[0, 0:dims["rq"], 0:dims["bnq"]],
        wsem.at[0],
    ).start()
    _attn_phases(
        layer, jnp.int32(0), h_ref[:, :], ln1_ref[0],
        bq_ref[0].astype(jnp.float32), length, cs_ref,
        wq_hbm, wo_hbm, cache_ref, kvs_ref, kv_store,
        xq_s, qkv_s, xo_s, opart_ref, xsum_s, p_s,
        wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
        dims=dims, unpack=unpack,
    )


def _mlp_half_kernel(
    scalars_ref,
    h1_ref, ln2_ref,
    wg_hbm, wd_hbm,
    mpart_ref,
    xq_s, gu_s, hm_s, xsum_s, p_s, wbuf, wsem,
    *, dims, unpack="pscratch3",
):
    layer = scalars_ref[0]
    pltpu.make_async_copy(
        wg_hbm.at[layer, 0], wbuf.at[0, 0:dims["rg"], 0:dims["bng"]],
        wsem.at[0],
    ).start()
    _mlp_phases(
        layer, jnp.int32(0), h1_ref[:, :].astype(jnp.float32), ln2_ref[0],
        wg_hbm, wd_hbm,
        xq_s, gu_s, hm_s, mpart_ref, xsum_s, p_s, wbuf, wsem,
        dims=dims, unpack=unpack,
    )


@functools.partial(
    jax.jit, static_argnames=("nq", "nkv", "eps", "interpret", "unpack"))
def w4a16_llama_attn_half(
    h: jax.Array,            # [1, H] residual input (replicated)
    wqkv: QLinear,           # stacked folded tiled, rank-local OC shard
    wo: QLinear,             # stacked folded tiled, rank-local IC shard
    ln1: jax.Array,          # [L, H] stacked norm weights (replicated)
    cos_row: jax.Array,      # [hd] f32 rope row at the current position
    sin_row: jax.Array,
    cache: jax.Array,        # [L, 2, 1, nkv_local, T, hd] local shard
    layer_idx: jax.Array,
    length: jax.Array,       # cache prefix length (current pos)
    nq: int = 0, nkv: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
    unpack: str = "pscratch3",
    cache_scales: jax.Array = None,   # [L, 2, 1, nkv, T] f32 (int8 cache)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Attention half of one decoder layer for one token: returns
    ``(o_partial [1, H] f32, k_new [nkv, hd], v_new [nkv, hd])``.
    ``o_partial`` is this rank's o-proj contribution; the caller psums
    over tp and adds the residual. k/v come back fp for the deferred
    batched cache append (quantized first for an int8 cache)."""
    H = h.shape[-1]
    hd = cache.shape[-1]
    nkv = nkv or cache.shape[3]
    nq = nq or wo.in_features // hd
    assert wqkv.folded and wo.folded
    if wqkv.dense3:
        unpack = "dense3"
    dims = _dims_attn(nq, nkv, hd, eps, wqkv, wo, cache)
    dims["exact"] = bool(interpret)
    ngh, ngo = dims["ngh"], dims["ngo"]

    h_rows = h.reshape(ngh, 128)
    L = cache.shape[0]
    ln = ln1.reshape(L, ngh, 128)
    nr = nq + 2 * nkv
    bq = (jnp.zeros((L, nr, hd), jnp.float32) if wqkv.bias is None
          else wqkv.bias.astype(jnp.float32).reshape(L, nr, hd))
    cs = jnp.stack([cos_row, sin_row]).astype(jnp.float32)
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(length, jnp.int32)])

    if cache_scales is None:
        cache_scales = jnp.zeros((1, 2, 1, 8, 128), jnp.float32)
    kv_dt = jnp.bfloat16 if cache.dtype == jnp.int8 else cache.dtype
    wrows = max(dims["rq"], dims["ro"])
    wcols = max(dims["bnq"], dims["bno"])
    pinned = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh, 128), pinned),                    # h rows
            pl.BlockSpec((1, ngh, 128),
                         lambda g, l: (l[0], 0, 0)),             # ln1
            pl.BlockSpec((1, nr, hd),
                         lambda g, l: (l[0], 0, 0)),             # qkv bias
            pl.BlockSpec((2, hd), pinned),                       # cos|sin
            pl.BlockSpec(memory_space=pl.ANY),                   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                   # wo
            pl.BlockSpec(memory_space=pl.ANY),                   # cache
            pl.BlockSpec(memory_space=pl.ANY),                   # kv scales
        ],
        out_specs=[
            pl.BlockSpec((ngh, 128), pinned),                    # o partial
            pl.BlockSpec((nkv, hd), pinned),                     # k_new
            pl.BlockSpec((nkv, hd), pinned),                     # v_new
        ],
        scratch_shapes=[
            pltpu.VMEM((ngh, 128), jnp.float32),                 # xq
            pltpu.VMEM((nr, hd), jnp.float32),                   # qkv rows
            pltpu.VMEM((ngo, 128), jnp.float32),                 # xo (attn)
            pltpu.VMEM((8, max(128, ngh)), jnp.float32),         # xsums
            pltpu.VMEM((2 * ngh, wcols), jnp.float32),           # parts
            pltpu.VMEM((2, wrows, wcols), jnp.int32),            # weight dbuf
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),
            pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    opart, kn, vn = pl.pallas_call(
        functools.partial(_attn_half_kernel, dims=dims, unpack=unpack),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngh, 128), jnp.float32),
            jax.ShapeDtypeStruct((nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((nkv, hd), kv_dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=_cost((wqkv, wo)),
        interpret=interpret,
    )(
        scalars, h_rows, ln, bq, cs,
        wqkv.qweight, wo.qweight, cache, cache_scales,
    )
    return opart.reshape(1, H), kn, vn


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret", "unpack"))
def w4a16_llama_mlp_half(
    h1: jax.Array,           # [1, H] f32 post-attention residual
    wgu: QLinear,            # stacked folded tiled, rank-local OC shard
    wdn: QLinear,            # stacked folded tiled, rank-local IC shard
    ln2: jax.Array,          # [L, H] stacked norm weights (replicated)
    layer_idx: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
    unpack: str = "pscratch3",
) -> jax.Array:
    """MLP half of one decoder layer: returns this rank's down-proj
    PARTIAL sum ``[1, H]`` f32; the caller psums and adds the residual."""
    H = h1.shape[-1]
    assert wgu.folded and wdn.folded
    if wgu.dense3:
        unpack = "dense3"
    dims = _dims_mlp(eps, wgu, wdn)
    dims["exact"] = bool(interpret)
    ngh, ngi = dims["ngh"], dims["ngi"]

    h_rows = h1.astype(jnp.float32).reshape(ngh, 128)
    L = ln2.shape[0]
    ln = ln2.reshape(L, ngh, 128)
    scalars = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    wrows = max(dims["rg"], dims["rd"])
    wcols = max(dims["bng"], dims["bnd"])
    pinned = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh, 128), pinned),                    # h1 rows
            pl.BlockSpec((1, ngh, 128),
                         lambda g, l: (l[0], 0, 0)),             # ln2
            pl.BlockSpec(memory_space=pl.ANY),                   # wgu
            pl.BlockSpec(memory_space=pl.ANY),                   # wdn
        ],
        out_specs=pl.BlockSpec((ngh, 128), pinned),              # m partial
        scratch_shapes=[
            pltpu.VMEM((ngh, 128), jnp.float32),                 # xm
            pltpu.VMEM((2 * ngi, 128), jnp.float32),             # gate|up
            pltpu.VMEM((ngi, 128), jnp.float32),                 # hm
            pltpu.VMEM((8, max(128, ngh, ngi)), jnp.float32),    # xsums
            pltpu.VMEM((2 * max(ngh, ngi), wcols), jnp.float32),  # parts
            pltpu.VMEM((2, wrows, wcols), jnp.int32),            # weight dbuf
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    mpart = pl.pallas_call(
        functools.partial(_mlp_half_kernel, dims=dims, unpack=unpack),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ngh, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=_cost((wgu, wdn)),
        interpret=interpret,
    )(scalars, h_rows, ln, wgu.qweight, wdn.qweight)
    return mpart.reshape(1, H)


def tp_megakernel_supported(cfg, layers, cache) -> bool:
    """Static eligibility for the TP half-layer megakernels. ``cfg`` is
    the LOCAL (per-rank) view; ``layers``/``cache`` hold the rank-local
    deploy-layout shards (``parallel/deploy.py``)."""
    if cfg.head_dim != 128 or cfg.act != "silu" or cfg.norm != "rmsnorm":
        return False
    if cfg.parallel_block or cfg.rotary_pct != 1.0:
        return False
    needed = ("wqkv", "wgateup", "wo", "down")
    if not all(n in layers for n in needed):
        return False
    d3 = isinstance(layers.get("wqkv"), QLinear) and layers["wqkv"].dense3
    for n in needed:
        p = layers[n]
        if not isinstance(p, QLinear) or not p.tiled_bn:
            return False
        if p.bias is not None and n != "wqkv":   # qwen2: QKV bias only
            return False
        if p.group_size != 128 or not p.folded:
            return False
        if not (p.w_bit == 4 and not p.dense3) and not (p.w_bit == 3
                                                        and p.dense3):
            return False
        if p.dense3 != d3:
            return False
    data = getattr(cache, "data", cache)
    if not isinstance(data, jax.Array):
        return False
    if data.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32, jnp.int8):
        return False
    if data.shape[2] != 1 or data.shape[4] % 256 != 0:
        return False
    if data.shape[3] != cfg.num_kv_heads:
        return False
    H = layers["wqkv"].in_features
    if H % 128 or layers["down"].in_features % 128:
        return False
    if layers.get("act_scale") is not None:
        return False
    # VMEM budget per half-kernel (the MLP half streams the widest rows)
    for pair in ((layers["wqkv"], layers["wo"]),
                 (layers["wgateup"], layers["down"])):
        wrows = max(p.qweight.shape[2] for p in pair)
        wcols = max(p.tiled_bn for p in pair)
        i_loc = layers["down"].in_features
        scratch = (2 * wrows * wcols * 4
                   + 4 * 512 * 1024
                   + (5 * H + 3 * i_loc) * 4
                   + 2 * max(H, i_loc) // 128 * wcols * 4
                   + 2 * cfg.num_layers * H * 4)
        if scratch > 14 * 1024 * 1024:
            return False
    return True
