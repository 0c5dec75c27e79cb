"""Fused dequant W4A16 (and W3A16) matmul.

TPU-native counterpart of the reference CUDA kernels
``awq/kernels/csrc/quantization_new/gemm/gemm_cuda.cu`` (prefill GEMM) and
``.../gemv/gemv_cuda.cu`` (decode GEMV). The design is re-derived for TPU
rather than translated:

- Weights are packed int4 codes in the Mosaic-friendly layout of
  :mod:`awq_tpu.quant.packing` (``int32 [IC//8, OC]``, 64-channel chunks).
- One Pallas kernel serves both GEMM and GEMV shapes: the grid is
  ``(M/bm, OC/bn, IC/bk)`` with the K dimension innermost, accumulating in
  an f32 VMEM scratch tile. Pallas's automatic pipelining double-buffers
  the packed-weight blocks, so decode (tiny M) runs at HBM streaming speed
  — the TPU analogue of the reference's split-K + semaphore scheme
  (``gemm_cuda.cu:312-753``), which the XLA grid handles for free.
- Dequantization uses the *matmul-then-scale* identity: within a
  quantization group g, ``x @ ((q - z) s) == s * (x @ q) - (sum_k x) * (s z)``,
  so the MXU consumes raw int4 codes cast to bf16 and the VPU only touches
  ``[bm, bn]`` partial sums per group — instead of scaling every weight
  element. ``szeros`` stores ``scales * zeros`` precomputed.

Accumulation is f32 (the reference uses fp16 accumulation for fp16 inputs,
``gemm_cuda.cu:92-140``; f32 here is both faster on MXU and more accurate).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.quant.core import quantize_groupwise
from awq_tpu.quant.packing import (
    pack_int3,
    pack_int4,
    unpack_int3,
    unpack_int4,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QLinear:
    """Packed quantized linear parameters (a pytree node).

    Counterpart of the reference ``WQLinear`` buffers
    (``awq/quantize/qmodule.py:98-130``) minus the tensor-core interleave.
    """

    qweight: jax.Array                 # int32 [IC//8, OC]; tiled variant:
    # [(L,) NB, IC//8, bn] (block-contiguous in HBM: each N block streams
    # as one DMA at ~95% of peak bandwidth vs ~55% for the strided layout).
    # folded variant: [(L,) NB, IC//8 + IC//G (+pad to 8), bn] — each
    # block carries ONE packed qparam row per group (bf16 scale | bf16
    # szero in an int32) as trailing rows, in the bf16-bitpack nibble
    # order, so one array / one DMA stream serves the whole matmul.
    scales: jax.Array                  # f32   [IC//G, OC]
    szeros: jax.Array                  # f32   [IC//G, OC]  == scales * zeros
    bias: Optional[jax.Array] = None   # [OC] or None
    w_bit: int = dataclasses.field(default=4, metadata=dict(static=True))
    group_size: int = dataclasses.field(default=128, metadata=dict(static=True))
    tiled_bn: int = dataclasses.field(default=0, metadata=dict(static=True))
    folded: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # dense3: qweight is the TRUE 3-bit runtime layout [IC*3//32, OC]
    # (quant/packing.py::pack_int3) — 0.75x the decode bytes of the
    # nibble container. w_bit==3 WITHOUT dense3 means 3-bit codes in the
    # int4 nibble container (IC % 256 fallback / legacy checkpoints).
    dense3: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # n_groups: group count of a FOLDED dense3 layout (the w3x row
    # formula 64*(n_g//5) + 16*(n_g%5) + n_g is not invertible from the
    # 8-aligned row count alone — e.g. n_g 4 and 5 both pad to 72 rows)
    n_groups: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def in_features(self) -> int:
        rows = self.qweight.shape[-2]
        if self.folded:
            if self.dense3:
                return self.n_groups * self.group_size
            # rows = IC/8 code rows + IC/G qparam rows (+ <8 pad): each
            # group of G inputs occupies G/8 code rows + 1 packed qparam
            # row (bf16 scale | bf16 szero)
            return (rows // (self.group_size // 8 + 1)) * self.group_size
        if self.dense3:
            return rows * 32 // 3
        return rows * 8

    @property
    def out_features(self) -> int:
        if self.tiled_bn:
            return self.qweight.shape[-3] * self.tiled_bn
        return self.qweight.shape[-1]


def quantize_linear(
    w: jax.Array,
    n_bit: int = 4,
    group_size: int = 128,
    bias: Optional[jax.Array] = None,
    clip_max: Optional[jax.Array] = None,
    scale_dtype=jnp.float32,
) -> QLinear:
    """Real-quantize a ``[IC, OC]`` weight into a packed :class:`QLinear`.

    Counterpart of ``WQLinear.from_linear`` (``qmodule.py:139-199``).
    """
    g = w.shape[0] if group_size == -1 else group_size
    q, s, z = quantize_groupwise(w, n_bit=n_bit, group_size=g, clip_max=clip_max)
    dense3 = n_bit == 3 and w.shape[0] % 256 == 0
    return QLinear(
        qweight=pack_int3(q) if dense3 else pack_int4(q),
        scales=s.astype(scale_dtype),
        szeros=(s * z).astype(scale_dtype),
        bias=bias,
        w_bit=n_bit,
        group_size=g,
        dense3=dense3,
    )


# --------------------------------------------------------------------------
# XLA reference implementation (runs anywhere; used on CPU and in tests)
# --------------------------------------------------------------------------


def w4a16_matmul_xla(x, qweight, scales, szeros, group_size: int,
                     dense3: bool = False):
    if dense3:
        q = unpack_int3(qweight, out_dtype=jnp.float32)
        ic = qweight.shape[0] * 32 // 3
    else:
        q = unpack_int4(qweight, out_dtype=jnp.float32)
        ic = qweight.shape[0] * 8
    n_g = ic // group_size
    qg = q.reshape(n_g, group_size, -1)
    w = qg * scales[:, None, :] - szeros[:, None, :]
    w = w.reshape(ic, -1).astype(x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------


def _unpack_block(w):
    """int32 ``[bkp, bn]`` packed block -> int32 codes ``[8*bkp, bn]``.

    Pure shift/mask + tile-aligned stack; see packing.py for the layout.
    """
    bkp, bn = w.shape
    w3 = w.reshape(bkp // 8, 8, bn)
    planes = [(w3 >> (4 * s)) & 0xF for s in range(8)]
    return jnp.stack(planes, axis=1).reshape(bkp * 8, bn)


def _w4a16_kernel(x_ref, qw_ref, s_ref, sz_ref, o_ref, *,
                  group_size: int, out_dtype):
    """Full-K block, per-group unpack (see ``_w4a16_kernel_stacked``):
    per-group: out += s_g * (x_g @ q_g) - (sum x_g) * sz_g — the MXU
    consumes raw codes, the VPU touches only [bm, bn] partials, and only
    one group's codes are unpacked at a time."""
    x = x_ref[:]                                           # [bm, IC]
    ic = x.shape[1]
    n_g = ic // group_size
    rows = group_size // 8
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(n_g):
        wq = _unpack_block(
            qw_ref[g * rows:(g + 1) * rows, :]
        ).astype(jnp.bfloat16)                             # [group, bn]
        xg = x[:, g * group_size:(g + 1) * group_size]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * s_ref[g, :][None, :] - xsum * sz_ref[g, :][None, :]
    o_ref[:] = acc.astype(out_dtype)



def _cap_bm(bm: int, ic: int, bn: int, group_size: int) -> int:
    """Shrink the M block so the kernel fits VMEM (~16 MB): double-buffered
    x [bm, IC] bf16 + qweight [IC/8, bn] int32 + f32 acc/out [bm, bn] +
    one unpacked group [G, bn] bf16."""
    budget = 12 * 1024 * 1024
    fixed = 2 * (ic // 8) * bn * 4 + group_size * bn * 2 \
        + 2 * (ic // group_size) * bn * 4
    while bm > 16 and fixed + 2 * bm * ic * 2 + 2 * bm * bn * 4 > budget:
        bm //= 2
    return max(bm, 16)

def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not divisible by any of {candidates}")


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n", "block_k")
)
def w4a16_matmul_pallas(
    x, qweight, scales, szeros, group_size: int,
    block_m: int = 0, block_n: int = 512, block_k: int = 0,
):
    m, ic = x.shape
    oc = qweight.shape[1]
    # bm need not divide m (we pad); pick the smallest tile-aligned block
    # covering m, capped at 256 (decode m=1..8 -> bm=16, one bf16 tile).
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bn = _pick_block(oc, (block_n, 256, 128))
    bm = _cap_bm(bm, ic, bn, group_size)
    if group_size % 64 != 0 or ic % group_size != 0:
        # irregular group sizes fall back to the XLA path
        return w4a16_matmul_xla(x, qweight, scales, szeros, group_size)

    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    grid = (x.shape[0] // bm, oc // bn)

    out = pl.pallas_call(
        functools.partial(
            _w4a16_kernel, group_size=group_size, out_dtype=x.dtype
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j: (i, 0)),
            pl.BlockSpec((ic // 8, bn), lambda i, j: (0, j)),
            pl.BlockSpec((ic // group_size, bn), lambda i, j: (0, j)),
            pl.BlockSpec((ic // group_size, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], oc), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * oc,
            bytes_accessed=ic * oc // 2 + x.shape[0] * ic * 2
            + x.shape[0] * oc * 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(x, qweight, scales, szeros)
    return out[:m] if m_pad else out


def _unpack_block3(w):
    """int32 ``[bkp, bn]`` dense-3-bit block -> int32 codes
    ``[bkp*32//3, bn]`` (layout: ``quant/packing.py::pack_int3``). All
    extraction ops work on whole 8-row sublane tiles, like
    :func:`_unpack_block` — 48 shift/ands per 256 codes vs 32 for int4,
    irrelevant next to the 25% HBM-byte saving on a bandwidth-bound
    decode."""
    bkp, bn = w.shape
    nc = bkp // 24
    w3 = w.reshape(nc, 24, bn)
    lo = w3[:, :16].reshape(nc, 2, 8, bn)
    hi = w3[:, 16:]
    planes = [((lo[:, s >> 4] >> (2 * (s & 15))) & 3) | (((hi >> s) & 1) << 2)
              for s in range(32)]
    return jnp.stack(planes, axis=1).reshape(nc * 256, bn)


def _chunk_groups(ic: int, group_size: int):
    """(group, in-chunk offset, length) pieces for each 256-IC chunk."""
    assert 256 % group_size == 0 or group_size % 256 == 0, group_size
    out = []
    for c in range(ic // 256):
        if group_size >= 256:
            out.append([(c * 256 // group_size, 0, 256)])
        else:
            gpc = 256 // group_size
            out.append([(c * gpc + j, j * group_size, group_size)
                        for j in range(gpc)])
    return out


def _w3a16_kernel_stacked(idx_ref, x_ref, qw_ref, s_ref, sz_ref, o_ref,
                          *, group_size: int, out_dtype):
    """W3A16 sibling of :func:`_w4a16_kernel_stacked`: full-K block,
    per-256-IC-chunk unpack of the dense 3-bit layout, same
    matmul-then-scale identity (out += s_g * (x_g @ q_g) - sum(x_g)*sz_g)."""
    del idx_ref
    x = x_ref[:]
    ic = x.shape[1]
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for c, pieces in enumerate(_chunk_groups(ic, group_size)):
        wq = _unpack_block3(
            qw_ref[0, c * 24:(c + 1) * 24, :]
        ).astype(jnp.bfloat16)                          # [256, bn]
        for g, off, ln in pieces:
            xg = x[:, c * 256 + off:c * 256 + off + ln]
            part = jnp.dot(xg, wq[off:off + ln],
                           preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + part * s_ref[0, g, :][None, :] \
                - xsum * sz_ref[0, g, :][None, :]
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n")
)
def w3a16_matmul_stacked(
    x, qweight, scales, szeros, layer_idx, group_size: int,
    block_m: int = 0, block_n: int = 512,
):
    """Stacked dense-3-bit matmul ``[L, IC*3//32, OC]``; streams 0.75x
    the weight bytes of :func:`w4a16_matmul_stacked`. No reference
    counterpart exists (``qmodule.py:82`` asserts w_bit==4)."""
    m, ic = x.shape
    _, icp, oc = qweight.shape
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bn = _pick_block(oc, (block_n, 256, 128))
    bm = _cap_bm(bm, ic, bn, group_size)
    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    grid = (x.shape[0] // bm, oc // bn)
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, icp, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(
            _w3a16_kernel_stacked, group_size=group_size, out_dtype=x.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], oc), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * oc,
            bytes_accessed=ic * oc * 3 // 8,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, x, qweight, scales, szeros)
    return out[:m] if m_pad else out


def _w4a16_kernel_stacked(idx_ref, x_ref, qw_ref, s_ref, sz_ref, o_ref,
                          *, group_size: int, out_dtype):
    """Full-K block, per-group unpack: the whole reduction happens in one
    grid step (no K grid dimension, no cross-step accumulator), and only
    one quantization group's codes are unpacked at a time so the VPU work
    interleaves with the MXU matmuls instead of front-loading a giant
    dequantized temporary."""
    del idx_ref  # consumed by the index maps
    x = x_ref[:]
    ic = x.shape[1]
    n_g = ic // group_size
    rows = group_size // 8  # packed words per group
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for g in range(n_g):
        wq = _unpack_block(
            qw_ref[0, g * rows:(g + 1) * rows, :]
        ).astype(jnp.bfloat16)                          # [group, bn]
        xg = x[:, g * group_size:(g + 1) * group_size]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc = acc + part * s_ref[0, g, :][None, :] \
            - xsum * sz_ref[0, g, :][None, :]
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n", "block_k")
)
def w4a16_matmul_stacked(
    x, qweight, scales, szeros, layer_idx, group_size: int,
    block_m: int = 0, block_n: int = 512, block_k: int = 0,
):
    """Like :func:`w4a16_matmul_pallas` but over STACKED per-layer weights
    ``[L, IC//8, OC]`` selected by ``layer_idx`` inside the kernel's index
    maps (scalar prefetch). Under a ``lax.scan`` over layers this reads the
    weights in place — slicing the stack outside the kernel would force XLA
    to materialize a full copy of each layer's weights per call."""
    del block_k  # full-K blocks
    m, ic = x.shape
    _, icp, oc = qweight.shape
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bn = _pick_block(oc, (block_n, 256, 128))
    bm = _cap_bm(bm, ic, bn, group_size)
    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    grid = (x.shape[0] // bm, oc // bn)
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, icp, bn), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(
            _w4a16_kernel_stacked, group_size=group_size, out_dtype=x.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], oc), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * oc,
            bytes_accessed=ic * oc // 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, x, qweight, scales, szeros)
    return out[:m] if m_pad else out


def _fold_nibble_maps():
    """Index tables for the bf16-bitpack nibble order (see
    ``_unpack_block_bf16``). The folded layout stores, in word ``q`` nibble
    ``k`` of each 16-word / 128-row window, the TRUE row
    ``32*(k&3) + 2*q + (k>>2)`` — chosen so the kernel's cheap unpack
    (4x shift/mask/or + one aligned concat + bitcast) emits rows in
    natural order. Returns (src_word, src_shift) [16, 8] tables mapping
    each (q, k) to its position in the STANDARD packing (packing.py: row
    ``r`` at word ``8*(r>>6) + (r&7)``, nibble ``(r>>3)&7``)."""
    import numpy as np

    q = np.arange(16)[:, None]
    k = np.arange(8)[None, :]
    r = 32 * (k & 3) + 2 * q + (k >> 2)       # true row held at (q, k)
    return ((8 * (r >> 6) + (r & 7)).astype(np.int32),
            (4 * ((r >> 3) & 7)).astype(np.int32))


def _fold_nibble_maps_inv():
    """Inverse tables: standard word ``q`` nibble ``s`` (true row
    ``r = 64*(q>>3) + 8*s + (q&7)``) lives in folded word ``(r>>1)&15``,
    nibble ``(r>>5) + 4*(r&1)``."""
    import numpy as np

    q = np.arange(16)[:, None]
    s = np.arange(8)[None, :]
    r = 64 * (q >> 3) + 8 * s + (q & 7)
    return (((r >> 1) & 15).astype(np.int32),
            (4 * ((r >> 5) + 4 * (r & 1))).astype(np.int32))


def _remap_nibbles(qw: jax.Array, maps) -> jax.Array:
    """Apply a word/nibble permutation (per 16-word window along the
    second-to-last axis) given (src_word, src_shift) [16, 8] tables."""
    src_word, src_shift = maps
    shape = qw.shape
    icp = shape[-2]
    w = qw.reshape(shape[:-2] + (icp // 16, 16, shape[-1]))
    out = jnp.zeros_like(w)
    for k in range(8):
        nib = (jnp.take(w, src_word[:, k], axis=-2)
               >> jnp.asarray(src_shift[:, k])[:, None]) & 0xF
        out = out | (nib << (4 * k))
    return out.reshape(shape)


def strip_unfolded_qparams(tree):
    """Replace every FOLDED QLinear's separate f32 scales/szeros fields
    with 1-element placeholders. The TPU folded kernels read quant params
    from the packed qparam rows; the fields only serve XLA fallbacks and
    ``untile_qweight`` round-trips. Saves ~0.4 GB on a 7B model — useful
    when benchmarking on a shared/contended chip."""
    def strip(x):
        if isinstance(x, QLinear) and x.folded:
            z = jnp.zeros((1,) * x.scales.ndim, jnp.float32)
            return dataclasses.replace(x, scales=z, szeros=z)
        return x

    return jax.tree_util.tree_map(
        strip, tree, is_leaf=lambda x: isinstance(x, QLinear))


def _unpack_block_bf16(w):
    """Folded-layout packed block ``[16, bn]`` int32 -> ``[128, bn]``
    bfloat16 holding ``128 + code`` (code in 0..15).

    Nibbles are placed (by ``tile_qlinear(fold_scales=True)``) so each
    plane's low/high half-words are already a (even, odd) bf16 row pair:
    ``0x4300 | code`` is the bf16 bit pattern of ``128 + code`` exactly,
    so unpacking is 3 VPU ops per 2 output rows with NO sublane
    interleave and NO int->float convert (the convert + interleave stack
    of the generic ``_unpack_block`` was the measured compute bound that
    held the streaming kernels at ~550 of 820 GB/s). The +128 bias is
    removed by consumers via an explicit bf16-exact ``- 128`` centering
    before the dot (``_qdot_rows`` and the folded kernels); the folded
    szeros rows are stored UNBIASED — do not fold 128*s into them."""
    planes = [((w >> (4 * j)) & 0x000F000F) | 0x43004300 for j in range(4)]
    u32 = jnp.concatenate(planes, axis=0)      # [64, bn]
    return pltpu.bitcast(u32, jnp.bfloat16)    # [128, bn]


def tile_qlinear(ql: QLinear, block_n: int = 512,
                 fold_scales: bool = False,
                 donate: bool = False) -> QLinear:
    """Repack a (stacked) QLinear to the block-contiguous layout
    ``[L, OC/bn, IC//8, bn]``; no-op if already tiled or OC % bn != 0.

    ``fold_scales`` appends ONE packed qparam row per group (bf16 scale |
    bf16 szero in an int32) as ``IC/G`` trailing rows and switches the
    code words to the bf16-bitpack nibble order (``_unpack_block_bf16``):
    one array/one DMA stream per matmul — the layout the decode kernels
    want (see QLinear docstring). Only supported for group_size == 128
    (the nibble permutation works on 128-row windows); other group sizes
    tile plain.
    """
    if fold_scales and ql.group_size != 128:
        fold_scales = False
    if ql.tiled_bn or ql.qweight.shape[-1] % block_n != 0:
        return ql
    if ql.dense3:
        # dense 3-bit: block-contiguous fold (no nibble remap) — the
        # megakernel/GEMM stream wants one contiguous block per DMA;
        # without fold_scales the column-sliced stream kernel reads the
        # plain layout directly
        if not fold_scales:
            return ql
        qw3 = ql.qweight if ql.qweight.ndim == 3 else ql.qweight[None]
        fold3 = _fold_tile3_donate if donate else _fold_tile3
        qt3 = fold3(qw3,
                    ql.scales if ql.qweight.ndim == 3 else ql.scales[None],
                    ql.szeros if ql.qweight.ndim == 3 else ql.szeros[None],
                    block_n)
        if ql.qweight.ndim == 2:
            qt3 = qt3[0]
        return QLinear(
            qweight=qt3, scales=ql.scales, szeros=ql.szeros, bias=ql.bias,
            w_bit=ql.w_bit, group_size=ql.group_size, tiled_bn=block_n,
            folded=True, dense3=True,
            n_groups=ql.in_features // ql.group_size,
        )
    qw = ql.qweight
    stacked = qw.ndim == 3
    if not stacked:
        qw = qw[None]
    if fold_scales:
        # one jitted pipeline: eagerly, the reshape/remap/concat chain
        # holds several array-sized temps at once — repacking a 7B model
        # that way OOMs a 16 GB chip. ``donate`` additionally frees the
        # original codes (callers must not reuse them afterwards).
        fold = _fold_tile_donate if donate else _fold_tile
        qt = fold(qw, ql.scales if stacked else ql.scales[None],
                  ql.szeros if stacked else ql.szeros[None],
                  block_n)
    else:
        L, icp, oc = qw.shape
        nb = oc // block_n
        qt = qw.reshape(L, icp, nb, block_n).transpose(0, 2, 1, 3).copy()
    if not stacked:
        qt = qt[0]
    return QLinear(
        qweight=qt, scales=ql.scales,
        szeros=ql.szeros, bias=ql.bias, w_bit=ql.w_bit,
        group_size=ql.group_size, tiled_bn=block_n, folded=fold_scales,
    )


@functools.partial(jax.jit, static_argnames=("block_n",))
def _fold_tile(qw: jax.Array, scales: jax.Array, szeros: jax.Array,
               block_n: int) -> jax.Array:
    """Blockify + nibble-permute + append packed qparam rows (see
    ``tile_qlinear``)."""
    L, icp, oc = qw.shape
    nb = oc // block_n
    qt = qw.reshape(L, icp, nb, block_n).transpose(0, 2, 1, 3)
    qt = _remap_nibbles(qt, _fold_nibble_maps())

    def blkify(a):  # [L, n_g, OC] -> [L, NB, n_g, bn] uint32 bf16 bits
        n_g = a.shape[-2]
        t = a.reshape(L, n_g, nb, block_n).transpose(0, 2, 1, 3)
        return jax.lax.bitcast_convert_type(
            t.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)

    # one packed qparam row per group: bf16(scale) in the low half-word,
    # bf16(szero) in the high — the kernel's bitcast to bf16 yields rows
    # (scale, szero) directly (low half -> even row)
    qparam = (blkify(scales) | (blkify(szeros) << 16)).astype(jnp.int32)
    qt = jnp.concatenate([qt, qparam], axis=2)
    # HBM DMA slices need the row dim 8-aligned (Mosaic (8,128) tiling)
    pad = -qt.shape[2] % 8
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return qt


_fold_tile_donate = functools.partial(
    jax.jit, static_argnames=("block_n",), donate_argnums=(0,)
)(_fold_tile.__wrapped__)


def _w3x_code_rows(n_g: int) -> int:
    """Code-row count of the folded ``w3x`` 3-bit layout: 64 int32 rows
    per full 5-group chunk + 16 W4-nibble rows per trailer group."""
    return 64 * (n_g // 5) + 16 * (n_g % 5)


def folded_rows(ic: int, group_size: int, dense3: bool = False) -> int:
    """Row count of a folded tiled block (codes + qparam band + 8-align
    pad) — what the megakernel's shared weight buffer must hold."""
    n_g = ic // group_size
    rows = (_w3x_code_rows(n_g) if dense3 else ic // 8) + n_g
    return rows + (-rows % 8)


@functools.partial(jax.jit, static_argnames=("block_n",))
def _fold_tile3(qw: jax.Array, scales: jax.Array, szeros: jax.Array,
                block_n: int) -> jax.Array:
    """Fold the dense 3-bit STORAGE codec (``pack_int3`` bitplanes) into
    the ``w3x`` runtime layout: 5 codes per 16-bit half, 3 bits each
    (bits ``3j..3j+2``), groups of 128 packed five-at-a-time so plane ``j``
    of a 64-row chunk IS group ``5c+j``'s ``[128, bn]`` code block —
    one ``(w >> 3j) & 0x00070007 | 0x43004300`` + bitcast yields bf16
    ``128 + code`` rows at exactly the W4 bf16-bitpack unpack cost.
    The first dense3 runtime fold (bitplane rows streamed as stored) hit
    11.0 vs W4's 5.6 ms/tok on-chip: 0.75x the bytes but 5x the unpack
    VPU ops exposed ~6 ms of compute. w3x trades 3.0 -> 3.2 bits/code
    for W4-equal unpack compute. ``n_g % 5`` trailer groups are stored
    as plain W4 nibble rows (16 rows each, `_unpack_block_bf16` order).
    Qparam band + <8-row alignment pad as in :func:`_fold_tile`."""
    L, icp3, oc = qw.shape
    ic = icp3 * 32 // 3
    n_g = ic // 128
    fc, tg = divmod(n_g, 5)
    nb = oc // block_n

    def layer_rows(qw_l):
        codes = unpack_int3(qw_l, out_dtype=jnp.int32)      # [IC, OC]
        rows = []
        if fc:
            # code k of group 5c+j -> int32 row k//2, half k%2, bits 3j
            cf = codes[: fc * 640].reshape(fc, 5, 64, 2, oc)
            w = jnp.zeros((fc, 64, oc), jnp.int32)
            for j in range(5):
                for h in range(2):
                    w = w | (cf[:, j, :, h] << (16 * h + 3 * j))
            rows.append(w.reshape(fc * 64, oc))
        if tg:
            # trailer: _unpack_block_bf16 nibble order — code 32j+2r+h
            # -> int32 row r, half h, bits 4j
            ct = codes[fc * 640:].reshape(tg, 4, 16, 2, oc)
            wt = jnp.zeros((tg, 16, oc), jnp.int32)
            for j in range(4):
                for h in range(2):
                    wt = wt | (ct[:, j, :, h] << (16 * h + 4 * j))
            rows.append(wt.reshape(tg * 16, oc))
        return jnp.concatenate(rows, axis=0)

    wr = jax.lax.map(layer_rows, qw)                        # [L, crows, oc]
    qt = wr.reshape(L, -1, nb, block_n).transpose(0, 2, 1, 3)

    def blkify(a):
        t = a.reshape(L, n_g, nb, block_n).transpose(0, 2, 1, 3)
        return jax.lax.bitcast_convert_type(
            t.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)

    qparam = (blkify(scales) | (blkify(szeros) << 16)).astype(jnp.int32)
    qt = jnp.concatenate([qt, qparam], axis=2)
    pad = -qt.shape[2] % 8
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return qt


_fold_tile3_donate = functools.partial(
    jax.jit, static_argnames=("block_n",), donate_argnums=(0,)
)(_fold_tile3.__wrapped__)


def untile_qweight(qweight: jax.Array, block_n: int,
                   icp: Optional[int] = None,
                   dense3: bool = False) -> jax.Array:
    """[(L,) NB, rows, bn] -> [(L,) ICp, OC] (XLA fallback paths).

    ``icp`` strips folded scale rows AND undoes the runtime code layout
    back to the standard packing: the bf16-bitpack nibble order for W4,
    or the w3x layout back to the ``pack_int3`` bitplane codec when
    ``dense3`` (``icp`` is then the STORAGE row count ``IC*3//32``)."""
    if qweight.ndim == 4:
        if icp and dense3:
            return jnp.stack([untile_qweight(q, block_n, icp, dense3=True)
                              for q in qweight])
        L, nb, rows, bn = qweight.shape
        qw = qweight[:, :, :icp or rows]
        if icp:
            qw = _remap_nibbles(qw, _fold_nibble_maps_inv())
        return qw.transpose(0, 2, 1, 3).reshape(L, -1, nb * bn)
    nb, rows, bn = qweight.shape
    if icp and dense3:
        ic = icp * 32 // 3
        n_g = ic // 128
        fc, tg = divmod(n_g, 5)
        w = qweight[:, :_w3x_code_rows(n_g)].transpose(1, 0, 2) \
            .reshape(-1, nb * bn)                       # [crows, OC]
        parts = []
        if fc:
            wf = w[: fc * 64].reshape(fc, 64, nb * bn)
            cf = jnp.stack([jnp.stack(
                [(wf >> (16 * h + 3 * j)) & 7 for h in range(2)], axis=2)
                for j in range(5)], axis=1)             # [c, j, r, h, OC]
            parts.append(cf.reshape(fc * 640, nb * bn))
        if tg:
            wt = w[fc * 64:].reshape(tg, 16, nb * bn)
            ctl = jnp.stack([jnp.stack(
                [(wt >> (16 * h + 4 * j)) & 7 for h in range(2)], axis=2)
                for j in range(4)], axis=1)             # [t, j, r, h, OC]
            parts.append(ctl.reshape(tg * 128, nb * bn))
        codes = jnp.concatenate(parts, axis=0).astype(jnp.uint8)
        return pack_int3(codes)
    qw = qweight[:, :icp or rows]
    if icp:
        qw = _remap_nibbles(qw, _fold_nibble_maps_inv())
    return qw.transpose(1, 0, 2).reshape(-1, nb * bn)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_n", "block_m")
)
def w4a16_matmul_stacked_tiled(
    x, qweight, scales, szeros, layer_idx, group_size: int, block_n: int,
    block_m: int = 0,
):
    """Stacked matmul over the block-contiguous layout
    ``qweight [L, NB, IC//8, bn]`` — each grid step's weight block is one
    contiguous HBM stream (measured ~777 GB/s vs ~453 strided on v5e)."""
    m, ic = x.shape
    _, nb, icp, bn = qweight.shape
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bm = _cap_bm(bm, ic, bn, group_size)
    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)

    def kern(idx_ref, x_ref, qw_ref, s_ref, sz_ref, o_ref):
        _w4a16_kernel_stacked(
            idx_ref, x_ref, qw_ref.at[0], s_ref, sz_ref, o_ref,
            group_size=group_size, out_dtype=x.dtype,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x.shape[0] // bm, nb),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, 1, icp, bn), lambda i, j, l: (l[0], j, 0, 0)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((1, ic // group_size, bn),
                         lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * nb * bn,
            bytes_accessed=ic * nb * bn // 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, x, qweight, scales, szeros)
    return out[:m] if m_pad else out


def _w4a16_kernel_folded(idx_ref, x_ref, qw_ref, o_ref, *,
                         group_size: int, n_g: int, out_dtype):
    """Folded-layout block matmul: ONE windowed input carries codes AND
    scales/szeros (bitcast rows beyond IC//8) — see QLinear docstring.
    The zero correction collapses into one [bm, n_g] x [n_g, bn] dot
    against the contiguous szeros rows instead of n_g vector FMAs."""
    del idx_ref
    x = x_ref[:]
    rows = group_size // 8
    icp = n_g * rows
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    sz_rows = []
    for g in range(n_g):
        # center by -128 here (exact in bf16): the unpack emits 128+code,
        # and keeping the bias out of the correction operands preserves
        # their small s*z magnitude for the bf16 correction dot below
        wq = _unpack_block_bf16(
            qw_ref[0, 0, g * rows:(g + 1) * rows, :]
        ) - jnp.bfloat16(128)
        xg = x[:, g * group_size:(g + 1) * group_size]
        part = jnp.dot(xg, wq, preferred_element_type=jnp.float32)
        qp = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :],
                           jnp.bfloat16)                   # [2, bn]: s, sz
        acc = acc + part * qp[0:1].astype(jnp.float32)
        sz_rows.append(qp[1:2].astype(jnp.float32))
    xsums = jnp.sum(
        x.astype(jnp.float32).reshape(x.shape[0], n_g, group_size), axis=2
    )                                                      # [bm, n_g]
    sz = jnp.concatenate(sz_rows, axis=0)                  # [n_g, bn]
    acc = acc - jnp.dot(xsums, sz, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_n", "block_m")
)
def w4a16_matmul_stacked_tiled_folded(
    x, qweight, layer_idx, group_size: int, block_n: int, block_m: int = 0,
):
    """Stacked matmul over the folded block-contiguous layout
    ``qweight [L, NB, IC//8 + IC/G (+pad), bn]`` — 3 windowed inputs
    total."""
    m, ic = x.shape
    _, nb, rows, bn = qweight.shape
    assert bn == block_n, (bn, block_n)
    n_g = ic // group_size
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bm = _cap_bm(bm, ic, bn, group_size)
    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x.shape[0] // bm, nb),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, 1, rows, bn), lambda i, j, l: (l[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(
            _w4a16_kernel_folded, group_size=group_size, n_g=n_g,
            out_dtype=x.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * nb * bn,
            bytes_accessed=ic * nb * bn // 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, x, qweight)
    return out[:m] if m_pad else out


def _w3x_group_block(read, n_g: int, g: int):
    """bf16 ``[128, bn]`` rows of ``128 + code`` for group ``g`` of a w3x
    block, via ``read(row0, row1) -> [rows, bn] int32`` (a ref slice —
    keeps each unpack a windowed VMEM read, never the whole block).
    Codes come out biased exactly like :func:`_unpack_block_bf16`'s, so
    consumers share the W4 epilogue."""
    fc = n_g // 5
    if g < fc * 5:
        c, j = divmod(g, 5)
        u = ((read(c * 64, (c + 1) * 64) >> (3 * j)) & 0x00070007) \
            | 0x43004300
        return pltpu.bitcast(u, jnp.bfloat16)
    base = fc * 64 + (g - fc * 5) * 16
    return _unpack_block_bf16(read(base, base + 16))


def _w3a16_kernel_folded(idx_ref, x_ref, qw_ref, o_ref, *,
                         n_g: int, out_dtype, exact: bool):
    """Folded w3x 3-bit block matmul (group_size == 128): one windowed
    input carries the w3x code rows AND the packed bf16 qparam band.
    Biased dots as in the W4 ``pscratch3`` path: the ``128 + code``
    blocks feed the MXU raw, ``-128 * xsum_g`` corrects the bias, and
    the szero correction is one [bm, n_g] x [n_g, bn] dot. ``exact``
    (CPU interpret) dots in f32 — interpret mode accumulates at input
    precision, which the ~128x biased magnitudes would amplify."""
    del idx_ref
    x = x_ref[:]
    read = lambda a, b: qw_ref[0, 0, a:b, :]
    qrow = _w3x_code_rows(n_g)
    dt = jnp.float32 if exact else jnp.bfloat16
    xr = x.astype(jnp.bfloat16).astype(dt)
    # sums of the SAME rounded x the dots consume, so the 128-column
    # cancels to f32 accumulation order
    xs = jnp.sum(xr.astype(jnp.float32).reshape(x.shape[0], n_g, 128),
                 axis=2)                                # [m, n_g]
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    sz_rows = []
    for g in range(n_g):
        wq = _w3x_group_block(read, n_g, g)
        part = jnp.dot(xr[:, g * 128:(g + 1) * 128], wq.astype(dt),
                       preferred_element_type=jnp.float32)
        part = part - 128.0 * xs[:, g:g + 1]
        qp = pltpu.bitcast(qw_ref[0, 0, qrow + g:qrow + g + 1, :],
                           jnp.bfloat16)                # [2, bn]: s, sz
        acc = acc + part * qp[0:1].astype(jnp.float32)
        sz_rows.append(qp[1:2].astype(jnp.float32))
    sz = jnp.concatenate(sz_rows, axis=0)               # [n_g, bn]
    acc = acc - jnp.dot(xs, sz, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_m")
)
def w3a16_matmul_stacked_tiled_folded(
    x, qweight, layer_idx, block_n: int, block_m: int = 0,
):
    """Stacked matmul over the folded w3x 3-bit layout
    ``qweight [L, NB, _w3x_code_rows(IC/128) + IC/128 (+pad), bn]``."""
    m, ic = x.shape
    _, nb, rows, bn = qweight.shape
    assert bn == block_n, (bn, block_n)
    n_g = ic // 128
    bm = block_m or min(256, max(16, 1 << (m - 1).bit_length()))
    bm = _cap_bm(bm, ic, bn, 128)
    m_pad = -m % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x.shape[0] // bm, nb),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda i, j, l: (i, 0)),
            pl.BlockSpec((1, 1, rows, bn), lambda i, j, l: (l[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
    )
    interp = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(_w3a16_kernel_folded, n_g=n_g,
                          out_dtype=x.dtype, exact=interp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * x.shape[0] * ic * nb * bn,
            bytes_accessed=ic * nb * bn * 2 // 5,
            transcendentals=0,
        ),
        interpret=interp,
    )(idx, x, qweight)
    return out[:m] if m_pad else out


def _cap_bm_a8(ic: int, rows: int, bn: int) -> int:
    """M block for the W4A8 prefill kernel: double-buffered int8 x
    [bm, IC] + folded weight window [rows, bn] i32 + persistent requanted
    w8 [IC, bn] scratch + f32 out, within ~13 MB."""
    budget = 13 * 1024 * 1024
    fixed = 2 * rows * bn * 4 + ic * bn + bn * 4
    bm = 512
    while bm > 32 and fixed + 2 * bm * ic + 2 * bm * bn * 4 > budget:
        bm //= 2
    return bm


def _w4a8_kernel_folded(idx_ref, xq_ref, sx_ref, qw_ref, o_ref, w8_s,
                        scol_s, *, group_size: int, n_g: int, bn: int,
                        out_dtype):
    """W4A8 prefill block matmul over the folded layout.

    At prefill the weight unpack cost amortizes over all M blocks, so the
    kernel REQUANTIZES each W4 block to per-COLUMN int8 once (at the
    first M step of each N block; the M grid axis is innermost) and then
    every M step is ONE [bm, IC] x [IC, bn] int8 MXU dot — 2x the bf16
    MXU rate with no per-group epilogue at all. The per-column scale
    ``s_col = (15/127) * max_g s_g`` bounds |code - z| <= 15, so the
    extra requant error is <= s_col/2 ~ 6% of the largest group's W4
    step. Counterpart: the reference's W8A8 path
    (``csrc/w8a8/w8a8_gemm_cuda.cu``) and the QServe-style W4A8 recipe.
    """
    del idx_ref
    i = pl.program_id(1)                   # M block index (innermost)
    rows = group_size // 8
    icp = n_g * rows

    @pl.when(i == 0)
    def _():
        smax = jnp.zeros((1, bn), jnp.float32)
        for g in range(n_g):
            qp = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :],
                               jnp.bfloat16)
            smax = jnp.maximum(smax, qp[0:1].astype(jnp.float32))
        scol = jnp.maximum(smax * (15.0 / 127.0), 1e-12)
        scol_s[0:1, :] = scol
        inv = 1.0 / scol
        for g in range(n_g):
            u = _unpack_block_bf16(
                qw_ref[0, 0, g * rows:(g + 1) * rows, :]
            ).astype(jnp.float32)                      # 128 + code
            qp = pltpu.bitcast(qw_ref[0, 0, icp + g:icp + g + 1, :],
                               jnp.bfloat16)
            s = qp[0:1].astype(jnp.float32)
            z = qp[1:2].astype(jnp.float32) / s
            wf = (u - (128.0 + z)) * (s * inv)
            w8_s[g * group_size:(g + 1) * group_size, :] = jnp.clip(
                jnp.round(wf), -127, 127).astype(jnp.int8)

    d = jax.lax.dot_general(
        xq_ref[:], w8_s[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # both dequant scales fold into THIS epilogue: the per-token act
    # scale applied outside the kernel cost a full [M, OC] round-trip
    # per matmul (~9 GB of pure glue per 2048-token 7B prefill)
    o_ref[:] = (d.astype(jnp.float32) * scol_s[0:1, :]
                * sx_ref[:]).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_n", "block_m")
)
def w4a8_matmul_stacked_tiled_folded(
    x, qweight, layer_idx, group_size: int, block_n: int, block_m: int = 0,
):
    """Int8-activation prefill matmul over the folded W4 layout: x is
    quantized per token (symmetric int8), weights requant to per-column
    int8 in VMEM once per N block (see ``_w4a8_kernel_folded``). The N
    grid axis is OUTERMOST so weights stream exactly once; the small x
    re-reads per N block ride under the dot."""
    from awq_tpu.ops.w8a8 import quant_per_token

    m, ic = x.shape
    _, nb, rows, bn = qweight.shape
    assert bn == block_n, (bn, block_n)
    n_g = ic // group_size
    bm = min(block_m or 512, _cap_bm_a8(ic, rows, bn))
    m_pad = -m % bm
    xq, sx = quant_per_token(x)
    sx = sx.astype(jnp.float32).reshape(-1, 1)
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad), (0, 0)))
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, xq.shape[0] // bm),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda j, i, l: (i, 0)),
            pl.BlockSpec((bm, 1), lambda j, i, l: (i, 0)),
            pl.BlockSpec((1, 1, rows, bn), lambda j, i, l: (l[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i, l: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((ic, bn), jnp.int8),            # requanted weights
            pltpu.VMEM((1, bn), jnp.float32),          # per-column scale
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _w4a8_kernel_folded, group_size=group_size, n_g=n_g, bn=bn,
            out_dtype=x.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((xq.shape[0], nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * xq.shape[0] * ic * nb * bn,
            bytes_accessed=ic * nb * bn // 2,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, xq, sx, qweight)
    return out[:m] if m_pad else out


# W4A8 pays per-call fixed costs (per-token act quant + in-VMEM per-block
# weight requant) that only amortize on long-enough inputs: measured on the
# 7B geometry, a8 LOSES at seq 256 (65.5 vs 53.5 ms TTFT) and wins from
# ~1024 up (103.8 vs 128.9). Gate on token count so short prefills never
# regress; override for experiments via AWQ_TPU_A8_MIN_M.
_A8_MIN_M = int(__import__("os").environ.get("AWQ_TPU_A8_MIN_M", "512"))


# --------------------------------------------------------------------------
# int8 prefill weight cache: W8A8 prefill at the full int8 MXU rate
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class W8Stack:
    """Precomputed per-column-int8 prefill weights for a stacked folded
    tiled :class:`QLinear`.

    The W4A8 prefill kernel (:func:`w4a8_matmul_stacked_tiled_folded`)
    requantizes each [IC, bn] W4 block to int8 in VMEM once per N block —
    ~20% of its runtime at S=2048, and the per-call fixed cost behind the
    ``_A8_MIN_M`` gate that keeps short prefills on the bf16 path.
    Precomputing the SAME requant once (bit-identical math, see
    :func:`build_w8_stack`) turns every prefill matmul into a pure int8
    MXU dot with a scale epilogue. Costs IC*OC bytes of HBM per layer —
    opt-in via ``RuntimeConfig.prefill_w8``. The reference has no
    counterpart (its W4A16 GEMM runs fp16 tensor cores,
    ``csrc/quantization_new/gemm/gemm_cuda.cu``); this is the QServe-style
    W4A8 recipe taken one step further for TTFT-optimized serving."""

    w8: jax.Array      # int8 [L, NB, IC, bn]
    scol: jax.Array    # f32  [L, NB, 1, bn] per-column dequant scale


def build_w8_stack(ql: QLinear) -> W8Stack:
    """Requantize a stacked folded tiled W4 QLinear to per-column int8.

    Mirrors ``_w4a8_kernel_folded``'s in-kernel requant EXACTLY (bf16
    qparams, ``z = szeros/s``, ``(code - z) * (s * inv)``, round-half-even,
    clip to +-127) so the cached path is bit-identical to the in-kernel
    one. Must run BEFORE :func:`strip_unfolded_qparams` (needs the
    unfolded scales/szeros)."""
    assert ql.folded and ql.tiled_bn and ql.w_bit == 4 and not ql.dense3, (
        "w8 cache needs a stacked folded tiled 4-bit QLinear")
    assert ql.qweight.ndim == 4, "w8 cache is for stacked [L, ...] layers"
    assert ql.scales.size > 1, (
        "scales were stripped — build the w8 cache before "
        "strip_unfolded_qparams")
    ic = ql.in_features
    icp = ic // 8
    bn = ql.tiled_bn
    n_layers, nb = ql.qweight.shape[0], ql.qweight.shape[1]
    n_g = ic // ql.group_size

    @jax.jit
    def one(qw_l, s_l, sz_l):
        codes = unpack_int4(untile_qweight(qw_l, bn, icp=icp),
                            jnp.float32)                   # [IC, OC]
        s = s_l.astype(jnp.bfloat16).astype(jnp.float32)   # folded rows
        sz = sz_l.astype(jnp.bfloat16).astype(jnp.float32)  # are bf16
        z = sz / s
        scol = jnp.maximum(jnp.max(s, axis=0) * (15.0 / 127.0), 1e-12)
        sinv = s * (1.0 / scol)[None, :]
        cg = codes.reshape(n_g, ql.group_size, -1)
        # the in-kernel requant subtracts (128 + z) from the bf16-bitpack
        # value (128 + code): the +128 truncates z's low mantissa bits in
        # f32, so mirror the exact op order for bit-identical codes
        wf = ((128.0 + cg) - (128.0 + z)[:, None, :]) * sinv[:, None, :]
        w8 = jnp.clip(jnp.round(wf), -127, 127).astype(jnp.int8)
        w8 = w8.reshape(ic, nb, bn).transpose(1, 0, 2)     # [NB, IC, bn]
        return w8, scol.reshape(nb, 1, bn)

    # donated accumulator: jnp.stack of the per-layer results would hold
    # 2x the cache (13 GB at 7B) at peak; the in-place set keeps it at 1x
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def setl(w8_acc, scol_acc, l, w8_l, scol_l):
        return w8_acc.at[l].set(w8_l), scol_acc.at[l].set(scol_l)

    w8_acc = jnp.zeros((n_layers, nb, ic, bn), jnp.int8)
    scol_acc = jnp.zeros((n_layers, nb, 1, bn), jnp.float32)
    for l in range(n_layers):
        w8_l, scol_l = one(ql.qweight[l], ql.scales[l], ql.szeros[l])
        w8_acc, scol_acc = setl(w8_acc, scol_acc, jnp.int32(l), w8_l,
                                scol_l)
    return W8Stack(w8=w8_acc, scol=scol_acc)


def _device_free_bytes():
    """Best-effort free-HBM probe: ``bytes_limit - bytes_in_use`` when the
    platform reports memory stats; ``None`` when it doesn't (the axon
    tunnel plugin returns nothing — then only an explicit budget caps)."""
    try:
        st = jax.local_devices()[0].memory_stats()
        if st and "bytes_limit" in st:
            return int(st["bytes_limit"]) - int(st.get("bytes_in_use", 0))
    except Exception:
        pass
    return None


def w8_cache_cost(layers: dict) -> dict:
    """Per-linear-name HBM cost (bytes) of the ``prefill_w8`` int8 weight
    cache: ``L * IC * OC`` int8 codes (+ negligible per-column scales)."""
    cost = {}
    for name, p in layers.items():
        if (isinstance(p, QLinear) and p.folded and p.tiled_bn
                and p.w_bit == 4 and not p.dense3 and p.qweight.ndim == 4
                and p.scales.size > 1):
            cost[name] = (p.qweight.shape[0] * p.in_features
                          * p.out_features)
    return cost


def attach_w8_caches(layers: dict, budget_bytes: Optional[int] = None,
                     headroom_bytes: int = 1 << 30) -> dict:
    """Return ``layers`` plus a ``<name>_w8`` :class:`W8Stack` for every
    eligible stacked folded tiled 4-bit QLinear — the ONE shared
    implementation of the ``prefill_w8`` attach step (engines,
    benchmarks, demos). Layers whose unfolded scales were already
    stripped are skipped with a warning (the in-kernel-requant a8 path
    still serves them); callers flip ``cfg.prefill_a8`` themselves.

    Fit guard: the cache costs ``sum(L*IC*OC)`` bytes (~6.6 GB at 7B,
    more at 8B's 128k-vocab off-head shapes). ``budget_bytes`` builds
    the DEEPEST-IC names first (where the in-kernel requant cost
    concentrates — PERF.md attribution) until the budget is spent and
    leaves the rest on the in-kernel-requant path. With no explicit
    budget, a platform that reports memory stats refuses cleanly
    (ValueError) when the full cache cannot fit free HBM minus
    ``headroom_bytes`` — instead of an allocation error halfway through
    engine init."""
    import warnings

    out = dict(layers)
    cost = w8_cache_cost(layers)
    for name, p in list(layers.items()):
        if not (isinstance(p, QLinear) and p.folded and p.tiled_bn
                and p.w_bit == 4 and not p.dense3 and p.qweight.ndim == 4):
            continue
        if p.scales.size <= 1:
            warnings.warn(
                f"prefill_w8: '{name}' has stripped scales "
                "(strip_unfolded_qparams ran first) — no w8 cache built; "
                "it stays on the in-kernel-requant a8 path")
            continue
    total = sum(cost.values())
    take = set(cost)
    if budget_bytes is not None and budget_bytes > 0:
        take = set()
        spent = 0
        # deepest-IC first: per-matmul requant cost scales with IC
        for name in sorted(cost, key=lambda n: -layers[n].in_features):
            if spent + cost[name] <= budget_bytes:
                take.add(name)
                spent += cost[name]
        skipped = sorted(set(cost) - take)
        if skipped:
            warnings.warn(
                f"prefill_w8: budget {budget_bytes / 2**30:.2f} GiB covers "
                f"{sorted(take)} ({spent / 2**30:.2f} GiB); "
                f"{skipped} stay on the in-kernel-requant a8 path")
    else:
        free = _device_free_bytes()
        if free is not None and total > max(free - headroom_bytes, 0):
            raise ValueError(
                f"prefill_w8: int8 weight cache needs "
                f"{total / 2**30:.2f} GiB but only {free / 2**30:.2f} GiB "
                f"HBM is free (headroom {headroom_bytes / 2**30:.1f} GiB)."
                " Set RuntimeConfig.prefill_w8_budget_gb (deepest-IC "
                "layers first) or disable prefill_w8.")
    for name in take:
        out[name + "_w8"] = build_w8_stack(layers[name])
    return out


# minimum token count for the cached-int8 prefill path: below this the
# M padding (bm rounds up to a power of two >= 32) plus the 2x weight
# bytes of int8-vs-W4 can lose to the bf16 folded kernel. Unmeasured
# below 256 — override per deployment like the a8 gate.
_W8_MIN_M = int(__import__("os").environ.get("AWQ_TPU_W8_MIN_M", "32"))


def _w8a8_kernel_stacked(idx_ref, xq_ref, sx_ref, w8_ref, scol_ref, o_ref,
                         *, out_dtype):
    """Pure int8 MXU dot over the cached prefill weights: both dequant
    scales (per-column weight scale x per-token activation scale) fold
    into the epilogue, exactly like ``_w4a8_kernel_folded`` minus its
    requant prologue."""
    del idx_ref
    d = jax.lax.dot_general(
        xq_ref[:], w8_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (d.astype(jnp.float32) * scol_ref[0, 0]
                * sx_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def w8a8_matmul_stacked_tiled(x, w8, scol, layer_idx, block_m: int = 0):
    """Prefill matmul over the int8 weight cache (see :class:`W8Stack`).

    Grid (NB, M-blocks) with N outermost: each [IC, bn] int8 weight block
    streams from HBM exactly once and is revisited across M steps."""
    from awq_tpu.ops.w8a8 import quant_per_token

    m, ic = x.shape
    n_layers, nb, ic2, bn = w8.shape
    assert ic2 == ic, (ic2, ic)
    # VMEM: double-buffered int8 w8 window [IC, bn] + int8 x [bm, IC] +
    # f32/bf16 out. The compiler's default 16 MB scoped cap would force
    # bm=64 on the 11008-IC down matmul; physical VMEM is 128 MB, so
    # size the cap to keep bm=512 (M-efficient MXU tiles).
    budget = 30 * 1024 * 1024
    # round bm up to a power of two covering m (min 32): a 40-row
    # admission prefill pads to 64 rows, not 512
    bm = min(block_m or 512, max(32, 1 << (max(m, 1) - 1).bit_length()))
    while bm > 32 and 2 * ic * bn + 2 * bm * ic + 2 * bm * bn * 4 > budget:
        bm //= 2
    vmem_limit = min(2 * ic * bn + 2 * bm * ic + 4 * bm * bn * 4
                     + 8 * 1024 * 1024, 100 * 1024 * 1024)
    m_pad = -m % bm
    xq, sx = quant_per_token(x)
    sx = sx.astype(jnp.float32).reshape(-1, 1)
    if m_pad:
        xq = jnp.pad(xq, ((0, m_pad), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad), (0, 0)))
    idx = jnp.reshape(layer_idx, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, xq.shape[0] // bm),
        in_specs=[
            pl.BlockSpec((bm, ic), lambda j, i, l: (i, 0)),
            pl.BlockSpec((bm, 1), lambda j, i, l: (i, 0)),
            pl.BlockSpec((1, 1, ic, bn), lambda j, i, l: (l[0], j, 0, 0)),
            pl.BlockSpec((1, 1, 1, bn), lambda j, i, l: (l[0], j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i, l: (i, j)),
    )
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel_stacked, out_dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((xq.shape[0], nb * bn), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * xq.shape[0] * ic * nb * bn,
            bytes_accessed=ic * nb * bn,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(idx, xq, sx, w8, scol)
    return out[:m] if m_pad else out


def qlinear_apply_stacked(ql: QLinear, layer_idx: jax.Array,
                          x: jax.Array, a8: bool = False,
                          w8stack: Optional["W8Stack"] = None) -> jax.Array:
    """Apply layer ``layer_idx`` of a stacked ``QLinear [L, ...]``.

    ``a8``: route through the int8-activation W4A8 kernel (prefill-sized
    inputs on folded weights only — see ``w4a8_matmul_stacked_tiled_folded``).
    ``w8stack``: int8 prefill weight cache — a8 inputs skip the in-kernel
    requant entirely (and its ``_A8_MIN_M`` amortization gate).
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if ql.dense3:
        if jax.default_backend() == "tpu" and ql.tiled_bn and ql.folded:
            out = w3a16_matmul_stacked_tiled_folded(
                x2, ql.qweight, layer_idx, ql.tiled_bn,
            )
        elif ql.tiled_bn:
            # index the layer FIRST: untiling the whole [L, ...] stack
            # then slicing would emit L unfold graphs per call
            qw3 = untile_qweight(ql.qweight[layer_idx], ql.tiled_bn,
                                 icp=ql.in_features * 3 // 32,
                                 dense3=True)
            out = w4a16_matmul_xla(
                x2, qw3, ql.scales[layer_idx],
                ql.szeros[layer_idx], ql.group_size, dense3=True,
            )
        elif jax.default_backend() == "tpu":
            out = w3a16_matmul_stacked(
                x2, ql.qweight, ql.scales, ql.szeros, layer_idx,
                ql.group_size,
            )
        else:
            out = w4a16_matmul_xla(
                x2, ql.qweight[layer_idx], ql.scales[layer_idx],
                ql.szeros[layer_idx], ql.group_size, dense3=True,
            )
    elif jax.default_backend() == "tpu" and ql.tiled_bn and ql.folded:
        if a8 and w8stack is not None and x2.shape[0] >= _W8_MIN_M:
            out = w8a8_matmul_stacked_tiled(
                x2, w8stack.w8, w8stack.scol, layer_idx,
            )
        elif a8 and x2.shape[0] >= _A8_MIN_M and ql.group_size == 128:
            out = w4a8_matmul_stacked_tiled_folded(
                x2, ql.qweight, layer_idx, ql.group_size, ql.tiled_bn,
            )
        else:
            out = w4a16_matmul_stacked_tiled_folded(
                x2, ql.qweight, layer_idx, ql.group_size, ql.tiled_bn,
            )
    elif jax.default_backend() == "tpu" and ql.tiled_bn:
        out = w4a16_matmul_stacked_tiled(
            x2, ql.qweight, ql.scales, ql.szeros, layer_idx,
            ql.group_size, ql.tiled_bn,
        )
    elif jax.default_backend() == "tpu":
        from awq_tpu.utils.tune import get_block_n

        oc_main = ql.out_features // 128 * 128
        if oc_main == ql.out_features:
            out = w4a16_matmul_stacked(
                x2, ql.qweight, ql.scales, ql.szeros, layer_idx,
                ql.group_size,
                block_n=get_block_n(ql.in_features, ql.out_features,
                                    x2.shape[0]),
            )
        else:
            # OC without a 128-lane tile width. FAST split layouts come
            # from fuse_linears (tiled main + '_rem' tail, done ONCE at
            # layout time); this fallback serves '_rem' tails themselves
            # and raw un-split stacked layouts. It slices ONE layer
            # (never the full [L, ...] stack — that would copy every
            # layer's codes per decode step) and dequants via XLA.
            out = w4a16_matmul_xla(
                x2, ql.qweight[layer_idx], ql.scales[layer_idx],
                ql.szeros[layer_idx], ql.group_size, dense3=ql.dense3,
            ).astype(x2.dtype)
    else:
        qw = ql.qweight[layer_idx]
        if ql.tiled_bn:
            qw = untile_qweight(
                qw, ql.tiled_bn,
                icp=ql.in_features // 8 if ql.folded else None)
        out = w4a16_matmul_xla(
            x2, qw, ql.scales[layer_idx], ql.szeros[layer_idx], ql.group_size
        )
    out = out.reshape(*lead, ql.out_features)
    if ql.bias is not None:
        out = out + ql.bias[layer_idx].astype(out.dtype)
    return out


def w4a16_matmul(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    szeros: jax.Array,
    group_size: int = 128,
    impl: str = "auto",
) -> jax.Array:
    """``x [..., IC] @ dequant(qweight) -> [..., OC]``.

    Dispatches GEMV/GEMM shapes to the same Pallas kernel on TPU (the
    reference dispatches tokens<8 to a GEMV kernel, ``qmodule.py:201-224``)
    and to the XLA reference implementation elsewhere.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if impl == "xla" or (impl == "auto" and jax.default_backend() != "tpu"):
        out = w4a16_matmul_xla(x2, qweight, scales, szeros, group_size)
    else:
        out = w4a16_matmul_pallas(x2, qweight, scales, szeros, group_size)
    return out.reshape(*lead, qweight.shape[1])


def qlinear_apply(ql: QLinear, x: jax.Array, impl: str = "auto") -> jax.Array:
    """Apply a quantized linear layer: ``x @ W_deq + bias``."""
    if ql.dense3:
        lead = x.shape[:-1]
        if (jax.default_backend() == "tpu" and impl != "xla"
                and ql.tiled_bn and ql.folded):
            out = w3a16_matmul_stacked_tiled_folded(
                x.reshape(-1, x.shape[-1]), ql.qweight[None],
                jnp.int32(0), ql.tiled_bn,
            ).reshape(*lead, ql.out_features)
        elif ql.tiled_bn:
            qw3 = untile_qweight(ql.qweight, ql.tiled_bn,
                                 icp=ql.in_features * 3 // 32,
                                 dense3=True)
            out = w4a16_matmul_xla(
                x.reshape(-1, x.shape[-1]), qw3, ql.scales,
                ql.szeros, ql.group_size, dense3=True,
            ).reshape(*lead, ql.out_features)
        elif jax.default_backend() == "tpu" and impl != "xla":
            out = w3a16_matmul_stacked(
                x.reshape(-1, x.shape[-1]), ql.qweight[None],
                ql.scales[None], ql.szeros[None], jnp.int32(0),
                ql.group_size,
            ).reshape(*x.shape[:-1], ql.out_features)
        else:
            out = w4a16_matmul_xla(
                x.reshape(-1, x.shape[-1]), ql.qweight, ql.scales,
                ql.szeros, ql.group_size, dense3=True,
            ).reshape(*lead, ql.out_features)
        if ql.bias is not None:
            out = out + ql.bias.astype(out.dtype)
        return out
    qw = ql.qweight
    if ql.tiled_bn:
        qw = untile_qweight(
            qw, ql.tiled_bn, icp=ql.in_features // 8 if ql.folded else None)
    out = w4a16_matmul(
        x, qw, ql.scales, ql.szeros, ql.group_size, impl=impl
    )
    if ql.bias is not None:
        out = out + ql.bias.astype(out.dtype)
    return out
