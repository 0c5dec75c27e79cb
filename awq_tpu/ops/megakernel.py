"""Whole-layer / whole-token W4A16 decode megakernels.

``w4a16_llama_token_step`` runs ALL decoder layers for one token in ONE
Pallas call: per layer, rmsnorm -> fused-QKV matmul -> RoPE -> flash
attention over the KV cache (current token in-register) -> o-proj ->
residual -> rmsnorm -> gate/up matmul -> SwiGLU -> down matmul ->
residual; the residual stream stays in VMEM between layers.
``w4a16_llama_layer_step`` is the single-layer building block (same body,
used by the parity tests and as the reference for the token kernel).

Why: the round-1 decode step used 5 kernels/layer (160 launches/token);
the measured cost at the 7B geometry was matmuls 6.0 ms (vs ~4.7 ms at
the streaming peak) + 1.3 ms of attention that is almost pure per-kernel
overhead at short context. One kernel per token keeps ONE continuous
weight stream through the DMA engine with zero launch/dispatch cost
between layers — the TPU analogue (and extension) of the reference
collapsing its decode into two fat kernel launches per layer
(``csrc/quantization_new/gemv/gemv_cuda.cu:38-244`` +
``csrc/attention/decoder_masked_multihead_attention.cu:30-101``).

Design notes:
- Weights live in ``memory_space=ANY`` (HBM) and are streamed by MANUAL
  double-buffered DMA into ONE shared VMEM buffer reused by all four
  matmul phases of every layer. A first version used Mosaic-managed
  windows (one BlockSpec per matmul, phase-switched on ``program_id``);
  grid-step bookkeeping and per-input window buffers made it both slower
  and more VMEM-hungry. With grid=(1,) there are no per-step window
  updates at all.
- Weights use the FOLDED tiled layout (``tile_qlinear(fold_scales=True)``):
  bf16-bitpack permuted nibbles + one packed qparam row per group
  (bf16 scale | bf16 szero), so each phase is exactly ONE HBM stream at
  ~106% of the code bytes.
- Cross-phase AND cross-layer prefetch: each phase's last iteration
  issues the next phase's (or next layer's first) block-0 DMA; the
  attention phase between QKV and o-proj hides o's first transfer.
- Activations live in head-layout ``[H/128, 128]`` f32 scratch: with
  group_size == head_dim == 128, one quantization group == one VMEM row,
  so the per-group matmul slices ROWS and the kernel needs no
  lane<->sublane relayouts beyond a [1, bn] -> [bn/128, 128] store per
  block.
- Attention streams the cache in ``[hc, block_t, hd]`` chunks with
  double-buffered manual DMA (same scheme as
  :func:`awq_tpu.ops.decode_attn.flash_decode_stacked`), batched
  per-chunk dots, online softmax, and the current token's k/v from the
  just-computed QKV registers. The cache append stays an XLA scatter in
  the caller (single-position bf16 HBM writes violate (2,128) tiling);
  with the token kernel it is ONE batched scatter for all layers.

Constraints (callers fall back to the 5-kernel path otherwise):
batch 1, single token, rmsnorm+SwiGLU (llama/mistral/qwen2), full-dim
RoPE, head_dim == 128, group_size == 128, no o/gate/up/down biases (a
QKV bias — qwen2, ``tinychat/models/qwen2.py:118-283`` — IS supported:
one [nr, hd] bias row block added between the QKV matmul and RoPE),
fp16/bf16/int8 cache, folded tiled stacked QLinears.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.w4a16 import (QLinear, _unpack_block, _unpack_block_bf16,
                               _w3x_code_rows, _w3x_group_block)


def _qdot_rows(x_rows, xsums, wbuf, slot, n_g, bn, row0=0,
               unpack="bf16", p_s=None, exact=False):
    """One [1, bn] output block of a W4A16 matmul whose LHS is a single
    row vector stored as rows ``x_rows [IC/128, 128]`` (f32, rows
    ``row0..row0+n_g``). ``wbuf[slot]`` holds the CURRENT folded block:
    codes rows then packed qparam rows. ``xsums [1, n_g]`` are the
    per-group input sums (precomputed once per PHASE, not per block).

    out = sum_g s_g * (x_g @ (unpack(qw_g) - 128)) - xsum_g * sz_g. The
    -128 centering happens in bf16 (exact for values 128..143) BEFORE
    the dot: relying on the correction to cancel the unpack bias breaks
    on real TPU, where the [1, N] dot may consume x at a different
    precision than the separately-computed xsums (~0.1 abs error,
    measured). The correction is a per-group [1, bn] f32 VPU FMA on the
    packed bf16 qparam row (bf16 scale | bf16 szero in one int32 row —
    halves the non-code stream bytes vs two f32 rows).
    """
    icp = n_g * 16
    acc = jnp.zeros((1, bn), jnp.float32)
    if unpack == "floor":
        # DMA-floor probe (wrong results, timing only): same block/DMA
        # structure, compute replaced by one row-read per group so the
        # stream can't be elided. Used by scripts/exp_megafloor.py to
        # separate "what the DMA pipeline can stream" from "what the
        # compute hides".
        for g in range(n_g):
            acc = acc + pltpu.bitcast(
                wbuf[slot, g * 16:g * 16 + 1, :bn], jnp.float32)
        return acc
    if unpack == "pscratch":
        # Chain-free epilogue: the round-2 kernel's per-group
        # ``acc = acc + part*s - xsum*sz`` is a SERIAL chain of 3*n_g
        # single-sublane VPU ops — measured ~0.7 ms/token of exposed
        # compute at the 8B geometry (scripts/exp_megafloor.py: nofma
        # 6.86 vs bf16 7.59 ms). Here each group's scaled partial goes
        # to its own scratch row (independent -> full ILP), and the
        # reduction over groups plus the szero correction become two
        # m=1 MXU dots per block. The szero dot consumes the RAW
        # interleaved qparam rows (s|sz per int32 row -> bf16 rows
        # alternate s, sz) with zero weights on the scale rows, so no
        # strided sublane slicing is ever needed.
        qpall = pltpu.bitcast(wbuf[slot, icp:icp + n_g, :bn],
                              jnp.bfloat16)              # [2n_g, bn]
        for g in range(n_g):
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
            xg = x_rows[row0 + g][None, :]
            part = jnp.dot(xg.astype(jnp.bfloat16), wq,
                           preferred_element_type=jnp.float32)
            qp = qpall[2 * g:2 * g + 2].astype(jnp.float32)  # [2,bn]: s,sz
            p_s[g:g + 1, :bn] = part * qp[0:1] - xsums[0, g] * qp[1:2]
        ones = jnp.ones((1, n_g), jnp.float32)
        return jax.lax.dot_general(
            ones, p_s[0:n_g, :bn], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if unpack == "pscratch2":
        # Interleave-matched scratch epilogue: p_s rows 2g+1 were
        # prefilled (once per PHASE, by run_phase) with -xsum_g; each
        # block stores its raw part into row 2g, then
        #   out = ones[1, 2n_g] @ (p_s  *  qpall_f32)
        # where qpall is the RAW interleaved qparam band (bf16 rows
        # alternate s_g, sz_g), so row 2g contributes part_g * s_g and
        # row 2g+1 contributes -xsum_g * sz_g — the entire scale/szero
        # epilogue is ONE [2n_g, bn] multiply and ONE m=1 dot per
        # block, with no strided slicing and no per-group VPU chain.
        qpf = pltpu.bitcast(wbuf[slot, icp:icp + n_g, :bn],
                            jnp.bfloat16).astype(jnp.float32)
        for g in range(n_g):
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
            xg = x_rows[row0 + g][None, :]
            p_s[2 * g:2 * g + 1, :bn] = jnp.dot(
                xg.astype(jnp.bfloat16), wq,
                preferred_element_type=jnp.float32)
        ones = jnp.ones((1, 2 * n_g), jnp.float32)
        return jax.lax.dot_general(
            ones, p_s[0:2 * n_g, :bn] * qpf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if unpack == "pscratch3":
        # pscratch2 + biased dots: skip the per-group [128, bn] ``-128``
        # centering (the largest remaining VPU op) and subtract
        # ``128 * xsum_g`` from the raw part instead — a [1, bn]-scalar
        # FMA. Exactness: the dot consumes bf16(x), and _row_sums
        # rounds x to bf16 before summing, so the 128-column of the
        # biased weights contributes 128 * xsum_g up to f32 accumulation
        # order (the round-2 mismatch came from summing UNROUNDED f32 x).
        # ``exact``: Pallas INTERPRET mode accumulates the dot at input
        # precision, which the biased parts' ~128x magnitude amplifies
        # into ~0.1 abs error (the real MXU accumulates f32: measured
        # on-chip parity with the centered path is 1e-2 at bf16 output,
        # scripts/exp_ps3.py); CPU tests therefore dot in f32.
        qpf = pltpu.bitcast(wbuf[slot, icp:icp + n_g, :bn],
                            jnp.bfloat16).astype(jnp.float32)
        dt = jnp.float32 if exact else jnp.bfloat16
        for g in range(n_g):
            wq = _unpack_block_bf16(wbuf[slot, g * 16:(g + 1) * 16, :bn])
            xg = x_rows[row0 + g][None, :]
            part = jnp.dot(xg.astype(jnp.bfloat16).astype(dt),
                           wq.astype(dt),
                           preferred_element_type=jnp.float32)
            p_s[2 * g:2 * g + 1, :bn] = part - 128.0 * xsums[0, g]
        ones = jnp.ones((1, 2 * n_g), jnp.float32)
        return jax.lax.dot_general(
            ones, p_s[0:2 * n_g, :bn] * qpf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if unpack == "dense3":
        # w3x 3-bit phase: each full 5-group chunk's plane j unpacks to
        # group 5c+j's [128, bn] bf16 ``128 + code`` block in ONE
        # shift/and/or + bitcast (W4 bf16-bitpack cost; trailer groups
        # ARE W4 nibble rows) — everything else is pscratch3 verbatim:
        # biased dots, -128*xsum FMA, raw parts to even scratch rows,
        # -xsum_g prefilled odd rows, one [2n_g, bn] qparam multiply +
        # one m=1 dot. Streams ~0.82x of the W4 code bytes.
        qrow = _w3x_code_rows(n_g)
        qpf = pltpu.bitcast(wbuf[slot, qrow:qrow + n_g, :bn],
                            jnp.bfloat16).astype(jnp.float32)
        dt = jnp.float32 if exact else jnp.bfloat16
        read = lambda a, b: wbuf[slot, a:b, :bn]
        for g in range(n_g):
            wq = _w3x_group_block(read, n_g, g)
            xg = x_rows[row0 + g][None, :]
            part = jnp.dot(xg.astype(jnp.bfloat16).astype(dt),
                           wq.astype(dt),
                           preferred_element_type=jnp.float32)
            p_s[2 * g:2 * g + 1, :bn] = part - 128.0 * xsums[0, g]
        ones = jnp.ones((1, 2 * n_g), jnp.float32)
        return jax.lax.dot_general(
            ones, p_s[0:2 * n_g, :bn] * qpf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if unpack == "qonce":
        # bf16 path with the qparam band bitcast+converted ONCE per
        # block (one [2n_g, bn] convert) instead of one small bitcast
        # per group
        qpf = pltpu.bitcast(wbuf[slot, icp:icp + n_g, :bn],
                            jnp.bfloat16).astype(jnp.float32)
        for g in range(n_g):
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
            xg = x_rows[row0 + g][None, :]
            part = jnp.dot(xg.astype(jnp.bfloat16), wq,
                           preferred_element_type=jnp.float32)
            acc = (acc + part * qpf[2 * g:2 * g + 1]
                   - xsums[0, g] * qpf[2 * g + 1:2 * g + 2])
        return acc
    if unpack == "rawdot":
        # probe: dots against raw (wrong) weight bits, no unpack, no
        # scales — isolates the m=1 MXU dot cost over the DMA floor
        for g in range(n_g):
            wq = pltpu.bitcast(wbuf[slot, 0:64, :bn], jnp.bfloat16)
            xg = x_rows[row0 + g][None, :]
            acc = acc + jnp.dot(xg.astype(jnp.bfloat16), wq,
                                preferred_element_type=jnp.float32)
        # touch the block tail so the full DMA is still required
        acc = acc + pltpu.bitcast(
            wbuf[slot, icp + n_g - 1:icp + n_g, :bn], jnp.float32)
        return acc
    if unpack == "nodot":
        # probe: unpack + row-reduce, no MXU dot (is the VPU unpack or
        # the m=1 dot the exposed cost?)
        for g in range(n_g):
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
            acc = acc + jnp.sum(wq.astype(jnp.float32), axis=0,
                                keepdims=True)
        return acc
    if unpack == "nofma":
        # probe: unpack + dot, no per-group scale/szero FMAs
        for g in range(n_g):
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
            xg = x_rows[row0 + g][None, :]
            acc = acc + jnp.dot(xg.astype(jnp.bfloat16), wq,
                                preferred_element_type=jnp.float32)
        return acc
    if unpack.startswith("chunk"):
        # Fewer, bigger MXU issues: pre-scale the unpacked weights by
        # their group scale (one [128, bn] VPU FMA per group) and dot C
        # groups at a time — [1, C*128] x [C*128, bn] — instead of one
        # [1, 128] dot per group. The m=1 per-group dots are almost pure
        # MXU issue overhead (~102k issues/token at the 8B geometry was
        # the measured 1.6 ms/token of compute the DMA could not hide —
        # scripts/exp_megafloor.py). Cost: the quantized weight value
        # s*(q-128) rounds to bf16 before the dot (<=2^-9 relative, an
        # order below the int4 quantization step itself); the szero
        # correction stays exact via the f32 xsum FMA.
        C = int(unpack[5:] or 8)
        assert n_g % C == 0, (n_g, C)
        qpall = pltpu.bitcast(wbuf[slot, icp:icp + n_g, :bn],
                              jnp.bfloat16)            # [2*n_g, bn] s|sz
        for c in range(n_g // C):
            ws = []
            for h in range(C):
                g = c * C + h
                wq = _unpack_block_bf16(
                    wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
                ws.append(wq * qpall[2 * g:2 * g + 1])
            wc = jnp.concatenate(ws, axis=0)           # [C*128, bn]
            xc = x_rows[row0 + c * C:row0 + (c + 1) * C, :].reshape(
                1, C * 128)
            acc = acc + jnp.dot(xc.astype(jnp.bfloat16), wc,
                                preferred_element_type=jnp.float32)
        for g in range(n_g):
            sz = qpall[2 * g + 1:2 * g + 2].astype(jnp.float32)
            acc = acc - xsums[0, g] * sz
        return acc
    for g in range(n_g):
        if unpack == "bf16":
            wq = _unpack_block_bf16(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]) - jnp.bfloat16(128)
        else:   # "legacy": round-1 shift/stack/convert (A/B speed probe;
                # WRONG results on the permuted folded layout)
            wq = _unpack_block(
                wbuf[slot, g * 16:(g + 1) * 16, :bn]).astype(jnp.bfloat16)
        xg = x_rows[row0 + g][None, :]                     # [1, 128]
        part = jnp.dot(xg.astype(jnp.bfloat16), wq,
                       preferred_element_type=jnp.float32)
        qp = pltpu.bitcast(wbuf[slot, icp + g:icp + g + 1, :bn],
                           jnp.bfloat16)                   # [2, bn]: s, sz
        s = qp[0:1].astype(jnp.float32)
        sz = qp[1:2].astype(jnp.float32)
        acc = acc + part * s - xsums[0, g] * sz
    return acc                                             # [1, bn]


def _row_sums(x_rows, n_g, row0=0):
    """[n_g, 128] rows -> [1, n_g] per-row sums (lane-major for the
    zero-correction FMAs).

    x is rounded to bf16 FIRST: the matmul dots consume bf16(x), so the
    szero correction (and pscratch3's folded +128 correction) must sum
    the values the MXU actually saw, not the f32 scratch."""
    xr = x_rows[row0:row0 + n_g, :].astype(jnp.bfloat16).astype(
        jnp.float32)
    s = jnp.sum(xr, axis=1, keepdims=True)                 # [n_g, 1]
    return jnp.transpose(s, (1, 0))                        # [1, n_g]


def _store_block(dst_rows, acc, j, bn):
    """[1, bn] f32 -> rows [bn/128, 128] at (traced) row offset j*bn/128."""
    r = bn // 128
    dst_rows[pl.ds(j * r, r), :] = acc.reshape(r, 128)


def _rms_rows(x_rows, g_rows, eps):
    xf = x_rows[:, :].astype(jnp.float32)
    ms = jnp.mean(xf * xf)
    return xf * jax.lax.rsqrt(ms + eps) * g_rows.astype(jnp.float32)


def _norm_rows(x_rows, g_rows, eps, kind="rmsnorm"):
    """rmsnorm or (weight-only) layernorm over the whole [ngh, 128]
    residual rows — one token, so the mean/variance span all of H
    (mpt-class models run bias-free LayerNorm; bloom-class LN biases are
    not megakernel-eligible)."""
    if kind == "rmsnorm":
        return _rms_rows(x_rows, g_rows, eps)
    xf = x_rows[:, :].astype(jnp.float32)
    xf = xf - jnp.mean(xf)
    ms = jnp.mean(xf * xf)
    return xf * jax.lax.rsqrt(ms + eps) * g_rows.astype(jnp.float32)


def _alibi_chunk_slopes(c, hc, grp, nq):
    """[hc, grp, 1] ALiBi slopes for chunk ``c``'s q heads, computed
    in-kernel from the head index (nq must be a power of two — the
    closest-power-of-2 extension would need a host-side table):
    slope_h = 2^(-8 (h+1) / nq), matching models/layers.alibi_slopes."""
    hidx = (jax.lax.broadcasted_iota(jnp.int32, (hc, grp, 1), 0) * grp
            + jax.lax.broadcasted_iota(jnp.int32, (hc, grp, 1), 1)
            + c * hc * grp).astype(jnp.float32)   # int iota (Mosaic)
    return jnp.exp2(-(8.0 / nq) * (hidx + 1.0))


def _rope_rows(x, cos, sin):
    """x [heads, 128] rows, cos/sin [1, 128] (HF rotate_half)."""
    half = x.shape[-1] // 2
    x1, x2 = x[:, :half], x[:, half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rot * sin


def _make_phase_runner(layer, base2, phases, wbuf, wsem, p_s,
                       dims, unpack, tail_dma=None):
    """Build the double-buffered weight-stream loop over a static phase
    table ``[(hbm ref, out blocks, folded rows, n_g, bn), ...]``.
    ``base2`` is the (traced) wbuf slot parity at the start of this
    table's block stream; ``tail_dma(nxt_slot)`` (if given) runs on the
    LAST phase's last block to prefetch whatever streams next. Block 0
    of phase 0 must already be in flight when run_phase(0) is called."""
    # static block-count offset of each phase within the stream
    offs = [0]
    for _, nb, _, _, _ in phases:
        offs.append(offs[-1] + nb)

    def wdma(ph, lyr, j, slot):
        hbm, _, rows, _, bn = phases[ph]
        return pltpu.make_async_copy(
            hbm.at[lyr, j], wbuf.at[slot, 0:rows, 0:bn], wsem.at[slot],
        )

    def run_phase(ph, x_rows, xsums, store):
        """Stream phase ``ph``'s blocks through wbuf; ``store(acc, j)``
        consumes each [1, bn] output block."""
        _, nb, _, n_g, bn = phases[ph]
        p0 = base2 + offs[ph]

        def body(j, _):
            slot = jax.lax.rem(j + p0, 2)
            nxt = jax.lax.rem(j + p0 + 1, 2)

            @pl.when(j + 1 < nb)
            def _():
                wdma(ph, layer, j + 1, nxt).start()

            if ph + 1 < len(phases):
                @pl.when(j + 1 == nb)
                def _():
                    wdma(ph + 1, layer, 0, nxt).start()
            elif tail_dma is not None:
                @pl.when(j + 1 == nb)
                def _():
                    tail_dma(nxt)

            wdma(ph, layer, j, slot).wait()
            acc = _qdot_rows(x_rows, xsums, wbuf, slot, n_g, bn,
                             unpack=unpack, p_s=p_s,
                             exact=dims.get("exact", False))
            store(acc, j)
            return 0

        if unpack in ("pscratch2", "pscratch3", "dense3"):
            # prefill the odd scratch rows with -xsum_g once per phase;
            # blocks then only write their raw parts into the even rows
            # (see _qdot_rows)
            for g in range(n_g):
                p_s[2 * g + 1:2 * g + 2, :bn] = jnp.broadcast_to(
                    -xsums[0:1, g:g + 1], (1, bn))

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)

    return run_phase


def _attn_phases(
    layer, base2, h_rows, ln1_row, bq_row, length, cs_ref,
    wq_hbm, wo_hbm, cache_ref, kvs_ref, kv_store,
    xq_s, qkv_s, xo_s, oacc_s, xsum_s, p_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, unpack="bf16", tail_dma=None,
):
    """Phases 1-3 of a decoder layer: rmsnorm -> fused QKV -> rope ->
    flash attention over the cache -> o-proj. Fills ``oacc_s`` with the
    o-proj OUTPUT only — no residual add, so under tensor parallelism
    (ops/megakernel_tp.py) ``oacc_s`` is the rank-local PARTIAL sum the
    caller psums. ``h_rows``/``ln1_row`` are ``[ngh, 128]``-shaped
    values; ``layer`` indexes the stacked weight/cache arrays; block 0
    of the QKV stream must already be in flight."""
    d = dims
    nq, nkv, hd, eps = d["nq"], d["nkv"], d["hd"], d["eps"]
    ngh, ngo = d["ngh"], d["ngo"]      # groups of H and nq*hd reductions
    bt, hc = d["bt"], d["hc"]
    grp = nq // nkv

    # static phase table: (hbm ref, out blocks, folded rows, n_g, bn)
    phases = [
        (wq_hbm, d["NBQ"], d["rq"], ngh, d["bnq"]),
        (wo_hbm, d["NBO"], d["ro"], ngo, d["bno"]),
    ]
    run_phase = _make_phase_runner(layer, base2, phases, wbuf, wsem, p_s,
                                   dims, unpack, tail_dma)

    # ---- phase 1: norm + fused QKV matmul -----------------------------------
    xn = _norm_rows(h_rows, ln1_row, eps, d.get("norm", "rmsnorm"))
    xq_s[:, :] = xn
    xsum_s[0:1, :ngh] = _row_sums(xn, ngh)
    run_phase(0, xq_s, xsum_s[0:1, :ngh],
              lambda acc, j: _store_block(qkv_s, acc, j, d["bnq"]))
    # QKV bias (qwen2-family; zeros otherwise) — before rope, as HF does
    qkv_s[:, :] = qkv_s[:, :] + bq_row

    # ---- phase 2: rope + flash attention over the cache ---------------------
    scale = 1.0 / (hd ** 0.5)
    if d.get("rope", True):
        cos = cs_ref[0][None, :]
        sin = cs_ref[1][None, :]
        q = _rope_rows(qkv_s[:nq, :], cos, sin)       # [nq, hd] f32
        k = _rope_rows(qkv_s[nq:nq + nkv, :], cos, sin)
    else:                                             # alibi archs (mpt)
        q = qkv_s[:nq, :]
        k = qkv_s[nq:nq + nkv, :]
    v = qkv_s[nq + nkv:nq + 2 * nkv, :]
    kv_store(k, v)
    qs = (q * scale).reshape(nkv, grp, hd)

    nblk = pl.cdiv(length, bt)
    n_chunks = nkv // hc

    q8 = dims["q8"]

    def dma(buf, kv, sem, slot, c, i):
        return pltpu.make_async_copy(
            cache_ref.at[layer, kv, 0, pl.ds(c * hc, hc),
                         pl.ds(i * bt, bt), :],
            buf.at[slot], sem.at[slot],
        )

    def sdma(buf, kv, sem, slot, c, i):
        # int8 cache: per-(head, position) dequant scales ride alongside
        return pltpu.make_async_copy(
            kvs_ref.at[layer, kv, 0, pl.ds(c * hc, hc),
                       pl.ds(i * bt, bt)],
            buf.at[slot], sem.at[slot],
        )

    def start_blk(c, i, slot):
        dma(kbuf, 0, ksem, slot, c, i).start()
        dma(vbuf, 1, vsem, slot, c, i).start()
        if q8:
            sdma(ksbuf, 0, kssem, slot, c, i).start()
            sdma(vsbuf, 1, vssem, slot, c, i).start()

    def chunk_body(c):
        # c is a static python int (the chunk loop is unrolled: Mosaic
        # has no value-level dynamic_slice)
        @pl.when(nblk > 0)
        def _():
            start_blk(c, 0, 0)

        qc = qs[c * hc:(c + 1) * hc]                   # [hc, grp, hd]
        sl3 = (_alibi_chunk_slopes(c, hc, grp, nq)
               if d.get("alibi") else None)

        def blk_body(i, carry):
            m, l, acc = carry
            slot = i % 2

            @pl.when(i + 1 < nblk)
            def _():
                start_blk(c, i + 1, (i + 1) % 2)

            dma(kbuf, 0, ksem, slot, c, i).wait()
            if q8:
                sdma(ksbuf, 0, kssem, slot, c, i).wait()
                kf = (kbuf[slot].astype(jnp.float32)
                      * ksbuf[slot][..., None])
            else:
                kf = kbuf[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                qc, kf,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                          # [hc, grp, bt]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) \
                + i * bt
            if sl3 is not None:
                s = s + sl3 * col.astype(jnp.float32)
            s = jnp.where(col < length, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
            dma(vbuf, 1, vsem, slot, c, i).wait()
            if q8:
                sdma(vsbuf, 1, vssem, slot, c, i).wait()
                vf = (vbuf[slot].astype(jnp.float32)
                      * vsbuf[slot][..., None])
            else:
                vf = vbuf[slot].astype(jnp.float32)
            pv = jax.lax.dot_general(
                p, vf,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                          # [hc, grp, hd]
            return m_new, l_new, acc * alpha + pv

        m0 = jnp.full((hc, grp, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((hc, grp, 1), jnp.float32)
        a0 = jnp.zeros((hc, grp, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblk, blk_body, (m0, l0, a0))

        # current token, in-register
        kc = k[c * hc:(c + 1) * hc]
        vc = v[c * hc:(c + 1) * hc]
        s_c = jnp.sum(qc * kc[:, None, :], axis=2, keepdims=True)
        if sl3 is not None:
            s_c = s_c + sl3 * length.astype(jnp.float32)
        m_new = jnp.maximum(m, s_c)
        alpha = jnp.exp(m - m_new)
        p_c = jnp.exp(s_c - m_new)
        l = l * alpha + p_c
        acc = acc * alpha + p_c * vc[:, None, :]
        rows = (acc / l).reshape(hc * grp, hd)
        xo_s[c * hc * grp:(c + 1) * hc * grp, :] = rows

    for c in range(n_chunks):
        chunk_body(c)
    xsum_s[1:2, :ngo] = _row_sums(xo_s, ngo)

    # ---- phase 3: o-proj ----------------------------------------------------
    run_phase(1, xo_s, xsum_s[1:2, :ngo],
              lambda acc, j: _store_block(oacc_s, acc, j, d["bno"]))


def _mlp_phases(
    layer, base2, h1_rows, ln2_row,
    wg_hbm, wd_hbm,
    xq_s, gu_s, hm_s, oacc_s, xsum_s, p_s, wbuf, wsem,
    *, dims, unpack="bf16", tail_dma=None,
):
    """Phases 4-5 of a decoder layer: rmsnorm -> gate/up -> SwiGLU ->
    down. Fills ``oacc_s`` with the down OUTPUT only — no residual add
    (the TP half-kernel psums it). ``h1_rows`` is the post-attention
    residual value [ngh, 128] f32; block 0 of the gate/up stream must
    already be in flight (the attn half's tail_dma or a prologue)."""
    d = dims
    ngh, ngi = d["ngh"], d["ngi"]
    phases = [
        (wg_hbm, d["NBG"], d["rg"], ngh, d["bng"]),
        (wd_hbm, d["NBD"], d["rd"], ngi, d["bnd"]),
    ]
    run_phase = _make_phase_runner(layer, base2, phases, wbuf, wsem, p_s,
                                   dims, unpack, tail_dma)

    # ---- phase 4: norm2 + gate/up (or plain up) ------------------------------
    xm = _norm_rows(h1_rows, ln2_row, d["eps"], d.get("norm", "rmsnorm"))
    xq_s[:, :] = xm                                   # reuse xq as xm
    xsum_s[2:3, :ngh] = _row_sums(xm, ngh)
    run_phase(0, xq_s, xsum_s[2:3, :ngh],
              lambda acc, j: _store_block(gu_s, acc, j, d["bng"]))

    # ---- phase 5: SwiGLU (or GELU) + down ------------------------------------
    ir = ngi            # intermediate rows = I/128
    if d.get("gated", True):
        gate = gu_s[:ir, :]
        up = gu_s[ir:2 * ir, :]
        hm = gate * jax.lax.logistic(gate) * up
    elif d.get("act") == "gelu":
        # erf GELU (HF MptMLP runs approximate="none"); Mosaic has no
        # erf primitive, so use Abramowitz-Stegun 7.1.26 (max abs error
        # 1.5e-7 — far below the bf16 activation noise floor)
        u = gu_s[:ir, :]
        x = u * 0.7071067811865476
        sx = jnp.sign(x)
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                 - 0.284496736) * t + 0.254829592) * t
        erf = sx * (1.0 - poly * jnp.exp(-ax * ax))
        hm = 0.5 * u * (1.0 + erf)
    else:
        # tanh-GELU (bloom-class plain MLP)
        u = gu_s[:ir, :]
        hm = 0.5 * u * (1.0 + jnp.tanh(
            0.7978845608028654 * (u + 0.044715 * u * u * u)))
    hm_s[:, :] = hm
    xsum_s[3:4, :ngi] = _row_sums(hm, ngi)
    # accumulate in f32 scratch; a partial bf16 store at a dynamic row
    # offset violates the (2,128) sublane packing (Mosaic rejects it)
    run_phase(1, hm_s, xsum_s[3:4, :ngi],
              lambda acc, j: _store_block(oacc_s, acc, j, d["bnd"]))


def _layer_phases(
    layer, base2, h_rows, ln1_row, ln2_row, bq_row, length, cs_ref,
    weights, cache_ref, kvs_ref, kv_store,
    xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s, xsum_s, p_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, unpack="bf16", tail_dma=None,
):
    """Phases 1-5 of one decoder layer (attn half + residual + MLP half).
    ``h_rows``/``ln*_row`` are ``[ngh, 128]``-shaped values; ``base2`` is
    the (traced) wbuf slot parity at the start of this layer's block
    stream; ``kv_store(k, v)`` consumes the new cache row;
    ``tail_dma(nxt_slot)`` (if given) is invoked on the LAST block's
    iteration to prefetch the next layer's first block. Returns the new
    residual rows [ngh, 128] f32.

    ``layer`` indexes the stacked weight/cache arrays; block 0 of phase 0
    must already be in flight (kernel prologue or previous tail_dma)."""
    d = dims

    def attn_tail(nxt):
        # cross-half prefetch: the o phase's last block starts the
        # gate/up stream's block 0
        pltpu.make_async_copy(
            weights[2].at[layer, 0],
            wbuf.at[nxt, 0:d["rg"], 0:d["bng"]], wsem.at[nxt],
        ).start()

    _attn_phases(
        layer, base2, h_rows, ln1_row, bq_row, length, cs_ref,
        weights[0], weights[1], cache_ref, kvs_ref, kv_store,
        xq_s, qkv_s, xo_s, oacc_s, xsum_s, p_s,
        wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
        dims=dims, unpack=unpack, tail_dma=attn_tail,
    )
    h1_s[:, :] = h_rows.astype(jnp.float32) + oacc_s[:, :]
    _mlp_phases(
        layer, base2 + d["NBQ"] + d["NBO"], h1_s[:, :], ln2_row,
        weights[2], weights[3],
        xq_s, gu_s, hm_s, oacc_s, xsum_s, p_s, wbuf, wsem,
        dims=dims, unpack=unpack, tail_dma=tail_dma,
    )
    return h1_s[:, :] + oacc_s[:, :]


def _mega_kernel(
    scalars_ref,
    h_ref, ln_ref, bq_ref, cs_ref,
    wq_hbm, wo_hbm, wg_hbm, wd_hbm,
    cache_ref, kvs_ref,
    out_ref, kn_ref, vn_ref,
    xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s, xsum_s, p_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, unpack="bf16",
):
    """Single-layer kernel: one call = one decoder layer, one token."""
    layer = scalars_ref[0]
    length = scalars_ref[1]

    def kv_store(k, v):
        kn_ref[:, :] = k.astype(kn_ref.dtype)
        vn_ref[:, :] = v.astype(vn_ref.dtype)

    # prologue: start phase-0 block-0 while rmsnorm computes
    pltpu.make_async_copy(
        wq_hbm.at[layer, 0], wbuf.at[0, 0:dims["rq"], 0:dims["bnq"]],
        wsem.at[0],
    ).start()
    h_new = _layer_phases(
        layer, jnp.int32(0), h_ref[:, :], ln_ref[0, 0], ln_ref[0, 1],
        bq_ref[0].astype(jnp.float32), length, cs_ref,
        (wq_hbm, wo_hbm, wg_hbm, wd_hbm), cache_ref, kvs_ref,
        kv_store,
        xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s, xsum_s, p_s,
        wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
        dims=dims, unpack=unpack,
    )
    out_ref[:, :] = h_new.astype(out_ref.dtype)


def _token_kernel(
    scalars_ref,
    h_ref, ln_ref, bq_ref, cs_ref, nw_ref,
    wq_hbm, wo_hbm, wg_hbm, wd_hbm, wh_hbm,
    cache_ref, kvs_ref,
    out_ref, kn_ref, vn_ref, logits_ref,
    hbuf, xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s, xsum_s, p_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, n_layers, unpack="bf16", head=False,
):
    """Whole-token kernel: one call runs ALL ``n_layers`` decoder layers
    (+ optionally the final rmsnorm and the quantized lm_head as a last
    streaming phase — the whole decode model is then ONE launch); the
    residual stream rides through VMEM (``hbuf``) and each layer's last
    block prefetches the next layer's (or the head's) first."""
    d = dims
    length = scalars_ref[0]
    # blocks per layer (for the wbuf slot parity across layers)
    tot = d["NBQ"] + d["NBO"] + d["NBG"] + d["NBD"]
    weights = (wq_hbm, wo_hbm, wg_hbm, wd_hbm)

    # prologue: start layer-0 phase-0 block-0 while rmsnorm computes
    pltpu.make_async_copy(
        wq_hbm.at[0, 0], wbuf.at[0, 0:d["rq"], 0:d["bnq"]], wsem.at[0],
    ).start()
    hbuf[:, :] = h_ref[:, :].astype(jnp.float32)

    def layer_body(l, _):
        base2 = jax.lax.rem(l * tot, 2)

        def kv_store(k, v):
            kn_ref[l, :, :] = k.astype(kn_ref.dtype)
            vn_ref[l, :, :] = v.astype(vn_ref.dtype)

        def tail_dma(nxt):
            @pl.when(l + 1 < n_layers)
            def _():
                pltpu.make_async_copy(
                    wq_hbm.at[l + 1, 0],
                    wbuf.at[nxt, 0:d["rq"], 0:d["bnq"]], wsem.at[nxt],
                ).start()

            if head:
                @pl.when(l + 1 == n_layers)
                def _():
                    pltpu.make_async_copy(
                        wh_hbm.at[0, 0],
                        wbuf.at[nxt, 0:d["rh"], 0:d["bnh"]], wsem.at[nxt],
                    ).start()

        h_new = _layer_phases(
            l, base2, hbuf[:, :], ln_ref[l, 0], ln_ref[l, 1],
            bq_ref[l].astype(jnp.float32), length, cs_ref, weights,
            cache_ref, kvs_ref, kv_store,
            xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s, xsum_s, p_s,
            wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
            dims=d, unpack=unpack, tail_dma=tail_dma,
        )
        # the residual stream is bf16 between layers in the composed
        # model (parity with the per-layer path)
        hbuf[:, :] = h_new.astype(jnp.bfloat16).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_layers, layer_body, 0, unroll=False)
    out_ref[:, :] = hbuf[:, :].astype(out_ref.dtype)

    if head:
        # ---- final norm + quantized lm_head phase ------------------------
        ngh = d["ngh"]
        bnh, NBH, rh = d["bnh"], d["NBH"], d["rh"]
        xf = _norm_rows(hbuf, nw_ref[:, :], d["eps"],
                        d.get("norm", "rmsnorm"))
        xq_s[:, :] = xf
        xsum_s[0:1, :ngh] = _row_sums(xf, ngh)
        p0 = jnp.asarray(n_layers * tot, jnp.int32)

        def hbody(j, _):
            slot = jax.lax.rem(j + p0, 2)
            nxt = jax.lax.rem(j + p0 + 1, 2)

            @pl.when(j + 1 < NBH)
            def _():
                pltpu.make_async_copy(
                    wh_hbm.at[0, j + 1],
                    wbuf.at[nxt, 0:rh, 0:bnh], wsem.at[nxt],
                ).start()

            pltpu.make_async_copy(
                wh_hbm.at[0, j], wbuf.at[slot, 0:rh, 0:bnh], wsem.at[slot],
            ).wait()
            acc = _qdot_rows(xq_s, xsum_s[0:1, :ngh], wbuf, slot, ngh,
                             bnh, unpack=unpack, p_s=p_s,
                             exact=dims.get("exact", False))
            _store_block(logits_ref, acc, j, bnh)
            return 0

        if unpack in ("pscratch2", "pscratch3", "dense3"):
            for g in range(ngh):
                p_s[2 * g + 1:2 * g + 2, :bnh] = jnp.broadcast_to(
                    -xsum_s[0:1, g:g + 1], (1, bnh))
        jax.lax.fori_loop(0, NBH, hbody, 0, unroll=False)


def _dims_for(cfg_like, wqkv: QLinear, wo: QLinear, wgu: QLinear,
              wdn: QLinear, cache, eps: float,
              norm: str = "rmsnorm", gated: bool = True,
              rope: bool = True, alibi: bool = False,
              act: str = "silu"):
    nq, nkv, hd = cfg_like
    q8 = cache.dtype == jnp.int8
    H = nq * hd
    I2 = wgu.out_features
    I = I2 // 2 if gated else I2
    t = cache.shape[4]
    bt = 256
    hc = max(1, min(nkv, (512 * 1024) // (bt * hd * cache.dtype.itemsize)))
    while nkv % hc:
        hc -= 1
    return dict(
        nq=nq, nkv=nkv, hd=hd, eps=eps,
        NBQ=wqkv.out_features // wqkv.tiled_bn,
        NBO=wo.out_features // wo.tiled_bn,
        NBG=I2 // wgu.tiled_bn,
        NBD=H // wdn.tiled_bn,
        bnq=wqkv.tiled_bn, bno=wo.tiled_bn, bng=wgu.tiled_bn,
        bnd=wdn.tiled_bn,
        rq=wqkv.qweight.shape[2], ro=wo.qweight.shape[2],
        rg=wgu.qweight.shape[2], rd=wdn.qweight.shape[2],
        # ngo = o-proj input groups (nq*hd/128): == ngh single-chip, but
        # SMALLER under TP where nq is the per-rank head count
        ngh=H // 128, ngi=I // 128, ngo=nq * hd // 128,
        bt=bt, hc=hc, T=t, q8=q8,
        norm=norm, gated=gated, rope=rope, alibi=alibi, act=act,
    )


def _scratches(dims, cache_dtype, nq, nkv, hd):
    ngh, ngi = dims["ngh"], dims["ngi"]
    wrows = max(dims["rq"], dims["ro"], dims["rg"], dims["rd"],
                dims.get("rh", 0))
    wcols = max(dims["bnq"], dims["bno"], dims["bng"], dims["bnd"],
                dims.get("bnh", 0))
    return [
        pltpu.VMEM((ngh, 128), jnp.float32),                 # xq / xm
        pltpu.VMEM((nq + 2 * nkv, hd), jnp.float32),         # qkv rows
        pltpu.VMEM((dims["ngo"], 128), jnp.float32),         # xo (attn)
        pltpu.VMEM((ngh, 128), jnp.float32),                 # h1
        pltpu.VMEM((2 * ngi, 128), jnp.float32),             # gate|up
        pltpu.VMEM((ngi, 128), jnp.float32),                 # hm
        pltpu.VMEM((ngh, 128), jnp.float32),                 # o/down acc
        pltpu.VMEM((8, max(128, ngi)), jnp.float32),         # xsums
        pltpu.VMEM((2 * max(ngh, ngi), wcols), jnp.float32),  # parts|-xsums
        pltpu.VMEM((2, wrows, wcols), jnp.int32),            # weight dbuf
        pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache_dtype),
        pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache_dtype),
        pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),  # k scales
        pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),  # v scales
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _cost(ws, n_layers: int = 1):
    by = n_layers * sum(w.in_features * w.out_features for w in ws) // 2
    return pl.CostEstimate(flops=4 * by, bytes_accessed=by,
                           transcendentals=0)


def megakernel_supported(cfg, layers, cache, slots: int = 1) -> bool:
    """Static eligibility check (see module docstring).

    Two model shapes ride the kernel: the llama family
    (rope + rmsnorm + SwiGLU) and — round 5 — the mpt class
    (ALiBi + bias-free LayerNorm + tanh-GELU plain MLP, power-of-2
    head count so the slopes compute in-kernel)."""
    if cfg.head_dim != 128:
        return False
    llama_shape = (cfg.act == "silu" and cfg.norm == "rmsnorm"
                   and cfg.pos_embed == "rope")
    mpt_shape = (cfg.act in ("gelu", "gelu_tanh")
                 and cfg.norm == "layernorm"
                 and cfg.pos_embed == "alibi"
                 and cfg.num_heads & (cfg.num_heads - 1) == 0
                 and layers.get("ln1_b") is None
                 and not cfg.embed_ln)
    if not (llama_shape or mpt_shape):
        return False
    if cfg.parallel_block or cfg.rotary_pct != 1.0:
        return False
    needed = ("wqkv", "wgateup" if llama_shape else "up", "wo", "down")
    if not all(n in layers for n in needed):
        return False
    if any(k.endswith("_rem") for k in layers):
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
        # W4 nibble layout, or the dense 3-bit layout (uniformly)
        if not (p.w_bit == 4 and not p.dense3) and not (p.w_bit == 3
                                                        and p.dense3):
            return False
        if p.dense3 != d3:
            return False
    data = getattr(cache, "data", cache)      # KVCache8 or plain array
    if not isinstance(data, jax.Array):
        return False
    if data.dtype not in (jnp.bfloat16, jnp.float16, jnp.float32, jnp.int8):
        return False
    if data.shape[2] != slots or data.shape[4] % 256 != 0:
        return False
    if (cfg.hidden_size % 128 or cfg.intermediate_size % 128):
        return False
    if layers.get("act_scale") is not None:
        return False
    # VMEM budget: shared weight double-buffer + activation scratch +
    # cache stream buffers must fit ~16 MB, else fall back to the
    # 5-kernel path instead of a Mosaic allocation error
    wrows = max(p.qweight.shape[2] for p in
                (layers[n] for n in needed))
    wcols = max(p.tiled_bn for p in (layers[n] for n in needed))
    H, I = cfg.hidden_size, cfg.intermediate_size
    scratch = (2 * wrows * wcols * 4            # weight double-buffer
               + 4 * 512 * 1024                 # cache k/v buffers
               + (6 * H + 3 * I) * 4            # activation rows (f32)
               + 2 * max(H, I) // 128 * wcols * 4  # parts/-xsums scratch
               + 2 * cfg.num_layers * H * 4)    # stacked norms window
    if scratch > 14 * 1024 * 1024:
        return False
    return True


@functools.partial(jax.jit,
                   static_argnames=("nq", "nkv", "eps", "interpret", "unpack"))
def w4a16_llama_layer_step(
    h: jax.Array,            # [1, H] bf16 residual input
    wqkv: QLinear, wo: QLinear, wgu: QLinear, wdn: QLinear,
    ln1: jax.Array,          # [L, H] stacked norm weights
    ln2: jax.Array,
    cos_row: jax.Array,      # [hd] f32 rope row at the current position
    sin_row: jax.Array,
    cache: jax.Array,        # [L, 2, 1, n_kv, T, hd] (append done by caller)
    layer_idx: jax.Array,
    length: jax.Array,       # cache prefix length (current pos)
    nq: int = 0, nkv: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
    unpack: str = "pscratch3",
    cache_scales: jax.Array = None,   # [L, 2, 1, n_kv, T] f32 (int8 cache)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run one decoder layer for one token. Returns
    ``(h_new [1, H], k_new [1, n_kv, hd], v_new [1, n_kv, hd])``; with an
    int8 cache, k/v come back fp (the caller quantizes + appends)."""
    H = h.shape[-1]
    hd = cache.shape[-1]
    nkv = nkv or cache.shape[3]
    nq = nq or H // hd
    assert wqkv.folded and wo.folded and wgu.folded and wdn.folded
    if wqkv.dense3:
        unpack = "dense3"
    dims = _dims_for((nq, nkv, hd), wqkv, wo, wgu, wdn, cache, eps)
    dims["exact"] = bool(interpret)
    ngh = dims["ngh"]

    h_rows = h.reshape(ngh, 128)
    ln = jnp.stack([ln1, ln2], axis=1).reshape(-1, 2, ngh, 128)
    nr = nq + 2 * nkv
    L = cache.shape[0]
    bq = (jnp.zeros((L, nr, hd), jnp.float32) if wqkv.bias is None
          else wqkv.bias.astype(jnp.float32).reshape(L, nr, hd))
    cs = jnp.stack([cos_row, sin_row]).astype(jnp.float32)
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(length, jnp.int32)])

    if cache_scales is None:
        cache_scales = jnp.zeros((1, 2, 1, 8, 128), jnp.float32)
    kv_dt = jnp.bfloat16 if cache.dtype == jnp.int8 else cache.dtype
    pinned_row = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh, 128), pinned_row),                # h rows
            pl.BlockSpec((1, 2, ngh, 128),
                         lambda g, l: (l[0], 0, 0, 0)),          # ln1|ln2
            pl.BlockSpec((1, nr, hd),
                         lambda g, l: (l[0], 0, 0)),             # qkv bias
            pl.BlockSpec((2, hd), pinned_row),                   # cos|sin
            pl.BlockSpec(memory_space=pl.ANY),                   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                   # wo
            pl.BlockSpec(memory_space=pl.ANY),                   # wgu
            pl.BlockSpec(memory_space=pl.ANY),                   # wdn
            pl.BlockSpec(memory_space=pl.ANY),                   # cache
            pl.BlockSpec(memory_space=pl.ANY),                   # kv scales
        ],
        out_specs=[
            pl.BlockSpec((ngh, 128), pinned_row),                # h_new rows
            pl.BlockSpec((nkv, hd), pinned_row),                 # k_new
            pl.BlockSpec((nkv, hd), pinned_row),                 # v_new
        ],
        scratch_shapes=_scratches(dims, cache.dtype, nq, nkv, hd),
    )

    out, kn, vn = pl.pallas_call(
        functools.partial(_mega_kernel, dims=dims, unpack=unpack),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngh, 128), h.dtype),
            jax.ShapeDtypeStruct((nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((nkv, hd), kv_dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=_cost((wqkv, wo, wgu, wdn)),
        interpret=interpret,
    )(
        scalars, h_rows, ln, bq, cs,
        wqkv.qweight, wo.qweight, wgu.qweight, wdn.qweight,
        cache, cache_scales,
    )
    return out.reshape(h.shape), kn[None], vn[None]


@functools.partial(jax.jit,
                   static_argnames=("nq", "nkv", "eps", "interpret",
                                    "unpack", "norm", "act", "pos_embed"))
def w4a16_llama_token_step(
    h: jax.Array,            # [1, H] bf16 residual input (post-embed)
    wqkv: QLinear, wo: QLinear, wgu: QLinear, wdn: QLinear,
    ln1: jax.Array,          # [L, H] stacked norm weights
    ln2: jax.Array,
    cos_row: jax.Array,      # [hd] f32 rope row at the current position
    sin_row: jax.Array,
    cache: jax.Array,        # [L, 2, 1, n_kv, T, hd] (append done by caller)
    length: jax.Array,       # cache prefix length (current pos)
    nq: int = 0, nkv: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
    unpack: str = "pscratch3",
    cache_scales: jax.Array = None,   # [L, 2, 1, n_kv, T] f32 (int8 cache)
    whead: QLinear = None,            # folded stacked-of-1 lm_head
    norm_w: jax.Array = None,         # [H] final rmsnorm weight
    norm: str = "rmsnorm",            # mpt-class: "layernorm" (no bias)
    act: str = "silu",                # "gelu"/"gelu_tanh" = plain-up MLP
    pos_embed: str = "rope",          # "alibi" = in-kernel slopes, no rope
):
    """Run ALL decoder layers for one token in one Pallas call. Returns
    ``(h_new [1, H], k_new [L, n_kv, hd], v_new [L, n_kv, hd])`` — the
    caller appends k/v to the cache with ONE batched scatter (quantizing
    first for an int8 cache; k/v come back fp). With ``whead``/``norm_w``
    the final rmsnorm + quantized lm_head run as a last streaming phase
    and a 4th output ``logits [1, vocab] f32`` is appended — the whole
    decode model is then ONE kernel launch."""
    H = h.shape[-1]
    hd = cache.shape[-1]
    L = cache.shape[0]
    nkv = nkv or cache.shape[3]
    nq = nq or H // hd
    assert wqkv.folded and wo.folded and wgu.folded and wdn.folded
    if wqkv.dense3:
        unpack = "dense3"
    dims = _dims_for((nq, nkv, hd), wqkv, wo, wgu, wdn, cache, eps,
                     norm=norm, gated=act == "silu",
                     rope=pos_embed == "rope",
                     alibi=pos_embed == "alibi", act=act)
    dims["exact"] = bool(interpret)
    ngh = dims["ngh"]

    h_rows = h.reshape(ngh, 128)
    ln = jnp.stack([ln1, ln2], axis=1).reshape(L, 2, ngh, 128)
    nr = nq + 2 * nkv
    bq = (jnp.zeros((L, nr, hd), jnp.float32) if wqkv.bias is None
          else wqkv.bias.astype(jnp.float32).reshape(L, nr, hd))
    cs = jnp.stack([cos_row, sin_row]).astype(jnp.float32)
    scalars = jnp.reshape(jnp.asarray(length, jnp.int32), (1,))

    if cache_scales is None:
        cache_scales = jnp.zeros((1, 2, 1, 8, 128), jnp.float32)
    kv_dt = jnp.bfloat16 if cache.dtype == jnp.int8 else cache.dtype
    head = whead is not None
    if head:
        assert whead.folded and whead.qweight.ndim == 4
        dims["bnh"] = whead.tiled_bn
        dims["NBH"] = whead.out_features // whead.tiled_bn
        dims["rh"] = whead.qweight.shape[2]
        vocab = whead.out_features
        wh_qw = whead.qweight
        nw = norm_w.astype(jnp.float32).reshape(ngh, 128)
    else:
        dims["bnh"] = dims["NBH"] = 0
        dims["rh"] = 8
        vocab = 128
        wh_qw = jnp.zeros((1, 1, 8, 128), jnp.int32)
        nw = jnp.zeros((ngh, 128), jnp.float32)
    pinned_row = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh, 128), pinned_row),                # h rows
            pl.BlockSpec((L, 2, ngh, 128),
                         lambda g, l: (0, 0, 0, 0)),             # all norms
            pl.BlockSpec((L, nr, hd),
                         lambda g, l: (0, 0, 0)),                # qkv bias
            pl.BlockSpec((2, hd), pinned_row),                   # cos|sin
            pl.BlockSpec((ngh, 128), pinned_row),                # final norm
            pl.BlockSpec(memory_space=pl.ANY),                   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                   # wo
            pl.BlockSpec(memory_space=pl.ANY),                   # wgu
            pl.BlockSpec(memory_space=pl.ANY),                   # wdn
            pl.BlockSpec(memory_space=pl.ANY),                   # lm_head
            pl.BlockSpec(memory_space=pl.ANY),                   # cache
            pl.BlockSpec(memory_space=pl.ANY),                   # kv scales
        ],
        out_specs=[
            pl.BlockSpec((ngh, 128), pinned_row),                # h_new rows
            pl.BlockSpec((L, nkv, hd), lambda g, l: (0, 0, 0)),  # k_new
            pl.BlockSpec((L, nkv, hd), lambda g, l: (0, 0, 0)),  # v_new
            pl.BlockSpec((vocab // 128, 128), pinned_row),       # logits
        ],
        scratch_shapes=(
            [pltpu.VMEM((ngh, 128), jnp.float32)]                # hbuf
            + _scratches(dims, cache.dtype, nq, nkv, hd)
        ),
    )

    out, kn, vn, logits = pl.pallas_call(
        functools.partial(_token_kernel, dims=dims, n_layers=L,
                          unpack=unpack, head=head),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngh, 128), h.dtype),
            jax.ShapeDtypeStruct((L, nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((L, nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((vocab // 128, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=_cost((wqkv, wo, wgu, wdn) + ((whead,) if head
                                                    else ()), L),
        interpret=interpret,
    )(
        scalars, h_rows, ln, bq, cs, nw,
        wqkv.qweight, wo.qweight, wgu.qweight, wdn.qweight, wh_qw,
        cache, cache_scales,
    )
    if head:
        return (out.reshape(h.shape), kn, vn,
                logits.reshape(1, vocab))
    return out.reshape(h.shape), kn, vn
