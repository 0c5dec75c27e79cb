"""Batched whole-token decode megakernel: ALL layers for B rows in ONE
Pallas launch.

The continuous-batching engine's decode step was launch-bound: ~5
kernels x 32 layers per step put B=8 at 16.6 ms/step (the weight stream
alone is ~5.4 ms). This kernel runs the whole batch through ONE weight
stream — each folded block is DMA'd once and dotted against ``[B, 128]``
activation tiles, so the per-step weight traffic is the same as a
SINGLE-token step while producing B tokens. B=8 exactly fills the f32
(8, 128) VPU/MXU tile, so the epilogue FMAs cost the same as the m=1
kernel's but do 8 rows of work.

Design vs the single-token kernel (``megakernel.py``, which stays
untouched — it owns the latency headline):

- Activations live ROW-MAJOR ``[unit*B + b, 128]`` (unit = 128-lane
  group; for H-dimension tensors unit == attention head since hd=128).
  Group ``g``'s matmul LHS is then the contiguous ``[B, 128]`` slab at
  rows ``g*B``, every residual/norm/SwiGLU op is a full-tile
  elementwise, and dynamic block stores land on 8-aligned rows
  (B % 8 == 0 required).
- Per-row state (rope position, cache length, cache rows) differs per
  batch row: the attention phase transposes the QKV rows to b-major
  ONCE per layer and runs the flash loop per row (static unroll over
  B) with that row's ``lengths[b]`` bound; outputs collect b-major and
  transpose back g-major for the o-proj matmul.
- The epilogue is the plain biased-dot chain (no pscratch ILP rows):
  at B=8 each FMA is a full sublane tile, so the m=1 chain cost that
  motivated pscratch3 is amortized 8x.

No reference counterpart exists: TinyChat serves batch 1 only
(`tinychat/serve/model_worker_new.py` decodes a single stream).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.megakernel import _dims_for, megakernel_supported
from awq_tpu.ops.w4a16 import (QLinear, _unpack_block_bf16, _w3x_code_rows,
                               _w3x_group_block)


def _qdot_rows_b(x_rows, xs_t, wbuf, slot, n_g, bn, B, *, dense3, exact):
    """One ``[B, bn]`` output block: biased dots over the folded block in
    ``wbuf[slot]`` against contiguous ``[B, 128]`` LHS slabs.

    ``xs_t [B, n_g]`` are per-(row, group) sums of the bf16-rounded x
    (the values the MXU consumes), correcting both the +128 unpack bias
    and the szero term. ``exact`` dots in f32 (CPU interpret mode
    accumulates at input precision — see megakernel.py pscratch3)."""
    qrow = _w3x_code_rows(n_g) if dense3 else n_g * 16
    read = lambda a, b: wbuf[slot, a:b, :bn]
    dt = jnp.float32 if exact else jnp.bfloat16
    # 4 independent accumulators: the per-group `acc = acc + ...` chain
    # is a serial [B, bn] VPU dependency (2 FMAs x n_g) that the m=1
    # kernel's pscratch trick removed; at B rows a 4-way tree gives the
    # VPU ILP without scratch rows
    nacc = min(4, n_g)
    accs = [jnp.zeros((B, bn), jnp.float32) for _ in range(nacc)]
    for g in range(n_g):
        if dense3:
            wq = _w3x_group_block(read, n_g, g)
        else:
            wq = _unpack_block_bf16(read(g * 16, (g + 1) * 16))
        xg = x_rows[g * B:(g + 1) * B, :]
        part = jnp.dot(xg.astype(jnp.bfloat16).astype(dt), wq.astype(dt),
                       preferred_element_type=jnp.float32)
        part = part - 128.0 * xs_t[:, g:g + 1]
        qp = pltpu.bitcast(wbuf[slot, qrow + g:qrow + g + 1, :bn],
                           jnp.bfloat16)               # [2, bn]: s, sz
        accs[g % nacc] = (accs[g % nacc] + part * qp[0:1].astype(jnp.float32)
                          - xs_t[:, g:g + 1] * qp[1:2].astype(jnp.float32))
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    return acc


def _row_sums_b(x_rows, n_g, B):
    """g-major rows ``[n_g*B, 128]`` -> per-(row, group) sums
    ``[B, n_g]`` of the bf16-rounded values (what the dots consume)."""
    xr = x_rows[0:n_g * B, :].astype(jnp.bfloat16).astype(jnp.float32)
    s = jnp.sum(xr.reshape(n_g, B, 128), axis=2)       # [n_g, B]
    return jnp.transpose(s, (1, 0))                    # [B, n_g]


def _rms_rows_b(x_rows, g_rows, eps, n_g, B):
    """Per-batch-row rmsnorm over g-major rows ``[n_g*B, 128]``."""
    xf = x_rows[0:n_g * B, :].astype(jnp.float32).reshape(n_g, B, 128)
    ms = jnp.mean(xf * xf, axis=(0, 2), keepdims=True)  # [1, B, 1]
    out = xf * jax.lax.rsqrt(ms + eps) \
        * g_rows.astype(jnp.float32)[:, None, :]
    return out.reshape(n_g * B, 128)


def _rope_rows_b(x, cos, sin):
    """x ``[rows, 128]``, cos/sin ``[1, 128]`` (HF rotate_half)."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
    return x * cos + rot * sin


def _store_rows_b(dst, acc, j, bn, B):
    """[B, bn] f32 -> g-major rows at OC block j (8-aligned: B%8==0;
    casts to the scratch dtype — the chunk kernel keeps its big
    activation arrays bf16 to fit VMEM)."""
    r = bn // 128
    for c in range(r):
        dst[pl.ds((j * r + c) * B, B), :] = \
            acc[:, c * 128:(c + 1) * 128].astype(dst.dtype)


def _blayer_phases(
    layer, base2, lengths, B, ln1_row, ln2_row, bq_row, cs_ref,
    weights, cache_ref, kvs_ref, kv_store, kv_flush,
    hbuf, xq_s, qkv_s, qkvb_s, xob_s, xo_s, gu_s, hm_s, oacc_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem, kssem, vssem,
    *, dims, dense3, has_bias, tail_dma=None, page_of=None,
):
    """One decoder layer for B rows. Residual lives in ``hbuf``
    (g-major); returns nothing (hbuf updated in place via h1/oacc).

    ``page_of(b, i)`` (paged mode) maps a row's block index to a
    physical page id in the pool — the cache operand is then the page
    pool ``[L, 2, n_pages, n_kv, page, hd]`` and block i of row b reads
    page ``tables[b, i]`` at offset 0 (page size == bt)."""
    d = dims
    nq, nkv, hd, eps = d["nq"], d["nkv"], d["hd"], d["eps"]
    ngh, ngi = d["ngh"], d["ngi"]
    bt, hc = d["bt"], d["hc"]
    grp = nq // nkv
    nr = nq + 2 * nkv
    exact = d.get("exact", False)

    phases = [
        (weights[0], d["NBQ"], d["rq"], ngh, d["bnq"]),
        (weights[1], d["NBO"], d["ro"], ngh, d["bno"]),
        (weights[2], d["NBG"], d["rg"], ngh, d["bng"]),
        (weights[3], d["NBD"], d["rd"], ngi, d["bnd"]),
    ]
    offs = [0]
    for _, nb, _, _, _ in phases:
        offs.append(offs[-1] + nb)

    def wdma(ph, lyr, j, slot):
        hbm, _, rows, _, bn = phases[ph]
        return pltpu.make_async_copy(
            hbm.at[lyr, j], wbuf.at[slot, 0:rows, 0:bn], wsem.at[slot],
        )

    def run_phase(ph, x_rows, xs_t, store):
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
            acc = _qdot_rows_b(x_rows, xs_t, wbuf, slot, n_g, bn, B,
                               dense3=dense3, exact=exact)
            store(acc, j)
            return 0

        jax.lax.fori_loop(0, nb, body, 0, unroll=False)

    # ---- phase 1: rmsnorm + fused QKV --------------------------------------
    # matmul-input scratch (xq/qkv/xo/gu/hm) is bf16: every consumer dot
    # rounds its LHS to bf16 anyway, and halving these buffers is what
    # lets B=32 fit the VMEM budget. Residual state (hbuf/h1/oacc) stays
    # f32.
    xq_s[:, :] = _rms_rows_b(hbuf, ln1_row, eps, ngh, B).astype(xq_s.dtype)
    xs = _row_sums_b(xq_s, ngh, B)
    run_phase(0, xq_s, xs,
              lambda acc, j: _store_rows_b(qkv_s, acc, j, d["bnq"], B))

    # ---- phase 2: transpose to b-major, rope + per-row flash ---------------
    # g-major [nr*B, 128] -> b-major [B*nr, 128] (+ qkv bias, broadcast
    # over rows)
    qkvg = qkv_s[0:nr * B, :].reshape(nr, B, 128)
    if has_bias:
        qkvg = qkvg + bq_row[:, None, :]
    qkvb_s[:, :] = jnp.transpose(qkvg, (1, 0, 2)).reshape(
        B * nr, 128).astype(qkvb_s.dtype)

    scale = 1.0 / (hd ** 0.5)
    n_chunks = nkv // hc
    q8 = d["q8"]

    def dma(buf, kv, sem, slot, b, c, i):
        if page_of is not None:
            src = cache_ref.at[layer, kv, page_of(b, i),
                               pl.ds(c * hc, hc), pl.ds(0, bt), :]
        else:
            src = cache_ref.at[layer, kv, b, pl.ds(c * hc, hc),
                               pl.ds(i * bt, bt), :]
        return pltpu.make_async_copy(src, buf.at[slot], sem.at[slot])

    def sdma(buf, kv, sem, slot, b, c, i):
        # int8 cache: per-(head, position) dequant scales ride alongside
        return pltpu.make_async_copy(
            kvs_ref.at[layer, kv, b, pl.ds(c * hc, hc), i],
            buf.at[slot], sem.at[slot],
        )

    for b in range(B):
        length = lengths[b]
        base = b * nr
        cos = cs_ref[0, b][None, :]
        sin = cs_ref[1, b][None, :]
        q = _rope_rows_b(qkvb_s[base:base + nq, :], cos, sin)
        k = _rope_rows_b(qkvb_s[base + nq:base + nq + nkv, :], cos, sin)
        v = qkvb_s[base + nq + nkv:base + nr, :]
        kv_store(b, k, v)
        qs = (q * scale).reshape(nkv, grp, hd)
        nblk = pl.cdiv(length, bt)

        def start_blk(c, i, slot):
            dma(kbuf, 0, ksem, slot, b, c, i).start()
            dma(vbuf, 1, vsem, slot, b, c, i).start()
            if q8:
                sdma(ksbuf, 0, kssem, slot, b, c, i).start()
                sdma(vsbuf, 1, vssem, slot, b, c, i).start()

        for c in range(n_chunks):
            @pl.when(nblk > 0)
            def _():
                start_blk(c, 0, 0)

            qc = qs[c * hc:(c + 1) * hc]               # [hc, grp, hd]

            def blk_body(i, carry):
                m, l, acc = carry
                slot = i % 2

                @pl.when(i + 1 < nblk)
                def _():
                    start_blk(c, i + 1, (i + 1) % 2)

                dma(kbuf, 0, ksem, slot, b, c, i).wait()
                if q8:
                    sdma(ksbuf, 0, kssem, slot, b, c, i).wait()
                    kf = (kbuf[slot].astype(jnp.float32)
                          * ksbuf[slot][..., None])
                else:
                    kf = kbuf[slot].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qc, kf,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                      # [hc, grp, bt]
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) \
                    + i * bt
                s = jnp.where(col < length, s, -jnp.inf)
                m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l_new = l * alpha + jnp.sum(p, axis=2, keepdims=True)
                dma(vbuf, 1, vsem, slot, b, c, i).wait()
                if q8:
                    sdma(vsbuf, 1, vssem, slot, b, c, i).wait()
                    vf = (vbuf[slot].astype(jnp.float32)
                          * vsbuf[slot][..., None])
                else:
                    vf = vbuf[slot].astype(jnp.float32)
                pv = jax.lax.dot_general(
                    p, vf,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                                      # [hc, grp, hd]
                return m_new, l_new, acc * alpha + pv

            m0 = jnp.full((hc, grp, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((hc, grp, 1), jnp.float32)
            a0 = jnp.zeros((hc, grp, hd), jnp.float32)
            m, l, acc = jax.lax.fori_loop(0, nblk, blk_body,
                                          (m0, l0, a0))

            kc = k[c * hc:(c + 1) * hc]
            vc = v[c * hc:(c + 1) * hc]
            s_c = jnp.sum(qc * kc[:, None, :], axis=2, keepdims=True)
            m_new = jnp.maximum(m, s_c)
            alpha = jnp.exp(m - m_new)
            p_c = jnp.exp(s_c - m_new)
            l = l * alpha + p_c
            acc = acc * alpha + p_c * vc[:, None, :]
            rows = (acc / l).reshape(hc * grp, hd)
            xob_s[b * nq + c * hc * grp:
                  b * nq + (c + 1) * hc * grp, :] = rows.astype(xob_s.dtype)

    kv_flush()
    # b-major attn rows -> g-major for the o-proj matmul
    xo_s[:, :] = jnp.transpose(
        xob_s[0:B * nq, :].reshape(B, nq, 128), (1, 0, 2)
    ).reshape(nq * B, 128).astype(xo_s.dtype)

    # ---- phase 3: o-proj ----------------------------------------------------
    xs = _row_sums_b(xo_s, ngh, B)
    run_phase(1, xo_s, xs,
              lambda acc, j: _store_rows_b(oacc_s, acc, j, d["bno"], B))

    # ---- phase 4: residual + norm2 + gate/up --------------------------------
    # residual accumulates into hbuf in place (h1 == hbuf + oacc was a
    # dedicated 512 KB buffer; in-place frees it for the VMEM budget)
    hbuf[:, :] = hbuf[:, :] + oacc_s[0:ngh * B, :]
    xq_s[:, :] = _rms_rows_b(hbuf, ln2_row, eps, ngh, B).astype(xq_s.dtype)
    xs = _row_sums_b(xq_s, ngh, B)
    run_phase(2, xq_s, xs,
              lambda acc, j: _store_rows_b(gu_s, acc, j, d["bng"], B))

    # ---- phase 5: SwiGLU + down + residual ----------------------------------
    # silu in f32 (bf16 logistic loses ~2 mantissa bits where it matters)
    gate = gu_s[0:ngi * B, :].astype(jnp.float32)
    up = gu_s[ngi * B:2 * ngi * B, :].astype(jnp.float32)
    hm_s[:, :] = (gate * jax.lax.logistic(gate) * up).astype(hm_s.dtype)
    xs = _row_sums_b(hm_s, ngi, B)
    run_phase(3, hm_s, xs,
              lambda acc, j: _store_rows_b(oacc_s, acc, j, d["bnd"], B))
    # residual is bf16 between layers (parity with the composed model)
    hbuf[:, :] = (hbuf[:, :] + oacc_s[0:ngh * B, :]).astype(
        jnp.bfloat16).astype(jnp.float32)


def _btoken_kernel(
    lengths_ref,
    h_ref, ln_ref, bq_ref, cs_ref, nw_ref,
    wq_hbm, wo_hbm, wg_hbm, wd_hbm, wh_hbm,
    cache_ref, kvs_ref,
    out_ref, kn_ref, vn_ref, logits_ref,
    hbuf, xq_s, pool_s, oacc_s,
    wbuf, kbuf, vbuf, ksbuf, vsbuf, kstage, vstage, lstage,
    wsem, ksem, vsem, kssem, vssem, st_sem,
    *, dims, n_layers, B, dense3, has_bias, head, max_pages=0,
):
    d = dims
    tot = d["NBQ"] + d["NBO"] + d["NBG"] + d["NBD"]
    weights = (wq_hbm, wo_hbm, wg_hbm, wd_hbm)
    # one bf16 pool backs {qkv g-/b-major, attn out b-major, attn out
    # g-major} AND {gate|up, hm}: the attention-phase views all die
    # before phase 4 writes gate|up, and gate|up/hm die before the next
    # layer's phase 2 — aliasing saves ~2.2 MB at B=32, the margin that
    # fits the 16 MB scoped-VMEM cap
    nr = d["nq"] + 2 * d["nkv"]
    nq, ngh, ngi = d["nq"], d["ngh"], d["ngi"]
    qkv_s = pool_s.at[0:nr * B, :]
    qkvb_s = pool_s.at[nr * B:2 * nr * B, :]
    xob_s = pool_s.at[2 * nr * B:(2 * nr + nq) * B, :]
    xo_s = pool_s.at[(2 * nr + nq) * B:(2 * nr + nq + ngh) * B, :]
    gu_s = pool_s.at[0:2 * ngi * B, :]
    hm_s = pool_s.at[2 * ngi * B:3 * ngi * B, :]
    lengths = [lengths_ref[b] for b in range(B)]
    # paged mode: scalars carry [B] lengths then [B*max_pages] tables
    page_of = (None if not max_pages else
               (lambda b, i: lengths_ref[B + b * max_pages + i]))

    pltpu.make_async_copy(
        wq_hbm.at[0, 0], wbuf.at[0, 0:d["rq"], 0:d["bnq"]], wsem.at[0],
    ).start()
    hbuf[:, :] = h_ref[:, :].astype(jnp.float32)

    def layer_body(l, _):
        base2 = jax.lax.rem(l * tot, 2)

        # kn/vn/logits live in HBM (pinned VMEM output blocks cost
        # 2*L*B*nkv*hd + vocab rows — what blocked B=32); rows collect
        # in small staging buffers and DMA out per layer / head block
        def kv_store(b, k, v):
            kstage[b, :, :] = k.astype(kstage.dtype)
            vstage[b, :, :] = v.astype(vstage.dtype)

        def kv_flush():
            ck = pltpu.make_async_copy(kstage, kn_ref.at[l], st_sem.at[0])
            cv = pltpu.make_async_copy(vstage, vn_ref.at[l], st_sem.at[1])
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()

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
                        wbuf.at[nxt, 0:d["rh"], 0:d["bnh"]],
                        wsem.at[nxt],
                    ).start()

        _blayer_phases(
            l, base2, lengths, B, ln_ref[l, 0], ln_ref[l, 1],
            bq_ref[0 if not has_bias else l].astype(jnp.float32),
            cs_ref, weights, cache_ref, kvs_ref, kv_store, kv_flush,
            hbuf, xq_s, qkv_s, qkvb_s, xob_s, xo_s, gu_s, hm_s,
            oacc_s, wbuf, kbuf, vbuf, ksbuf, vsbuf, wsem, ksem, vsem,
            kssem, vssem,
            dims=d, dense3=dense3, has_bias=has_bias, tail_dma=tail_dma,
            page_of=page_of,
        )
        return 0

    jax.lax.fori_loop(0, n_layers, layer_body, 0, unroll=False)
    out_ref[:, :] = hbuf[:, :].astype(out_ref.dtype)

    if head:
        ngh = d["ngh"]
        bnh, NBH, rh = d["bnh"], d["NBH"], d["rh"]
        xq_s[:, :] = _rms_rows_b(hbuf, nw_ref[:, :], d["eps"], ngh,
                                 B).astype(xq_s.dtype)
        xs = _row_sums_b(xq_s, ngh, B)
        p0 = jnp.asarray(n_layers * tot, jnp.int32)

        def hbody(j, _):
            slot = jax.lax.rem(j + p0, 2)
            nxt = jax.lax.rem(j + p0 + 1, 2)

            @pl.when(j + 1 < NBH)
            def _():
                pltpu.make_async_copy(
                    wh_hbm.at[0, j + 1], wbuf.at[nxt, 0:rh, 0:bnh],
                    wsem.at[nxt],
                ).start()

            pltpu.make_async_copy(
                wh_hbm.at[0, j], wbuf.at[slot, 0:rh, 0:bnh],
                wsem.at[slot],
            ).wait()
            acc = _qdot_rows_b(xq_s, xs, wbuf, slot, ngh, bnh, B,
                               dense3=dense3,
                               exact=d.get("exact", False))
            # logits output lives in HBM: stage the block's rows in
            # VMEM and DMA them to their g-major row range
            _store_rows_b(lstage, acc, 0, bnh, B)
            r = bnh // 128
            cl = pltpu.make_async_copy(
                lstage, logits_ref.at[pl.ds(j * r * B, r * B), :],
                st_sem.at[2],
            )
            cl.start()
            cl.wait()
            return 0

        jax.lax.fori_loop(0, NBH, hbody, 0, unroll=False)


def _bscratch_bytes(cfg, layers, batch: int) -> int:
    """VMEM scratch bytes for the batched kernel at ``batch`` rows:
    weight double-buffer + k/v stream buffers + activation scratch
    (residual state f32, matmul-input scratch bf16) + norms window +
    qkv bias block."""
    H, I = cfg.hidden_size, cfg.intermediate_size
    nr_rows = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim // 128
    needed = ("wqkv", "wo", "wgateup", "down")
    wrows = max(layers[n].qweight.shape[2] for n in needed)
    wcols = max(layers[n].tiled_bn for n in needed)
    f32_rows = 2 * (H // 128) * batch               # hbuf, oacc
    bf16_rows = ((H // 128) * batch                 # xq
                 # shared pool: {qkv g/b-major, attn b/g-major} |
                 # {gate|up, hm}
                 + max(2 * nr_rows + cfg.num_heads + H // 128,
                       3 * (I // 128)) * batch)
    bias_rows = (cfg.num_layers * nr_rows
                 if layers["wqkv"].bias is not None else nr_rows)
    return (2 * wrows * wcols * 4 + 4 * 512 * 1024
            + f32_rows * 128 * 4 + bf16_rows * 128 * 2
            + 2 * cfg.num_layers * H * 4            # norms window
            + bias_rows * 128 * 4                   # qkv bias block
            + 2 * batch * cfg.num_kv_heads * cfg.head_dim * 2  # k/v staging
            + 2 * (H // 128) * batch * 128 * 2      # h in/out blocks
            + 4 * batch * 128 * 4)                  # logits staging


def megakernel_batched_supported(cfg, layers, cache, batch: int) -> bool:
    """The batched kernel shares the single-token gate plus: B%8==0,
    B<=64 (the attention phase statically unrolls over rows — compile
    time and VMEM scratch scale with B; the kernel raises its own
    scoped-vmem limit, measured fine through B=64 at the 7B geometry:
    2355 tok/s aggregate), batch matches the cache's slot axis."""
    data = getattr(cache, "data", cache)
    if not isinstance(data, jax.Array):
        return False
    if batch % 8 != 0 or batch > 64 or data.shape[2] != batch:
        return False
    if not megakernel_supported(cfg, layers, cache, slots=batch):
        return False
    return _bscratch_bytes(cfg, layers, batch) <= 80 * 1024 * 1024


def megakernel_paged_supported(cfg, layers, pool, batch: int) -> bool:
    """Paged-mode gate: fp pool with 256-position pages; B%8==0 and
    B<=64, plus the batched VMEM budget."""
    if not isinstance(pool, jax.Array) or pool.dtype == jnp.int8:
        return False
    if pool.shape[4] != 256:
        return False
    if batch % 8 != 0 or batch > 64:
        return False
    if not megakernel_supported(cfg, layers, pool, slots=pool.shape[2]):
        return False
    return _bscratch_bytes(cfg, layers, batch) <= 80 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("nq", "nkv", "eps", "interpret"))
def w4a16_llama_token_step_batched(
    h: jax.Array,            # [B, H] bf16 residual input (post-embed)
    wqkv: QLinear, wo: QLinear, wgu: QLinear, wdn: QLinear,
    ln1: jax.Array,          # [L, H]
    ln2: jax.Array,
    cos_rows: jax.Array,     # [B, hd] f32 rope rows at each row's position
    sin_rows: jax.Array,
    cache: jax.Array,        # [L, 2, B, n_kv, T, hd]
    lengths: jax.Array,      # [B] per-row cache lengths (write positions)
    nq: int = 0, nkv: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
    whead: QLinear = None,
    norm_w: jax.Array = None,
    cache_scales: jax.Array = None,   # [L, 2, B, n_kv, T//256, 256] f32
    tables: jax.Array = None,         # [B, max_pages] page ids (PAGED mode:
                                      # ``cache`` is then the page pool
                                      # [L, 2, n_pages, n_kv, 256, hd])
):
    """ALL decoder layers for B rows in one Pallas call. Returns
    ``(h_new [B, H], k_new [L, B, n_kv, hd], v_new [L, B, n_kv, hd])``
    (+ ``logits [B, vocab] f32`` with ``whead``/``norm_w``); the caller
    appends k/v with one batched scatter (``ops/cache_append.py``)."""
    B, H = h.shape
    hd = cache.shape[-1]
    L = cache.shape[0]
    nkv = nkv or cache.shape[3]
    nq = nq or H // hd
    assert B % 8 == 0, B
    assert wqkv.folded and wo.folded and wgu.folded and wdn.folded
    dense3 = wqkv.dense3
    dims = _dims_for((nq, nkv, hd), wqkv, wo, wgu, wdn, cache, eps)
    dims["exact"] = bool(interpret)
    ngh, ngi = dims["ngh"], dims["ngi"]
    nr = nq + 2 * nkv

    # [B, H] -> g-major rows [ngh*B, 128]
    h_rows = jnp.transpose(h.reshape(B, ngh, 128), (1, 0, 2)) \
        .reshape(ngh * B, 128)
    ln = jnp.stack([ln1, ln2], axis=1).reshape(L, 2, ngh, 128)
    has_bias = wqkv.bias is not None
    bq = (wqkv.bias.astype(jnp.float32).reshape(L, nr, hd) if has_bias
          else jnp.zeros((1, nr, hd), jnp.float32))
    cs = jnp.stack([cos_rows, sin_rows]).astype(jnp.float32)
    scalars = jnp.asarray(lengths, jnp.int32).reshape(B)
    max_pages = 0
    if tables is not None:
        assert cache.shape[4] == dims["bt"], "page size must equal bt"
        max_pages = tables.shape[1]
        scalars = jnp.concatenate(
            [scalars, tables.astype(jnp.int32).reshape(-1)])

    if cache_scales is None:
        cache_scales = jnp.zeros((1, 2, B, 8, 1, 256), jnp.float32)
    # int8 cache: k/v come back fp — the caller quantizes + appends
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

    wrows = max(dims["rq"], dims["ro"], dims["rg"], dims["rd"],
                dims["rh"])
    wcols = max(dims["bnq"], dims["bno"], dims["bng"], dims["bnd"],
                dims["bnh"])
    hc, bt = dims["hc"], dims["bt"]
    kv_isz = jnp.dtype(cache.dtype).itemsize
    # exact bytes of the scratch_shapes below + the pinned in/out blocks
    # (used to size the kernel's scoped-vmem limit)
    scratch_bytes = (
        ngh * B * 128 * (4 + 2 + 4 + 4)        # hbuf, xq, oacc, h in/out
        + max((2 * nr + nq + ngh) * B, 3 * ngi * B) * 128 * 2   # pool
        + 2 * wrows * wcols * 4                # weight double-buffer
        + 2 * 2 * hc * bt * hd * kv_isz        # k/v stream buffers
        + 2 * 2 * hc * bt * 4                  # k/v scale buffers
        + 2 * B * nkv * hd * 2                 # k/v staging
        + max(dims["bnh"] // 128, 1) * B * 128 * 4    # logits staging
        + L * 2 * ngh * 128 * 4                # ln window
        + (L if has_bias else 1) * nr * hd * 4  # qkv bias window
    )
    pinned = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh * B, 128), pinned),                # h rows
            pl.BlockSpec((L, 2, ngh, 128), lambda g, l: (0,) * 4),
            pl.BlockSpec((L if has_bias else 1, nr, hd),
                         lambda g, l: (0, 0, 0)),                # qkv bias
            pl.BlockSpec((2, B, hd), lambda g, l: (0, 0, 0)),    # cos|sin
            pl.BlockSpec((ngh, 128), pinned),                    # final norm
            pl.BlockSpec(memory_space=pl.ANY),                   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                   # wo
            pl.BlockSpec(memory_space=pl.ANY),                   # wgu
            pl.BlockSpec(memory_space=pl.ANY),                   # wdn
            pl.BlockSpec(memory_space=pl.ANY),                   # lm_head
            pl.BlockSpec(memory_space=pl.ANY),                   # cache
            pl.BlockSpec(memory_space=pl.ANY),                   # kv scales
        ],
        out_specs=[
            pl.BlockSpec((ngh * B, 128), pinned),                # h_new
            pl.BlockSpec(memory_space=pl.ANY),                   # k_new (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                   # v_new (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                   # logits (HBM)
        ],
        scratch_shapes=[
            # residual state f32; matmul-input scratch bf16 (consumer
            # dots round to bf16 regardless — halves VMEM, admits B=32)
            pltpu.VMEM((ngh * B, 128), jnp.float32),             # hbuf
            pltpu.VMEM((ngh * B, 128), jnp.bfloat16),            # xq/xm
            # shared pool: {qkv g-/b-major, attn out b-/g-major} |
            # {gate|up, hm}
            pltpu.VMEM((max((2 * nr + nq + ngh) * B, 3 * ngi * B), 128),
                       jnp.bfloat16),
            pltpu.VMEM((ngh * B, 128), jnp.float32),             # o/down acc
            pltpu.VMEM((2, wrows, wcols), jnp.int32),            # weight dbuf
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),  # k scales
            pltpu.VMEM((2, dims["hc"], dims["bt"]), jnp.float32),  # v scales
            pltpu.VMEM((B, nkv, hd), kv_dt),                     # k staging
            pltpu.VMEM((B, nkv, hd), kv_dt),                     # v staging
            pltpu.VMEM((max(dims["bnh"] // 128, 1) * B, 128),
                       jnp.float32),                             # logits stg
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),                       # k/v/logits out
        ],
    )

    by = sum(w.in_features * w.out_features for w in (wqkv, wo, wgu, wdn))
    cost = pl.CostEstimate(flops=2 * B * L * by * 2,
                           bytes_accessed=L * by // 2, transcendentals=0)
    out, kn, vn, logits = pl.pallas_call(
        functools.partial(_btoken_kernel, dims=dims, n_layers=L, B=B,
                          dense3=dense3, has_bias=has_bias, head=head,
                          max_pages=max_pages),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngh * B, 128), h.dtype),
            jax.ShapeDtypeStruct((L, B, nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((L, B, nkv, hd), kv_dt),
            jax.ShapeDtypeStruct((vocab // 128 * B, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default 16 MB scoped-vmem cap is a compiler default,
            # not the physical VMEM size: B>=24 activation scratch needs
            # more and measured fine (B=32/bn=512 runs at 17 ms/step
            # with a 32 MB cap; bn=256 under 16 MB was 7% slower).
            # Estimate + fixed headroom for the compiler's own stack.
            # headroom for the compiler's own stack scales with the
            # B-unrolled attention phase (measured ~5 MB at B=32,
            # ~10 MB at B=64 beyond the explicit buffers)
            vmem_limit_bytes=int(os.environ.get("AWQ_TPU_VMEM_LIMIT", 0))
            or min(scratch_bytes + 8 * 1024 * 1024 + B * 192 * 1024,
                   96 * 1024 * 1024),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(
        scalars, h_rows, ln, bq, cs, nw,
        wqkv.qweight, wo.qweight, wgu.qweight, wdn.qweight, wh_qw,
        cache, cache_scales,
    )
    h_new = jnp.transpose(out.reshape(ngh, B, 128), (1, 0, 2)) \
        .reshape(B, H)
    if head:
        logits = jnp.transpose(logits.reshape(vocab // 128, B, 128),
                               (1, 0, 2)).reshape(B, vocab)
        return h_new, kn, vn, logits
    return h_new, kn, vn
