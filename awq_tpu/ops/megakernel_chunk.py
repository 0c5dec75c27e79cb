"""Chunked-prefill megakernel: ALL layers for one S<=32-token window of a
single sequence in ONE Pallas launch.

The multi-round chat path ("32-token question on reused history KV",
reference ``tinychat/benchmark.py`` chunk-prefill mode) ran through the
5-kernel/layer prefill stack: ~160 launches for a 32-row matmul put the
step at 15.7 ms when the weight stream alone is ~5.4. This kernel is the
single-sequence sibling of ``megakernel_batched.py`` — the S window rows
share ONE history cache stream (cheaper than the batched kernel's
per-row streams) plus an in-register causal tail among the window.

Layout identities that make it small:
- Activations are row-major ``[unit*S + i, 128]`` exactly like the
  batched kernel with B -> S, so the matmul/norm/SwiGLU helpers are
  imported unchanged.
- With hd == 128, H-dimension units ARE attention heads, and HF orders
  q heads so kv-head k owns the consecutive q heads ``k*grp..``: the
  flash Q block for cache chunk ``c`` is the CONTIGUOUS row slab
  ``[c*hc*grp*S, (c+1)*hc*grp*S)`` reshaped ``[hc, grp*S, hd]`` — no
  transposes anywhere (the batched kernel needs two per layer).
- The window is padded to S=32 rows; pad rows sit at the END so the
  causal mask keeps them out of every real row's softmax, and the
  caller appends/returns only the first ``s`` rows.

Reference comparison: TinyChat 2.0 chunk-prefill is 14.4 ms on a 4090
(``tinychat/README.md:229-234``); this kernel targets ~6-7 ms on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from awq_tpu.ops.megakernel import _dims_for
from awq_tpu.ops.megakernel_batched import (
    _qdot_rows_b,
    _rms_rows_b,
    _rope_rows_b,
    _row_sums_b,
    _store_rows_b,
)

CHUNK_S = 32


def _cchunk_kernel(
    scalars_ref,
    h_ref, ln_ref, bq_ref, cs_ref,
    wq_hbm, wo_hbm, wg_hbm, wd_hbm,
    cache_ref,
    out_ref, kn_ref, vn_ref,
    hbuf, xq_s, qkv_s, xo_s, h1_s, gu_s, hm_s, oacc_s,
    wbuf, kbuf, vbuf, wsem, ksem, vsem,
    *, dims, n_layers, S, dense3, has_bias,
):
    d = dims
    nq, nkv, hd, eps = d["nq"], d["nkv"], d["hd"], d["eps"]
    ngh, ngi = d["ngh"], d["ngi"]
    bt, hc = d["bt"], d["hc"]
    grp = nq // nkv
    nr = nq + 2 * nkv
    hist = scalars_ref[0]                       # history length
    tot = d["NBQ"] + d["NBO"] + d["NBG"] + d["NBD"]

    phases = [
        (wq_hbm, d["NBQ"], d["rq"], ngh, d["bnq"]),
        (wo_hbm, d["NBO"], d["ro"], ngh, d["bno"]),
        (wg_hbm, d["NBG"], d["rg"], ngh, d["bng"]),
        (wd_hbm, d["NBD"], d["rd"], ngi, d["bnd"]),
    ]
    offs = [0]
    for _, nb, _, _, _ in phases:
        offs.append(offs[-1] + nb)

    pltpu.make_async_copy(
        wq_hbm.at[0, 0], wbuf.at[0, 0:d["rq"], 0:d["bnq"]], wsem.at[0],
    ).start()
    hbuf[:, :] = h_ref[:, :].astype(jnp.float32)

    def layer_body(l, _):
        base2 = jax.lax.rem(l * tot, 2)

        def wdma(ph, j, slot):
            hbm, _, rows, _, bn = phases[ph]
            return pltpu.make_async_copy(
                hbm.at[l, j], wbuf.at[slot, 0:rows, 0:bn], wsem.at[slot],
            )

        def run_phase(ph, x_rows, xs_t, store):
            _, nb, _, n_g, bn = phases[ph]
            p0 = base2 + offs[ph]

            def body(j, _):
                slot = jax.lax.rem(j + p0, 2)
                nxt = jax.lax.rem(j + p0 + 1, 2)

                @pl.when(j + 1 < nb)
                def _():
                    wdma(ph, j + 1, nxt).start()

                if ph + 1 < len(phases):
                    @pl.when(j + 1 == nb)
                    def _():
                        wdma(ph + 1, 0, nxt).start()
                else:
                    @pl.when((j + 1 == nb) & (l + 1 < n_layers))
                    def _():
                        pltpu.make_async_copy(
                            wq_hbm.at[l + 1, 0],
                            wbuf.at[nxt, 0:d["rq"], 0:d["bnq"]],
                            wsem.at[nxt],
                        ).start()

                wdma(ph, j, slot).wait()
                acc = _qdot_rows_b(x_rows, xs_t, wbuf, slot, n_g, bn, S,
                                   dense3=dense3,
                                   exact=d.get("exact", False))
                store(acc, j)
                return 0

            jax.lax.fori_loop(0, nb, body, 0, unroll=False)

        # ---- phase 1: per-token rmsnorm + fused QKV ------------------------
        xq_s[:, :] = _rms_rows_b(hbuf, ln_ref[l, 0], eps, ngh, S)
        xs = _row_sums_b(xq_s, ngh, S)
        run_phase(0, xq_s, xs,
                  lambda acc, j: _store_rows_b(qkv_s, acc, j,
                                               d["bnq"], S))

        # ---- phase 2: rope + flash over history + causal tail --------------
        cos = cs_ref[0]                         # [S, hd]
        sin = cs_ref[1]
        qkvf = qkv_s[0:nr * S, :].astype(jnp.float32)
        if has_bias:
            qkvf = qkvf + jnp.repeat(
                bq_ref[l].astype(jnp.float32), S, axis=0)
        # head-major rows [h*S + i, hd]: per-head rope with per-ROW
        # cos/sin (positions hist..hist+S-1)
        cos_t = jnp.concatenate([cos] * nq, axis=0)
        sin_t = jnp.concatenate([sin] * nq, axis=0)
        q = _rope_rows_b(qkvf[0:nq * S, :], cos_t, sin_t)
        k = _rope_rows_b(qkvf[nq * S:(nq + nkv) * S, :],
                         cos_t[0:nkv * S], sin_t[0:nkv * S])
        v = qkvf[(nq + nkv) * S:nr * S, :]
        kn_ref[l, :, :] = k.astype(kn_ref.dtype)
        vn_ref[l, :, :] = v.astype(vn_ref.dtype)
        scale = 1.0 / (hd ** 0.5)
        qs = q * scale
        n_chunks = nkv // hc
        nblk = pl.cdiv(hist, bt)

        def dma(buf, kv, sem, slot, c, i):
            return pltpu.make_async_copy(
                cache_ref.at[l, kv, 0, pl.ds(c * hc, hc),
                             pl.ds(i * bt, bt), :],
                buf.at[slot], sem.at[slot],
            )

        for c in range(n_chunks):
            @pl.when(nblk > 0)
            def _():
                dma(kbuf, 0, ksem, 0, c, 0).start()
                dma(vbuf, 1, vsem, 0, c, 0).start()

            qc = qs[c * hc * grp * S:(c + 1) * hc * grp * S, :] \
                .reshape(hc, grp * S, hd)

            def blk_body(i, carry):
                m, lsum, acc = carry
                slot = i % 2

                @pl.when(i + 1 < nblk)
                def _():
                    dma(kbuf, 0, ksem, (i + 1) % 2, c, i + 1).start()
                    dma(vbuf, 1, vsem, (i + 1) % 2, c, i + 1).start()

                dma(kbuf, 0, ksem, slot, c, i).wait()
                s = jax.lax.dot_general(
                    qc, kbuf[slot].astype(jnp.float32),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )                               # [hc, grp*S, bt]
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) \
                    + i * bt
                s = jnp.where(col < hist, s, -jnp.inf)
                m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l_new = lsum * alpha + jnp.sum(p, axis=2, keepdims=True)
                dma(vbuf, 1, vsem, slot, c, i).wait()
                pv = jax.lax.dot_general(
                    p, vbuf[slot].astype(jnp.float32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return m_new, l_new, acc * alpha + pv

            m0 = jnp.full((hc, grp * S, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((hc, grp * S, 1), jnp.float32)
            a0 = jnp.zeros((hc, grp * S, hd), jnp.float32)
            m, lsum, acc = jax.lax.fori_loop(0, nblk, blk_body,
                                             (m0, l0, a0))

            # causal tail among the window (k/v of this chunk's kv heads,
            # in-register): q row (g, sq) may attend k row sk <= sq —
            # pad rows sit at the end, so they never enter a real row
            kc = k[c * hc * S:(c + 1) * hc * S, :].reshape(hc, S, hd)
            vc = v[c * hc * S:(c + 1) * hc * S, :].reshape(hc, S, hd)
            st = jax.lax.dot_general(
                qc, kc, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                   # [hc, grp*S, S]
            sq = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1) % S
            sk = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
            st = jnp.where(sk <= sq, st, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(st, axis=2, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p_t = jnp.exp(st - m_new)
            lsum = lsum * alpha + jnp.sum(p_t, axis=2, keepdims=True)
            pv = jax.lax.dot_general(
                p_t, vc, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            rows = (acc / lsum).reshape(hc * grp * S, hd)
            xo_s[c * hc * grp * S:(c + 1) * hc * grp * S, :] = rows

        # ---- phase 3: o-proj ------------------------------------------------
        xs = _row_sums_b(xo_s, ngh, S)
        run_phase(1, xo_s, xs,
                  lambda acc, j: _store_rows_b(oacc_s, acc, j,
                                               d["bno"], S))

        # ---- phase 4: residual + norm2 + gate/up ----------------------------
        h1_s[:, :] = hbuf[:, :].astype(jnp.float32) + oacc_s[0:ngh * S, :]
        xq_s[:, :] = _rms_rows_b(h1_s, ln_ref[l, 1], eps, ngh, S)
        xs = _row_sums_b(xq_s, ngh, S)
        run_phase(2, xq_s, xs,
                  lambda acc, j: _store_rows_b(gu_s, acc, j,
                                               d["bng"], S))

        # ---- phase 5: SwiGLU + down + residual ------------------------------
        gate = gu_s[0:ngi * S, :].astype(jnp.float32)
        up = gu_s[ngi * S:2 * ngi * S, :].astype(jnp.float32)
        hm_s[:, :] = (gate * jax.lax.logistic(gate) * up).astype(
            hm_s.dtype)
        xs = _row_sums_b(hm_s, ngi, S)
        run_phase(3, hm_s, xs,
                  lambda acc, j: _store_rows_b(oacc_s, acc, j,
                                               d["bnd"], S))
        hbuf[:, :] = (h1_s[:, :] + oacc_s[0:ngh * S, :]).astype(
            jnp.bfloat16).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_layers, layer_body, 0, unroll=False)
    out_ref[:, :] = hbuf[:, :].astype(out_ref.dtype)


def chunk_megakernel_supported(cfg, layers, cache, s: int) -> bool:
    """Single-sequence window of 1..CHUNK_S tokens, fp cache, plus the
    single-token gate (uniform folded layouts, hd=128, T%256, VMEM)."""
    from awq_tpu.ops.megakernel import megakernel_supported

    data = getattr(cache, "data", cache)
    if not isinstance(data, jax.Array) or data.dtype == jnp.int8:
        return False
    if not (0 < s <= CHUNK_S):
        return False
    if not megakernel_supported(cfg, layers, cache):
        return False
    # S=32 activation scratch (bf16 for the big arrays) must also fit
    H, I = cfg.hidden_size, cfg.intermediate_size
    nr_rows = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim // 128
    needed = ("wqkv", "wo", "wgateup", "down")
    wrows = max(layers[n].qweight.shape[2] for n in needed)
    wcols = max(layers[n].tiled_bn for n in needed)
    act = CHUNK_S * 128 * (
        (5 * H // 128) * 4                    # hbuf/xq/xo/h1/oacc f32
        + (nr_rows + 3 * I // 128) * 2        # qkv/gu/hm bf16
    )
    bias_rows = (cfg.num_layers * nr_rows
                 if layers["wqkv"].bias is not None else nr_rows)
    scratch = (2 * wrows * wcols * 4 + 4 * 512 * 1024 + act
               + 2 * cfg.num_layers * H * 4
               + bias_rows * 128 * 4)          # qkv bias block
    return scratch <= 15 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("nq", "nkv", "eps", "interpret"))
def w4a16_llama_chunk_step(
    h: jax.Array,            # [S, H] bf16 window rows (post-embed; S<=32,
                             # caller pads to CHUNK_S)
    wqkv, wo, wgu, wdn,
    ln1: jax.Array, ln2: jax.Array,
    cos_rows: jax.Array,     # [S, hd] rope rows at hist..hist+S-1
    sin_rows: jax.Array,
    cache: jax.Array,        # [L, 2, 1, n_kv, T, hd]
    hist: jax.Array,         # history length (scalar)
    nq: int = 0, nkv: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """All layers for one S-token window in one launch. Returns
    ``(h_new [S, H], k_new [L, n_kv, S, hd], v_new [L, n_kv, S, hd])``;
    the caller appends k/v at ``hist`` (one dynamic_update_slice) and
    runs the final norm + lm_head on the rows it needs."""
    S, H = h.shape
    hd = cache.shape[-1]
    L = cache.shape[0]
    nkv = nkv or cache.shape[3]
    nq = nq or H // hd
    assert S == CHUNK_S, S
    assert wqkv.folded and wo.folded and wgu.folded and wdn.folded
    dense3 = wqkv.dense3
    dims = _dims_for((nq, nkv, hd), wqkv, wo, wgu, wdn, cache, eps)
    dims["exact"] = bool(interpret)
    ngh, ngi = dims["ngh"], dims["ngi"]
    nr = nq + 2 * nkv

    h_rows = jnp.transpose(h.reshape(S, ngh, 128), (1, 0, 2)) \
        .reshape(ngh * S, 128)
    ln = jnp.stack([ln1, ln2], axis=1).reshape(L, 2, ngh, 128)
    has_bias = wqkv.bias is not None
    bq = (wqkv.bias.astype(jnp.float32).reshape(L, nr, hd) if has_bias
          else jnp.zeros((1, nr, hd), jnp.float32))
    cs = jnp.stack([cos_rows, sin_rows]).astype(jnp.float32)
    scalars = jnp.reshape(jnp.asarray(hist, jnp.int32), (1,))

    wrows = max(dims["rq"], dims["ro"], dims["rg"], dims["rd"])
    wcols = max(dims["bnq"], dims["bno"], dims["bng"], dims["bnd"])
    pinned = lambda g, l: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((ngh * S, 128), pinned),
            pl.BlockSpec((L, 2, ngh, 128), lambda g, l: (0,) * 4),
            pl.BlockSpec((L if has_bias else 1, nr, hd),
                         lambda g, l: (0, 0, 0)),
            pl.BlockSpec((2, S, hd), lambda g, l: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),                   # wo
            pl.BlockSpec(memory_space=pl.ANY),                   # wgu
            pl.BlockSpec(memory_space=pl.ANY),                   # wdn
            pl.BlockSpec(memory_space=pl.ANY),                   # cache
        ],
        out_specs=[
            pl.BlockSpec((ngh * S, 128), pinned),
            pl.BlockSpec((L, nkv * S, hd), lambda g, l: (0, 0, 0)),
            pl.BlockSpec((L, nkv * S, hd), lambda g, l: (0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ngh * S, 128), jnp.float32),             # hbuf
            pltpu.VMEM((ngh * S, 128), jnp.float32),             # xq/xm
            pltpu.VMEM((nr * S, 128), jnp.bfloat16),             # qkv
            pltpu.VMEM((ngh * S, 128), jnp.float32),             # xo
            pltpu.VMEM((ngh * S, 128), jnp.float32),             # h1
            pltpu.VMEM((2 * ngi * S, 128), jnp.bfloat16),        # gate|up
            pltpu.VMEM((ngi * S, 128), jnp.bfloat16),            # hm
            pltpu.VMEM((ngh * S, 128), jnp.float32),             # acc
            pltpu.VMEM((2, wrows, wcols), jnp.int32),            # weight dbuf
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.VMEM((2, dims["hc"], dims["bt"], hd), cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    by = sum(w.in_features * w.out_features for w in (wqkv, wo, wgu, wdn))
    cost = pl.CostEstimate(flops=2 * S * L * by * 2,
                           bytes_accessed=L * by // 2, transcendentals=0)
    out, kn, vn = pl.pallas_call(
        functools.partial(_cchunk_kernel, dims=dims, n_layers=L, S=S,
                          dense3=dense3, has_bias=has_bias),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ngh * S, 128), h.dtype),
            jax.ShapeDtypeStruct((L, nkv * S, hd), cache.dtype),
            jax.ShapeDtypeStruct((L, nkv * S, hd), cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(
        scalars, h_rows, ln, bq, cs,
        wqkv.qweight, wo.qweight, wgu.qweight, wdn.qweight, cache,
    )
    h_new = jnp.transpose(out.reshape(ngh, S, 128), (1, 0, 2)) \
        .reshape(S, H)
    return (h_new, kn.reshape(L, nkv, S, hd), vn.reshape(L, nkv, S, hd))
