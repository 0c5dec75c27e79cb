"""Functional Llama-family decoder (llama 1/2/3, mistral, qwen2, vicuna,
codellama, deepseek-r1-distill-llama/qwen...).

TPU-first redesign of the reference's from-scratch inference model
(``tinychat/models/llama.py:325-413`` and ``qwen2.py``): instead of torch
modules with per-layer static buffers, the model is

- a parameter pytree with all decoder layers **stacked on a leading axis**
  (one ``lax.scan`` trace per forward — compile time is O(1) in depth),
- a pure ``forward(params, cfg, tokens, cache, start_pos)`` with static
  shapes: the KV cache is preallocated ``[L, 2, B, n_kv, T, hd]`` and
  written via ``dynamic_update_slice`` at ``start_pos``, so chunked
  prefill / multi-round KV reuse (reference ``llama.py:342-350``) falls
  out of the same jitted function with zero recompilation.

Quantized and fp16 execution share this file: each linear is either a
``Linear`` or a packed ``QLinear`` pytree (the reference instead rewrites
modules via surgery, ``tinychat/modules/fused_attn.py:549-634``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models.layers import (
    Linear,
    apply_rope,
    attention,
    linear_apply,
    mlp_gelu,
    mlp_swiglu,
    layer_norm,
    rms_norm,
    rope_table,
    update_kv_cache,
)
from awq_tpu.ops.w4a16 import quantize_linear

Params = Dict[str, Any]

# per-layer linears eligible for AWQ quantization, in block order
LAYER_LINEARS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def _dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: ModelConfig, key: jax.Array, scale: float = 0.02) -> Params:
    """Random-initialized parameters (tests/benchmarks; real weights come
    from :mod:`awq_tpu.models.hf_import`)."""
    dt = _dtype(cfg)
    h, i = cfg.hidden_size, cfg.intermediate_size
    nq, nkv, hd, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    ks = jax.random.split(key, 16)

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    def lin(k, ic, oc, bias):
        return Linear(
            w=w(k, (L, ic, oc)),
            b=jnp.zeros((L, oc), dt) if bias else None,
        )

    layers = {
        "ln1": jnp.ones((L, h), dt),
        "wq": lin(ks[0], h, nq * hd, cfg.qkv_bias or cfg.attn_bias),
        "wk": lin(ks[1], h, nkv * hd, cfg.qkv_bias or cfg.attn_bias),
        "wv": lin(ks[2], h, nkv * hd, cfg.qkv_bias or cfg.attn_bias),
        "wo": lin(ks[3], nq * hd, h, cfg.attn_bias),
        "up": lin(ks[5], h, i, cfg.mlp_bias),
        "down": lin(ks[6], i, h, cfg.mlp_bias),
    }
    if not cfg.single_ln:
        layers["ln2"] = jnp.ones((L, h), dt)
    if cfg.act == "silu":
        layers["gate"] = lin(ks[4], h, i, cfg.mlp_bias)
    if cfg.norm == "layernorm" and cfg.norm_bias:
        layers["ln1_b"] = jnp.zeros((L, h), dt)
        if not cfg.single_ln:
            layers["ln2_b"] = jnp.zeros((L, h), dt)
    params: Params = {
        "embed": w(ks[7], (cfg.vocab_size, h)),
        "layers": layers,
        "norm": jnp.ones((h,), dt),
    }
    if cfg.norm == "layernorm" and cfg.norm_bias:
        params["norm_b"] = jnp.zeros((h,), dt)
    if cfg.embed_ln:
        params["embed_ln_w"] = jnp.ones((h,), dt)
        params["embed_ln_b"] = jnp.zeros((h,), dt)
    if cfg.pos_embed == "learned":
        off = 2 if cfg.arch == "opt" else 0
        params["pos_embed"] = w(
            ks[9], (cfg.max_position_embeddings + off, h)
        )
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[8], (h, cfg.vocab_size))
    return params


def pseudo_quantize_params(
    params: Params,
    qcfg: QuantConfig,
    clips: Optional[Dict[str, jax.Array]] = None,
) -> Params:
    """Fake-quantize every decoder-layer linear in place (weights stay fp).

    Counterpart of ``pseudo_quantize_model_weight``
    (``awq/quantize/quantizer.py:107-122``) / the CLI's ``--q_backend fake``
    accuracy-simulation path (``awq/entry.py:227-234``)."""
    from awq_tpu.quant.core import pseudo_quantize

    out = dict(params)
    layers = dict(params["layers"])
    for name in LAYER_LINEARS:
        if name not in layers or not isinstance(layers[name], Linear):
            continue
        lin = layers[name]
        clip = None if clips is None else clips.get(name)

        def fq(w, c):
            return pseudo_quantize(
                w.astype(jnp.float32),
                n_bit=qcfg.w_bit,
                group_size=(w.shape[0] if qcfg.group_size == -1
                            else qcfg.group_size),
                zero_point=qcfg.zero_point,
                clip_max=c,
            ).astype(lin.w.dtype)

        w = jax.vmap(fq)(lin.w, clip) if clip is not None else jax.vmap(
            lambda x: fq(x, None)
        )(lin.w)
        layers[name] = Linear(w=w, b=lin.b)
    out["layers"] = layers
    return out


def init_qparams(
    cfg: ModelConfig, qcfg: QuantConfig, key: jax.Array, scale: float = 0.02
) -> Params:
    """Random *packed* quantized parameters, built directly in the packed
    layout (no fp16 intermediate) — for benchmarks at 7B+ scale where the
    fp16 pytree would not fit alongside the packed one."""
    from awq_tpu.ops.w4a16 import QLinear

    dt = _dtype(cfg)
    h, i = cfg.hidden_size, cfg.intermediate_size
    nq, nkv, hd, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    g = cfg.hidden_size if qcfg.group_size == -1 else qcfg.group_size
    ks = iter(jax.random.split(key, 32))

    def qlin(ic, oc, bias):
        # random codes + smooth scales => well-conditioned activations.
        # w_bit==3 synthesizes the TRUE dense 3-bit runtime layout so the
        # W3 decode bench streams real W3 bytes.
        dense3 = qcfg.w_bit == 3 and ic % 256 == 0
        rows = ic * 3 // 32 if dense3 else ic // 8
        qw = jax.random.randint(next(ks), (L, rows, oc), -(2**31), 2**31 - 1,
                                jnp.int32)
        s = jax.random.uniform(next(ks), (L, ic // g, oc), jnp.float32,
                               0.5, 1.5) * (scale / 4)
        z = jnp.full_like(s, float(2 ** (qcfg.w_bit - 1))) * s
        return QLinear(
            qweight=qw, scales=s, szeros=z,
            bias=jnp.zeros((L, oc), dt) if bias else None,
            w_bit=qcfg.w_bit, group_size=g, dense3=dense3,
        )

    layers = {
        "ln1": jnp.ones((L, h), dt),
        "ln2": jnp.ones((L, h), dt),
        "wq": qlin(h, nq * hd, cfg.qkv_bias or cfg.attn_bias),
        "wk": qlin(h, nkv * hd, cfg.qkv_bias or cfg.attn_bias),
        "wv": qlin(h, nkv * hd, cfg.qkv_bias or cfg.attn_bias),
        "wo": qlin(nq * hd, h, cfg.attn_bias),
        "up": qlin(h, i, cfg.mlp_bias),
        "down": qlin(i, h, cfg.mlp_bias),
    }
    if cfg.act == "silu":
        layers["gate"] = qlin(h, i, cfg.mlp_bias)
    params: Params = {
        "embed": (jax.random.normal(next(ks), (cfg.vocab_size, h), jnp.float32)
                  * scale).astype(dt),
        "layers": layers,
        "norm": jnp.ones((h,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(next(ks), (h, cfg.vocab_size), jnp.float32) * scale
        ).astype(dt)
    return params


def fuse_linears(params: Params, cfg: ModelConfig,
                 consume: bool = False,
                 tile: Optional[bool] = None,
                 block_n: int = 512) -> Params:
    """Concatenate wq/wk/wv -> ``wqkv`` and gate/up -> ``wgateup`` along the
    output-channel axis (counterpart of the reference's QKV fusion in
    ``make_quant_attn``, ``tinychat/modules/fused_attn.py:549-634``, and the
    fused gate/up GEMV in ``fused_mlp.py``). One kernel launch instead of
    three/two — launch overhead is a real cost at decode.

    ``consume=True`` MUTATES ``params`` (drops each original tensor as it
    is repacked) so the device-memory peak is old+one tensor instead of
    old+new — use when the caller rebinds ``params`` anyway.

    ``tile`` controls the folded block-contiguous repack (round 5: ON
    for every arch — ALiBi models now ride the stacked flash path with
    in-kernel slopes, so the old plain-branch exception is stale).
    Linears whose OC has no 128-lane tile width (falcon-7b's 71x64
    heads) stay plain with a warning — the stacked kernel serves plain
    and tiled layouts side by side."""
    from awq_tpu.ops.w4a16 import QLinear

    if tile is None:
        tile = True

    layers = params["layers"] if consume else dict(params["layers"])
    if "wqkv" in layers or "wq" not in layers:
        # already fused — but still tile a plain 2D QLinear lm_head (the
        # quantize_head -> fuse_linears sequence on pre-fused params would
        # otherwise silently skip the in-kernel head)
        return _tile_head(dict(params), cfg, tile, block_n)

    def cat(parts):
        a = parts[0]
        if isinstance(a, QLinear):
            # OC is the lane axis in BOTH the nibble and dense-3 layouts,
            # so concatenation along it is layout-preserving
            return QLinear(
                qweight=jnp.concatenate([p.qweight for p in parts], axis=-1),
                scales=jnp.concatenate([p.scales for p in parts], axis=-1),
                szeros=jnp.concatenate([p.szeros for p in parts], axis=-1),
                bias=(jnp.concatenate([p.bias for p in parts], axis=-1)
                      if a.bias is not None else None),
                w_bit=a.w_bit, group_size=a.group_size, dense3=a.dense3,
            )
        return Linear(
            w=jnp.concatenate([p.w for p in parts], axis=-1),
            b=(jnp.concatenate([p.b for p in parts], axis=-1)
               if a.b is not None else None),
        )

    layers["wqkv"] = cat([layers.pop("wq"), layers.pop("wk"),
                          layers.pop("wv")])
    if "gate" in layers:
        layers["wgateup"] = cat([layers.pop("gate"), layers.pop("up")])
    # block-contiguous weight layout: each kernel N block becomes one
    # contiguous HBM stream (~777 vs ~453 GB/s measured on v5e)
    from awq_tpu.ops.w4a16 import folded_rows, tile_qlinear

    if tile:
        # the megakernel streams every phase through ONE shared
        # [2, max_rows, max_bn] VMEM buffer; a tall reduction (e.g.
        # qwen2's 18944-wide `down`) at bn=512 would blow the ~14 MB
        # budget and silently forfeit the megakernel — shrink the
        # UNIFORM block width until the double-buffer fits ~8 MB
        max_rows = max(
            (folded_rows(p.in_features, p.group_size, p.dense3)
             for p in layers.values() if isinstance(p, QLinear)),
            default=0)
        while block_n > 128 and 2 * max_rows * block_n * 4 > 8 * 2 ** 20:
            block_n //= 2
        for name, p in list(layers.items()):
            if isinstance(p, QLinear):
                if p.out_features % 128 and p.out_features > 128:
                    # falcon-7b-class shapes (71x64 heads, 4544 hidden):
                    # the 128-aligned OC prefix tiles normally; the
                    # sub-128 tail splits off at LAYOUT time as a small
                    # plain '<name>_rem' QLinear (slicing the stacked
                    # array per decode step instead would copy every
                    # layer's codes each scan iteration). OC is the lane
                    # axis in both packings, so the split is free.
                    oc_main = p.out_features // 128 * 128

                    def cut(ql, lo, hi):
                        return QLinear(
                            qweight=ql.qweight[..., lo:hi],
                            scales=ql.scales[..., lo:hi],
                            szeros=ql.szeros[..., lo:hi],
                            bias=(ql.bias[..., lo:hi]
                                  if ql.bias is not None else None),
                            w_bit=ql.w_bit, group_size=ql.group_size,
                            dense3=ql.dense3,
                        )

                    rem = cut(p, oc_main, p.out_features)
                    mainq = cut(p, 0, oc_main)
                    if consume:
                        del layers[name]
                    layers[name] = tile_qlinear(mainq, block_n=block_n,
                                                fold_scales=True)
                    layers[name + "_rem"] = rem
                    del p
                    continue
                # fold_scales packs scales/szeros into the blocks: one HBM
                # stream per matmul — the layout the decode megakernel's
                # manual-DMA loop wants (ops/megakernel.py).
                if consume:
                    del layers[name]  # free the original before the fold copy
                layers[name] = tile_qlinear(p, block_n=block_n,
                                            fold_scales=True, donate=consume)
                del p
    out = dict(params)
    out["layers"] = layers
    return _tile_head(out, cfg, tile, block_n)


def _tile_head(params: Params, cfg: ModelConfig, tile: bool,
               block_n: int) -> Params:
    """Repack a plain 2D QLinear ``lm_head`` as a stacked-of-1 folded tiled
    QLinear so decode's logits GEMV rides the same streaming kernel (a fp16
    7B head is ~260 MB/token of pure HBM reads). bn <= 512 keeps the head
    phase inside the megakernel's shared weight buffer (wcols)."""
    from awq_tpu.ops.w4a16 import QLinear, tile_qlinear

    head = params.get("lm_head")
    if tile and isinstance(head, QLinear) and head.qweight.ndim == 2:
        bn = next((b for b in (block_n, 512, 256, 128)
                   if b <= 512 and head.out_features % b == 0), 0)
        if bn:
            params["lm_head"] = tile_qlinear(
                jax.tree_util.tree_map(lambda a: a[None], head),
                block_n=bn, fold_scales=True,
            )
    return params


def quantize_head(params: Params, cfg: ModelConfig) -> Params:
    """Real-quantize a plain fp ``lm_head`` to the body's W4/W3 format.

    The reference keeps lm_head fp16 (``qmodule.py`` never quantizes it),
    which on Llama-3's 128k vocab streams ~1 GB/token at decode. Call
    BEFORE :func:`fuse_linears` so the head gets the stacked-of-1 folded
    tiling and runs inside the megakernel. No-op unless the body is
    quantized (bit width / group size are inferred from a body QLinear)
    and the head is a plain array whose IC is a multiple of the group
    size.
    """
    from awq_tpu.ops.w4a16 import QLinear, quantize_linear

    head = params.get("lm_head")
    if head is None or isinstance(head, QLinear):
        return params
    body = next((p for p in params["layers"].values()
                 if isinstance(p, QLinear)), None)
    if body is None or head.ndim != 2 or head.shape[0] % body.group_size:
        return params
    out = dict(params)
    out["lm_head"] = quantize_linear(
        head.astype(jnp.float32), n_bit=body.w_bit,
        group_size=body.group_size)
    return out


class KVCache8(NamedTuple):
    """int8 KV cache: data + per-(layer, kv, row, head, position) scales.

    New capability (the reference cache is fp16-only): halves cache HBM
    traffic and memory, so double the batch slots / context at the same
    footprint. Scales stay [.., T] here and are reshaped to the kernel's
    [.., T//256, 256] block layout at the call site (free, contiguous).
    """

    data: jax.Array    # int8 [L, 2, B, n_kv, T, hd]
    scales: jax.Array  # f32  [L, 2, B, n_kv, T]


def init_kv_cache8(cfg: ModelConfig, batch: int, max_seq: int) -> KVCache8:
    L, nkv, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    return KVCache8(
        data=jnp.zeros((L, 2, batch, nkv, max_seq, hd), jnp.int8),
        scales=jnp.zeros((L, 2, batch, nkv, max_seq), jnp.float32),
    )


def cache_seq_len(cache) -> int:
    """T of either a plain array cache or a KVCache8."""
    return (cache.data if isinstance(cache, KVCache8) else cache).shape[4]


def quantize_kv(k: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(row, position, head) symmetric int8 over head_dim.

    ``k``: [B, S, n_kv, hd] -> (int8 same shape, scales [B, S, n_kv]).
    """
    kf = k.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kf), axis=-1)
    s = jnp.maximum(absmax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(kf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
) -> jax.Array:
    """Preallocated static KV cache ``[L, 2, B, n_kv, T, hd]`` (counterpart
    of the per-layer cache buffers at ``tinychat/models/llama.py:128-155``;
    head-major so each head's [T, hd] slab is HBM-contiguous for the
    flash-decode kernel's DMAs)."""
    return jnp.zeros(
        (cfg.num_layers, 2, batch, cfg.num_kv_heads, max_seq, cfg.head_dim),
        dtype,
    )


def _norm(cfg: ModelConfig, x, weight, bias):
    if cfg.norm == "rmsnorm":
        return rms_norm(x, weight, cfg.rms_eps)
    return layer_norm(x, weight, bias, cfg.rms_eps)


def _embed_ln(cfg: ModelConfig, params: Params, h: jax.Array) -> jax.Array:
    """Bloom's ``word_embeddings_layernorm`` — a LayerNorm applied to the
    embedding output before the decoder stack (reference handles it in
    ``pre_quant.py`` ``get_blocks``/``move_embed`` for BloomForCausalLM)."""
    if not cfg.embed_ln:
        return h
    return layer_norm(h, params["embed_ln_w"], params.get("embed_ln_b"),
                      cfg.rms_eps).astype(h.dtype)


def _embed_lookup(params: Params, cfg: ModelConfig, ids: jax.Array, dt,
                  tp_axis: Optional[str]) -> jax.Array:
    """Token embedding lookup, shared by every forward/decode entry.

    Under explicit TP with a vocab-sharded table: local masked lookup,
    then psum — rows outside this shard contribute zeros (Megatron
    embedding-parallel)."""
    if tp_axis is not None and params["embed"].shape[0] != cfg.vocab_size:
        emb = params["embed"]
        shard = emb.shape[0]
        loc = ids - jax.lax.axis_index(tp_axis) * shard
        ok = (loc >= 0) & (loc < shard)
        h = jnp.where(ok[..., None], emb[jnp.clip(loc, 0, shard - 1)], 0)
        return jax.lax.psum(h, tp_axis).astype(dt)
    return params["embed"][ids].astype(dt)


def _apply_rem(layers_all, name, idx, xx, out):
    """Append the ``<name>_rem`` tail — fuse_linears' layout-time split
    of an OC with no 128-lane tile width (falcon-7b-class shapes) —
    onto the main kernel output. No-op for every other arch."""
    rem = layers_all.get(name + "_rem")
    if rem is None:
        return out
    from awq_tpu.ops.w4a16 import qlinear_apply_stacked

    return jnp.concatenate(
        [out, qlinear_apply_stacked(rem, idx, xx).astype(out.dtype)],
        axis=-1)


def _lin_row_fn(layers_all, tp_axis: Optional[str], lin, a8: bool = False):
    """Build the row-parallel linear apply shared by every decode/verify
    entry: the IC-sharded contraction yields a partial sum -> psum over
    ``tp_axis``, with the (replicated) bias added AFTER the psum — once,
    not tp times. ``lin`` is the local non-collective apply returned
    unchanged when ``tp_axis`` is None."""
    if tp_axis is None:
        return lin
    import dataclasses as _dc

    from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked

    def lin_row(name, idx, xx):
        p = layers_all[name]
        bias = None
        if isinstance(p, QLinear):
            if p.bias is not None:
                bias, p = p.bias[idx], _dc.replace(p, bias=None)
            out = qlinear_apply_stacked(
                p, idx, xx, a8=a8,
                w8stack=layers_all.get(name + "_w8") if a8 else None)
        else:
            lp1 = jax.tree_util.tree_map(lambda a: a[idx], p)
            if getattr(lp1, "b", None) is not None:
                bias, lp1 = lp1.b, _dc.replace(lp1, b=None)
            out = linear_apply(lp1, xx)
        out = jax.lax.psum(out, tp_axis)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out

    return lin_row


def _head_logits(params: Params, h: jax.Array, dt) -> jax.Array:
    """Final-normed hidden states -> f32 logits, dispatching on the head
    format (tied embedding / stacked-of-1 tiled QLinear / plain QLinear /
    fp matrix). The single place this dispatch lives — forward, the
    batched decode step, and the batched-megakernel branch all share it."""
    from awq_tpu.ops.w4a16 import QLinear, qlinear_apply

    head = params.get("lm_head")
    if head is None:
        return jnp.matmul(h, params["embed"].astype(dt).T,
                          preferred_element_type=jnp.float32)
    if isinstance(head, QLinear):
        if head.qweight.ndim == 4:      # stacked-of-1 tiled (fuse_linears)
            from awq_tpu.ops.w4a16 import qlinear_apply_stacked

            return qlinear_apply_stacked(head, jnp.int32(0),
                                         h).astype(jnp.float32)
        return qlinear_apply(head, h).astype(jnp.float32)
    return jnp.matmul(h, head.astype(dt),
                      preferred_element_type=jnp.float32)


def _layer_forward(
    cfg: ModelConfig,
    lp: Params,                # single-layer params (no leading L)
    h: jax.Array,              # [B, S, H]
    kv: jax.Array,             # [2, B, n_kv, T, hd]
    start_pos: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,      # [S]
    attn_bias: Optional[jax.Array] = None,  # alibi [n_q, 1, T]
) -> Tuple[jax.Array, jax.Array]:
    b, s, _ = h.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def la(name, xx):
        out = linear_apply(lp[name], xx)
        rem = lp.get(name + "_rem")   # fuse_linears' OC-remainder split
        if rem is not None:
            out = jnp.concatenate(
                [out, linear_apply(rem, xx).astype(out.dtype)], axis=-1)
        return out

    x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
    if "wqkv" in lp:
        qkv = la("wqkv", x)
        q, k, v = jnp.split(qkv, [nq * hd, (nq + nkv) * hd], axis=-1)
        q = q.reshape(b, s, nq, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
    else:
        q = la("wq", x).reshape(b, s, nq, hd)
        k = la("wk", x).reshape(b, s, nkv, hd)
        v = la("wv", x).reshape(b, s, nkv, hd)
    if cfg.pos_embed == "rope":
        q, k = apply_rope(q, k, cos, sin, positions)
    k_cache, v_cache = update_kv_cache(kv[0], kv[1], k, v, start_pos)
    attn = attention(q, k_cache, v_cache, start_pos, bias=attn_bias)
    attn_out = la("wo", attn)

    if cfg.parallel_block:
        # falcon/neox: both branches read (pre-)norms of the SAME input and
        # sum into one residual (falcon-7b reuses ln1 for both, single_ln)
        xm = x if cfg.single_ln else _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
    else:
        h = h + attn_out
        xm = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
    if "wgateup" in lp:
        gu = la("wgateup", xm)
        g, u = jnp.split(gu, 2, axis=-1)
        hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        m = la("down", hm)
    elif "up_rem" in lp or "down_rem" in lp:
        # OC-remainder split layouts (falcon-7b-class): apply via la(),
        # mirroring mlp_gelu's act dispatch AND the AWQ act_scale fold
        hm = la("up", xm)
        if cfg.act == "relu":
            hm = jnp.maximum(hm, 0)
        else:
            hm = jax.nn.gelu(hm.astype(jnp.float32),
                             approximate=(cfg.act == "gelu_tanh")
                             ).astype(xm.dtype)
        if lp.get("act_scale") is not None:
            hm = (hm.astype(jnp.float32)
                  / lp["act_scale"]).astype(hm.dtype)
        m = la("down", hm)
    elif cfg.act == "silu":
        m = mlp_swiglu(lp["gate"], lp["up"], lp["down"], xm)
    else:
        m = mlp_gelu(lp["up"], lp["down"], xm, act=cfg.act,
                     act_scale=lp.get("act_scale"))
    if cfg.parallel_block:
        h = h + attn_out + m
    else:
        h = h + m
    return h, jnp.stack([k_cache, v_cache])


@functools.partial(jax.jit, static_argnames=("cfg", "last_only", "tp_axis"))
def forward(
    params: Params,
    cfg: ModelConfig,
    tokens: jax.Array,          # [B, S] int32
    cache: jax.Array,           # [L, 2, B, n_kv, T, hd]
    start_pos: jax.Array,       # scalar int32
    last_only: bool = True,
    inputs_embeds: Optional[jax.Array] = None,  # [B, S, H] (VLM splicing)
    tp_axis: Optional[str] = None,
    alibi_slopes: Optional[jax.Array] = None,   # [n_q local] under tp
) -> Tuple[jax.Array, jax.Array]:
    """Run the decoder; returns ``(logits, new_cache)``.

    ``last_only=True`` computes logits for the final position only
    (prefill fast path, reference ``llama.py:353``); ``False`` returns
    ``[B, S, V]`` for perplexity evaluation. ``inputs_embeds`` bypasses the
    token embedding (multimodal splicing; reference
    ``llama.py:390-413`` takes the same optional argument).

    ``tp_axis``: set when running INSIDE ``shard_map`` over a mesh axis of
    that name (see parallel/tp.py). ``cfg`` must then be the LOCAL config
    (head counts divided by the axis size), params/cache the local shards
    (column-parallel OC shards, row-parallel IC shards, vocab-sharded
    embedding, kv-head-sharded cache), and this function inserts the
    Megatron-TP collectives itself: psum after the row-parallel wo/down
    contractions and a masked-lookup psum for the sharded embedding.
    Logits come back vocab-sharded ([B, S, V/tp] per device).
    """
    b, s = tokens.shape
    dt = _dtype(cfg)
    if inputs_embeds is not None:
        h = inputs_embeds.astype(dt)
    else:
        h = _embed_lookup(params, cfg, tokens, dt, tp_axis)
    h = _embed_ln(cfg, params, h)

    is_q8 = isinstance(cache, KVCache8)
    max_t = cache_seq_len(cache)
    cos, sin = rope_table(cfg, max_t)
    positions = start_pos + jnp.arange(s)

    if cfg.pos_embed == "learned":
        # OPT: learned positions (+2 offset quirk is OPT-specific)
        off = 2 if cfg.arch == "opt" else 0
        h = h + params["pos_embed"][positions + off][None].astype(dt)

    attn_bias = None
    slopes = None
    if cfg.pos_embed == "alibi":
        # slope*(j - i) == slope*j - (softmax-invariant per-row constant),
        # so a [n_q, 1, T] key-position bias suffices (cf. mpt.py:22-46).
        # Under explicit TP the LOCAL cfg can't derive global head
        # indices — the caller (parallel/tp.py) passes this rank's
        # slopes sliced from the global table.
        if tp_axis is not None:
            assert alibi_slopes is not None, \
                "ALiBi under tp_axis needs per-rank slopes"
            slopes = alibi_slopes
        else:
            from awq_tpu.models.layers import alibi_slopes as _aslopes

            slopes = _aslopes(cfg.num_heads)
        attn_bias = (slopes[:, None, None]
                     * jnp.arange(max_t, dtype=jnp.float32)[None, None, :])

    import os as _os

    # test hook: exercises the flash/deferred-append decode path on the
    # CPU backend via kernel interpret mode
    _force_flash = _os.environ.get("AWQ_TPU_FORCE_FLASH") == "1"
    use_stacked = (
        jax.default_backend() == "tpu" or is_q8 or _force_flash
        or tp_axis is not None
    )
    flash_ok = (
        use_stacked
        and max_t % 256 == 0
        # hd 128-multiples tile directly; hd 64 (falcon-7b / small
        # bloom) rides the kernels' PAIRED mode ([T/2, 128] cache view,
        # two half-lane dots — the reference MMHA dispatches head dims
        # 32..256). Other dims (e.g. 192) fall back to XLA attention.
        and (cfg.head_dim % 128 == 0 or cfg.head_dim == 64)
        and (jax.default_backend() == "tpu" or _force_flash)
    )
    use_flash = s == 1 and flash_ok and not (is_q8 and slopes is not None)
    use_prefill_flash = s > 1 and flash_ok and not is_q8

    use_mega = False
    mega_logits = None
    # the megakernel fuses ALL layers into one launch, so per-layer psums
    # cannot be inserted — incompatible with Megatron TP by construction
    if (use_flash and b == 1 and cfg.pos_embed in ("rope", "alibi")
            and tp_axis is None
            and (jax.default_backend() == "tpu"
                 or _os.environ.get("AWQ_TPU_FORCE_MEGAKERNEL") == "1")):
        from awq_tpu.ops.megakernel import megakernel_supported

        use_mega = (
            _os.environ.get("AWQ_TPU_DISABLE_MEGAKERNEL") != "1"
            and megakernel_supported(cfg, params["layers"], cache)
        )
    use_cmega = False
    if (not use_mega and 1 < s and b == 1 and tp_axis is None
            and cfg.pos_embed == "rope" and cfg.norm == "rmsnorm"
            and cfg.act == "silu" and not cfg.parallel_block
            and not is_q8 and jax.default_backend() == "tpu"
            and _os.environ.get("AWQ_TPU_DISABLE_MEGAKERNEL") != "1"):
        from awq_tpu.ops.megakernel_chunk import chunk_megakernel_supported

        use_cmega = chunk_megakernel_supported(cfg, params["layers"],
                                               cache, s)
    use_tpmega = False
    if (tp_axis is not None and s == 1 and b == 1
            and cfg.pos_embed == "rope" and max_t % 256 == 0
            and (jax.default_backend() == "tpu"
                 or _os.environ.get("AWQ_TPU_TP_MEGAKERNEL") == "1")
            and _os.environ.get("AWQ_TPU_DISABLE_MEGAKERNEL") != "1"):
        from awq_tpu.ops.megakernel_tp import tp_megakernel_supported

        use_tpmega = tp_megakernel_supported(cfg, params["layers"], cache)
    if use_mega:
        # whole-token megakernel: ONE Pallas call runs ALL layers
        # (norm->qkv->rope->flash-attn->o->norm->gate/up->silu->down per
        # layer, residual stream in VMEM) — see ops/megakernel.py for why
        # (per-kernel launch overheads dominated the 5-kernel/layer decode
        # step). The kernel reads the cache; layer i's attention at this
        # token only needs previous tokens (the current token's k/v live
        # in-register), so all appends collapse into ONE batched
        # dynamic_update_slice afterwards.
        from awq_tpu.ops.megakernel import w4a16_llama_token_step

        la = params["layers"]
        cos_row = cos[positions[0]]
        sin_row = sin[positions[0]]
        from awq_tpu.ops.w4a16 import QLinear as _QL0

        # run the final rmsnorm + quantized lm_head INSIDE the kernel
        # when the head is a compatible folded stacked-of-1 QLinear —
        # the whole decode model is then one launch
        mhead = params.get("lm_head")
        if not (isinstance(mhead, _QL0) and mhead.qweight.ndim == 4
                and mhead.folded and mhead.bias is None
                and mhead.tiled_bn <= 512
                and params.get("norm_b") is None
                # the head phase runs in the same unpack mode as the body
                and mhead.dense3 == la["wqkv"].dense3):
            mhead = None

        res = w4a16_llama_token_step(
            h[:, 0], la["wqkv"], la["wo"],
            la["wgateup"] if "wgateup" in la else la["up"], la["down"],
            la["ln1"], la["ln2"], cos_row, sin_row,
            cache.data if is_q8 else cache, start_pos,
            nq=cfg.num_heads, nkv=cfg.num_kv_heads, eps=cfg.rms_eps,
            cache_scales=cache.scales if is_q8 else None,
            whead=mhead,
            norm_w=params["norm"] if mhead is not None else None,
            norm=cfg.norm, act=cfg.act, pos_embed=cfg.pos_embed,
            interpret=jax.default_backend() != "tpu",
        )
        if mhead is not None:
            hn, ks_new, vs_new, mega_logits = res
        else:
            hn, ks_new, vs_new = res
            mega_logits = None
        h = hn[:, None, :]
        kv = jnp.stack([ks_new, vs_new], axis=1)[
            :, :, None, :, :]                  # [L, 2, 1, n_kv, hd] fp
        if is_q8:
            kvq, kvs = quantize_kv(kv)
            new_cache = KVCache8(
                data=jax.lax.dynamic_update_slice(
                    cache.data, kvq[..., None, :],
                    (0, 0, 0, 0, start_pos, 0)),
                scales=jax.lax.dynamic_update_slice(
                    cache.scales, kvs[..., None],
                    (0, 0, 0, 0, start_pos)),
            )
        else:
            new_cache = jax.lax.dynamic_update_slice(
                cache, kv[..., None, :].astype(cache.dtype),
                (0, 0, 0, 0, start_pos, 0),
            )
    elif use_tpmega:
        # TP half-layer megakernels: 2 Pallas launches + 2 psums per
        # layer (ops/megakernel_tp.py) — each rank streams its deploy-
        # layout shard at the single-chip streaming rate instead of
        # falling back to the 5-kernel/layer path. Appends are deferred
        # to ONE batched update after the scan, as in the token kernel.
        from awq_tpu.ops.megakernel_tp import (
            w4a16_llama_attn_half,
            w4a16_llama_mlp_half,
        )

        la = params["layers"]
        cos_row = cos[positions[0]]
        sin_row = sin[positions[0]]
        interp = jax.default_backend() != "tpu"

        def body(hrow, idx):
            o_part, k1, v1 = w4a16_llama_attn_half(
                hrow, la["wqkv"], la["wo"], la["ln1"], cos_row, sin_row,
                cache.data if is_q8 else cache, idx, start_pos,
                nq=cfg.num_heads, nkv=cfg.num_kv_heads, eps=cfg.rms_eps,
                cache_scales=cache.scales if is_q8 else None,
                interpret=interp,
            )
            h1 = hrow.astype(jnp.float32) + jax.lax.psum(o_part, tp_axis)
            m_part = w4a16_llama_mlp_half(
                h1, la["wgateup"], la["down"], la["ln2"], idx,
                eps=cfg.rms_eps, interpret=interp,
            )
            hn = h1 + jax.lax.psum(m_part, tp_axis)
            return hn.astype(dt), (k1, v1)

        hrow, (ks_new, vs_new) = jax.lax.scan(
            body, h[:, 0], jnp.arange(cfg.num_layers))
        h = hrow[:, None, :]
        kv = jnp.stack([ks_new, vs_new], axis=1)[
            :, :, None, :, :]                  # [L, 2, 1, n_kv, hd] fp
        if is_q8:
            kvq, kvs = quantize_kv(kv)
            new_cache = KVCache8(
                data=jax.lax.dynamic_update_slice(
                    cache.data, kvq[..., None, :],
                    (0, 0, 0, 0, start_pos, 0)),
                scales=jax.lax.dynamic_update_slice(
                    cache.scales, kvs[..., None],
                    (0, 0, 0, 0, start_pos)),
            )
        else:
            new_cache = jax.lax.dynamic_update_slice(
                cache, kv[..., None, :].astype(cache.dtype),
                (0, 0, 0, 0, start_pos, 0),
            )
    elif use_cmega:
        # chunked-prefill megakernel: a <=32-token window of ONE sequence
        # (the multi-round chat path) runs all layers in one launch —
        # the 5-kernel/layer prefill stack was launch-bound at this size
        # (ops/megakernel_chunk.py). Pad rows sit at the END; the causal
        # tail keeps them out of real rows, and only the first s k/v
        # rows are appended.
        from awq_tpu.ops.megakernel_chunk import (
            CHUNK_S,
            w4a16_llama_chunk_step,
        )

        la = params["layers"]
        pad = CHUNK_S - s
        hw = h[0]
        if pad:
            hw = jnp.concatenate(
                [hw, jnp.zeros((pad, hw.shape[-1]), hw.dtype)], axis=0)
        pos_w = jnp.clip(start_pos + jnp.arange(CHUNK_S), 0,
                         cos.shape[0] - 1)
        hn, kn, vn = w4a16_llama_chunk_step(
            hw, la["wqkv"], la["wo"], la["wgateup"], la["down"],
            la["ln1"], la["ln2"], cos[pos_w], sin[pos_w], cache,
            start_pos, nq=cfg.num_heads, nkv=cfg.num_kv_heads,
            eps=cfg.rms_eps,
        )
        h = hn[:s][None]
        kv = jnp.stack([kn[:, :, :s], vn[:, :, :s]],
                       axis=1)[:, :, None]        # [L, 2, 1, n_kv, s, hd]
        new_cache = jax.lax.dynamic_update_slice(
            cache, kv.astype(cache.dtype), (0, 0, 0, 0, start_pos, 0),
        )
    elif use_stacked:
        # The cache rides through the scan as a carry; packed weights stay
        # stacked and are indexed INSIDE the Pallas kernels via scalar
        # prefetch — a per-layer slice outside the kernel would be
        # materialized as a full copy per layer per call (custom-call
        # operands can't alias a dynamic slice). Decode (s==1) attends with
        # the flash kernel; prefill uses the masked XLA attention on a
        # cache slice (slices feeding XLA fusions don't materialize).
        from awq_tpu.ops.decode_attn import flash_decode_stacked
        from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked

        layers_all = params["layers"]
        small = {k2: v for k2, v in layers_all.items()
                 if isinstance(v, jax.Array)}
        # W4A8 prefill: int8-activation matmuls at 2x MXU rate (opt-in
        # via cfg.prefill_a8 — a cfg field so the jit cache keys on it);
        # decode stays W4A16
        a8 = s > 1 and cfg.prefill_a8

        def lin(name, idx, xx):
            p = layers_all[name]
            if isinstance(p, QLinear):
                out = qlinear_apply_stacked(
                    p, idx, xx, a8=a8,
                    w8stack=layers_all.get(name + "_w8") if a8 else None)
                return _apply_rem(layers_all, name, idx, xx, out)
            lp1 = jax.tree_util.tree_map(lambda a: a[idx], p)
            return linear_apply(lp1, xx)

        lin_row = _lin_row_fn(layers_all, tp_axis, lin, a8=a8)

        # flash decode takes the current token's k/v in-register, so the
        # append can be DEFERRED out of the scan: one batched update for
        # all layers instead of 32 per-layer scatters (for int8 this also
        # batches the quantize — the per-layer quantize+append was a
        # measured ~2 ms/token overhead at batch 1)
        defer_append = s == 1 and use_flash

        def body(carry, idx):
            h, cache = carry
            lp = {k2: v[idx] for k2, v in small.items() if v is not None}
            x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
            nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            if "wqkv" in layers_all:
                qkv = lin("wqkv", idx, x)
                q, k, v = jnp.split(qkv, [nq * hd, (nq + nkv) * hd], axis=-1)
                q = q.reshape(b, s, nq, hd)
                k = k.reshape(b, s, nkv, hd)
                v = v.reshape(b, s, nkv, hd)
            else:
                q = lin("wq", idx, x).reshape(b, s, nq, hd)
                k = lin("wk", idx, x).reshape(b, s, nkv, hd)
                v = lin("wv", idx, x).reshape(b, s, nkv, hd)
            if cfg.pos_embed == "rope":
                q, k = apply_rope(q, k, cos, sin, positions)
            # append in XLA (in-place on the scan carry)
            if defer_append:
                pass
            elif is_q8:
                kq, ks_ = quantize_kv(k)
                vq, vs_ = quantize_kv(v)
                data = jax.lax.dynamic_update_slice(
                    cache.data,
                    jnp.stack([jnp.swapaxes(kq, 1, 2),
                               jnp.swapaxes(vq, 1, 2)])[None],
                    (idx, 0, 0, 0, start_pos, 0),
                )
                sc = jax.lax.dynamic_update_slice(
                    cache.scales,
                    jnp.stack([jnp.swapaxes(ks_, 1, 2),
                               jnp.swapaxes(vs_, 1, 2)])[None],
                    (idx, 0, 0, 0, start_pos),
                )
                cache = KVCache8(data, sc)
            else:
                kv_new = jnp.stack([
                    jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
                ])[None].astype(cache.dtype)          # [1,2,B,n_kv,S,hd]
                cache = jax.lax.dynamic_update_slice(
                    cache, kv_new, (idx, 0, 0, 0, start_pos, 0)
                )
            if use_flash and is_q8:
                from awq_tpu.ops.decode_attn import flash_decode_stacked8

                attn = flash_decode_stacked8(
                    q[:, 0], k[:, 0], v[:, 0], cache.data,
                    cache.scales.reshape(*cache.scales.shape[:4],
                                         max_t // 256, 256),
                    idx, start_pos,
                    interpret=jax.default_backend() != "tpu",
                ).reshape(b, 1, nq * hd)
            elif use_flash:
                # prefix = start_pos; the current token rides in-register
                attn = flash_decode_stacked(
                    q[:, 0], k[:, 0], v[:, 0], cache, idx, start_pos,
                    interpret=jax.default_backend() != "tpu",
                    slopes=slopes,
                ).reshape(b, 1, nq * hd)
            elif use_prefill_flash:
                from awq_tpu.ops.decode_attn import (flash_prefill_stacked,
                                                     prefill_fixed_max)

                attn = flash_prefill_stacked(
                    q, cache, idx, start_pos,
                    interpret=jax.default_backend() != "tpu",
                    slopes=slopes, fixed_max=prefill_fixed_max(),
                )
            elif is_q8:
                kc = (cache.data[idx, 0].astype(jnp.float32)
                      * cache.scales[idx, 0][..., None]).astype(dt)
                vc = (cache.data[idx, 1].astype(jnp.float32)
                      * cache.scales[idx, 1][..., None]).astype(dt)
                attn = attention(q, kc, vc, start_pos, bias=attn_bias)
            else:
                attn = attention(q, cache[idx, 0], cache[idx, 1],
                                 start_pos, bias=attn_bias)
            attn_out = lin_row("wo", idx, attn)
            if cfg.parallel_block:
                xm = x if cfg.single_ln else _norm(
                    cfg, h, lp["ln2"], lp.get("ln2_b"))
            else:
                h = h + attn_out
                xm = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
            if "wgateup" in layers_all:
                gu = lin("wgateup", idx, xm)
                g, u = jnp.split(gu, 2, axis=-1)
                hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
            elif cfg.act == "silu":
                g = lin("gate", idx, xm)
                u = lin("up", idx, xm)
                hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
            else:
                hm = lin("up", idx, xm)
                if cfg.act == "relu":
                    hm = jnp.maximum(hm, 0)
                else:
                    hm = jax.nn.gelu(
                        hm.astype(jnp.float32),
                        approximate=(cfg.act == "gelu_tanh"),
                    ).astype(xm.dtype)
                if lp.get("act_scale") is not None:
                    hm = (hm.astype(jnp.float32)
                          / lp["act_scale"]).astype(hm.dtype)
            m = lin_row("down", idx, hm)
            h = (h + attn_out + m) if cfg.parallel_block else (h + m)
            ys = (k[:, 0], v[:, 0]) if defer_append else None
            return (h, cache), ys

        (h, new_cache), kv_all = jax.lax.scan(
            body, (h, cache), jnp.arange(cfg.num_layers)
        )
        if defer_append:
            ks_new, vs_new = kv_all            # [L, b, n_kv, hd] each
            kv = jnp.stack([ks_new, vs_new], axis=1)  # [L, 2, b, n_kv, hd]
            if is_q8:
                kvq, kvs = quantize_kv(kv)
                new_cache = KVCache8(
                    data=jax.lax.dynamic_update_slice(
                        new_cache.data, kvq[..., None, :],
                        (0, 0, 0, 0, start_pos, 0)),
                    scales=jax.lax.dynamic_update_slice(
                        new_cache.scales, kvs[..., None],
                        (0, 0, 0, 0, start_pos)),
                )
            else:
                new_cache = jax.lax.dynamic_update_slice(
                    new_cache, kv[..., None, :].astype(new_cache.dtype),
                    (0, 0, 0, 0, start_pos, 0),
                )
    else:
        def body(h, lp_kv):
            lp, kv = lp_kv
            h, kv = _layer_forward(
                cfg, lp, h, kv, start_pos, cos, sin, positions, attn_bias
            )
            return h, kv

        h, new_cache = jax.lax.scan(body, h, (params["layers"], cache))

    if mega_logits is not None:
        # final norm + lm_head already ran inside the token kernel
        return mega_logits[:, None, :], new_cache
    if last_only:
        h = h[:, -1:, :]
    h = _norm(cfg, h, params["norm"], params.get("norm_b"))
    return _head_logits(params, h, dt), new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"),
                   donate_argnums=(3,))
def decode_step_batched(
    params: Params,
    cfg: ModelConfig,
    tokens: jax.Array,          # [B] one token per row
    cache: jax.Array,           # [L, 2, B, n_kv, T, hd]
    lengths: jax.Array,         # [B] current per-row lengths (write pos)
    tp_axis: Optional[str] = None,
    alibi_slopes: Optional[jax.Array] = None,   # [n_q local] under tp
) -> Tuple[jax.Array, jax.Array]:
    """One decode step with PER-ROW positions — the continuous-batching
    step (new capability; the reference engine is batch-1). Returns
    ``(logits [B, V], cache)``. Rows write/read at their own lengths.

    ``tp_axis``: running inside ``shard_map`` (parallel/tp.py) with the
    LOCAL cfg/shards, same contract as :func:`forward` — Megatron psums
    after wo/down, masked-psum embedding, vocab-sharded logits out."""
    b = tokens.shape[0]
    dt = _dtype(cfg)
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = _embed_lookup(params, cfg, tokens, dt, tp_axis)[:, None]
    h = _embed_ln(cfg, params, h)                        # [B, 1, H]
    is_q8 = isinstance(cache, KVCache8)
    max_t = cache_seq_len(cache)
    cos, sin = rope_table(cfg, max_t)
    positions = lengths[:, None]                         # [B, 1]

    if cfg.pos_embed == "learned":
        off = 2 if cfg.arch == "opt" else 0
        h = h + params["pos_embed"][positions + off].astype(dt)

    on_tpu = jax.default_backend() == "tpu"
    import os as _os0

    _force = _os0.environ.get("AWQ_TPU_FORCE_FLASH") == "1"
    use_flash = ((on_tpu or _force) and max_t % 256 == 0
                 and (hd % 128 == 0 or hd == 64)
                 and (cfg.pos_embed in ("rope", "none", "learned")
                      or (cfg.pos_embed == "alibi" and not is_q8)))
    layers_all = params["layers"]
    from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked

    # batched whole-token megakernel: the 5-kernel/layer batched step is
    # launch-bound (~160 launches/step at L=32); one launch streams each
    # weight block ONCE for the whole batch (ops/megakernel_batched.py)
    import os as _os

    use_bmega = False
    if (on_tpu and cfg.pos_embed == "rope"
            and cfg.norm == "rmsnorm" and cfg.act == "silu"
            and not cfg.parallel_block and tp_axis is None
            and _os.environ.get("AWQ_TPU_DISABLE_MEGAKERNEL") != "1"):
        from awq_tpu.ops.megakernel_batched import (
            megakernel_batched_supported,
        )

        use_bmega = megakernel_batched_supported(cfg, layers_all, cache, b)
    if use_bmega:
        from awq_tpu.ops.cache_append import batched_cache_append
        from awq_tpu.ops.megakernel_batched import (
            w4a16_llama_token_step_batched,
        )
        from awq_tpu.ops.w4a16 import qlinear_apply as _qla
        from awq_tpu.ops.w4a16 import qlinear_apply_stacked as _qlas

        la = layers_all
        mhead = params.get("lm_head")
        if not (isinstance(mhead, QLinear) and mhead.qweight.ndim == 4
                and mhead.folded and mhead.bias is None
                and mhead.tiled_bn <= 512
                and mhead.dense3 == la["wqkv"].dense3):
            mhead = None
        res = w4a16_llama_token_step_batched(
            h[:, 0], la["wqkv"], la["wo"], la["wgateup"], la["down"],
            la["ln1"], la["ln2"], cos[lengths], sin[lengths],
            cache.data if is_q8 else cache, lengths,
            nq=nq, nkv=nkv, eps=cfg.rms_eps,
            whead=mhead,
            norm_w=params["norm"] if mhead is not None else None,
            cache_scales=(cache.scales.reshape(
                *cache.scales.shape[:4], max_t // 256, 256)
                if is_q8 else None),
        )
        if mhead is not None:
            h_new, kn, vn, logits = res
        else:
            h_new, kn, vn = res
        kv_all = jnp.stack([kn, vn], axis=1)       # [L, 2, B, n_kv, hd]
        if is_q8:
            kvq, kvs = quantize_kv(kv_all)
            # B dynamic_update_slice writes, as in the scan path below
            # (advanced-index scatters on the multi-GB cache take XLA
            # minutes to compile)
            for i in range(b):
                qrow = kvq[:, :, i][:, :, None, :, None, :]
                srow = kvs[:, :, i][:, :, None, :, None]
                cache = KVCache8(
                    data=jax.lax.dynamic_update_slice(
                        cache.data, qrow, (0, 0, i, 0, lengths[i], 0)),
                    scales=jax.lax.dynamic_update_slice(
                        cache.scales, srow, (0, 0, i, 0, lengths[i])),
                )
        else:
            cache = batched_cache_append(
                cache, kv_all.astype(cache.dtype), lengths)
        if mhead is None:
            hn = _norm(cfg, h_new, params["norm"], params.get("norm_b"))
            logits = _head_logits(params, hn, dt)
        return logits, cache

    small = {k2: v for k2, v in layers_all.items()
             if isinstance(v, jax.Array)}

    def lin(name, idx, xx):
        p = layers_all[name]
        # _rem layouts must go through the stacked apply on every
        # backend (the plain tree_map path would drop the tail columns)
        if isinstance(p, QLinear) and (on_tpu
                                       or name + "_rem" in layers_all):
            return _apply_rem(layers_all, name, idx, xx,
                              qlinear_apply_stacked(p, idx, xx))
        lp1 = jax.tree_util.tree_map(lambda a: a[idx], p)
        return linear_apply(lp1, xx)

    lin_row = _lin_row_fn(layers_all, tp_axis, lin)

    rows = jnp.arange(b)
    if cfg.pos_embed == "alibi":
        # per-head linear key-position bias (forward() applies the same
        # via attn_bias; without it mpt/bloom decode is silently wrong).
        # Under tp the caller passes THIS rank's slopes (local cfg can't
        # derive global head indices).
        if tp_axis is not None:
            assert alibi_slopes is not None, \
                "ALiBi under tp_axis needs per-rank slopes"
            sl_flat = alibi_slopes
        else:
            from awq_tpu.models.layers import alibi_slopes as _aslopes

            sl_flat = _aslopes(cfg.num_heads)
        slopes = sl_flat.reshape(
            cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads)
    else:
        slopes = None

    def xla_attn(q, k_new, v_new, kc, vc):
        # [B,1,nq,hd] x cache prefix [B,n_kv,T,hd] (strict per-row masks)
        # + the current token's k/v appended as an extra column
        groups = nq // nkv
        qf = q.reshape(b, nkv, groups, hd).astype(jnp.float32)
        scores = jnp.einsum("bkgh,bkth->bkgt", qf,
                            kc.astype(jnp.float32)) / jnp.sqrt(hd)
        if slopes is not None:
            scores = scores + (slopes[None, :, :, None]
                               * jnp.arange(max_t, dtype=jnp.float32)[
                                   None, None, None, :])
        mask = jnp.arange(max_t)[None, None, None, :] < \
            lengths[:, None, None, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        s_cur = jnp.einsum("bkgh,bkh->bkg", qf,
                           k_new.astype(jnp.float32))[..., None] \
            / jnp.sqrt(hd)
        if slopes is not None:
            s_cur = s_cur + (slopes[None, :, :, None]
                             * lengths[:, None, None, None].astype(
                                 jnp.float32))
        scores = jnp.concatenate([scores, s_cur], axis=-1)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgt,bkth->bkgh", p[..., :-1],
                       vc.astype(jnp.float32)) \
            + p[..., -1:] * v_new.astype(jnp.float32)[:, :, None, :]
        return o.reshape(b, 1, nq * hd).astype(dt)

    def body(carry, idx):
        h, cache = carry
        lp = {k2: v[idx] for k2, v in small.items() if v is not None}
        x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
        if "wqkv" in layers_all:
            qkv = lin("wqkv", idx, x)
            q, k, v = jnp.split(qkv, [nq * hd, (nq + nkv) * hd], axis=-1)
            q = q.reshape(b, 1, nq, hd)
            k = k.reshape(b, 1, nkv, hd)
            v = v.reshape(b, 1, nkv, hd)
        else:
            q = lin("wq", idx, x).reshape(b, 1, nq, hd)
            k = lin("wk", idx, x).reshape(b, 1, nkv, hd)
            v = lin("wv", idx, x).reshape(b, 1, nkv, hd)
        if cfg.pos_embed == "rope":
            q, k = apply_rope(q, k, cos, sin, positions)
        # cache append is DEFERRED: the flash kernel takes the current
        # token in-register, and all layers' k/v are scattered into the
        # cache in ONE op after the scan (32 per-row scatters inside the
        # scan explode XLA compile time)
        if use_flash and is_q8:
            from awq_tpu.ops.decode_attn import flash_decode_stacked8

            attn = flash_decode_stacked8(
                q[:, 0], k[:, 0], v[:, 0], cache.data,
                cache.scales.reshape(*cache.scales.shape[:4],
                                     max_t // 256, 256),
                idx, lengths, interpret=not on_tpu,
            ).reshape(b, 1, nq * hd)
        elif use_flash:
            from awq_tpu.ops.decode_attn import flash_decode_stacked

            attn = flash_decode_stacked(
                q[:, 0], k[:, 0], v[:, 0], cache, idx, lengths,
                slopes=slopes, interpret=not on_tpu,
            ).reshape(b, 1, nq * hd)
        elif is_q8:
            kc = (cache.data[idx, 0].astype(jnp.float32)
                  * cache.scales[idx, 0][..., None]).astype(dt)
            vc = (cache.data[idx, 1].astype(jnp.float32)
                  * cache.scales[idx, 1][..., None]).astype(dt)
            attn = xla_attn(q, k[:, 0], v[:, 0], kc, vc)
        else:
            attn = xla_attn(q, k[:, 0], v[:, 0], cache[idx, 0],
                            cache[idx, 1])
        attn_out = lin_row("wo", idx, attn)
        if cfg.parallel_block:
            xm = x if cfg.single_ln else _norm(cfg, h, lp["ln2"],
                                               lp.get("ln2_b"))
        else:
            h = h + attn_out
            xm = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
        if "wgateup" in layers_all:
            gu = lin("wgateup", idx, xm)
            g, u = jnp.split(gu, 2, axis=-1)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        elif cfg.act == "silu":
            g = lin("gate", idx, xm)
            u = lin("up", idx, xm)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        else:
            hm = lin("up", idx, xm)
            if cfg.act == "relu":
                hm = jnp.maximum(hm, 0)
            else:
                hm = jax.nn.gelu(
                    hm.astype(jnp.float32),
                    approximate=(cfg.act == "gelu_tanh"),
                ).astype(xm.dtype)
            if lp.get("act_scale") is not None:
                hm = (hm.astype(jnp.float32) / lp["act_scale"]
                      ).astype(hm.dtype)
        m = lin_row("down", idx, hm)
        h = (h + attn_out + m) if cfg.parallel_block else (h + m)
        if is_q8:
            kq, ks_ = quantize_kv(k)                  # [B,1,n_kv,*]
            vq, vs_ = quantize_kv(v)
            kv_new = (jnp.stack([kq[:, 0], vq[:, 0]]),
                      jnp.stack([ks_[:, 0], vs_[:, 0]]))
        else:
            kv_new = jnp.stack([k[:, 0], v[:, 0]]).astype(cache.dtype)
        return (h, cache), kv_new                     # ys: [2, B, n_kv, hd]

    (h, cache), kv_all = jax.lax.scan(
        body, (h, cache), jnp.arange(cfg.num_layers)
    )
    # append every layer's k/v after the scan
    if is_q8:
        # B static dynamic_update_slice writes (one per row at its own
        # position) — advanced-index scatters on the multi-GB cache take
        # XLA minutes to compile
        for i in range(b):                            # kv_all [L,2,B,n_kv,..]
            qrow = kv_all[0][:, :, i][:, :, None, :, None, :]
            srow = kv_all[1][:, :, i][:, :, None, :, None]
            cache = KVCache8(
                data=jax.lax.dynamic_update_slice(
                    cache.data, qrow, (0, 0, i, 0, lengths[i], 0)),
                scales=jax.lax.dynamic_update_slice(
                    cache.scales, srow, (0, 0, i, 0, lengths[i])),
            )
    elif jax.default_backend() == "tpu":
        # ONE Pallas scatter for all rows/layers (ops/cache_append.py) —
        # the O(B) slice loop re-emits B separate fusions over the
        # multi-GB cache every step
        from awq_tpu.ops.cache_append import batched_cache_append

        cache = batched_cache_append(cache, kv_all, lengths)
    else:
        for i in range(b):
            row = kv_all[:, :, i][:, :, None, :, None, :]  # [L,2,1,n_kv,1,hd]
            cache = jax.lax.dynamic_update_slice(
                cache, row.astype(cache.dtype), (0, 0, i, 0, lengths[i], 0)
            )
    h = _norm(cfg, h, params["norm"], params.get("norm_b"))
    return _head_logits(params, h, dt)[:, 0], cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"),
                   donate_argnums=(3,))
def verify_step_batched(
    params: Params,
    cfg: ModelConfig,
    windows: jax.Array,         # [B, W] int32: [cur_token, d1..d_{W-1}]
    cache,                      # [L, 2, B, n_kv, T, hd] fp or KVCache8
    lengths: jax.Array,         # [B] per-row write positions
    tp_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One speculative VERIFY step for a batch: every row's ``W``-token
    window forwards at its own positions, returning ``logits [B, W, V]``
    (all positions — the caller accepts the longest prefix where
    ``argmax(logits[:, j-1]) == windows[:, j]``).

    The batched sibling of the verify forward in
    ``runtime/speculative.py`` (which rides batch-1 ``forward``); rows at
    different lengths verify together, which is where free accepted
    tokens multiply. KV rows for all W positions are written
    optimistically — the static cache masks by length, so rejected rows
    are dead until overwritten (same rollback-free design as batch-1).
    No reference counterpart: TinyChat decodes one token per forward.

    ``tp_axis``: running inside ``shard_map`` with LOCAL cfg/shards, same
    contract as :func:`decode_step_batched` — Megatron psums after
    wo/down, masked-psum embedding, vocab-sharded logits out. An int8
    ``KVCache8`` composes too: window k/v rows quantize before append and
    the prefix dequantizes in the attention read.
    """
    b, w = windows.shape
    dt = _dtype(cfg)
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    is_q8 = isinstance(cache, KVCache8)
    max_t = cache_seq_len(cache)
    h = _embed_lookup(params, cfg, windows, dt, tp_axis)  # [B, W, H]
    h = _embed_ln(cfg, params, h)
    cos, sin = rope_table(cfg, max_t)
    positions = lengths[:, None] + jnp.arange(w)[None]   # [B, W]

    if cfg.pos_embed == "learned":
        off = 2 if cfg.arch == "opt" else 0
        h = h + params["pos_embed"][positions + off].astype(dt)
    assert cfg.pos_embed in ("rope", "learned", "none"), cfg.pos_embed

    on_tpu = jax.default_backend() == "tpu"
    layers_all = params["layers"]
    from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked

    small = {k2: v for k2, v in layers_all.items()
             if isinstance(v, jax.Array)}

    def lin(name, idx, xx):
        p = layers_all[name]
        # _rem layouts must go through the stacked apply on every
        # backend (the plain tree_map path would drop the tail columns)
        if isinstance(p, QLinear) and (on_tpu
                                       or name + "_rem" in layers_all):
            return _apply_rem(layers_all, name, idx, xx,
                              qlinear_apply_stacked(p, idx, xx))
        lp1 = jax.tree_util.tree_map(lambda a: a[idx], p)
        return linear_apply(lp1, xx)

    lin_row = _lin_row_fn(layers_all, tp_axis, lin)

    def xla_attn(q, k_new, v_new, kc, vc, ksc=None, vsc=None):
        """q/k_new/v_new [B, W, n*, hd]; prefix cache kc/vc
        [B, n_kv, T, hd] (int8 with per-position scales ksc/vsc
        [B, n_kv, T] when the cache is a KVCache8). Per-row prefix mask
        (t < lengths[b]) plus an in-window causal tail."""
        groups = nq // nkv
        kcf = kc.astype(jnp.float32)
        vcf = vc.astype(jnp.float32)
        if ksc is not None:
            kcf = kcf * ksc[..., None]
            vcf = vcf * vsc[..., None]
        qf = jnp.swapaxes(q, 1, 2).reshape(b, nkv, groups, w, hd) \
            .astype(jnp.float32)
        scores = jnp.einsum("bkgwh,bkth->bkgwt", qf, kcf) / jnp.sqrt(hd)
        mask = jnp.arange(max_t)[None, None, None, None, :] < \
            lengths[:, None, None, None, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        kw = jnp.swapaxes(k_new, 1, 2).astype(jnp.float32)  # [B,nkv,W,hd]
        s_win = jnp.einsum("bkgwh,bkjh->bkgwj", qf, kw) / jnp.sqrt(hd)
        causal = jnp.arange(w)[None, :] <= jnp.arange(w)[:, None]  # [W,W] j<=i
        s_win = jnp.where(causal[None, None, None], s_win, -jnp.inf)
        scores = jnp.concatenate([scores, s_win], axis=-1)
        p = jax.nn.softmax(scores, axis=-1)
        vw = jnp.swapaxes(v_new, 1, 2).astype(jnp.float32)
        o = jnp.einsum("bkgwt,bkth->bkgwh", p[..., :max_t], vcf) \
            + jnp.einsum("bkgwj,bkjh->bkgwh", p[..., max_t:], vw)
        return jnp.swapaxes(o.reshape(b, nq, w, hd), 1, 2) \
            .reshape(b, w, nq * hd).astype(dt)

    def body(carry, idx):
        h, cache = carry
        lp = {k2: v[idx] for k2, v in small.items() if v is not None}
        x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
        if "wqkv" in layers_all:
            qkv = lin("wqkv", idx, x)
            q, k, v = jnp.split(qkv, [nq * hd, (nq + nkv) * hd], axis=-1)
            q = q.reshape(b, w, nq, hd)
            k = k.reshape(b, w, nkv, hd)
            v = v.reshape(b, w, nkv, hd)
        else:
            q = lin("wq", idx, x).reshape(b, w, nq, hd)
            k = lin("wk", idx, x).reshape(b, w, nkv, hd)
            v = lin("wv", idx, x).reshape(b, w, nkv, hd)
        if cfg.pos_embed == "rope":
            q, k = apply_rope(q, k, cos, sin, positions)
        if is_q8:
            attn = xla_attn(q, k, v, cache.data[idx, 0], cache.data[idx, 1],
                            cache.scales[idx, 0], cache.scales[idx, 1])
        else:
            attn = xla_attn(q, k, v, cache[idx, 0], cache[idx, 1])
        attn_out = lin_row("wo", idx, attn)
        if cfg.parallel_block:
            xm = x if cfg.single_ln else _norm(cfg, h, lp["ln2"],
                                               lp.get("ln2_b"))
        else:
            h = h + attn_out
            xm = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
        if "wgateup" in layers_all:
            gu = lin("wgateup", idx, xm)
            g, u = jnp.split(gu, 2, axis=-1)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        elif cfg.act == "silu":
            g = lin("gate", idx, xm)
            u = lin("up", idx, xm)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        else:
            hm = lin("up", idx, xm)
            hm = jnp.maximum(hm, 0) if cfg.act == "relu" else jax.nn.gelu(
                hm.astype(jnp.float32),
                approximate=(cfg.act == "gelu_tanh")).astype(xm.dtype)
            if lp.get("act_scale") is not None:
                hm = (hm.astype(jnp.float32) / lp["act_scale"]
                      ).astype(hm.dtype)
        m = lin_row("down", idx, hm)
        h = (h + attn_out + m) if cfg.parallel_block else (h + m)
        # [2, B, n_kv, W, hd]
        kv_new = jnp.stack([jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)])
        # q8 caches quantize AFTER the scan (scales need the fp values)
        return (h, cache), kv_new.astype(
            jnp.float32 if is_q8 else cache.dtype)

    (h, cache), kv_all = jax.lax.scan(
        body, (h, cache), jnp.arange(cfg.num_layers)
    )
    # per-row window append (B static slices; kv_all [L, 2, B, n_kv, W, hd])
    if is_q8:
        kq, sc = quantize_kv(kv_all)   # shape-agnostic over leading axes
        for i in range(b):
            cache = KVCache8(
                data=jax.lax.dynamic_update_slice(
                    cache.data, kq[:, :, i][:, :, None],
                    (0, 0, i, 0, lengths[i], 0)),
                scales=jax.lax.dynamic_update_slice(
                    cache.scales, sc[:, :, i][:, :, None],
                    (0, 0, i, 0, lengths[i])),
            )
    else:
        for i in range(b):
            row = kv_all[:, :, i][:, :, None]
            cache = jax.lax.dynamic_update_slice(
                cache, row, (0, 0, i, 0, lengths[i], 0))
    h = _norm(cfg, h, params["norm"], params.get("norm_b"))
    return _head_logits(params, h, dt), cache


@functools.partial(jax.jit, static_argnames=("cfg", "tp_axis"),
                   donate_argnums=(3,))
def decode_step_paged(
    params: Params,
    cfg: ModelConfig,
    tokens: jax.Array,          # [B] one token per row
    pool: jax.Array,            # [L, 2, n_pages, n_kv, page, hd] page pool
    tables: jax.Array,          # [B, max_pages] int32 physical page ids
    lengths: jax.Array,         # [B] current per-row lengths (write pos)
    tp_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step over a PAGED KV cache: row ``b``'s positions
    ``[0, lengths[b])`` live in pages ``tables[b]`` of the shared pool.

    The paged sibling of :func:`decode_step_batched` — HBM held per slot
    is proportional to its ACTUAL length (page granularity) instead of
    ``max_seq``, which is what lets B=32 fit on a squeezed chip. The TPU
    path reads pages via ``flash_decode_paged`` (block-table DMA); the
    XLA fallback gathers each row's pages into a contiguous view. The
    reference has no paged cache (tinychat is batch-1, static buffer);
    this follows vLLM's PagedAttention design re-derived for the
    manual-DMA flash kernel.
    """
    b = tokens.shape[0]
    dt = _dtype(cfg)
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    page = pool.shape[4]
    max_t = tables.shape[1] * page
    h = _embed_lookup(params, cfg, tokens, dt, tp_axis)[:, None]
    h = _embed_ln(cfg, params, h)                        # [B, 1, H]
    cos, sin = rope_table(cfg, max_t)
    positions = lengths[:, None]                         # [B, 1]

    if cfg.pos_embed == "learned":
        off = 2 if cfg.arch == "opt" else 0
        h = h + params["pos_embed"][positions + off].astype(dt)

    import os as _os

    on_tpu = jax.default_backend() == "tpu"
    _force = _os.environ.get("AWQ_TPU_FORCE_FLASH") == "1"
    use_flash = ((on_tpu or _force) and hd % 128 == 0 and page % 8 == 0
                 and cfg.pos_embed in ("rope", "none", "learned"))
    layers_all = params["layers"]
    from awq_tpu.ops.w4a16 import QLinear, qlinear_apply_stacked

    # paged batched megakernel (B<=16): one launch per step over the
    # page pool — block i of row b reads page tables[b, i]
    use_pmega = False
    if (on_tpu and cfg.pos_embed == "rope" and cfg.norm == "rmsnorm"
            and cfg.act == "silu" and not cfg.parallel_block
            and tp_axis is None
            and _os.environ.get("AWQ_TPU_DISABLE_MEGAKERNEL") != "1"):
        from awq_tpu.ops.megakernel_batched import (
            megakernel_paged_supported,
        )

        use_pmega = megakernel_paged_supported(cfg, layers_all, pool, b)
    if use_pmega:
        from awq_tpu.ops.megakernel_batched import (
            w4a16_llama_token_step_batched,
        )

        la = layers_all
        mhead = params.get("lm_head")
        if not (isinstance(mhead, QLinear) and mhead.qweight.ndim == 4
                and mhead.folded and mhead.bias is None
                and mhead.tiled_bn <= 512
                and mhead.dense3 == la["wqkv"].dense3):
            mhead = None
        res = w4a16_llama_token_step_batched(
            h[:, 0], la["wqkv"], la["wo"], la["wgateup"], la["down"],
            la["ln1"], la["ln2"], cos[lengths], sin[lengths],
            pool, lengths,
            nq=nq, nkv=nkv, eps=cfg.rms_eps,
            whead=mhead,
            norm_w=params["norm"] if mhead is not None else None,
            tables=tables,
        )
        if mhead is not None:
            h_new, kn, vn, logits = res
        else:
            h_new, kn, vn = res
        kv_all2 = jnp.stack([kn, vn], axis=1).astype(pool.dtype)
        rows = jnp.arange(b)
        w_pages = tables[rows, lengths // page]
        w_offs = lengths % page
        for i in range(b):
            row = kv_all2[:, :, i][:, :, None, :, None, :]
            pool = jax.lax.dynamic_update_slice(
                pool, row, (0, 0, w_pages[i], 0, w_offs[i], 0))
        if mhead is None:
            hn = _norm(cfg, h_new, params["norm"], params.get("norm_b"))
            logits = _head_logits(params, hn, dt)
        return logits, pool

    small = {k2: v for k2, v in layers_all.items()
             if isinstance(v, jax.Array)}

    def lin(name, idx, xx):
        p = layers_all[name]
        # _rem layouts must go through the stacked apply on every
        # backend (the plain tree_map path would drop the tail columns)
        if isinstance(p, QLinear) and (on_tpu
                                       or name + "_rem" in layers_all):
            return _apply_rem(layers_all, name, idx, xx,
                              qlinear_apply_stacked(p, idx, xx))
        lp1 = jax.tree_util.tree_map(lambda a: a[idx], p)
        return linear_apply(lp1, xx)

    lin_row = _lin_row_fn(layers_all, tp_axis, lin)

    if cfg.pos_embed == "alibi":
        assert tp_axis is None, "tp_axis does not support ALiBi archs"
        from awq_tpu.models.layers import alibi_slopes

        slopes = alibi_slopes(cfg.num_heads).reshape(
            cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads)
    else:
        slopes = None

    def xla_attn(q, k_new, v_new, kc, vc):
        # identical math to decode_step_batched's fallback, over the
        # gathered page view (junk beyond lengths is masked)
        groups = nq // nkv
        qf = q.reshape(b, nkv, groups, hd).astype(jnp.float32)
        scores = jnp.einsum("bkgh,bkth->bkgt", qf,
                            kc.astype(jnp.float32)) / jnp.sqrt(hd)
        if slopes is not None:
            scores = scores + (slopes[None, :, :, None]
                               * jnp.arange(max_t, dtype=jnp.float32)[
                                   None, None, None, :])
        mask = jnp.arange(max_t)[None, None, None, :] < \
            lengths[:, None, None, None]
        scores = jnp.where(mask, scores, -jnp.inf)
        s_cur = jnp.einsum("bkgh,bkh->bkg", qf,
                           k_new.astype(jnp.float32))[..., None] \
            / jnp.sqrt(hd)
        if slopes is not None:
            s_cur = s_cur + (slopes[None, :, :, None]
                             * lengths[:, None, None, None].astype(
                                 jnp.float32))
        scores = jnp.concatenate([scores, s_cur], axis=-1)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgt,bkth->bkgh", p[..., :-1],
                       vc.astype(jnp.float32)) \
            + p[..., -1:] * v_new.astype(jnp.float32)[:, :, None, :]
        return o.reshape(b, 1, nq * hd).astype(dt)

    def body(carry, idx):
        h, pool = carry
        lp = {k2: v[idx] for k2, v in small.items() if v is not None}
        x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
        if "wqkv" in layers_all:
            qkv = lin("wqkv", idx, x)
            q, k, v = jnp.split(qkv, [nq * hd, (nq + nkv) * hd], axis=-1)
            q = q.reshape(b, 1, nq, hd)
            k = k.reshape(b, 1, nkv, hd)
            v = v.reshape(b, 1, nkv, hd)
        else:
            q = lin("wq", idx, x).reshape(b, 1, nq, hd)
            k = lin("wk", idx, x).reshape(b, 1, nkv, hd)
            v = lin("wv", idx, x).reshape(b, 1, nkv, hd)
        if cfg.pos_embed == "rope":
            q, k = apply_rope(q, k, cos, sin, positions)
        if use_flash:
            from awq_tpu.ops.decode_attn import flash_decode_paged

            attn = flash_decode_paged(
                q[:, 0], k[:, 0], v[:, 0], pool, tables, idx, lengths,
                interpret=not on_tpu,
            ).reshape(b, 1, nq * hd)
        else:
            # gather this row's pages into a contiguous [B, n_kv, T, hd]
            # view; out-of-table entries (-1) clip to page 0 and are
            # masked by the lengths mask above
            kc = jnp.swapaxes(pool[idx, 0][tables], 1, 2) \
                .reshape(b, nkv, max_t, hd)
            vc = jnp.swapaxes(pool[idx, 1][tables], 1, 2) \
                .reshape(b, nkv, max_t, hd)
            attn = xla_attn(q, k[:, 0], v[:, 0], kc, vc)
        attn_out = lin_row("wo", idx, attn)
        if cfg.parallel_block:
            xm = x if cfg.single_ln else _norm(cfg, h, lp["ln2"],
                                               lp.get("ln2_b"))
        else:
            h = h + attn_out
            xm = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
        if "wgateup" in layers_all:
            gu = lin("wgateup", idx, xm)
            g, u = jnp.split(gu, 2, axis=-1)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        elif cfg.act == "silu":
            g = lin("gate", idx, xm)
            u = lin("up", idx, xm)
            hm = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        else:
            hm = lin("up", idx, xm)
            if cfg.act == "relu":
                hm = jnp.maximum(hm, 0)
            else:
                hm = jax.nn.gelu(
                    hm.astype(jnp.float32),
                    approximate=(cfg.act == "gelu_tanh"),
                ).astype(xm.dtype)
            if lp.get("act_scale") is not None:
                hm = (hm.astype(jnp.float32) / lp["act_scale"]
                      ).astype(hm.dtype)
        m = lin_row("down", idx, hm)
        h = (h + attn_out + m) if cfg.parallel_block else (h + m)
        kv_new = jnp.stack([k[:, 0], v[:, 0]]).astype(pool.dtype)
        return (h, pool), kv_new                     # ys: [2, B, n_kv, hd]

    (h, pool), kv_all = jax.lax.scan(
        body, (h, pool), jnp.arange(cfg.num_layers)
    )
    # append every layer's k/v into each row's current page after the scan
    rows = jnp.arange(b)
    w_pages = tables[rows, lengths // page]          # [B] physical page
    w_offs = lengths % page                          # [B] offset in page
    for i in range(b):
        row = kv_all[:, :, i][:, :, None, :, None, :]  # [L,2,1,n_kv,1,hd]
        pool = jax.lax.dynamic_update_slice(
            pool, row, (0, 0, w_pages[i], 0, w_offs[i], 0)
        )
    h = _norm(cfg, h, params["norm"], params.get("norm_b"))
    return _head_logits(params, h, dt)[:, 0], pool


def quantize_params(
    params: Params,
    qcfg: QuantConfig,
    clips: Optional[Dict[str, jax.Array]] = None,
    quantize_lm_head: bool = False,
) -> Params:
    """Real-quantize every decoder-layer linear to packed ``QLinear``
    (embed/lm_head stay fp by default, as in ``real_quantize_model_weight``,
    ``awq/quantize/quantizer.py:126-165``). ``quantize_lm_head`` extends
    quantization to the output head — worthwhile for 128k-vocab models
    whose fp16 head alone streams >1 GB/token. AWQ scales must already be
    folded into the weights (see awq_tpu.quant.apply)."""
    out = dict(params)
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_linear(
            params["lm_head"].astype(jnp.float32),
            n_bit=qcfg.w_bit, group_size=qcfg.group_size,
        )
    layers = dict(params["layers"])
    L = layers["ln1"].shape[0]
    for name in LAYER_LINEARS:
        if name not in layers:
            continue
        lin = layers[name]
        if not isinstance(lin, Linear):
            continue
        clip = None if clips is None else clips.get(name)

        def quant_one(w, b, c):
            return quantize_linear(
                w.astype(jnp.float32),
                n_bit=qcfg.w_bit,
                group_size=qcfg.group_size,
                bias=b,
                clip_max=c,
            )

        qls = [
            quant_one(
                lin.w[l],
                None if lin.b is None else lin.b[l],
                None if clip is None else clip[l],
            )
            for l in range(L)
        ]
        layers[name] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *qls
        )
    out["layers"] = layers
    return out
