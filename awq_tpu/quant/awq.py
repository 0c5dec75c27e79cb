"""AWQ search: activation-aware per-channel scale + weight-clip search.

Pure-JAX re-design of the reference pipeline
(``awq/quantize/pre_quant.py:102-249`` + ``auto_scale.py`` + ``auto_clip.py``):

- No forward hooks / Catcher module: our layer forward is a pure function,
  so per-linear inputs are captured by running the layer with
  ``capture=True`` and reading the returned intermediates.
- No 20x ``state_dict`` save/restore per grid point
  (``auto_scale.py:127-148``): the ratio grid is evaluated by a jitted
  ``lax.map`` whose body scales + fake-quantizes weights functionally.
- No CPU<->GPU block shuffling: blocks stream through the device
  naturally; everything is donate-able pytrees.

Semantics match the reference exactly (same grids, same loss, same
normalization ``s / sqrt(s_max s_min)``, same clip token subsampling,
same q/k skip list) so published perplexity deltas carry over.
"""

from __future__ import annotations

import dataclasses
import functools
import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig
from awq_tpu.models.layers import (
    Linear,
    apply_rope,
    attention,
    linear_apply,
    rms_norm,
    rope_table,
)
from awq_tpu.quant.core import pseudo_quantize

# ---------------------------------------------------------------------------
# results container + (de)serialization
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AwqResult:
    """Searched artifacts: the counterpart of the reference's
    ``{"scale": [...], "clip": [...]}`` dump (``awq/entry.py:215``)."""

    # (layer_idx, prev_op_name, (linear names...), scales[dim])
    scale: List[Tuple[int, str, Tuple[str, ...], np.ndarray]]
    # (layer_idx, linear_name, max_val [n_group, OC])
    clip: List[Tuple[int, str, np.ndarray]]

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(
                {"scale": self.scale, "clip": self.clip, "version": 1}, f
            )

    @staticmethod
    def load(path: str) -> "AwqResult":
        with open(path, "rb") as f:
            d = pickle.load(f)
        return AwqResult(scale=d["scale"], clip=d["clip"])


# ---------------------------------------------------------------------------
# layer-input capture
# ---------------------------------------------------------------------------


def _norm_of(cfg: ModelConfig, lp, name, x):
    from awq_tpu.models.layers import layer_norm

    if cfg.norm == "rmsnorm":
        return rms_norm(x, lp[name], cfg.rms_eps)
    return layer_norm(x, lp[name], lp.get(name + "_b"), cfg.rms_eps)


def _act_fn(cfg: ModelConfig, h):
    if cfg.act == "relu":
        return jnp.maximum(h, 0)
    approx = cfg.act == "gelu_tanh"
    return jax.nn.gelu(h.astype(jnp.float32), approximate=approx).astype(h.dtype)


def _attention_of(cfg: ModelConfig, lp, x1, cos, sin, attn_bias):
    b, s, _ = x1.shape
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = linear_apply(lp["wq"], x1).reshape(b, s, nq, hd)
    k = linear_apply(lp["wk"], x1).reshape(b, s, nkv, hd)
    v = linear_apply(lp["wv"], x1).reshape(b, s, nkv, hd)
    if cfg.pos_embed == "rope":
        q, k = apply_rope(q, k, cos, sin, jnp.arange(s))
    return attention(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), jnp.int32(0),
        bias=attn_bias,
    )


def _capture(cfg: ModelConfig, lp, h, cos, sin, attn_bias=None):
    """Run one decoder layer, returning (h_out, captured linear inputs).

    The captured dict mirrors the reference's forward hooks on every
    nn.Linear (``pre_quant.py:180-193``); ``__input__`` is the raw layer
    input (the falcon whole-layer scale group feeds on it). Structure
    mirrors ``models.llama._layer_forward`` for every supported arch.
    """
    x1 = _norm_of(cfg, lp, "ln1", h)
    attn = _attention_of(cfg, lp, x1, cos, sin, attn_bias)
    attn_out = linear_apply(lp["wo"], attn)

    if cfg.parallel_block:
        xm = x1 if cfg.single_ln else _norm_of(cfg, lp, "ln2", h)
        h_mid = h
    else:
        h_mid = h + attn_out
        xm = _norm_of(cfg, lp, "ln2", h_mid)

    caps = {"__input__": h, "wq": x1, "wk": x1, "wv": x1, "wo": attn}
    if cfg.act == "silu":
        g = linear_apply(lp["gate"], xm)
        u = linear_apply(lp["up"], xm)
        act = jax.nn.silu(g.astype(jnp.float32)).astype(xm.dtype) * u
        caps.update({"gate": xm, "up": xm, "down": act})
    else:
        u = linear_apply(lp["up"], xm)
        act = _act_fn(cfg, u)
        caps.update({"up": xm, "down": act})
    m = linear_apply(lp["down"], act)
    h_out = (h + attn_out + m) if cfg.parallel_block else (h_mid + m)
    return h_out, caps


# ---------------------------------------------------------------------------
# scale-group block functions (module2inspect counterparts)
# ---------------------------------------------------------------------------


def _attn_block_fn(cfg: ModelConfig, lp, cos, sin, attn_bias=None):
    """self_attn as a function of (wq, wk, wv): x1 -> o_proj output."""

    def fn(ws, x1):
        merged = dict(lp)
        merged.update(ws)
        return linear_apply(
            lp["wo"], _attention_of(cfg, merged, x1, cos, sin, attn_bias)
        )

    return fn


def _mlp_block_fn(cfg: ModelConfig, lp):
    if cfg.act == "silu":
        def fn(ws, x2):
            g = linear_apply(ws["gate"], x2)
            u = linear_apply(ws["up"], x2)
            act = jax.nn.silu(g.astype(jnp.float32)).astype(x2.dtype) * u
            return linear_apply(lp["down"], act)
    else:
        def fn(ws, x2):
            return linear_apply(lp["down"], _act_fn(cfg, linear_apply(ws["up"], x2)))

    return fn


def _layer_block_fn(cfg: ModelConfig, lp, cos, sin, attn_bias=None):
    """Whole decoder layer as a function of the scaled linears (falcon
    single-LN joint group; reference uses module2inspect=layer)."""

    def fn(ws, h):
        merged = dict(lp)
        merged.update(ws)
        out, _ = _capture(cfg, merged, h, cos, sin, attn_bias)
        return out

    return fn


def _single_fn(name: str):
    def fn(ws, x):
        return linear_apply(ws[name], x)

    return fn


# ---------------------------------------------------------------------------
# scale search (auto_scale.py:109-156)
# ---------------------------------------------------------------------------

N_GRID = 20


def _search_scale(
    block_fn: Callable,
    linears: Dict[str, Linear],
    x: jax.Array,            # input features [.., dim]
    qcfg: QuantConfig,
) -> jax.Array:
    """Grid search s = x_absmean^ratio (20 ratios), minimizing block-output
    MSE under fake quantization. Returns best scales [dim] (f32)."""
    x_max = jnp.mean(
        jnp.abs(x.reshape(-1, x.shape[-1]).astype(jnp.float32)), axis=0
    )
    org_out = block_fn(linears, x)

    def loss_for(ratio):
        s = jnp.clip(x_max**ratio, 1e-4, None)
        s = s / jnp.sqrt(s.max() * s.min())
        ws = {
            k: Linear(
                w=(
                    pseudo_quantize(
                        (v.w.astype(jnp.float32) * s[:, None]),
                        n_bit=qcfg.w_bit,
                        group_size=qcfg.group_size,
                        zero_point=qcfg.zero_point,
                    )
                    / s[:, None]
                ).astype(v.w.dtype),
                b=v.b,
            )
            for k, v in linears.items()
        }
        out = block_fn(ws, x)
        return jnp.mean((org_out - out).astype(jnp.float32) ** 2), s

    ratios = jnp.arange(N_GRID, dtype=jnp.float32) / N_GRID
    losses, scales = jax.lax.map(loss_for, ratios)
    best = jnp.argmin(losses)
    return scales[best]


# ---------------------------------------------------------------------------
# clip search (auto_clip.py:11-63)
# ---------------------------------------------------------------------------


def _fake_quant_lastdim(w: jax.Array, n_bit: int, zero_point: bool) -> jax.Array:
    """Group-wise fake quant where the group is the last axis (the clip
    search layout [OC, n_group, G])."""
    max_int = 2**n_bit - 1
    if zero_point:
        mx = w.max(-1, keepdims=True)
        mn = w.min(-1, keepdims=True)
        scales = jnp.maximum(mx - mn, 1e-5) / max_int
        zeros = jnp.clip(-jnp.round(mn / scales), 0, max_int)
    else:
        scales = jnp.maximum(jnp.abs(w).max(-1, keepdims=True), 1e-5) / (
            2 ** (n_bit - 1) - 1
        )
        zeros = jnp.full_like(scales, float(2 ** (n_bit - 1)))
    return (jnp.clip(jnp.round(w / scales) + zeros, 0, max_int) - zeros) * scales


@functools.partial(jax.jit, static_argnames=("n_bit", "group_size", "n_grid",
                                              "max_shrink", "zero_point"))
def _clip_search_batch(
    w: jax.Array,            # [OC_b, n_group, G] f32  (OC-major like the ref)
    x: jax.Array,            # [n_tok, n_group, G] f32
    n_bit: int,
    group_size: int,
    n_grid: int = 20,
    max_shrink: float = 0.5,
    zero_point: bool = True,
):
    org_max = jnp.abs(w).max(-1, keepdims=True)            # [OC_b, n_g, 1]
    org_out = jnp.einsum("tgi,ogi->otg", x, w)             # [OC_b, T, n_g]

    def body(carry, i_s):
        best_max, min_err = carry
        max_val = org_max * (1 - i_s / n_grid)
        cur_w = jnp.clip(w, -max_val, max_val)
        q_w = _fake_quant_lastdim(cur_w, n_bit, zero_point)
        cur_out = jnp.einsum("tgi,ogi->otg", x, q_w)
        err = jnp.mean((cur_out - org_out) ** 2, axis=1)[..., None]  # [OC_b,n_g,1]
        better = err < min_err
        return (
            jnp.where(better, max_val, best_max),
            jnp.where(better, err, min_err),
        ), None

    steps = jnp.arange(int(max_shrink * n_grid), dtype=jnp.float32)
    (best_max, _), _ = jax.lax.scan(
        body, (org_max, jnp.full_like(org_max, 1e9)), steps
    )
    return best_max[..., 0]                                # [OC_b, n_g]


def _clip_layer(
    w: jax.Array,            # [IC, OC] (jax convention)
    feat: jax.Array,         # [..., IC]
    qcfg: QuantConfig,
    n_sample_token: int = 512,
) -> jax.Array:
    """Returns clip max_val [n_group, OC] (matching quantize clip_max)."""
    ic, oc = w.shape
    g = ic if qcfg.group_size == -1 else qcfg.group_size
    x = feat.reshape(-1, ic).astype(jnp.float32)
    stride = max(x.shape[0] // n_sample_token, 1)
    x = x[::stride][:n_sample_token].reshape(-1, ic // g, g)
    w_oc = w.astype(jnp.float32).T.reshape(oc, ic // g, g)

    oc_bs = 256 if oc % 256 == 0 else (64 if oc % 64 == 0 else oc)
    outs = []
    for i in range(0, oc, oc_bs):
        outs.append(
            _clip_search_batch(
                w_oc[i:i + oc_bs], x,
                n_bit=qcfg.w_bit, group_size=g,
                zero_point=qcfg.zero_point,
            )
        )
    best = jnp.concatenate(outs, axis=0)                   # [OC, n_g]
    return best.T                                          # [n_g, OC]


# clip skip list (auto_clip.py:75): q/k projections are entangled with rope
CLIP_SKIP = ("wq", "wk")


# ---------------------------------------------------------------------------
# scale application (auto_scale.py:34-83 / apply_scale)
# ---------------------------------------------------------------------------


def _scale_ln_fcs(lp: dict, ln_name: str, fc_names: Sequence[str], s: jax.Array):
    lp[ln_name] = (lp[ln_name].astype(jnp.float32) / s).astype(lp[ln_name].dtype)
    bkey = ln_name + "_b"
    if bkey in lp and lp[bkey] is not None:
        lp[bkey] = (lp[bkey].astype(jnp.float32) / s).astype(lp[bkey].dtype)
    for n in fc_names:
        fc = lp[n]
        lp[n] = Linear(
            w=(fc.w.astype(jnp.float32) * s[:, None]).astype(fc.w.dtype),
            b=fc.b,
        )


def _scale_fc_fc(lp: dict, prev: str, nxt: str, s: jax.Array):
    fc1, fc2 = lp[prev], lp[nxt]
    n = s.shape[0]
    w1 = fc1.w.astype(jnp.float32)
    w1 = w1.at[:, -n:].divide(s[None, :])
    b1 = fc1.b
    if b1 is not None:
        b1 = (b1.astype(jnp.float32).at[-n:].divide(s)).astype(fc1.b.dtype)
    lp[prev] = Linear(w=w1.astype(fc1.w.dtype), b=b1)
    lp[nxt] = Linear(
        w=(fc2.w.astype(jnp.float32) * s[:, None]).astype(fc2.w.dtype),
        b=fc2.b,
    )


def _apply_one_scale(lp: dict, kind: str, prev: str, lin_names, s):
    if kind == "ln":
        _scale_ln_fcs(lp, prev, lin_names, s)
    elif kind == "fc":
        _scale_fc_fc(lp, prev, lin_names[0], s)
    else:  # act
        _scale_act_fc(lp, lin_names[0], s)


def _scale_act_fc(lp: dict, nxt: str, s: jax.Array):
    """Fold via activation scaling: act output divided at runtime by
    ``act_scale`` (ScaledActivation counterpart, ``auto_scale.py:464-467``),
    next linear's input channels multiplied."""
    prev = lp.get("act_scale")
    lp["act_scale"] = s if prev is None else (prev * s)
    fc = lp[nxt]
    lp[nxt] = Linear(
        w=(fc.w.astype(jnp.float32) * s[:, None]).astype(fc.w.dtype),
        b=fc.b,
    )


# ---------------------------------------------------------------------------
# per-arch scale groups (auto_scale.py:175-444)
# ---------------------------------------------------------------------------


def scale_groups(cfg: ModelConfig):
    """(kind, prev_name, linears, feat_key, block_fn_builder) per layer.

    Counterpart of the per-arch tables at ``auto_scale.py:175-444``.
    kind: "ln" folds into a norm, "fc" into the previous linear's output
    channels, "act" into a ScaledActivation-equivalent act_scale.
    """
    mk_attn = lambda lp, cos, sin, ab: _attn_block_fn(cfg, lp, cos, sin, ab)
    mk_mlp = lambda lp, cos, sin, ab: _mlp_block_fn(cfg, lp)
    mk_layer = lambda lp, cos, sin, ab: _layer_block_fn(cfg, lp, cos, sin, ab)
    single = lambda name: (lambda lp, cos, sin, ab: _single_fn(name))

    groups = []
    if cfg.single_ln:
        # falcon-7b: one LN feeds qkv AND mlp-up; joint fold over the
        # whole layer (reference falcon branch, auto_scale.py:331-371).
        # Grid basis is the post-LN activation feeding the scaled linears
        # (reference uses input_feat['self_attention.query_key_value']),
        # not the raw pre-LN hidden state.
        groups.append(("ln", "ln1", ("wq", "wk", "wv", "up"), "wq",
                       mk_layer))
    else:
        groups.append(("ln", "ln1", ("wq", "wk", "wv"), "wq", mk_attn))
    # v->o only when shapes match (GQA/MQA breaks the fold; reference:
    # auto_scale.py:232 shape equality check)
    if cfg.num_kv_heads == cfg.num_heads:
        groups.append(("fc", "wv", ("wo",), "wo", single("wo")))
    if cfg.act == "silu":
        groups += [
            ("ln", "ln2", ("gate", "up"), "gate", mk_mlp),
            ("fc", "up", ("down",), "down", single("down")),
        ]
    else:
        if not cfg.single_ln:
            groups.append(("ln", "ln2", ("up",), "up", mk_mlp))
        # gelu -> down: fold via activation scaling (ScaledActivation
        # counterpart; reference scale_gelu_fc, auto_scale.py:72-83)
        groups.append(("act", "up", ("down",), "down", single("down")))
    return groups


# ---------------------------------------------------------------------------
# driver (pre_quant.py:102-249)
# ---------------------------------------------------------------------------


def run_awq(
    params: Dict[str, Any],
    cfg: ModelConfig,
    samples: jax.Array,                # [n_blocks, seqlen] int32 calib tokens
    qcfg: QuantConfig,
    auto_scale: bool = True,
    mse_range: bool = True,
    verbose: bool = False,
) -> Tuple[Dict[str, Any], AwqResult]:
    """Block-wise AWQ search. Returns (transformed params, AwqResult).

    The returned params have scales folded and clips recorded (clips are
    applied at quantization time via ``clip_max``, equivalent to the
    reference's in-place weight clamp)."""
    n, s = samples.shape
    L = cfg.num_layers
    h = params["embed"][samples].astype(jnp.dtype(cfg.dtype))
    if cfg.pos_embed == "learned":
        off = 2 if cfg.arch == "opt" else 0
        h = h + params["pos_embed"][jnp.arange(s) + off][None].astype(h.dtype)
    cos, sin = rope_table(cfg, s)
    attn_bias = None
    if cfg.pos_embed == "alibi":
        from awq_tpu.models.layers import alibi_slopes

        slopes = alibi_slopes(cfg.num_heads)
        attn_bias = (slopes[:, None, None]
                     * jnp.arange(s, dtype=jnp.float32)[None, None, :])

    layers = params["layers"]
    new_layer_slices: List[dict] = []
    result = AwqResult(scale=[], clip=[])
    capture = jax.jit(
        lambda lp, h: _capture(cfg, lp, h, cos, sin, attn_bias)
    )

    for i in range(L):
        lp = jax.tree_util.tree_map(lambda a: a[i], layers)
        # next layer's input computed with ORIGINAL weights (pre_quant.py:195)
        h_next, feats = capture(lp, h)
        if not bool(jnp.all(jnp.isfinite(h_next.astype(jnp.float32)))):
            raise FloatingPointError(
                f"non-finite hidden state after layer {i} during AWQ "
                "calibration — degenerate calibration batch or broken "
                "weights (reference guard: auto_scale.py:47-51)"
            )

        lp = dict(lp)
        if auto_scale:
            for kind, prev, lin_names, feat_key, mk_fn in scale_groups(cfg):
                fn = mk_fn(lp, cos, sin, attn_bias)
                sc = _search_scale(
                    fn, {k: lp[k] for k in lin_names}, feats[feat_key], qcfg
                )
                sc_np = np.asarray(sc)
                if not np.all(np.isfinite(sc_np)) or np.any(sc_np == 0):
                    raise FloatingPointError(
                        f"AWQ scale search produced degenerate scales at "
                        f"layer {i} group {kind}:{prev} "
                        "(reference guard: auto_scale.py:47-51,155)"
                    )
                _apply_one_scale(lp, kind, prev, lin_names, sc)
                # divide captured inputs (apply_scale input_feat_dict path)
                for nme in lin_names:
                    feats[nme] = (
                        feats[nme].astype(jnp.float32) / sc
                    ).astype(feats[nme].dtype)
                result.scale.append(
                    (i, kind + ":" + prev, tuple(lin_names), sc_np)
                )
        if mse_range:
            for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
                if name in CLIP_SKIP or name not in lp:
                    continue
                mv = _clip_layer(lp[name].w, feats[name], qcfg)
                mv_np = np.asarray(mv)
                if not np.all(np.isfinite(mv_np)):
                    raise FloatingPointError(
                        f"AWQ clip search produced non-finite clip range at "
                        f"layer {i} linear {name}"
                    )
                result.clip.append((i, name, mv_np))
        if verbose:
            print(f"[awq] layer {i + 1}/{L} done")
        new_layer_slices.append(lp)
        h = h_next

    new_layers = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *new_layer_slices
    )
    out = dict(params)
    out["layers"] = new_layers
    return out, result


def apply_awq(
    params: Dict[str, Any], cfg: ModelConfig, result: AwqResult
) -> Dict[str, Any]:
    """Re-apply cached search results to fresh params
    (counterpart of ``apply_awq``, ``pre_quant.py:252-254``; clips are
    carried to quantization via :func:`clips_by_layer`)."""
    layers = params["layers"]
    L = cfg.num_layers
    slices = [
        dict(jax.tree_util.tree_map(lambda a: a[i], layers)) for i in range(L)
    ]
    for i, tagged, lin_names, sc in result.scale:
        s = jnp.asarray(sc)
        if ":" in tagged:
            kind, prev = tagged.split(":", 1)
        else:  # v0 dumps: infer from the prev name
            prev = tagged
            kind = "ln" if prev.startswith("ln") else "fc"
        _apply_one_scale(slices[i], kind, prev, lin_names, s)
    out = dict(params)
    out["layers"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *slices
    )
    return out


def clips_by_layer(result: AwqResult, cfg: ModelConfig) -> Dict[str, jax.Array]:
    """Regroup clip entries into {linear_name: [L, n_group, OC]} for
    ``quantize_params(..., clips=...)``. Missing entries become +inf."""
    by_name: Dict[str, Dict[int, np.ndarray]] = {}
    for i, name, mv in result.clip:
        by_name.setdefault(name, {})[i] = mv
    out = {}
    for name, d in by_name.items():
        mats = [d[i] for i in range(cfg.num_layers)]
        out[name] = jnp.asarray(np.stack(mats))
    return out
