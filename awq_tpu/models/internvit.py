"""InternViT vision encoder (InternVL3's tower), fp + W8A8 paths.

TPU-native counterpart of ``tinychat/models/internvl/internvit.py`` (425
LoC torch module tree) and its int8 pipeline
``tinychat/modules/fused_internencoder.py:39-237``. Functional JAX:
stacked-layer pytree + ``lax.scan``; differences from the SigLIP/CLIP tower
in :mod:`awq_tpu.models.vision`:

- CLS token + learned position embeddings (bicubic resize when the input
  grid differs from the checkpoint grid)
- fused QKV with optional **QK normalization** (RMSNorm over the *full*
  flattened head dim, ``internvit.py:195-199``)
- per-branch **layer scale** parameters ls1/ls2 (``internvit.py:268-269``)
- norm_type rms_norm (InternViT-6B) or layer_norm (the 300M used by
  InternVL3-2B/8B)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.models.layers import Linear, layer_norm, linear_apply, rms_norm
from awq_tpu.models.vision import _vit_attention
from awq_tpu.ops.w8a8 import (
    W8A8Linear,
    gelu_quant,
    layer_norm_quant,
    quant_per_token,
    rms_norm_quant,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class InternViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    norm_type: str = "layer_norm"       # "layer_norm" | "rms_norm"
    qk_norm: bool = False
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6
    act: str = "gelu"
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid ** 2

    # shims so _vit_attention / patchify accept this config
    @property
    def use_class_token(self) -> bool:
        return True


def internvit_config_from_hf(hf: Dict[str, Any]) -> InternViTConfig:
    """From an OpenGVLab InternVisionConfig or HF InternVLVisionConfig."""
    return InternViTConfig(
        image_size=hf["image_size"] if isinstance(hf["image_size"], int)
        else hf["image_size"][0],
        patch_size=hf["patch_size"] if isinstance(hf["patch_size"], int)
        else hf["patch_size"][0],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        norm_type=hf.get("norm_type", "layer_norm"),
        qk_norm=hf.get("qk_normalization", hf.get("use_qk_norm", False)),
        qkv_bias=hf.get("qkv_bias", hf.get("attention_bias", True)),
        layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
        act=hf.get("hidden_act", "gelu"),
    )


def _norm(cfg: InternViTConfig, x, g, b):
    if cfg.norm_type == "rms_norm":
        return rms_norm(x, g, cfg.layer_norm_eps)
    return layer_norm(x, g, b, cfg.layer_norm_eps)


def _full_rms(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    """RMSNorm over the flattened (heads*dim) axis — InternViT's
    qk_normalization (``internvit.py:195-199``)."""
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(v + eps)) * g).astype(x.dtype)


def internvit_forward(
    params: Params, cfg: InternViTConfig, pixels: jax.Array,
    n_layers: int = 0,
) -> jax.Array:
    """[B, H, W, 3] -> hidden states [B, 1 + n_patches, hidden].

    ``n_layers`` truncates the encoder (InternVL's ``select_layer``: layer
    ``-k`` means run ``num_layers - k + 1`` blocks,
    ``internvl3.py:147-157``). 0 = all layers."""
    from awq_tpu.models.vision import patchify

    dt = jnp.dtype(cfg.dtype)
    x = patchify(cfg, pixels).astype(dt)
    h = linear_apply(params["patch_embed"], x)             # [B, P, H]
    b, p, hd = h.shape
    cls = jnp.broadcast_to(params["cls"][None, None], (b, 1, hd)).astype(dt)
    h = jnp.concatenate([cls, h], axis=1)
    pos = params["pos_embed"]                              # [1+P0, H]
    if pos.shape[0] != h.shape[1]:
        g0 = int(round((pos.shape[0] - 1) ** 0.5))
        g1 = int(round(p ** 0.5))
        body_pos = jax.image.resize(
            pos[1:].reshape(g0, g0, -1).astype(jnp.float32),
            (g1, g1, pos.shape[-1]), method="cubic",
        ).reshape(g1 * g1, -1)
        pos = jnp.concatenate([pos[:1].astype(jnp.float32), body_pos])
    h = h + pos[None].astype(dt)

    def body(h, lp):
        x = _norm(cfg, h, lp["ln1"], lp.get("ln1_b"))
        qkv = linear_apply(lp["wqkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_norm:
            q = _full_rms(q, lp["qn"], cfg.layer_norm_eps)
            k = _full_rms(k, lp["kn"], cfg.layer_norm_eps)
        attn = _vit_attention(cfg, q, k, v).astype(dt)
        h = h + linear_apply(lp["wo"], attn) * lp["ls1"].astype(dt)
        x = _norm(cfg, h, lp["ln2"], lp.get("ln2_b"))
        m = linear_apply(lp["fc1"], x)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(dt)
        m = linear_apply(lp["fc2"], m)
        h = h + m * lp["ls2"].astype(dt)
        return h, None

    layers = params["layers"]
    if n_layers:
        layers = jax.tree_util.tree_map(lambda a: a[:n_layers], layers)
    h, _ = jax.lax.scan(body, h, layers)
    return h


# ---------------------------------------------------------------------------
# W8A8 pipeline (fused_internencoder.py counterpart)
# ---------------------------------------------------------------------------


def w8a8_quantize_internvit(params: Params) -> Params:
    """int8-quantize the block linears (patch embed stays fp, as in the
    reference which only swaps the encoder,
    ``internvl_demo`` QuantInternVisionEncoder assembly)."""
    layers = dict(params["layers"])
    L = layers["ln1"].shape[0]
    for name in ("wqkv", "wo", "fc1", "fc2"):
        lin = layers[name]
        per = [
            W8A8Linear.from_linear(
                lin.w[i].astype(jnp.float32),
                None if lin.b is None else lin.b[i],
            )
            for i in range(L)
        ]
        layers[name] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)
    out = dict(params)
    out["layers"] = layers
    return out


def internvit_forward_w8a8(
    params: Params, cfg: InternViTConfig, pixels: jax.Array,
    n_layers: int = 0,
) -> jax.Array:
    """int8-activation InternViT: norm+quant -> int8 fused QKV -> (optional
    qk-norm, fp) attention -> quant -> int8 out-proj (x ls1); fc1 int8 ->
    gelu+quant -> fc2 int8 (x ls2) — mirroring
    ``fused_internencoder.py:39-237``."""
    from awq_tpu.models.vision import patchify

    dt = jnp.dtype(cfg.dtype)
    x = patchify(cfg, pixels).astype(dt)
    h = linear_apply(params["patch_embed"], x)
    b, p, hd = h.shape
    cls = jnp.broadcast_to(params["cls"][None, None], (b, 1, hd)).astype(dt)
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None].astype(dt)

    def apply8(lin: W8A8Linear, q, s):
        out = jax.lax.dot_general(
            q, lin.qweight,
            dimension_numbers=(((q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * s * lin.scale[None, :]
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(dt)

    def norm_quant(h, g, bvec):
        if cfg.norm_type == "rms_norm":
            return rms_norm_quant(h, g, cfg.layer_norm_eps)
        return layer_norm_quant(h, g, bvec, cfg.layer_norm_eps)

    def body(h, lp):
        q8, s8 = norm_quant(h, lp["ln1"], lp.get("ln1_b"))
        wqkv = W8A8Linear(lp["wqkv"].qweight, lp["wqkv"].scale,
                          lp["wqkv"].bias)
        qkv = apply8(wqkv, q8, s8)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_norm:
            q = _full_rms(q, lp["qn"], cfg.layer_norm_eps)
            k = _full_rms(k, lp["kn"], cfg.layer_norm_eps)
        attn = _vit_attention(cfg, q, k, v).astype(dt)
        a8, as8 = quant_per_token(attn)
        wo = W8A8Linear(lp["wo"].qweight, lp["wo"].scale, lp["wo"].bias)
        h = h + apply8(wo, a8, as8) * lp["ls1"].astype(dt)

        m8, ms8 = norm_quant(h, lp["ln2"], lp.get("ln2_b"))
        fc1 = W8A8Linear(lp["fc1"].qweight, lp["fc1"].scale, lp["fc1"].bias)
        mid = apply8(fc1, m8, ms8)
        g8, gs8 = gelu_quant(mid)
        fc2 = W8A8Linear(lp["fc2"].qweight, lp["fc2"].scale, lp["fc2"].bias)
        h = h + apply8(fc2, g8, gs8) * lp["ls2"].astype(dt)
        return h, None

    layers = params["layers"]
    if n_layers:
        layers = jax.tree_util.tree_map(lambda a: a[:n_layers], layers)
    h, _ = jax.lax.scan(body, h, layers)
    return h


# ---------------------------------------------------------------------------
# importers
# ---------------------------------------------------------------------------


def build_internvit_params(
    cfg: InternViTConfig, sd: Dict[str, np.ndarray], dtype: str = "float32",
) -> Params:
    """From either checkpoint layout:

    - OpenGVLab: ``embeddings.{class_embedding,position_embedding,
      patch_embedding}``, ``encoder.layers.{i}.{attn.qkv,attn.proj,
      attn.q_norm,attn.k_norm,norm1,norm2,ls1,ls2,mlp.fc1,mlp.fc2}``
    - HF (transformers InternVLVisionModel): ``embeddings.{cls_token,
      position_embeddings,patch_embeddings.projection}``,
      ``encoder.layer.{i}.{attention.{q,k,v}_proj,attention.
      projection_layer,attention.{q,k}_norm,layernorm_before/after,
      lambda_1/2,mlp.fc1,mlp.fc2}``
    """
    dt = jnp.dtype(dtype)
    L = cfg.num_layers
    hf_layout = any(k.startswith("encoder.layer.") for k in sd)

    def stack(fmt, transpose=False, optional=False):
        key0 = fmt.format(i=0)
        if key0 not in sd:
            if optional:
                return None
            raise KeyError(key0)
        a = np.stack([
            sd[fmt.format(i=i)].T if transpose else sd[fmt.format(i=i)]
            for i in range(L)
        ])
        return jnp.asarray(a, dt)

    def stack_lin(fmt):
        w = stack(fmt + ".weight", transpose=True)
        b = stack(fmt + ".bias", optional=True)
        return Linear(w=w, b=b)

    if hf_layout:
        pre = "encoder.layer.{i}."
        q = stack_lin(pre + "attention.q_proj")
        k = stack_lin(pre + "attention.k_proj")
        v = stack_lin(pre + "attention.v_proj")
        wqkv = Linear(
            w=jnp.concatenate([q.w, k.w, v.w], axis=-1),
            b=(jnp.concatenate([q.b, k.b, v.b], axis=-1)
               if q.b is not None else None),
        )
        layers = {
            "ln1": stack(pre + "layernorm_before.weight"),
            "ln2": stack(pre + "layernorm_after.weight"),
            "wqkv": wqkv,
            "wo": stack_lin(pre + "attention.projection_layer"),
            "fc1": stack_lin(pre + "mlp.fc1"),
            "fc2": stack_lin(pre + "mlp.fc2"),
            "ls1": stack(pre + "lambda_1"),
            "ls2": stack(pre + "lambda_2"),
        }
        if cfg.norm_type == "layer_norm":
            layers["ln1_b"] = stack(pre + "layernorm_before.bias")
            layers["ln2_b"] = stack(pre + "layernorm_after.bias")
        if cfg.qk_norm:
            layers["qn"] = stack(pre + "attention.q_norm.weight")
            layers["kn"] = stack(pre + "attention.k_norm.weight")
        cls = sd["embeddings.cls_token"].reshape(-1)
        pos = sd["embeddings.position_embeddings"].reshape(
            -1, cfg.hidden_size)
        conv = sd["embeddings.patch_embeddings.projection.weight"]
        conv_b = sd.get("embeddings.patch_embeddings.projection.bias")
    else:
        pre = "encoder.layers.{i}."
        layers = {
            "ln1": stack(pre + "norm1.weight"),
            "ln2": stack(pre + "norm2.weight"),
            "wqkv": stack_lin(pre + "attn.qkv"),
            "wo": stack_lin(pre + "attn.proj"),
            "fc1": stack_lin(pre + "mlp.fc1"),
            "fc2": stack_lin(pre + "mlp.fc2"),
            "ls1": stack(pre + "ls1"),
            "ls2": stack(pre + "ls2"),
        }
        if cfg.norm_type == "layer_norm":
            layers["ln1_b"] = stack(pre + "norm1.bias")
            layers["ln2_b"] = stack(pre + "norm2.bias")
        if cfg.qk_norm:
            layers["qn"] = stack(pre + "attn.q_norm.weight")
            layers["kn"] = stack(pre + "attn.k_norm.weight")
        cls = sd["embeddings.class_embedding"].reshape(-1)
        pos = sd["embeddings.position_embedding"].reshape(-1, cfg.hidden_size)
        conv = sd["embeddings.patch_embedding.weight"]
        conv_b = sd.get("embeddings.patch_embedding.bias")
    return {
        "cls": jnp.asarray(cls, dt),
        "pos_embed": jnp.asarray(pos, dt),
        "patch_embed": Linear(
            w=jnp.asarray(conv.reshape(conv.shape[0], -1).T, dt),
            b=(jnp.asarray(conv_b, dt) if conv_b is not None
               else jnp.zeros((conv.shape[0],), dt)),
        ),
        "layers": layers,
    }


def init_internvit_params(
    cfg: InternViTConfig, key: jax.Array, scale: float = 0.02,
) -> Params:
    dt = jnp.dtype(cfg.dtype)
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = iter(jax.random.split(key, 24))

    def w(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dt)

    def lin(ic, oc):
        return Linear(w=w((L, ic, oc)), b=jnp.zeros((L, oc), dt))

    layers: Params = {
        "ln1": jnp.ones((L, h), dt), "ln2": jnp.ones((L, h), dt),
        "wqkv": lin(h, 3 * h), "wo": lin(h, h),
        "fc1": lin(h, i), "fc2": lin(i, h),
        "ls1": jnp.full((L, h), 0.1, dt), "ls2": jnp.full((L, h), 0.1, dt),
    }
    if cfg.norm_type == "layer_norm":
        layers["ln1_b"] = jnp.zeros((L, h), dt)
        layers["ln2_b"] = jnp.zeros((L, h), dt)
    if cfg.qk_norm:
        layers["qn"] = jnp.ones((L, h), dt)
        layers["kn"] = jnp.ones((L, h), dt)
    return {
        "cls": w((h,)),
        "pos_embed": w((cfg.num_patches + 1, h)),
        "patch_embed": Linear(w=w((3 * cfg.patch_size ** 2, h)),
                              b=jnp.zeros((h,), dt)),
        "layers": layers,
    }
