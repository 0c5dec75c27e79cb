"""Functional ViT vision towers (SigLIP / CLIP) with fp and W8A8 paths.

Counterpart of the reference vision stack:
- fp path: ``tinychat/models/llava_base/multimodal_encoder/clip_encoder.py``
  and the SigLIP tower used by NVILA.
- W8A8 path: ``tinychat/modules/fused_siglipdecoder.py:24-283`` — the int8
  activation pipeline (LN+quant -> int8 QKV GEMM -> fp attention ->
  quant -> int8 out-proj; MLP via gelu_and_quant). Here each fused CUDA op
  maps to an ops.w8a8 function and XLA fuses the epilogues; there is no
  activation-buffer arena (``input_metadata.py``) because XLA owns buffers.

Weights are a pytree with layers stacked on a leading axis, like the
decoder. ``w8a8_quantize_vision`` converts the four linears per block to
:class:`W8A8Linear` (optionally after SmoothQuant folding).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.models.layers import Linear, layer_norm, linear_apply
from awq_tpu.ops.w8a8 import (
    W8A8Linear,
    gelu_quant,
    layer_norm_quant,
    quant_per_token,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    layer_norm_eps: float = 1e-6
    use_class_token: bool = False      # CLIP: True, SigLIP: False
    post_norm_full: bool = True        # SigLIP norms the whole sequence;
    # CLIP post-norms only the pooled CLS (VLMs consume pre-norm states)
    act: str = "gelu_tanh"             # siglip: gelu_pytorch_tanh
    dtype: str = "float32"

    @property
    def num_patches(self) -> int:
        # floor: HF towers use a "valid" conv (siglip-384/14 -> 27x27)
        n = (self.image_size // self.patch_size) ** 2
        return n + (1 if self.use_class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def vision_config_from_hf(hf: Dict[str, Any]) -> VisionConfig:
    return VisionConfig(
        image_size=hf["image_size"],
        patch_size=hf["patch_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        layer_norm_eps=hf.get("layer_norm_eps", 1e-6),
        use_class_token=hf.get("model_type") == "clip_vision_model",
        post_norm_full=hf.get("model_type") != "clip_vision_model",
        act={"quick_gelu": "quick_gelu", "gelu": "gelu"}.get(
            hf.get("hidden_act", "gelu_pytorch_tanh"), "gelu_tanh"),
    )


def init_vision_params(cfg: VisionConfig, key: jax.Array,
                       scale: float = 0.02) -> Params:
    dt = jnp.dtype(cfg.dtype)
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ks = iter(jax.random.split(key, 20))

    def w(shape):
        return (jax.random.normal(next(ks), shape, jnp.float32)
                * scale).astype(dt)

    def lin(ic, oc):
        return Linear(w=w((L, ic, oc)), b=jnp.zeros((L, oc), dt))

    patch_dim = 3 * cfg.patch_size ** 2
    params: Params = {
        "patch_embed": Linear(w=w((patch_dim, h)), b=jnp.zeros((h,), dt)),
        "pos_embed": w((cfg.num_patches, h)),
        "layers": {
            "ln1": jnp.ones((L, h), dt), "ln1_b": jnp.zeros((L, h), dt),
            "ln2": jnp.ones((L, h), dt), "ln2_b": jnp.zeros((L, h), dt),
            "wq": lin(h, h), "wk": lin(h, h), "wv": lin(h, h),
            "wo": lin(h, h), "fc1": lin(h, i), "fc2": lin(i, h),
        },
        "post_norm": jnp.ones((h,), dt),
        "post_norm_b": jnp.zeros((h,), dt),
    }
    if cfg.use_class_token:
        params["class_embed"] = w((h,))
        params["pre_norm"] = jnp.ones((h,), dt)
        params["pre_norm_b"] = jnp.zeros((h,), dt)
    return params


def patchify(cfg: VisionConfig, pixels: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> [B, n_patches, 3*p*p] (conv-as-matmul unfold;
    edge pixels beyond a patch multiple are cropped, like a "valid"
    stride-p convolution — e.g. siglip 384/14 -> 27x27)."""
    b, hh, ww, c = pixels.shape
    p = cfg.patch_size
    hh, ww = (hh // p) * p, (ww // p) * p
    pixels = pixels[:, :hh, :ww]
    x = pixels.reshape(b, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)                 # [B, gh, gw, p, p, C]
    # HF conv weight layout contraction order is (C, p, p); match it
    x = x.transpose(0, 1, 2, 5, 3, 4)                 # [B, gh, gw, C, p, p]
    return x.reshape(b, (hh // p) * (ww // p), c * p * p)


def _vit_attention(cfg: VisionConfig, q, k, v):
    b, s, _ = q.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    q = q.reshape(b, s, nh, hd).astype(jnp.float32)
    k = k.reshape(b, s, nh, hd).astype(jnp.float32)
    v = v.reshape(b, s, nh, hd).astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, s, nh * hd)


def vision_forward(params: Params, cfg: VisionConfig,
                   pixels: jax.Array) -> jax.Array:
    """[B, H, W, 3] -> patch features [B, n_patches, hidden] (fp path)."""
    dt = jnp.dtype(cfg.dtype)
    x = patchify(cfg, pixels).astype(dt)
    h = linear_apply(params["patch_embed"], x)
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_embed"][None, None], (h.shape[0], 1, h.shape[-1])
        ).astype(dt)
        h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None].astype(dt)
    if cfg.use_class_token:
        h = layer_norm(h, params["pre_norm"], params["pre_norm_b"],
                       cfg.layer_norm_eps)

    def body(h, lp):
        x = layer_norm(h, lp["ln1"], lp["ln1_b"], cfg.layer_norm_eps)
        q = linear_apply(lp["wq"], x)
        k = linear_apply(lp["wk"], x)
        v = linear_apply(lp["wv"], x)
        attn = _vit_attention(cfg, q, k, v).astype(dt)
        h = h + linear_apply(lp["wo"], attn)
        x = layer_norm(h, lp["ln2"], lp["ln2_b"], cfg.layer_norm_eps)
        m = linear_apply(lp["fc1"], x)
        mf = m.astype(jnp.float32)
        if cfg.act == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
            mf = mf * jax.nn.sigmoid(1.702 * mf)
        else:
            mf = jax.nn.gelu(mf, approximate=(cfg.act == "gelu_tanh"))
        h = h + linear_apply(lp["fc2"], mf.astype(dt))
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    if not cfg.post_norm_full:
        return h
    return layer_norm(h, params["post_norm"], params["post_norm_b"],
                      cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# W8A8 execution (QuantSiglipEncoder counterpart)
# ---------------------------------------------------------------------------


def w8a8_quantize_vision(params: Params) -> Params:
    """Convert block linears to int8 (keep patch embed fp; reference keeps
    it fp16 too, cuDNN-tuned at ``tinychat/utils/tune.py:16-34``)."""
    layers = dict(params["layers"])
    L = layers["ln1"].shape[0]
    for name in ("wq", "wk", "wv", "wo", "fc1", "fc2"):
        lin = layers[name]
        per = [
            W8A8Linear.from_linear(
                lin.w[i].astype(jnp.float32),
                None if lin.b is None else lin.b[i],
            )
            for i in range(L)
        ]
        layers[name] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *per
        )
    out = dict(params)
    out["layers"] = layers
    return out


def vision_forward_w8a8(params: Params, cfg: VisionConfig,
                        pixels: jax.Array) -> jax.Array:
    """int8 activation pipeline per block: LN+quant -> int8 QKV -> fp attn
    -> quant -> int8 out-proj; MLP fc1 int8 -> gelu+quant -> fc2 int8
    (mirrors ``fused_siglipdecoder.py:207-243``)."""
    dt = jnp.dtype(cfg.dtype)
    x = patchify(cfg, pixels).astype(dt)
    h = linear_apply(params["patch_embed"], x)
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_embed"][None, None], (h.shape[0], 1, h.shape[-1])
        ).astype(dt)
        h = jnp.concatenate([cls, h], axis=1)
    h = h + params["pos_embed"][None].astype(dt)
    if cfg.use_class_token:
        h = layer_norm(h, params["pre_norm"], params["pre_norm_b"],
                       cfg.layer_norm_eps)

    def apply8(lin: W8A8Linear, q, s):
        out = jax.lax.dot_general(
            q, lin.qweight,
            dimension_numbers=(((q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * s * lin.scale[None, :]
        if lin.bias is not None:
            out = out + lin.bias.astype(jnp.float32)
        return out.astype(dt)

    def body(h, lp):
        q8, s8 = layer_norm_quant(h, lp["ln1"], lp["ln1_b"],
                                  cfg.layer_norm_eps)
        wq = W8A8Linear(lp["wq"].qweight, lp["wq"].scale, lp["wq"].bias)
        wk = W8A8Linear(lp["wk"].qweight, lp["wk"].scale, lp["wk"].bias)
        wv = W8A8Linear(lp["wv"].qweight, lp["wv"].scale, lp["wv"].bias)
        attn = _vit_attention(
            cfg, apply8(wq, q8, s8), apply8(wk, q8, s8), apply8(wv, q8, s8)
        ).astype(dt)
        a8, as8 = quant_per_token(attn)
        wo = W8A8Linear(lp["wo"].qweight, lp["wo"].scale, lp["wo"].bias)
        h = h + apply8(wo, a8, as8)

        m8, ms8 = layer_norm_quant(h, lp["ln2"], lp["ln2_b"],
                                   cfg.layer_norm_eps)
        fc1 = W8A8Linear(lp["fc1"].qweight, lp["fc1"].scale, lp["fc1"].bias)
        mid = apply8(fc1, m8, ms8)
        g8, gs8 = gelu_quant(mid)
        fc2 = W8A8Linear(lp["fc2"].qweight, lp["fc2"].scale, lp["fc2"].bias)
        h = h + apply8(fc2, g8, gs8)
        return h, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    if not cfg.post_norm_full:
        return h
    return layer_norm(h, params["post_norm"], params["post_norm_b"],
                      cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# HF importer (SiglipVisionModel / CLIPVisionModel)
# ---------------------------------------------------------------------------


def import_hf_vision(model, dtype: str = "float32") -> Tuple[VisionConfig, Params]:
    sd = {k: np.asarray(v.detach().float().cpu().numpy())
          for k, v in model.state_dict().items()}
    raw = model.config.to_dict()
    cfg = VisionConfig(**{**vision_config_from_hf(raw).__dict__,
                          "dtype": dtype})
    return cfg, build_vision_params(cfg, sd)


def build_vision_params(cfg: VisionConfig, sd: Dict[str, Any]) -> Params:
    """Params from a numpy state dict with ``vision_model.``-rooted keys."""
    dt = jnp.dtype(cfg.dtype)
    L = cfg.num_layers
    pre = "vision_model.encoder.layers.{i}."

    def lin(fmt):
        w = np.stack([sd[fmt.format(i=i) + ".weight"].T for i in range(L)])
        bkey = fmt.format(i=0) + ".bias"
        b = (jnp.asarray(np.stack([sd[fmt.format(i=i) + ".bias"]
                                   for i in range(L)]), dt)
             if bkey in sd else None)
        return Linear(w=jnp.asarray(w, dt), b=b)

    def vec(fmt):
        return jnp.asarray(np.stack([sd[fmt.format(i=i)] for i in range(L)]),
                           dt)

    conv = sd["vision_model.embeddings.patch_embedding.weight"]  # [H,C,p,p]
    patch_w = conv.reshape(conv.shape[0], -1).T                  # [Cpp, H]
    pe_key = "vision_model.embeddings.position_embedding.weight"
    params: Params = {
        "patch_embed": Linear(
            w=jnp.asarray(patch_w, dt),
            b=jnp.asarray(
                sd.get("vision_model.embeddings.patch_embedding.bias",
                       np.zeros(conv.shape[0])), dt),
        ),
        "pos_embed": jnp.asarray(sd[pe_key], dt),
        "layers": {
            "ln1": vec(pre + "layer_norm1.weight"),
            "ln1_b": vec(pre + "layer_norm1.bias"),
            "ln2": vec(pre + "layer_norm2.weight"),
            "ln2_b": vec(pre + "layer_norm2.bias"),
            "wq": lin(pre + "self_attn.q_proj"),
            "wk": lin(pre + "self_attn.k_proj"),
            "wv": lin(pre + "self_attn.v_proj"),
            "wo": lin(pre + "self_attn.out_proj"),
            "fc1": lin(pre + "mlp.fc1"),
            "fc2": lin(pre + "mlp.fc2"),
        },
        "post_norm": jnp.asarray(sd["vision_model.post_layernorm.weight"], dt),
        "post_norm_b": jnp.asarray(sd["vision_model.post_layernorm.bias"], dt),
    }
    if cfg.use_class_token:
        params["class_embed"] = jnp.asarray(
            sd["vision_model.embeddings.class_embedding"], dt)
        params["pre_norm"] = jnp.asarray(
            sd["vision_model.pre_layrnorm.weight"], dt)
        params["pre_norm_b"] = jnp.asarray(
            sd["vision_model.pre_layrnorm.bias"], dt)
    return params
