"""HuggingFace checkpoint -> awq_tpu parameter pytree.

Replaces the reference's reliance on ``transformers.AutoModelForCausalLM``
plus accelerate device maps (``awq/entry.py:122-270``): weights are read
into numpy, transposed to JAX ``[IC, OC]`` convention, and stacked along a
leading layer axis for the scan-based forward.

Two entry points:
- :func:`import_hf_model` — from an in-memory ``transformers`` model
  (used by tests: build a tiny random model, compare logits) or a local
  checkpoint directory with ``config.json`` + safetensors/bin shards.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, model_config_from_hf
from awq_tpu.models.layers import Linear

_LLAMA_MAP = {
    "ln1": "model.layers.{i}.input_layernorm.weight",
    "ln2": "model.layers.{i}.post_attention_layernorm.weight",
    "wq": "model.layers.{i}.self_attn.q_proj",
    "wk": "model.layers.{i}.self_attn.k_proj",
    "wv": "model.layers.{i}.self_attn.v_proj",
    "wo": "model.layers.{i}.self_attn.o_proj",
    "gate": "model.layers.{i}.mlp.gate_proj",
    "up": "model.layers.{i}.mlp.up_proj",
    "down": "model.layers.{i}.mlp.down_proj",
}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def _load_dir_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a checkpoint dir (safetensors preferred)."""
    sd: Dict[str, np.ndarray] = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors import safe_open

        for f in sorted(st_files):
            with safe_open(os.path.join(path, f), framework="np") as sf:
                for k in sf.keys():
                    sd[k] = sf.get_tensor(k)
        return sd
    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    if bins:
        import torch

        for f in sorted(bins):
            blob = torch.load(
                os.path.join(path, f), map_location="cpu", weights_only=True
            )
            for k, v in blob.items():
                sd[k] = _to_numpy(v)
        return sd
    raise FileNotFoundError(f"no weights found in {path}")


def import_hf_model(model_or_path, dtype: str = "bfloat16") -> Tuple[ModelConfig, Dict[str, Any]]:
    """Import an HF decoder checkpoint into (ModelConfig, params).

    Covers every family the reference ships rewritten models or AWQ
    search tables for (``tinychat/models/*``, ``auto_scale.py:175-444``):
    llama/mistral/qwen2/vicuna/codellama, opt, falcon, mpt,
    bigcode (starcoder), gpt-neox.
    """
    if isinstance(model_or_path, str):
        with open(os.path.join(model_or_path, "config.json")) as f:
            raw_cfg = json.load(f)
        sd = _load_dir_state_dict(model_or_path)
    else:
        raw_cfg = model_or_path.config.to_dict()
        sd = {k: _to_numpy(v) for k, v in model_or_path.state_dict().items()}
    cfg = model_config_from_hf(raw_cfg)
    if dtype:
        cfg = ModelConfig(**{**cfg.__dict__, "dtype": dtype})
    builders = {
        "llama": _build_llama_params,
        "mistral": _build_llama_params,
        "qwen2": _build_llama_params,
        "opt": _build_opt_params,
        "falcon": _build_falcon_params,
        "mpt": _build_mpt_params,
        "bigcode": _build_bigcode_params,
        "neox": _build_neox_params,
        "bloom": _build_bloom_params,
    }
    if cfg.arch not in builders:
        raise NotImplementedError(f"importer: unsupported arch {cfg.arch}")
    return cfg, builders[cfg.arch](cfg, sd)


def _build_llama_params(cfg: ModelConfig, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    L = cfg.num_layers

    def stack(fmt: str) -> jnp.ndarray:
        return jnp.asarray(
            np.stack([sd[fmt.format(i=i)] for i in range(L)]), dtype=dt
        )

    def stack_linear(prefix_fmt: str) -> Linear:
        w = np.stack(
            [sd[prefix_fmt.format(i=i) + ".weight"].T for i in range(L)]
        )  # [L, IC, OC]
        bkey = prefix_fmt.format(i=0) + ".bias"
        b = None
        if bkey in sd:
            b = jnp.asarray(
                np.stack([sd[prefix_fmt.format(i=i) + ".bias"] for i in range(L)]),
                dtype=dt,
            )
        return Linear(w=jnp.asarray(w, dtype=dt), b=b)

    layers: Dict[str, Any] = {
        "ln1": stack(_LLAMA_MAP["ln1"]),
        "ln2": stack(_LLAMA_MAP["ln2"]),
    }
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
        layers[name] = stack_linear(_LLAMA_MAP[name])

    params: Dict[str, Any] = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype=dt),
        "layers": layers,
        "norm": jnp.asarray(sd["model.norm.weight"], dtype=dt),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"].T, dtype=dt)
    return params


# ---------------------------------------------------------------------------
# generic table-driven importer for the non-llama families
# ---------------------------------------------------------------------------


def _stack_lin(cfg: ModelConfig, sd, fmt: str) -> Linear:
    dt = jnp.dtype(cfg.dtype)
    L = cfg.num_layers
    w = np.stack([sd[fmt.format(i=i) + ".weight"].T for i in range(L)])
    b = None
    if fmt.format(i=0) + ".bias" in sd:
        b = jnp.asarray(
            np.stack([sd[fmt.format(i=i) + ".bias"] for i in range(L)]), dt
        )
    return Linear(w=jnp.asarray(w, dt), b=b)


def _stack_vec(cfg: ModelConfig, sd, fmt: str, optional: bool = False):
    dt = jnp.dtype(cfg.dtype)
    if fmt.format(i=0) not in sd:
        if optional:
            return None
        raise KeyError(fmt)
    return jnp.asarray(
        np.stack([sd[fmt.format(i=i)] for i in range(cfg.num_layers)]), dt
    )


def _split_qkv(cfg: ModelConfig, fused: Linear, layout: str) -> Dict[str, Linear]:
    """Split a stacked fused-QKV Linear ``[L, H, qkv_out]``.

    layouts: "concat" (q|k|v blocks), "neox" (per-head q,k,v interleave),
    "mqa" (q heads | 1 k | 1 v — falcon-7b / bigcode c_attn),
    "grouped" (falcon new_decoder_architecture: per-kv-group
    [n_kv, q_per_group+2, head_dim] interleave — HF
    FalconAttention._split_heads new-arch branch).
    """
    nq, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    w, b = fused.w, fused.b

    if layout == "grouped":
        L, H, _ = w.shape
        g = nq // nkv
        wg = w.reshape(L, H, nkv, g + 2, hd)
        bg = None if b is None else b.reshape(L, nkv, g + 2, hd)

        def take_group(lo, hi, nh):
            return Linear(
                w=wg[:, :, :, lo:hi, :].reshape(L, H, nh * hd),
                b=None
                if bg is None
                else bg[:, :, lo:hi, :].reshape(L, nh * hd),
            )

        return {
            "wq": take_group(0, g, nq),
            "wk": take_group(g, g + 1, nkv),
            "wv": take_group(g + 1, g + 2, nkv),
        }

    def cut(lo, hi):
        return Linear(
            w=w[:, :, lo:hi], b=None if b is None else b[:, lo:hi]
        )

    if layout == "neox":
        L, H, _ = w.shape
        w3 = w.reshape(L, H, nq, 3, hd)
        b3 = None if b is None else b.reshape(L, nq, 3, hd)

        def take(j):
            return Linear(
                w=w3[:, :, :, j, :].reshape(L, H, nq * hd),
                b=None if b3 is None else b3[:, :, j, :].reshape(L, nq * hd),
            )

        return {"wq": take(0), "wk": take(1), "wv": take(2)}
    q_dim, kv_dim = nq * hd, nkv * hd
    return {
        "wq": cut(0, q_dim),
        "wk": cut(q_dim, q_dim + kv_dim),
        "wv": cut(q_dim + kv_dim, q_dim + 2 * kv_dim),
    }


def _build_opt_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    pre = "model.decoder.layers.{i}."
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + "self_attn_layer_norm.weight"),
        "ln1_b": _stack_vec(cfg, sd, pre + "self_attn_layer_norm.bias"),
        "ln2": _stack_vec(cfg, sd, pre + "final_layer_norm.weight"),
        "ln2_b": _stack_vec(cfg, sd, pre + "final_layer_norm.bias"),
        "wq": _stack_lin(cfg, sd, pre + "self_attn.q_proj"),
        "wk": _stack_lin(cfg, sd, pre + "self_attn.k_proj"),
        "wv": _stack_lin(cfg, sd, pre + "self_attn.v_proj"),
        "wo": _stack_lin(cfg, sd, pre + "self_attn.out_proj"),
        "up": _stack_lin(cfg, sd, pre + "fc1"),
        "down": _stack_lin(cfg, sd, pre + "fc2"),
    }
    return {
        "embed": jnp.asarray(sd["model.decoder.embed_tokens.weight"], dt),
        "pos_embed": jnp.asarray(
            sd["model.decoder.embed_positions.weight"], dt
        ),
        "layers": layers,
        "norm": jnp.asarray(sd["model.decoder.final_layer_norm.weight"], dt),
        "norm_b": jnp.asarray(sd["model.decoder.final_layer_norm.bias"], dt),
    }


def _build_falcon_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    pre = "transformer.h.{i}."
    fused = _stack_lin(cfg, sd, pre + "self_attention.query_key_value")
    # new_decoder_architecture (falcon-40b/180b): QKV is stored grouped per
    # kv-head and the two parallel branches get their own LNs (ln_attn /
    # ln_mlp) instead of input_layernorm (HF modeling_falcon new-arch branch).
    ln1_key = "ln_attn" if cfg.grouped_qkv else "input_layernorm"
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + ln1_key + ".weight"),
        "ln1_b": _stack_vec(cfg, sd, pre + ln1_key + ".bias"),
        **_split_qkv(cfg, fused, "grouped" if cfg.grouped_qkv else "concat"),
        "wo": _stack_lin(cfg, sd, pre + "self_attention.dense"),
        "up": _stack_lin(cfg, sd, pre + "mlp.dense_h_to_4h"),
        "down": _stack_lin(cfg, sd, pre + "mlp.dense_4h_to_h"),
    }
    if not cfg.single_ln:
        ln2_key = "ln_mlp" if cfg.grouped_qkv else "post_attention_layernorm"
        layers["ln2"] = _stack_vec(cfg, sd, pre + ln2_key + ".weight")
        layers["ln2_b"] = _stack_vec(cfg, sd, pre + ln2_key + ".bias")
    params = {
        "embed": jnp.asarray(sd["transformer.word_embeddings.weight"], dt),
        "layers": layers,
        "norm": jnp.asarray(sd["transformer.ln_f.weight"], dt),
        "norm_b": jnp.asarray(sd["transformer.ln_f.bias"], dt),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"].T, dt)
    return params


def _build_mpt_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    pre = "transformer.blocks.{i}."
    fused = _stack_lin(cfg, sd, pre + "attn.Wqkv")
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + "norm_1.weight"),
        "ln2": _stack_vec(cfg, sd, pre + "norm_2.weight"),
        **_split_qkv(cfg, fused, "concat"),
        "wo": _stack_lin(cfg, sd, pre + "attn.out_proj"),
        "up": _stack_lin(cfg, sd, pre + "ffn.up_proj"),
        "down": _stack_lin(cfg, sd, pre + "ffn.down_proj"),
    }
    return {
        "embed": jnp.asarray(sd["transformer.wte.weight"], dt),
        "layers": layers,
        "norm": jnp.asarray(sd["transformer.norm_f.weight"], dt),
    }


def _build_bigcode_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    pre = "transformer.h.{i}."
    fused = _stack_lin(cfg, sd, pre + "attn.c_attn")
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + "ln_1.weight"),
        "ln1_b": _stack_vec(cfg, sd, pre + "ln_1.bias"),
        "ln2": _stack_vec(cfg, sd, pre + "ln_2.weight"),
        "ln2_b": _stack_vec(cfg, sd, pre + "ln_2.bias"),
        **_split_qkv(cfg, fused, "mqa" if cfg.num_kv_heads == 1 else "concat"),
        "wo": _stack_lin(cfg, sd, pre + "attn.c_proj"),
        "up": _stack_lin(cfg, sd, pre + "mlp.c_fc"),
        "down": _stack_lin(cfg, sd, pre + "mlp.c_proj"),
    }
    return {
        "embed": jnp.asarray(sd["transformer.wte.weight"], dt),
        "pos_embed": jnp.asarray(sd["transformer.wpe.weight"], dt),
        "layers": layers,
        "norm": jnp.asarray(sd["transformer.ln_f.weight"], dt),
        "norm_b": jnp.asarray(sd["transformer.ln_f.bias"], dt),
    }


def _build_bloom_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    """Bloom (reference: AWQ search branch ``auto_scale.py:258-295``,
    activation scaling ``quantizer.py:24-33`` — the last arch family the
    reference's search supports). The fused ``query_key_value`` uses the
    per-head ``[n_heads, 3, head_dim]`` interleave (HF
    ``BloomAttention._split_heads``) — this importer's "neox" layout —
    and the embedding is followed by ``word_embeddings_layernorm``
    (``cfg.embed_ln``). Unlike the reference (which skips the qkv->dense
    fold because its fused buffer can't scale v-channels alone), the
    split wq/wk/wv storage here keeps the generic v->o scale group."""
    dt = jnp.dtype(cfg.dtype)
    pre = "transformer.h.{i}."
    fused = _stack_lin(cfg, sd, pre + "self_attention.query_key_value")
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + "input_layernorm.weight"),
        "ln1_b": _stack_vec(cfg, sd, pre + "input_layernorm.bias"),
        "ln2": _stack_vec(cfg, sd, pre + "post_attention_layernorm.weight"),
        "ln2_b": _stack_vec(cfg, sd,
                            pre + "post_attention_layernorm.bias"),
        **_split_qkv(cfg, fused, "neox"),
        "wo": _stack_lin(cfg, sd, pre + "self_attention.dense"),
        "up": _stack_lin(cfg, sd, pre + "mlp.dense_h_to_4h"),
        "down": _stack_lin(cfg, sd, pre + "mlp.dense_4h_to_h"),
    }
    return {
        "embed": jnp.asarray(sd["transformer.word_embeddings.weight"], dt),
        "embed_ln_w": jnp.asarray(
            sd["transformer.word_embeddings_layernorm.weight"], dt),
        "embed_ln_b": jnp.asarray(
            sd["transformer.word_embeddings_layernorm.bias"], dt),
        "layers": layers,
        "norm": jnp.asarray(sd["transformer.ln_f.weight"], dt),
        "norm_b": jnp.asarray(sd["transformer.ln_f.bias"], dt),
    }


def _build_neox_params(cfg: ModelConfig, sd) -> Dict[str, Any]:
    dt = jnp.dtype(cfg.dtype)
    pre = "gpt_neox.layers.{i}."
    fused = _stack_lin(cfg, sd, pre + "attention.query_key_value")
    layers = {
        "ln1": _stack_vec(cfg, sd, pre + "input_layernorm.weight"),
        "ln1_b": _stack_vec(cfg, sd, pre + "input_layernorm.bias"),
        "ln2": _stack_vec(cfg, sd, pre + "post_attention_layernorm.weight"),
        "ln2_b": _stack_vec(cfg, sd, pre + "post_attention_layernorm.bias"),
        **_split_qkv(cfg, fused, "neox"),
        "wo": _stack_lin(cfg, sd, pre + "attention.dense"),
        "up": _stack_lin(cfg, sd, pre + "mlp.dense_h_to_4h"),
        "down": _stack_lin(cfg, sd, pre + "mlp.dense_4h_to_h"),
    }
    return {
        "embed": jnp.asarray(sd["gpt_neox.embed_in.weight"], dt),
        "layers": layers,
        "norm": jnp.asarray(sd["gpt_neox.final_layer_norm.weight"], dt),
        "norm_b": jnp.asarray(sd["gpt_neox.final_layer_norm.bias"], dt),
        "lm_head": jnp.asarray(sd["embed_out.weight"].T, dt),
    }
