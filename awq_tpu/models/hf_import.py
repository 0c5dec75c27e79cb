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
    """Import an HF llama/mistral/qwen2 model into (ModelConfig, params)."""
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
    if cfg.arch not in ("llama", "mistral", "qwen2"):
        raise NotImplementedError(f"importer supports llama-family, got {cfg.arch}")
    return cfg, _build_llama_params(cfg, sd)


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
