"""HF LLaVA-style VLM checkpoint importer.

Counterpart of the reference's VLM builders (``tinychat/models/nvila/
builder.py:66-242``, ``vila_llama.py:20-109``): one HF directory with
``vision_config`` + ``text_config`` becomes a :class:`awq_tpu.models.vlm.VLM`
(vision tower params, projector, decoder params).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig, model_config_from_hf
from awq_tpu.models.hf_import import _build_llama_params, _load_dir_state_dict
from awq_tpu.models.layers import Linear
from awq_tpu.models.vlm import VLM, MMProjector
from awq_tpu.models.vision import (
    VisionConfig,
    vision_config_from_hf,
)


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _build_vision_from_sd(vcfg_raw: Dict[str, Any], sd: Dict[str, np.ndarray],
                          dtype: str):
    """Vision (cfg, params) from ``vision_model.``-rooted numpy tensors."""
    from awq_tpu.models.vision import build_vision_params

    cfg = VisionConfig(**{**vision_config_from_hf(vcfg_raw).__dict__,
                          "dtype": dtype})
    return cfg, build_vision_params(cfg, sd)


def import_llava_model(
    model_or_path,
    dtype: str = "bfloat16",
    quantize: Optional[QuantConfig] = None,
    vision_int8: bool = False,
) -> VLM:
    """Import an HF llava checkpoint (LlavaForConditionalGeneration layout).

    ``quantize`` real-quantizes the language model's linears (AWQ scales
    should already be folded if desired); ``vision_int8`` converts the
    tower to the W8A8 pipeline.
    """
    if isinstance(model_or_path, str):
        with open(os.path.join(model_or_path, "config.json")) as f:
            raw = json.load(f)
        sd = _load_dir_state_dict(model_or_path)
    else:
        raw = model_or_path.config.to_dict()
        sd = {k: np.asarray(v.detach().float().cpu().numpy())
              for k, v in model_or_path.state_dict().items()}

    vcfg_raw = raw["vision_config"]
    tcfg_raw = raw["text_config"]
    llm_cfg = model_config_from_hf(tcfg_raw)
    llm_cfg = ModelConfig(**{**llm_cfg.__dict__, "dtype": dtype})

    # language model. Two HF layouts:
    #   old: language_model.model.layers...  + language_model.lm_head.weight
    #   new: model.language_model.layers...  + lm_head.weight
    if any(k.startswith("model.language_model.") for k in sd):
        lm_sd = {"model." + k: v for k, v in
                 _strip_prefix(sd, "model.language_model.").items()}
        if "lm_head.weight" in sd:
            lm_sd["lm_head.weight"] = sd["lm_head.weight"]
    elif any(k.startswith("language_model.") for k in sd):
        lm_sd = _strip_prefix(sd, "language_model.")
    else:
        lm_sd = sd
    llm_params = _build_llama_params(llm_cfg, lm_sd)
    if quantize is not None:
        from awq_tpu.models.llama import quantize_params

        llm_params = quantize_params(llm_params, quantize)

    # vision tower
    vt_sd = _strip_prefix(sd, "model.vision_tower.")
    if not vt_sd:
        vt_sd = _strip_prefix(sd, "vision_tower.")
    vis_cfg, vis_params = _build_vision_from_sd(vcfg_raw, vt_sd, "float32")
    if vision_int8:
        from awq_tpu.models.vision import w8a8_quantize_vision

        vis_params = w8a8_quantize_vision(vis_params)

    # projector: multi_modal_projector.linear_1/linear_2 (llava) or mlp
    dt = jnp.dtype(dtype)

    def lin(prefix: str) -> Optional[Linear]:
        wkey = prefix + ".weight"
        if wkey not in sd:
            return None
        return Linear(
            w=jnp.asarray(np.asarray(sd[wkey]).T, dt),
            b=(jnp.asarray(np.asarray(sd[prefix + ".bias"]), dt)
               if prefix + ".bias" in sd else None),
        )

    fc1 = lin("model.multi_modal_projector.linear_1")
    fc2 = lin("model.multi_modal_projector.linear_2")
    if fc1 is None:
        fc1 = lin("multi_modal_projector.linear_1")
        fc2 = lin("multi_modal_projector.linear_2")
    if fc1 is None:  # mm_projector.0 / mm_projector.2 (vila-style)
        fc1 = lin("mm_projector.0")
        fc2 = lin("mm_projector.2")
    if fc1 is None:
        raise KeyError("no projector weights found")
    projector = MMProjector(fc1=fc1, fc2=fc2)

    return VLM(
        vis_cfg=vis_cfg, vis_params=vis_params, projector=projector,
        llm_cfg=llm_cfg, llm_params=llm_params, vision_int8=vision_int8,
    )
