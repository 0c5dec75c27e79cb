"""Import third-party AWQ quantized checkpoints.

Counterpart of ``tinychat/utils/load_quant.py`` (v1/v2 packed torch
checkpoints) and ``examples/convert_to_hf.py`` (AutoAWQ HF exports): detects
the packing flavor, unpacks via the native repacker, and re-packs into the
TPU layout:

- **AutoAWQ / HF "gemm"**: per-linear ``qweight`` int32 ``[IC, OC/8]``,
  ``qzeros`` int32 ``[IC/G, OC/8]`` (same nibble order), ``scales`` f16
  ``[IC/G, OC]``.
- **llm-awq v2 (TinyChat)**: ``qweight`` int16 ``[OC/4, IC]`` interleaved,
  ``scales``/``scaled_zeros`` transposed+padded.

Dequant conventions differ: AutoAWQ's ``w = (q - z) * s`` maps to our
``szeros = s * z``; TinyChat v2 stores ``scaled_zeros = -(z * s)`` style
already folded — handled per flavor.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from awq_tpu import native
from awq_tpu.config import ModelConfig, QuantConfig, model_config_from_hf
from awq_tpu.models.hf_import import _LLAMA_MAP, _load_dir_state_dict
from awq_tpu.ops.w4a16 import QLinear


def _unpack_autoawq_linear(
    qweight: np.ndarray,      # int32 [IC, OC/8]
    qzeros: np.ndarray,       # int32 [IC/G, OC/8]
    scales: np.ndarray,       # [IC/G, OC]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (codes uint8 [IC, OC], scales f32, szeros f32)."""
    ic = qweight.shape[0]
    oc = qweight.shape[1] * 8
    codes = native.unpack_awq_gemm(qweight, ic, oc)
    zeros = native.unpack_awq_gemm(qzeros, qzeros.shape[0], oc)
    s = scales.astype(np.float32)
    sz = s * zeros.astype(np.float32)
    return codes, s, sz


def load_autoawq_checkpoint(
    path: str, dtype: str = "bfloat16"
) -> Tuple[ModelConfig, Dict[str, Any], QuantConfig]:
    """Load an AutoAWQ-format HF directory into (cfg, params, qcfg)."""
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    qc = raw.get("quantization_config", {})
    qcfg = QuantConfig(
        w_bit=qc.get("bits", qc.get("w_bit", 4)),
        group_size=qc.get("group_size", qc.get("q_group_size", 128)),
        zero_point=qc.get("zero_point", True),
    )
    if qcfg.w_bit != 4:
        raise NotImplementedError("autoawq import supports 4-bit")
    cfg = model_config_from_hf(raw)
    cfg = ModelConfig(**{**cfg.__dict__, "dtype": dtype})
    if cfg.arch not in ("llama", "mistral", "qwen2"):
        raise NotImplementedError(f"autoawq import: arch {cfg.arch}")
    sd = _load_dir_state_dict(path)
    dt = jnp.dtype(dtype)
    L = cfg.num_layers

    def qlin(prefix_fmt: str) -> QLinear:
        qws, ss, szs, bs = [], [], [], []
        has_bias = prefix_fmt.format(i=0) + ".bias" in sd
        for i in range(L):
            p = prefix_fmt.format(i=i)
            codes, s, sz = _unpack_autoawq_linear(
                np.ascontiguousarray(sd[p + ".qweight"]),
                np.ascontiguousarray(sd[p + ".qzeros"]),
                np.asarray(sd[p + ".scales"]),
            )
            qws.append(native.pack_int4_tpu(codes))
            ss.append(s)
            szs.append(sz)
            if has_bias:
                bs.append(np.asarray(sd[p + ".bias"], np.float32))
        return QLinear(
            qweight=jnp.asarray(np.stack(qws)),
            scales=jnp.asarray(np.stack(ss)),
            szeros=jnp.asarray(np.stack(szs)),
            bias=jnp.asarray(np.stack(bs), dt) if bs else None,
            w_bit=qcfg.w_bit,
            group_size=qcfg.group_size,
        )

    def vec(fmt: str):
        return jnp.asarray(
            np.stack([np.asarray(sd[fmt.format(i=i)]) for i in range(L)]), dt
        )

    layers: Dict[str, Any] = {
        "ln1": vec(_LLAMA_MAP["ln1"]),
        "ln2": vec(_LLAMA_MAP["ln2"]),
    }
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
        layers[name] = qlin(_LLAMA_MAP[name])
    params: Dict[str, Any] = {
        "embed": jnp.asarray(np.asarray(sd["model.embed_tokens.weight"]), dt),
        "layers": layers,
        "norm": jnp.asarray(np.asarray(sd["model.norm.weight"]), dt),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(
            np.asarray(sd["lm_head.weight"]).T, dt
        )
    return cfg, params, qcfg
