"""Quantized-checkpoint serialization.

Counterpart of the reference's checkpoint tooling: ``torch.save`` of real-
quantized state dicts with a ``*-v2.pt`` layout-version convention
(``awq/entry.py:238-246``), loader-side version check
(``tinychat/utils/load_quant.py:16-24``), per-tensor split checkpoints for
memory-efficient loading (``tinychat/split_ckpt.py``). Here the container is
**safetensors** (zero-copy numpy mmap) + a JSON sidecar holding the model /
quant configs and the pack-layout version.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig, QuantConfig, RopeScaling
from awq_tpu.models.layers import Linear
from awq_tpu.ops.w4a16 import QLinear

PACK_LAYOUT_VERSION = 1  # int32 [IC//8, OC], 64-channel chunks (packing.py)


def _flatten(params: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten the params pytree to {dotted_name: array} + leaf-type tags."""
    flat: Dict[str, Any] = {}
    tags: Dict[str, Any] = {}
    for k, v in params.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            f, t = _flatten(v, name + ".")
            flat.update(f)
            tags.update(t)
        elif isinstance(v, QLinear):
            tags[name] = {
                "kind": "qlinear",
                "w_bit": v.w_bit,
                "group_size": v.group_size,
                "tiled_bn": v.tiled_bn,
                "folded": v.folded,
                "dense3": v.dense3,
                "n_groups": v.n_groups,
            }
            flat[name + ".qweight"] = v.qweight
            flat[name + ".scales"] = v.scales
            flat[name + ".szeros"] = v.szeros
            if v.bias is not None:
                flat[name + ".bias"] = v.bias
        elif isinstance(v, Linear):
            tags[name] = {"kind": "linear"}
            flat[name + ".w"] = v.w
            if v.b is not None:
                flat[name + ".b"] = v.b
        elif v is None:
            continue
        else:
            tags[name] = {"kind": "array"}
            flat[name] = v
    return flat, tags


def _unflatten(flat: Dict[str, np.ndarray], tags: Dict[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}

    def put(name: str, value):
        parts = name.split(".")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    for name, tag in tags.items():
        kind = tag["kind"]
        if kind == "qlinear":
            put(name, QLinear(
                qweight=jnp.asarray(flat[name + ".qweight"]),
                scales=jnp.asarray(flat[name + ".scales"]),
                szeros=jnp.asarray(flat[name + ".szeros"]),
                bias=(jnp.asarray(flat[name + ".bias"])
                      if name + ".bias" in flat else None),
                w_bit=tag["w_bit"],
                group_size=tag["group_size"],
                tiled_bn=tag.get("tiled_bn", 0),
                folded=tag.get("folded", False),
                dense3=tag.get("dense3", False),
                n_groups=tag.get("n_groups", 0),
            ))
        elif kind == "linear":
            put(name, Linear(
                w=jnp.asarray(flat[name + ".w"]),
                b=(jnp.asarray(flat[name + ".b"])
                   if name + ".b" in flat else None),
            ))
        else:
            put(name, jnp.asarray(flat[name]))
    return params


def save_checkpoint(
    path: str,
    params: Dict[str, Any],
    cfg: ModelConfig,
    qcfg: Optional[QuantConfig] = None,
) -> None:
    """Write ``<path>.safetensors`` + ``<path>.json``."""
    from safetensors.numpy import save_file

    flat, tags = _flatten(params)
    np_flat = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # safetensors-numpy has no bf16; store raw bits
            a = a.view(np.uint16)
            tags.setdefault("__bf16__", []).append(k)
        np_flat[k] = a
    bf16_keys = tags.pop("__bf16__", [])
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    save_file(np_flat, path + ".safetensors")
    meta = {
        "pack_layout_version": PACK_LAYOUT_VERSION,
        "model_config": dataclasses.asdict(cfg),
        "quant_config": dataclasses.asdict(qcfg) if qcfg else None,
        "tags": tags,
        "bf16_keys": bf16_keys,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def split_checkpoint(path: str, out_dir: str) -> int:
    """Split a saved checkpoint into one file per tensor.

    Counterpart of ``tinychat/split_ckpt.py:6-28`` (per-tensor checkpoints
    for memory-constrained shard-by-shard loading). Returns tensor count."""
    from safetensors.numpy import load_file, save_file

    flat = load_file(path + ".safetensors")
    os.makedirs(out_dir, exist_ok=True)
    import shutil

    shutil.copy(path + ".json", os.path.join(out_dir, "meta.json"))
    for i, (k, v) in enumerate(sorted(flat.items())):
        save_file({k: v}, os.path.join(out_dir, f"t{i:05d}.safetensors"))
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump({k: f"t{i:05d}.safetensors"
                   for i, k in enumerate(sorted(flat))}, f)
    return len(flat)


def load_split_checkpoint(out_dir: str):
    """Shard-by-shard loader (``mem_efficient_load`` counterpart,
    ``tinychat/utils/load_quant.py:27-58``): peak host memory is one tensor
    plus the accumulated device arrays."""
    from safetensors.numpy import load_file

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    ver = meta.get("pack_layout_version")
    if ver != PACK_LAYOUT_VERSION:
        raise ValueError(f"split checkpoint pack layout v{ver} unsupported")
    with open(os.path.join(out_dir, "index.json")) as f:
        index = json.load(f)
    flat: Dict[str, np.ndarray] = {}
    for k, fname in index.items():
        flat.update(load_file(os.path.join(out_dir, fname)))
    for k in meta.get("bf16_keys", []):
        flat[k] = flat[k].view(jnp.bfloat16)
    mc = dict(meta["model_config"])
    if mc.get("rope_scaling"):
        mc["rope_scaling"] = RopeScaling(**mc["rope_scaling"])
    cfg = ModelConfig(**mc)
    qcfg = QuantConfig(**meta["quant_config"]) if meta["quant_config"] else None
    return _unflatten(flat, meta["tags"]), cfg, qcfg


def load_checkpoint(
    path: str,
) -> Tuple[Dict[str, Any], ModelConfig, Optional[QuantConfig]]:
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    from safetensors.numpy import load_file

    with open(path + ".json") as f:
        meta = json.load(f)
    ver = meta.get("pack_layout_version")
    if ver != PACK_LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint pack layout v{ver} != supported v{PACK_LAYOUT_VERSION}"
            " — repack the checkpoint (cf. the reference's v1->v2 repacker,"
            " tinychat/offline-weight-repacker.py)"
        )
    flat = load_file(path + ".safetensors")
    for k in meta.get("bf16_keys", []):
        flat[k] = flat[k].view(jnp.bfloat16)
    mc = dict(meta["model_config"])
    if mc.get("rope_scaling"):
        mc["rope_scaling"] = RopeScaling(**mc["rope_scaling"])
    cfg = ModelConfig(**mc)
    qcfg = QuantConfig(**meta["quant_config"]) if meta["quant_config"] else None
    return _unflatten(flat, meta["tags"]), cfg, qcfg
