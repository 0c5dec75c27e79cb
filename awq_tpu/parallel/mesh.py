"""Device-mesh construction and shape selection.

The reference's only multi-device machinery is an accelerate device map
splitting decoder blocks across GPUs plus a GPU-count heuristic keyed on the
parameter-count suffix of the model path (``awq/utils/parallel.py:6-28``,
``awq/entry.py:166-186``). The TPU-native replacement is a first-class
``jax.sharding.Mesh`` with named axes:

- ``dp``  — data parallel (batch / calibration shards), rides DCN or ICI
- ``tp``  — tensor parallel (sharded quantized matmuls), must ride ICI

Everything downstream is ``NamedSharding`` annotations; XLA GSPMD inserts
the collectives (all-gather for column-parallel outputs, psum for
row-parallel contractions) — no per-module hooks, no NCCL.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    tp: int = 1

    @property
    def n_devices(self) -> int:
        return self.dp * self.tp


def pick_mesh_shape(
    n_params_b: float,
    n_devices: Optional[int] = None,
    max_tp: int = 8,
) -> MeshConfig:
    """Choose (dp, tp) from model size and available devices.

    Counterpart of the reference's GPU-count heuristic
    (``awq/utils/parallel.py:6-28``), but mesh-shaped: enough ``tp`` to fit
    the model (≈0.6 GB/chip-HBM-GB per billion params at W4), rest ``dp``.
    """
    n = n_devices if n_devices is not None else len(jax.devices())
    # ~0.55 GiB per 1B params at 4-bit; assume ≥16 GiB HBM per chip and
    # leave half for KV cache + activations.
    tp = 1
    while tp < min(n, max_tp) and n_params_b * 0.6 > 8.0 * tp:
        tp *= 2
    while n % tp != 0:
        tp //= 2
    return MeshConfig(dp=n // tp, tp=tp)


def parse_mesh_arg(s: Optional[str]) -> Optional[Mesh]:
    """CLI ``--mesh 'dp,tp'`` (or just ``'tp'``) -> Mesh; None/'' -> None.

    The serving/demo counterpart of the reference's
    ``CUDA_VISIBLE_DEVICES`` heuristic (``awq/utils/parallel.py:6-28``)."""
    if not s:
        return None
    parts = [int(x) for x in s.split(",")]
    dp, tp = (1, parts[0]) if len(parts) == 1 else parts
    return make_mesh(MeshConfig(dp=dp, tp=tp))


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Build a 2-axis mesh. ``tp`` is the fastest-varying (innermost) axis so
    tensor-parallel collectives ride ICI neighbours."""
    devs = list(devices) if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(dp=1, tp=len(devs))
    if cfg.n_devices > len(devs):
        raise ValueError(
            f"mesh {cfg} needs {cfg.n_devices} devices, have {len(devs)}"
        )
    grid = np.asarray(devs[: cfg.n_devices]).reshape(cfg.dp, cfg.tp)
    return Mesh(grid, axis_names)
