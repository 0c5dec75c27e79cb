"""Multimodal projectors (VILA/NVILA family).

TPU-native counterpart of the reference's mm_projector zoo (the reference
imports it from the external VILA ``llava`` package; the quantized demos
load its weights via ``tinychat/models/nvila/builder.py:66-242`` /
``llava_arch.py`` ``get_mm_projector``). Re-implemented functionally from
the architecture spec:

- ``linear``                  — one Linear
- ``mlp2x_gelu`` / ``mlp``    — Linear, GELU, Linear
- ``mlp_downsample``          — 2x2 space-to-channel, LayerNorm, Linear,
                                GELU, Linear (VILA-1.5)
- ``mlp_downsample_3x3_fix``  — 3x3 space-to-channel, LayerNorm, Linear,
                                GELU, LayerNorm, Linear, GELU, Linear
                                (NVILA "scale-then-compress")
- ``internvl_mlp1``           — LayerNorm, Linear, GELU, Linear applied
                                after pixel-shuffle (InternVL3's ``mlp1``,
                                ``tinychat/models/internvl3.py:99-104``)

A projector is a list of (op, params) steps; weights import from the
``mm_projector/`` sub-checkpoint's ``layers.{i}.*`` keys by position.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.models.layers import Linear, linear_apply


def _pad_to_multiple(grid: jax.Array, f: int) -> jax.Array:
    """Zero-pad H and W (dims 1, 2) of ``[B, H, W, C]`` up to multiples of
    ``f`` (matches the VILA flat_square padding semantics)."""
    b, h, w, c = grid.shape
    ph, pw = -h % f, -w % f
    if ph or pw:
        grid = jnp.pad(grid, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return grid


def flat_square(grid: jax.Array, f: int) -> jax.Array:
    """VILA's space-to-channel downsample on ``[B, H, W, C]`` -> ``[B, H/f,
    W/f, C*f*f]``, bit-exact to the torch reference's two view/permute
    passes: channels of the f*f block are ordered (column-within-row pairs
    first), i.e. ``view(n, w, h/f, c*f) -> permute -> view(n, h/f, w/f,
    c*f*f) -> permute``."""
    grid = _pad_to_multiple(grid, f)
    n, w, h, c = grid.shape  # torch code names dims (n, w, h, c)
    x = grid.reshape(n, w, h // f, c * f)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(n, h // f, w // f, c * f * f)
    return jnp.transpose(x, (0, 2, 1, 3))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerNormP:
    g: jax.Array
    b: jax.Array


@dataclasses.dataclass
class Projector:
    """Sequential projector. ``ops`` is static; ``params`` aligns with the
    parametrized ops ("ln" -> LayerNormP, "linear" -> Linear)."""

    mm_type: str
    ops: Tuple[str, ...]                 # "ds2"|"ds3"|"ln"|"linear"|"gelu"
    params: List[Any]

    def __call__(self, feats: jax.Array) -> jax.Array:
        """[B, P, C] -> [B, P', H]. P must be square for downsample ops."""
        x = feats
        pi = 0
        for op in self.ops:
            if op in ("ds2", "ds3"):
                f = 2 if op == "ds2" else 3
                b, p, c = x.shape
                side = int(round(p ** 0.5))
                assert side * side == p, f"non-square patch count {p}"
                g = flat_square(x.reshape(b, side, side, c), f)
                x = g.reshape(b, -1, g.shape[-1])
            elif op == "ln":
                ln: LayerNormP = self.params[pi]
                pi += 1
                xf = x.astype(jnp.float32)
                mu = xf.mean(-1, keepdims=True)
                var = xf.var(-1, keepdims=True)
                xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
                x = (xf * ln.g + ln.b).astype(x.dtype)
            elif op == "linear":
                x = linear_apply(self.params[pi], x)
                pi += 1
            elif op == "gelu":
                x = jax.nn.gelu(
                    x.astype(jnp.float32), approximate=False
                ).astype(x.dtype)
            else:
                raise ValueError(op)
        return x

    @property
    def downsample(self) -> int:
        for op in self.ops:
            if op == "ds2":
                return 2
            if op == "ds3":
                return 3
        return 1


PROJECTOR_OPS = {
    "linear": ("linear",),
    "mlp": ("linear", "gelu", "linear"),
    "mlp2x_gelu": ("linear", "gelu", "linear"),
    "mlp_downsample": ("ds2", "ln", "linear", "gelu", "linear"),
    "mlp_downsample_3x3_fix": (
        "ds3", "ln", "linear", "gelu", "ln", "linear", "gelu", "linear"
    ),
    "internvl_mlp1": ("ln", "linear", "gelu", "linear"),
}


def build_projector(
    mm_type: str,
    sd: dict,
    prefix: str = "layers.",
    dtype: str = "float32",
) -> Projector:
    """Assemble a :class:`Projector` from checkpoint tensors.

    ``sd`` holds ``{prefix}{i}.weight/bias`` numpy arrays where ``i`` is the
    position in the torch ``nn.Sequential`` (downsample/GELU steps have no
    params but still consume an index)."""
    if mm_type not in PROJECTOR_OPS:
        raise NotImplementedError(f"mm_projector type {mm_type!r}")
    ops = PROJECTOR_OPS[mm_type]
    dt = jnp.dtype(dtype)
    params: List[Any] = []
    for i, op in enumerate(ops):
        key = f"{prefix}{i}.weight"
        if op == "ln":
            params.append(LayerNormP(
                g=jnp.asarray(np.asarray(sd[key]), jnp.float32),
                b=jnp.asarray(np.asarray(sd[f"{prefix}{i}.bias"]),
                              jnp.float32),
            ))
        elif op == "linear":
            bkey = f"{prefix}{i}.bias"
            params.append(Linear(
                w=jnp.asarray(np.asarray(sd[key]).T, dt),
                b=(jnp.asarray(np.asarray(sd[bkey]), dt)
                   if bkey in sd else None),
            ))
    return Projector(mm_type=mm_type, ops=ops, params=params)


def init_projector(
    mm_type: str, mm_hidden: int, hidden: int, key: jax.Array,
    dtype: str = "float32",
) -> Projector:
    """Random-init (for tests/benchmarks without a checkpoint)."""
    ops = PROJECTOR_OPS[mm_type]
    dt = jnp.dtype(dtype)
    ds = {"ds2": 4, "ds3": 9}
    cur = mm_hidden
    # mirror the torch Sequential's layer widths
    widths: List[Tuple[int, int]] = []
    if mm_type == "mlp_downsample":
        widths = [(mm_hidden * 4, hidden), (hidden, hidden)]
        cur = mm_hidden * 4
    elif mm_type == "mlp_downsample_3x3_fix":
        widths = [(mm_hidden * 9, mm_hidden * 3), (mm_hidden * 3, hidden),
                  (hidden, hidden)]
        cur = mm_hidden * 9
    elif mm_type in ("mlp", "mlp2x_gelu"):
        widths = [(mm_hidden, hidden), (hidden, hidden)]
    elif mm_type == "internvl_mlp1":
        widths = [(mm_hidden, hidden), (hidden, hidden)]
    else:
        widths = [(mm_hidden, hidden)]
    params: List[Any] = []
    wi = 0
    for op in ops:
        if op == "ln":
            params.append(LayerNormP(g=jnp.ones((cur,), jnp.float32),
                                     b=jnp.zeros((cur,), jnp.float32)))
        elif op == "linear":
            ic, oc = widths[wi]
            wi += 1
            key, sub = jax.random.split(key)
            params.append(Linear(
                w=(jax.random.normal(sub, (ic, oc), jnp.float32)
                   * 0.02).astype(dt),
                b=jnp.zeros((oc,), dt),
            ))
            cur = oc
        elif op in ds:
            cur = cur * ds[op]
    return Projector(mm_type=mm_type, ops=ops, params=params)
