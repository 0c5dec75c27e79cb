"""SmoothQuant: activation-outlier balancing for W8A8 layers.

Counterpart of ``awq/quantize/smooth.py`` (a SmoothQuant port used on
VILA/Siglip vision towers): collect per-channel activation absmax stats,
then fold ``s = amax(act)^alpha / amax(w)^(1-alpha)`` into LN->linear pairs
(``smooth_ln_fcs``, ``smooth.py:198-224``). Stats here come from a pure
capture function instead of forward hooks.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from awq_tpu.models.layers import Linear


def collect_act_stats(
    capture_fn: Callable[[jax.Array], Dict[str, jax.Array]],
    batches: Sequence[jax.Array],
) -> Dict[str, jax.Array]:
    """Per-channel activation absmax over calibration batches.

    ``capture_fn(batch) -> {name: activation [..., D]}`` is the functional
    stand-in for the reference's forward hooks (``smooth.py:23-56``).
    """
    stats: Dict[str, jax.Array] = {}
    for b in batches:
        acts = capture_fn(b)
        for name, a in acts.items():
            m = jnp.max(jnp.abs(a.astype(jnp.float32).reshape(-1, a.shape[-1])),
                        axis=0)
            stats[name] = m if name not in stats else jnp.maximum(stats[name], m)
    return stats


def smooth_scale(
    act_max: jax.Array,       # [D]
    weights: Sequence[jax.Array],  # each [D, OC]
    alpha: float = 0.5,
) -> jax.Array:
    """s = amax(act)^alpha / amax(|w|)^(1-alpha)  (``smooth.py:208-216``)."""
    w_max = jnp.max(
        jnp.concatenate([jnp.abs(w.astype(jnp.float32)) for w in weights],
                        axis=1),
        axis=1,
    )
    s = (jnp.clip(act_max, 1e-5, None) ** alpha
         / jnp.clip(w_max, 1e-5, None) ** (1 - alpha))
    return jnp.clip(s, 1e-5, None)


def smooth_ln_fcs(
    ln_w: jax.Array,
    ln_b: Optional[jax.Array],
    fcs: Sequence[Linear],
    act_max: jax.Array,
    alpha: float = 0.5,
):
    """Divide LN params by s, multiply linears' input channels by s.

    Returns (ln_w, ln_b, [Linear...], s). Counterpart of ``smooth_ln_fcs``
    (``smooth.py:198-224``).
    """
    s = smooth_scale(act_max, [f.w for f in fcs], alpha)
    new_ln_w = (ln_w.astype(jnp.float32) / s).astype(ln_w.dtype)
    new_ln_b = None
    if ln_b is not None:
        new_ln_b = (ln_b.astype(jnp.float32) / s).astype(ln_b.dtype)
    new_fcs = [
        Linear(w=(f.w.astype(jnp.float32) * s[:, None]).astype(f.w.dtype),
               b=f.b)
        for f in fcs
    ]
    return new_ln_w, new_ln_b, new_fcs, s
