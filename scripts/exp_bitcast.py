#!/usr/bin/env python
"""Probe pltpu.bitcast int32 -> bf16 row-pairing semantics on real TPU.

Feeds words 0xAAAABBBB where AAAA = bf16 bits of (1000 + 2*i) and BBBB =
bf16 bits of (1000 + 2*i + 1) for source row i, then reports which output
row holds which value — tells us whether the LOW half-word becomes the
EVEN row (adjacent-pair packing) or some other scheme.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref):
    o_ref[:, :] = pltpu.bitcast(x_ref[:, :], jnp.bfloat16).astype(jnp.float32)


def main():
    rows, cols = 8, 128
    # value for (source row i, half h): 1000 + 2*i + h
    vals_lo = (16 * np.arange(rows))[:, None] * np.ones((1, cols))
    vals_hi = vals_lo + 8
    lo_bits = np.asarray(jnp.asarray(vals_lo, jnp.bfloat16).view(jnp.uint16),
                         np.uint32)
    hi_bits = np.asarray(jnp.asarray(vals_hi, jnp.bfloat16).view(jnp.uint16),
                         np.uint32)
    words = (hi_bits << 16) | lo_bits
    x = jnp.asarray(words.astype(np.int32))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * rows, cols), jnp.float32),
    )(x)
    out = np.asarray(out)
    print("col0 of each output row:", out[:, 0].astype(int).tolist())
    # interpretation
    for r in range(2 * rows):
        v = int(out[r, 0])
        src, half = v // 16, (v % 16) // 8
        print(f"out row {r:2d} <- src row {src} {'HI' if half else 'LO'} half")


if __name__ == "__main__":
    main()
