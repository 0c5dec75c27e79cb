"""TPU-friendly sub-byte weight packing.

The reference packs INT4 weights with a tensor-core-specific interleave
(32-element shuffle + ``[0,2,4,6,1,3,5,7]`` reorder + 4-row interleave into
int16, ``awq/quantize/qmodule.py:26-65``) that matches ``ldmatrix``/``mma``
fragment layouts. None of that is meaningful on TPU, so the layout here is
re-derived from Mosaic tiling constraints instead:

Runtime layout (``pack_int4``)
------------------------------
``q [IC, OC] (codes 0..15)  ->  packed int32 [IC//8, OC]``

Within each chunk of 64 input channels, code for input channel
``ic = 64*c + 8*s + r`` lives in word ``p = 8*c + r`` at nibble slot ``s``
(bits ``4s..4s+3``). Properties:

- A block of 8 consecutive packed rows (one f32/int32 sublane tile) unpacks
  to 64 consecutive input channels with **eight shift-and ops and one
  tile-aligned stack** — no sublane interleave, no lane shuffles. This is
  what the in-kernel dequant of the Pallas W4A16 matmul does.
- The last dimension (OC, lanes) is untouched, so the packed array shards
  over a tensor-parallel mesh axis on OC exactly like the fp16 weight would.
- Quantization groups (multiples of 64 input channels) map to whole chunks,
  so per-group scales broadcast along full sublane tiles.

INT3 runtime layout (``pack_int3``)
-----------------------------------
``q [IC, OC] (codes 0..7)  ->  packed int32 [IC*3//32, OC]`` — true
3-bit density, 0.75x the HBM bytes of the nibble container. Decode is
purely bandwidth-bound, so this is the whole point of W3 at decode (the
reference has *no* INT3 runtime at all, only pseudo-quant:
``qmodule.py:82`` hard-asserts w_bit==4). Layout per 256-IC chunk
(24 words), chosen so every extraction op works on whole 8-row sublane
tiles with no interleave, like the int4 layout:

- rows 0..15 (two 8-row groups ``g``): 2-bit LOW planes — word
  ``(g, r)`` bit ``2*s_lo .. 2*s_lo+1`` holds the low 2 bits of the code
  at ``ic = 256c + 8*(16g + s_lo) + r``.
- rows 16..23: 1-bit HIGH plane — word ``r`` bit ``s`` holds the high
  bit of the code at ``ic = 256c + 8s + r`` (s in 0..31).

Requires ``IC % 256 == 0`` (all deploy geometries); otherwise INT3
falls back to the nibble container. A dense 3-bit bitplane codec
(``pack_int3_dense``) is additionally provided for checkpoint storage.
"""

from __future__ import annotations

import jax.numpy as jnp

PACK_FACTOR = 8   # int4 codes per int32 word
PACK_CHUNK = 64   # input channels per packing chunk


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 codes ``[IC, OC]`` (values < 16) into int32 ``[IC//8, OC]``."""
    ic, oc = q.shape
    if ic % PACK_CHUNK != 0:
        raise ValueError(f"IC={ic} must be divisible by {PACK_CHUNK}")
    # [c, s, r, oc]
    qc = q.reshape(ic // PACK_CHUNK, 8, 8, oc).astype(jnp.uint32)
    packed = jnp.zeros((ic // PACK_CHUNK, 8, oc), dtype=jnp.uint32)
    for s in range(8):
        packed = packed | (qc[:, s] << (4 * s))
    return packed.reshape(ic // PACK_FACTOR, oc).view(jnp.int32)


def unpack_int4(packed: jnp.ndarray, out_dtype=jnp.uint8) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: int32 ``[IC//8, OC]`` -> codes ``[IC, OC]``.

    The same shift/mask/stack sequence is used inside Pallas kernels on a
    per-block basis (there the reshape spans only the current K block).
    """
    icp, oc = packed.shape
    w = packed.reshape(icp // 8, 8, oc)
    planes = [(w >> (4 * s)) & 0xF for s in range(8)]
    # [c, s, r, oc] -> [ic, oc]
    out = jnp.stack(planes, axis=1).reshape(icp * 8, oc)
    return out.astype(out_dtype)


INT3_CHUNK = 256        # input channels per runtime-layout chunk
INT3_ROWS = 24          # packed words per chunk (16 lo + 8 hi)


def pack_int3(q: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 codes ``[IC, OC]`` (values < 8) into the dense 3-bit
    runtime layout: int32 ``[IC*3//32, OC]`` (see module docstring)."""
    ic, oc = q.shape
    if ic % INT3_CHUNK != 0:
        raise ValueError(f"IC={ic} must be divisible by {INT3_CHUNK}")
    nc = ic // INT3_CHUNK
    qc = q.reshape(nc, 32, 8, oc).astype(jnp.uint32)   # [c, s, r, oc]
    lo = jnp.zeros((nc, 2, 8, oc), jnp.uint32)         # [c, g, r, oc]
    for s in range(32):
        g, s_lo = s >> 4, s & 15
        lo = lo.at[:, g].set(lo[:, g] | ((qc[:, s] & 3) << (2 * s_lo)))
    hi = jnp.zeros((nc, 8, oc), jnp.uint32)            # [c, r, oc]
    for s in range(32):
        hi = hi | ((qc[:, s] >> 2) << s)
    rows = jnp.concatenate([lo.reshape(nc, 16, oc), hi], axis=1)
    return rows.reshape(nc * INT3_ROWS, oc).view(jnp.int32)


def unpack_int3(packed: jnp.ndarray, out_dtype=jnp.uint8) -> jnp.ndarray:
    """Inverse of :func:`pack_int3`: int32 ``[IC*3//32, OC]`` -> codes
    ``[IC, OC]``. The same shift/mask/stack sequence runs inside the
    Pallas W3A16 kernels per 24-row chunk."""
    nrows, oc = packed.shape
    nc = nrows // INT3_ROWS
    w = packed.view(jnp.uint32).reshape(nc, INT3_ROWS, oc)
    lo = w[:, :16].reshape(nc, 2, 8, oc)               # [c, g, r, oc]
    hi = w[:, 16:]                                     # [c, r, oc]
    lo_planes = jnp.stack(
        [(lo[:, s >> 4] >> (2 * (s & 15))) & 3 for s in range(32)], axis=1
    )                                                  # [c, s, r, oc]
    hi_planes = jnp.stack(
        [(hi >> s) & 1 for s in range(32)], axis=1
    )                                                  # [c, s, r, oc]
    out = lo_planes | (hi_planes << 2)
    return out.reshape(nc * INT3_CHUNK, oc).astype(out_dtype)


def pack_int3_dense(q: jnp.ndarray) -> jnp.ndarray:
    """Bitplane-pack codes ``[IC, OC]`` (values < 8) into int32 ``[3, IC//32, OC]``.

    True 3-bit storage (for checkpoints): bit ``b`` of code at
    ``ic = 32*c + j`` is bit ``j`` of ``packed[b, c]``.
    """
    ic, oc = q.shape
    if ic % 32 != 0:
        raise ValueError(f"IC={ic} must be divisible by 32")
    qc = q.reshape(ic // 32, 32, oc).astype(jnp.uint32)
    planes = []
    for b in range(3):
        bit = (qc >> b) & 1
        word = jnp.zeros((ic // 32, oc), dtype=jnp.uint32)
        for j in range(32):
            word = word | (bit[:, j] << j)
        planes.append(word)
    return jnp.stack(planes, axis=0).view(jnp.int32)


def unpack_int3_dense(packed: jnp.ndarray, out_dtype=jnp.uint8) -> jnp.ndarray:
    """Inverse of :func:`pack_int3_dense` -> codes ``[IC, OC]``."""
    _, c, oc = packed.shape
    w = packed.view(jnp.uint32)
    cols = []
    for j in range(32):
        v = ((w[0] >> j) & 1) | (((w[1] >> j) & 1) << 1) | (((w[2] >> j) & 1) << 2)
        cols.append(v)
    out = jnp.stack(cols, axis=1).reshape(c * 32, oc)
    return out.astype(out_dtype)
