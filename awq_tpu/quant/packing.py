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

INT3 weights reuse the same container with codes 0..7 (one wasted bit —
the reference has *no* INT3 runtime at all, only pseudo-quant:
``qmodule.py:82`` hard-asserts w_bit==4). A dense 3-bit bitplane codec
(``pack_int3_dense``) is provided for checkpoint storage.
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
