"""S2 / dynamic-resolution tiling for VLM vision towers.

Counterpart of NVILA's multi-scale feature plumbing
(``tinychat/models/nvila/llava_arch.py:261-392``:
``split_chessboard`` / ``merge_chessboard`` /
``merge_features_for_dynamic_s2``): large images are split into an n x n
chessboard of base-resolution tiles, encoded tile-by-tile (batched through
the tower), reassembled spatially, and multi-scale features are
channel-concatenated at the base grid resolution.

Functional JAX, NHWC images, ``[B, P, C]`` patch features.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def split_chessboard(x: jax.Array, n: int) -> jax.Array:
    """[B, H, W, C] -> [B*n*n, H/n, W/n, C] (row-major tiles)."""
    b, h, w, c = x.shape
    assert h % n == 0 and w % n == 0, (h, w, n)
    x = x.reshape(b, n, h // n, n, w // n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * n * n, h // n, w // n, c)


def merge_chessboard(x: jax.Array, n: int) -> jax.Array:
    """Inverse of :func:`split_chessboard`."""
    bnn, h, w, c = x.shape
    b = bnn // (n * n)
    x = x.reshape(b, n, n, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, n * h, n * w, c)


def feats_to_grid(feats: jax.Array) -> jax.Array:
    """[B, P, C] patch features -> [B, s, s, C] (P must be square)."""
    b, p, c = feats.shape
    s = int(round(p ** 0.5))
    assert s * s == p, f"non-square patch count {p}"
    return feats.reshape(b, s, s, c)


def grid_to_feats(grid: jax.Array) -> jax.Array:
    b, h, w, c = grid.shape
    return grid.reshape(b, h * w, c)


def merge_features_for_s2(
    tile_feats: Sequence[jax.Array],   # per scale: [n_i^2, P, C]
    scales: Sequence[int],             # tile counts per side, e.g. (1, 2)
    base_side: int,                    # output grid side (patches)
) -> jax.Array:
    """Merge multi-scale tile features -> [1, base_side^2, C * n_scales].

    Each scale's tiles are chessboard-merged to a large grid, resized
    (bilinear) to the base grid, and channel-concatenated — the S2 recipe
    (``llava_arch.py:261-392``).
    """
    outs: List[jax.Array] = []
    for feats, n in zip(tile_feats, scales):
        grid = feats_to_grid(feats)                    # [n^2, s, s, C]
        merged = merge_chessboard(grid, n)             # [1, n*s, n*s, C]
        resized = jax.image.resize(
            merged,
            (1, base_side, base_side, merged.shape[-1]),
            method="bilinear",
        )
        outs.append(resized)
    return grid_to_feats(jnp.concatenate(outs, axis=-1))


def pixel_shuffle_downsample(grid: jax.Array, factor: int = 2) -> jax.Array:
    """InternVL-style pixel shuffle: merge ``factor x factor`` spatial
    patches into channels — [B, H, W, C] -> [B, H/f, W/f, C*f*f]
    (counterpart of the pixel-shuffle in ``tinychat/models/internvl3.py:55-383``,
    which quarters the image-token count before the projector)."""
    b, h, w, c = grid.shape
    assert h % factor == 0 and w % factor == 0
    x = grid.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def dynamic_s2_preprocess(
    image: jax.Array,                  # [H, W, 3] float
    base_size: int,
    max_tiles: int = 12,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Pick an (nx, ny) tiling <= max_tiles that best matches the aspect
    ratio, resize, and return stacked base-size tiles [nx*ny(+1), S, S, 3]
    with a thumbnail tile first (NVILA dynamic-res behavior)."""
    h, w = image.shape[:2]
    best, best_err = (1, 1), float("inf")
    for ny in range(1, max_tiles + 1):
        for nx in range(1, max_tiles // ny + 1):
            err = abs((w / h) - (nx / ny))
            if err < best_err or (err == best_err
                                  and nx * ny > best[0] * best[1]):
                best, best_err = (nx, ny), err
    nx, ny = best
    thumb = jax.image.resize(image, (base_size, base_size, 3), "bilinear")
    big = jax.image.resize(image, (ny * base_size, nx * base_size, 3),
                           "bilinear")
    tiles = big.reshape(ny, base_size, nx, base_size, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(-1, base_size, base_size, 3)
    return jnp.concatenate([thumb[None], tiles], axis=0), (nx, ny)
