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


def area_resize(grid: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Adaptive-average-pool resize of ``[B, H, W, C]`` to ``(out_h, out_w)``
    — exact counterpart of torch ``F.interpolate(mode="area")`` as used by
    NVILA's multi-scale merge (``nvila/llava_arch.py:361-368``): output cell
    ``i`` is the uniform mean of input cells ``[floor(i*H/out),
    ceil((i+1)*H/out))``."""
    b, h, w, c = grid.shape

    def pool_matrix(n_in: int, n_out: int) -> jax.Array:
        rows = []
        for i in range(n_out):
            lo = (i * n_in) // n_out
            hi = -((-(i + 1) * n_in) // n_out)  # ceil
            row = jnp.zeros((n_in,), jnp.float32)
            row = row.at[lo:hi].set(1.0 / (hi - lo))
            rows.append(row)
        return jnp.stack(rows)                     # [n_out, n_in]

    ah = pool_matrix(h, out_h)
    aw = pool_matrix(w, out_w)
    out = jnp.einsum("oh,bhwc->bowc", ah, grid.astype(jnp.float32))
    out = jnp.einsum("ow,bhwc->bhoc", aw, out)
    return out.astype(grid.dtype)


def find_closest_aspect_ratio(
    aspect: float, ratios, width: int, height: int, image_size: int
) -> Tuple[int, int]:
    """InternVL/NVILA tile-grid selection: closest (w_tiles, h_tiles) to the
    image aspect ratio, preferring more coverage on ties."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for r in ratios:
        target = r[0] / r[1]
        diff = abs(aspect - target)
        if diff < best_diff:
            best_diff = diff
            best = r
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * r[0] * r[1]:
                best = r
    return best


def _grid_tiles(img: jax.Array, ny: int, nx: int, s: int) -> jax.Array:
    """Resize [H, W, 3] to (ny*s, nx*s) and split row-major into tiles."""
    big = jax.image.resize(img, (ny * s, nx * s, 3), "bilinear")
    tiles = big.reshape(ny, s, nx, s, 3)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(ny * nx, s, s, 3)


def dynamic_s2_multiscale_preprocess(
    image: jax.Array,                  # [H, W, 3] float
    scales: Sequence[int],             # e.g. (448, 896, 1344)
    base_size: int,                    # scales[0] == tower input size
    max_tiles: int = 12,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """NVILA dynamic-S2 tiling: every scale but the last is a square
    chessboard of ``(scale/base)^2`` tiles; the last scale picks an
    aspect-fit ``(w_tiles, h_tiles)`` grid with ``min_num <= w*h <=
    max_tiles`` where ``min_num = (scales[-1]/scales[0])^2`` (the VILA
    ``mm_utils`` dynamic_s2 recipe feeding
    ``merge_features_for_dynamic_s2``). Returns stacked tiles
    ``[sum_tiles, S, S, 3]`` and the last scale's block size ``(h, w)``."""
    h, w = image.shape[:2]
    tiles = []
    for scale in scales[:-1]:
        r = scale // scales[0]
        tiles.append(_grid_tiles(image, r, r, base_size))
    min_num = (scales[-1] // scales[0]) ** 2
    ratios = sorted(
        {(i, j)
         for n in range(min_num, max_tiles + 1)
         for i in range(1, n + 1)
         for j in range(1, n + 1)
         if min_num <= i * j <= max_tiles},
        key=lambda r: r[0] * r[1],
    )
    wt, ht = find_closest_aspect_ratio(w / h, ratios, w, h, base_size)
    tiles.append(_grid_tiles(image, ht, wt, base_size))
    return jnp.concatenate(tiles, axis=0), (ht, wt)


def merge_chessboard_hw(x: jax.Array, ny: int, nx: int) -> jax.Array:
    """[B*ny*nx, h, w, C] row-major tiles -> [B, ny*h, nx*w, C]
    (rectangular counterpart of :func:`merge_chessboard`, matching the
    reference ``merge_chessboard(x, num_split_h, num_split_w)``)."""
    bnn, h, w, c = x.shape
    b = bnn // (ny * nx)
    x = x.reshape(b, ny, nx, h, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, ny * h, nx * w, c)


def split_chessboard_hw(x: jax.Array, ny: int, nx: int) -> jax.Array:
    """Inverse of :func:`merge_chessboard_hw`."""
    b, hh, ww, c = x.shape
    h, w = hh // ny, ww // nx
    x = x.reshape(b, ny, h, nx, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * ny * nx, h, w, c)
