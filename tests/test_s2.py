"""S2 tiling tests."""

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.models.s2 import (
    dynamic_s2_preprocess,
    feats_to_grid,
    merge_chessboard,
    merge_features_for_s2,
    split_chessboard,
)


def test_chessboard_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    tiles = split_chessboard(x, 2)
    assert tiles.shape == (8, 4, 4, 3)
    back = merge_chessboard(tiles, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # tile order is row-major: top-left tile first
    np.testing.assert_allclose(np.asarray(tiles[0]), np.asarray(x[0, :4, :4]))


def test_merge_features_for_s2_shapes():
    c = 16
    f1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, c))   # 1x1, 4x4
    f2 = jax.random.normal(jax.random.PRNGKey(2), (4, 16, c))   # 2x2 tiles
    out = merge_features_for_s2([f1, f2], scales=(1, 2), base_side=4)
    assert out.shape == (1, 16, 2 * c)
    # scale-1 channels pass through unresized
    np.testing.assert_allclose(
        np.asarray(out[0, :, :c]),
        np.asarray(f1[0]), rtol=1e-5, atol=1e-5,
    )


def test_dynamic_s2_preprocess():
    img = jax.random.normal(jax.random.PRNGKey(3), (100, 200, 3))
    tiles, (nx, ny) = dynamic_s2_preprocess(img, base_size=32, max_tiles=6)
    assert nx / ny == 2.0  # matches the 2:1 aspect
    assert tiles.shape == (nx * ny + 1, 32, 32, 3)


def test_pixel_shuffle_downsample():
    from awq_tpu.models.s2 import pixel_shuffle_downsample

    g = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 8))
    out = pixel_shuffle_downsample(g, 2)
    assert out.shape == (1, 2, 2, 32)
    # the 2x2 top-left patch lands in the first output cell's channels
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]).reshape(2, 2, 8),
        np.asarray(g[0, :2, :2, :]),
    )
