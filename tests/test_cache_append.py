"""Pallas batched cache append == the per-row dynamic_update_slice loop."""

import jax
import jax.numpy as jnp
import numpy as np

from awq_tpu.ops.cache_append import batched_cache_append


def test_batched_append_matches_slice_loop():
    L, B, nkv, T, hd = 3, 4, 2, 16, 128
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    cache = (jax.random.normal(k1, (L, 2, B, nkv, T, hd)) * 0.1
             ).astype(jnp.bfloat16)
    kv = (jax.random.normal(k2, (L, 2, B, nkv, hd)) * 0.1
          ).astype(jnp.bfloat16)
    lengths = jnp.asarray([0, 3, 7, 15], jnp.int32)  # even/odd/last slots

    ref = cache
    for i in range(B):
        row = kv[:, :, i][:, :, None, :, None, :]
        ref = jax.lax.dynamic_update_slice(
            ref, row, (0, 0, i, 0, int(lengths[i]), 0))

    got = batched_cache_append(cache.copy(), kv, lengths)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
