import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.quant import (
    pack_int4,
    unpack_int4,
    pack_int3_dense,
    unpack_int3_dense,
)


def _codes(ic, oc, hi, seed=0):
    return jax.random.randint(
        jax.random.PRNGKey(seed), (ic, oc), 0, hi, dtype=jnp.int32
    ).astype(jnp.uint8)


@pytest.mark.parametrize("ic,oc", [(64, 128), (256, 32), (128, 256)])
def test_int4_roundtrip(ic, oc):
    q = _codes(ic, oc, 16)
    p = pack_int4(q)
    assert p.shape == (ic // 8, oc) and p.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(unpack_int4(p)), np.asarray(q))


def test_int4_layout_semantics():
    """Code at ic = 64c + 8s + r lives in word [8c + r] bits 4s..4s+3."""
    ic, oc = 128, 8
    q = np.asarray(_codes(ic, oc, 16, seed=1))
    p = np.asarray(pack_int4(jnp.asarray(q))).view(np.uint32)
    for ic_idx in [0, 7, 8, 63, 64, 100, 127]:
        c, rem = divmod(ic_idx, 64)
        s, r = divmod(rem, 8)
        got = (p[8 * c + r] >> (4 * s)) & 0xF
        np.testing.assert_array_equal(got, q[ic_idx])


def test_int3_dense_roundtrip():
    q = _codes(96, 64, 8)
    p = pack_int3_dense(q)
    assert p.shape == (3, 3, 64)
    np.testing.assert_array_equal(np.asarray(unpack_int3_dense(p)), np.asarray(q))


def test_int3_in_nibble_container():
    q = _codes(128, 32, 8)
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(pack_int4(q))), np.asarray(q)
    )
