"""Native repacker tests: C++ (or numpy fallback) vs layout definitions."""

import numpy as np
import pytest

from awq_tpu import native
from awq_tpu.quant.packing import pack_int4, unpack_int4


def _pack_v2_reference(codes: np.ndarray) -> np.ndarray:
    """Forward TinyChat-v2 packing (layout spec from qmodule.py:26-65),
    independently written in numpy as the test oracle."""
    N, K = codes.shape
    x = codes.reshape(N, K // 32, 4, 4, 2).transpose(0, 1, 3, 2, 4)
    x = x.reshape(N, K // 32, 4, 4, 2).transpose(0, 1, 2, 4, 3)
    x = x.reshape(N // 4, 4, K // 64, 64).transpose(0, 2, 1, 3)
    x = x.reshape(N // 4, K // 64, 64, 4).astype(np.uint16)
    w = x[..., 0] | (x[..., 1] << 4) | (x[..., 2] << 8) | (x[..., 3] << 12)
    return w.reshape(N // 4, K).view(np.int16)


def test_unpack_awq_v2_inverts_reference_packing():
    rng = np.random.RandomState(0)
    N, K = 8, 128
    codes = rng.randint(0, 16, (N, K)).astype(np.uint8)
    packed = _pack_v2_reference(codes)
    out = native.unpack_awq_v2(packed, N, K)
    np.testing.assert_array_equal(out, codes)


def test_unpack_awq_gemm():
    rng = np.random.RandomState(1)
    K, N = 16, 64
    codes = rng.randint(0, 16, (K, N)).astype(np.uint8)
    order = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    nib = codes.reshape(K, N // 8, 8)[:, :, order].astype(np.uint32)
    packed = np.zeros((K, N // 8), np.uint32)
    for s in range(8):
        packed |= nib[:, :, s] << (4 * s)
    out = native.unpack_awq_gemm(packed.view(np.int32), K, N)
    np.testing.assert_array_equal(out, codes)


def test_pack_int4_tpu_matches_jax_packing():
    rng = np.random.RandomState(2)
    ic, oc = 128, 64
    codes = rng.randint(0, 16, (ic, oc)).astype(np.uint8)
    ref = np.asarray(pack_int4(codes))
    out = native.pack_int4_tpu(codes)
    np.testing.assert_array_equal(out, ref)
    # and the jax unpack inverts it
    np.testing.assert_array_equal(np.asarray(unpack_int4(out)), codes)


def test_native_lib_builds():
    # informational: native path should build in this image (g++ present)
    assert native.native_available(), "native librepack.so failed to build"


def test_v2_roundtrip_through_tpu_layout():
    """Full import path: v2 checkpoint -> codes -> TPU packing."""
    rng = np.random.RandomState(3)
    N, K = 16, 128  # [OC, IC] torch convention
    codes_nk = rng.randint(0, 16, (N, K)).astype(np.uint8)
    v2 = _pack_v2_reference(codes_nk)
    codes = native.unpack_awq_v2(v2, N, K)
    packed = native.pack_int4_tpu(np.ascontiguousarray(codes.T))  # [IC, OC]
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(packed)), codes_nk.T
    )
