import jax
import jax.numpy as jnp
import numpy as np
import pytest

from awq_tpu.quant import (
    pseudo_quantize,
    quantize_groupwise,
    dequantize_groupwise,
)


def _rand(ic, oc, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (ic, oc), jnp.float32)


@pytest.mark.parametrize("n_bit,group", [(4, 128), (4, -1), (3, 128), (3, 64)])
def test_roundtrip_error_bounded(n_bit, group):
    w = _rand(256, 64)
    wq = pseudo_quantize(w, n_bit=n_bit, group_size=group)
    g = 256 if group == -1 else group
    # max abs error per group is <= scale/2 = (max-min)/(2*(2^n-1))
    wg = np.asarray(w).reshape(-1, g, 64)
    span = wg.max(1) - wg.min(1)
    bound = span / (2 * (2**n_bit - 1)) + 1e-6
    err = np.abs(np.asarray(wq - w)).reshape(-1, g, 64).max(1)
    assert (err <= bound).all()


def test_matches_torch_reference():
    """Bit-exact parity with the reference pseudo_quantize_tensor
    (awq/quantize/quantizer.py:61-103), reimplemented here in torch."""
    torch = pytest.importorskip("torch")
    w = np.asarray(_rand(512, 128, seed=3))
    n_bit, g = 4, 128

    # torch reference math on [OC, IC] with groups along IC
    t = torch.from_numpy(w.T.copy())  # [OC, IC]
    tw = t.reshape(-1, g)
    max_val = tw.amax(dim=1, keepdim=True)
    min_val = tw.amin(dim=1, keepdim=True)
    max_int = 2**n_bit - 1
    scales = (max_val - min_val).clamp(min=1e-5) / max_int
    zeros = (-torch.round(min_val / scales)).clamp_(0, max_int)
    ref = ((torch.clamp(torch.round(tw / scales) + zeros, 0, max_int) - zeros)
           * scales)
    ref = ref.reshape(t.shape).numpy().T  # back to [IC, OC]

    # integer codes must match bit-for-bit (same rounding semantics) ...
    ref_q = torch.clamp(torch.round(tw / scales) + zeros, 0, max_int)
    ref_q = ref_q.reshape(t.shape).numpy().T.astype(np.uint8)
    q, _, _ = quantize_groupwise(jnp.asarray(w), n_bit=n_bit, group_size=g)
    np.testing.assert_array_equal(np.asarray(q), ref_q)
    # ... dequantized values to 1 ulp (mul ordering differs between backends)
    ours = np.asarray(pseudo_quantize(jnp.asarray(w), n_bit=n_bit, group_size=g))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_quantize_dequantize_consistency():
    w = _rand(256, 32, seed=1)
    q, s, z = quantize_groupwise(w, n_bit=4, group_size=64)
    assert q.dtype == jnp.uint8 and q.max() <= 15
    assert s.shape == (4, 32) and z.shape == (4, 32)
    deq = dequantize_groupwise(q, s, z)
    np.testing.assert_allclose(
        np.asarray(deq),
        np.asarray(pseudo_quantize(w, n_bit=4, group_size=64)),
        rtol=1e-6, atol=1e-6,
    )


def test_clip_max_applied():
    w = _rand(128, 16, seed=2)
    cm = jnp.full((1, 16), 0.5)
    wq = pseudo_quantize(w, n_bit=4, group_size=-1, clip_max=cm)
    # reconstruction grid can overshoot the clip bound by half a step
    # (zero-point rounding), exactly as in the reference
    step = 1.0 / 15
    assert np.abs(np.asarray(wq)).max() <= 0.5 + step / 2 + 1e-6


def test_zero_point_false_symmetric():
    w = _rand(128, 16, seed=4)
    q, s, z = quantize_groupwise(w, n_bit=4, group_size=-1, zero_point=False)
    assert np.all(np.asarray(z) == 8.0)
    deq = dequantize_groupwise(q, s, z)
    assert np.abs(np.asarray(deq - w)).max() < np.abs(w).max() / 7
