"""Batched KV-cache append: one Pallas call scatters every row's new
k/v into the cache at that row's OWN position.

The continuous-batching decode step produces ``kv [L, 2, B, n_kv, hd]``
per token with per-row write positions ``lengths [B]``. A python loop of
``B`` ``dynamic_update_slice`` ops works (round 1) but emits B separate
XLA fusions over the multi-GB cache and rewrites tiling-unaligned
single-position rows; XLA advanced-index scatter takes minutes to
compile at this rank. Counterpart: the reference fuses the append into
its decode-attention kernel
(``csrc/attention/decoder_masked_multihead_attention.cu:30-101``) — on
TPU the append cannot ride the attention kernel (single-position bf16
HBM writes violate the (2,128) tile granularity), so it is its own
kernel built on aligned read-modify-write:

for each batch row, DMA-read the 8-aligned sublane window containing
the row's position, patch the target sublane in VMEM (masked select),
and DMA-write the window back. Regions of different rows are disjoint (each row owns its batch
index), so iterations pipeline freely. The cache is donated and aliased
in place — no copy of the multi-GB buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _append_kernel(len_ref, kv_hbm, cache_hbm, out_ref,
                   buf, kvb, rsem, ksem, *, B):
    del cache_hbm  # aliased with out_ref; read and write through out_ref

    def body(i, _):
        t = len_ref[i]
        tp = (t // 8) * 8          # HBM slices need 8-aligned sublanes
        rd = pltpu.make_async_copy(
            out_ref.at[:, :, i, :, pl.ds(tp, 8), :], buf, rsem)
        kd = pltpu.make_async_copy(kv_hbm.at[:, :, i], kvb, ksem)
        rd.start()
        kd.start()
        rd.wait()
        kd.wait()

        m = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 3) == (t - tp)
        new = jnp.expand_dims(kvb[:, :, :, :], 3)     # [L,2,nkv,1,hd]
        buf[:, :, :, :, :] = jnp.where(m, new, buf[:, :, :, :, :])

        wr = pltpu.make_async_copy(
            buf, out_ref.at[:, :, i, :, pl.ds(tp, 8), :], rsem)
        wr.start()
        wr.wait()
        return 0

    jax.lax.fori_loop(0, B, body, 0, unroll=False)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=())
def batched_cache_append(cache: jax.Array, kv: jax.Array,
                         lengths: jax.Array) -> jax.Array:
    """Scatter ``kv [L, 2, B, n_kv, hd]`` into ``cache
    [L, 2, B, n_kv, T, hd]`` at per-row positions ``lengths [B]``,
    in place (cache is donated). Returns the updated cache."""
    L, _, B, nkv, T, hd = cache.shape
    assert T % 8 == 0, f"cache T axis must be 8-aligned, got {T}"
    # Precondition: every lengths[i] < T (a full slot would push the
    # 8-row RMW window past the T axis). BatchEngine admission enforces
    # this; clamp as a belt-and-braces guard so an OOB length corrupts
    # at most the last position instead of reading past the buffer.
    lengths = jnp.minimum(lengths.astype(jnp.int32), T - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # kv
            pl.BlockSpec(memory_space=pl.ANY),        # cache (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((L, 2, nkv, 8, hd), cache.dtype),   # RMW tile window
            pltpu.VMEM((L, 2, nkv, hd), cache.dtype),      # new k/v row
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_append_kernel, B=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},      # cache arg (after scalars) -> out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lengths, kv.astype(cache.dtype), cache)
