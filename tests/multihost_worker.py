"""Worker process for tests/test_multihost.py.

Each of the 2 processes owns 4 virtual CPU devices; together they form an
8-device (dp=2, tp=4) mesh where the dp axis spans DCN (the process
boundary) and tp stays "on-host" — the exact topology
``parallel/distributed.py::make_multihost_mesh`` builds on a real
multi-host TPU pod. The worker builds the TP deploy layout
(``parallel/deploy.py``) on that mesh, runs ``tp_forward`` and a short
greedy ``tp_decode_scan`` across DCN, and asserts its ADDRESSABLE shards
of the global logits match a single-device reference computed locally
(both processes build identical params from the same PRNG seed).

Invoked as: python multihost_worker.py <coordinator> <n_proc> <proc_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # the env var alone is not
# honored when a TPU plugin is installed (see tests/conftest.py)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig  # noqa: E402
from awq_tpu.parallel.distributed import (init_distributed,  # noqa: E402
                                          make_multihost_mesh)


def main(coordinator: str, n_proc: int, proc_id: int) -> None:
    init_distributed(coordinator, n_proc, proc_id)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, len(jax.devices())

    from awq_tpu.models import forward, init_kv_cache
    from awq_tpu.models.llama import (fuse_linears, init_params,
                                      quantize_params)
    from awq_tpu.parallel import build_tp_params, tp_decode_scan, tp_forward
    from awq_tpu.runtime.generate import decode_scan

    mesh = make_multihost_mesh(tp=4)
    assert mesh.devices.shape == (n_proc, 4), mesh.devices.shape
    # tp must stay within one process ("host"): every tp row single-proc
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "tp axis crosses DCN")

    # per-rank fused QKV OC must stay 128-tileable at tp=4:
    # (8 + 2*8) heads * hd 64 / 4 ranks = 384
    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=8, num_kv_heads=8,
        head_dim=64, max_position_embeddings=128, dtype="float32",
    )
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(7)),
        QuantConfig(w_bit=4, group_size=64),
    )
    tokens = jax.random.randint(
        jax.random.PRNGKey(3), (2, 8), 0, cfg.vocab_size)
    cache = init_kv_cache(cfg, 2, 128, jnp.float32)

    # single-device reference (local to this process)
    ref_params = fuse_linears(params, cfg)
    ref_logits, ref_cache = forward(
        ref_params, cfg, tokens, cache, jnp.int32(0))

    dep = build_tp_params(params, cfg, mesh)
    logits, tp_cache = tp_forward(dep, cfg, tokens, cache, jnp.int32(0),
                                  mesh)
    ref_np = np.asarray(ref_logits)
    for shard in logits.addressable_shards:
        got = np.asarray(shard.data)
        want = ref_np[shard.index]
        assert np.allclose(got, want, atol=2e-3, rtol=2e-3), (
            proc_id, shard.index, np.abs(got - want).max())
    print(f"[proc {proc_id}] tp_forward parity OK", flush=True)

    # greedy decode burst across DCN vs the local single-device scan
    first = jnp.argmax(ref_logits[:, -1], axis=-1).astype(jnp.int32)
    gen = GenConfig(greedy=True)
    stop = jnp.asarray([-1], jnp.int32)
    seen = jnp.zeros((2, cfg.vocab_size), bool)
    ref_toks, _, _ = decode_scan(
        ref_params, cfg, ref_cache, first, jnp.int32(8),
        jax.random.PRNGKey(0), stop, seen, gen, 4, cfg.vocab_size)
    tp_toks, _, _ = tp_decode_scan(
        dep, cfg, tp_cache, first, jnp.int32(8),
        jax.random.PRNGKey(0), stop, seen, gen, 4, mesh)
    ref_t = np.asarray(ref_toks)
    for shard in tp_toks.addressable_shards:
        assert (np.asarray(shard.data) == ref_t[shard.index]).all(), (
            proc_id, shard.index)
    print(f"[proc {proc_id}] tp_decode_scan parity OK", flush=True)
    print(f"[proc {proc_id}] MULTIHOST PARITY OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
