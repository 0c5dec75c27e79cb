"""Single-model inference engine: cache ownership + chunked prefill
accounting.

Counterpart of the TinyChat demo loop state (``tinychat/demo.py:256-283``:
``start_pos`` bookkeeping across dialogue rounds) plus model assembly
(``load_awq_llama_fast`` + module surgery) — here assembly is just
"build params pytree, optionally quantized".
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig, QuantConfig, RuntimeConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.runtime.generate import StreamGenerator, generate


class InferenceEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        runtime: Optional[RuntimeConfig] = None,
        tokenizer=None,
        cache_dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        from awq_tpu.models.llama import fuse_linears, quantize_head

        self.rt = runtime or RuntimeConfig()
        self.mesh = self.rt.mesh
        self.tokenizer = tokenizer
        t = min(self.rt.max_seq_len, cfg.max_position_embeddings)
        if self.mesh is not None:
            # multi-chip serving: the TP deploy layout (fused + folded +
            # tiled shards) under shard_map — parallel/deploy.py. The
            # reference's counterpart splits decoder BLOCKS across GPUs
            # via accelerate hooks (awq/entry.py:166-186); here weights
            # and KV shard Megatron-style over ICI.
            from jax.sharding import NamedSharding
            from awq_tpu.parallel import build_tp_params
            from awq_tpu.parallel.tp import cache_specs

            shape = dict(zip(self.mesh.axis_names,
                             self.mesh.devices.shape))
            if shape.get("dp", 1) != 1:
                raise ValueError(
                    "engines require a dp=1 mesh (the batch axis is the "
                    "engine's slot axis); got "
                    f"{dict(shape)}")
            tp = shape.get("tp", 1)
            self.params = build_tp_params(
                params, cfg, self.mesh,
                quantize_head=self.rt.quantize_head,
                prefill_w8=self.rt.prefill_w8)
            if self.rt.prefill_w8:
                import dataclasses as _dc

                self.cfg = cfg = _dc.replace(cfg, prefill_a8=True)
            if cache_dtype in ("int8", jnp.int8):
                from awq_tpu.models.llama import init_kv_cache8

                cache = init_kv_cache8(cfg, self.rt.max_batch_size, t)
            else:
                cache = init_kv_cache(cfg, self.rt.max_batch_size, t,
                                      cache_dtype)
            from jax.sharding import PartitionSpec as _P

            self.cache = jax.device_put(
                cache,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(self.mesh, s),
                    cache_specs(cache, shard_kv=tp > 1),
                    is_leaf=lambda x: isinstance(x, _P)),
            )
            self.start_pos = 0
            return
        # fused QKV/gate-up + folded tiled weights -> the decode
        # megakernel path (one launch per token on TPU)
        if self.rt.quantize_head:
            params = quantize_head(params, cfg)
        self.params = fuse_linears(params, cfg)
        if self.rt.prefill_w8:
            # TTFT mode: int8 prefill weight cache (built while the
            # unfolded scales are still present, i.e. before any
            # strip_unfolded_qparams by the caller)
            import dataclasses as _dc

            from awq_tpu.ops.w4a16 import attach_w8_caches

            budget = int(getattr(self.rt, "prefill_w8_budget_gb", 0.0)
                         * 2**30) or None
            self.params = {**self.params,
                           "layers": attach_w8_caches(
                               self.params["layers"],
                               budget_bytes=budget)}
            self.cfg = cfg = _dc.replace(cfg, prefill_a8=True)
        if cache_dtype in ("int8", jnp.int8):
            from awq_tpu.models.llama import init_kv_cache8

            self.cache = init_kv_cache8(cfg, self.rt.max_batch_size, t)
        else:
            self.cache = init_kv_cache(
                cfg, self.rt.max_batch_size, t, cache_dtype
            )
        self.start_pos = 0

    # ---- conversation state (chunked prefill across rounds) ----

    def reset(self):
        self.start_pos = 0
        self.cache = jax.tree_util.tree_map(jnp.zeros_like, self.cache)

    @property
    def max_seq_len(self) -> int:
        from awq_tpu.models.llama import cache_seq_len

        return cache_seq_len(self.cache)

    def _forward(self, tokens, cache, start_pos):
        if self.mesh is not None:
            from awq_tpu.parallel import tp_forward

            return tp_forward(self.params, self.cfg, tokens, cache,
                              start_pos, self.mesh)
        return forward(self.params, self.cfg, tokens, cache, start_pos)

    def warmup(self, seq_len: int = 64):
        """Trigger compilation of prefill + decode (reference warmup:
        ``tinychat/demo.py:242``)."""
        toks = jnp.zeros((self.rt.max_batch_size, seq_len), jnp.int32)
        logits, _ = self._forward(toks, self.cache, jnp.int32(0))
        logits.block_until_ready()
        logits, _ = self._forward(toks[:, :1], self.cache, jnp.int32(seq_len))
        logits.block_until_ready()

    def generate(
        self,
        prompt_ids: Sequence[int],
        gen: GenConfig,
        stop_ids: Sequence[int] = (),
        key=None,
        continue_dialogue: bool = True,
    ) -> Dict[str, Any]:
        """One dialogue round: prefill only the new tokens (history KV is
        reused via start_pos), then scan-decode."""
        tokens = jnp.asarray([list(prompt_ids)], jnp.int32)
        if self.start_pos + tokens.shape[1] + gen.max_new_tokens > self.max_seq_len:
            self.reset()  # simplistic eviction; paged cache lands later
        out = generate(
            self.params, self.cfg, tokens, self.cache, gen,
            stop_ids=stop_ids, start_pos=self.start_pos, key=key,
            mesh=self.mesh,
        )
        self.cache = out["cache"]
        n_new = int(out["n_valid"][0])
        if continue_dialogue:
            self.start_pos += tokens.shape[1] + n_new
        out["output_ids"] = out["output_ids"][0, :n_new]
        if self.tokenizer is not None:
            out["text"] = self.tokenizer.decode(list(map(int, out["output_ids"])))
        return out

    def generate_speculative(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_ids: Sequence[int] = (),
        k: int = 7,
        n: int = 3,
        continue_dialogue: bool = True,
        device_loop: Optional[bool] = None,
        gen=None,
    ) -> Dict[str, Any]:
        """Greedy generation with prompt-lookup speculative verification
        (``runtime/speculative.py``): up to ``k`` drafted tokens verified
        per forward, output identical to :meth:`generate` with
        ``GenConfig(greedy=True)``. History KV is reused via
        ``start_pos`` like :meth:`generate`.

        ``device_loop`` (default: on TPU) runs the whole draft -> verify
        -> accept loop inside one jitted while_loop — one host fetch per
        generation instead of one ~27 ms round-trip per window.

        ``gen``: a sampling :class:`GenConfig` (``temperature > 0``)
        rides rejection-sampling speculative acceptance in the device
        loop — output distributed exactly as :meth:`generate` with the
        same config (requires ``device_loop``)."""
        from awq_tpu.runtime.speculative import (
            generate_speculative,
            spec_decode_device,
        )

        tokens = jnp.asarray([list(prompt_ids)], jnp.int32)
        if (self.start_pos + tokens.shape[1] + max_new_tokens
                > self.max_seq_len):
            self.reset()
        eos = int(stop_ids[0]) if len(stop_ids) else None
        sampled = gen is not None and not gen.greedy \
            and gen.temperature >= 1e-5
        if self.mesh is not None:
            # the device while_loop has no collectives; the host verify
            # loop routes every window through tp_forward instead
            if device_loop:
                raise ValueError("device_loop is single-chip; mesh "
                                 "speculation uses the host verify loop")
            if sampled:
                raise NotImplementedError(
                    "sampled speculation under a mesh: use BatchEngine"
                    "(spec_k=...) with a mesh RuntimeConfig")
            out_ids, stats = generate_speculative(
                self.params, self.cfg, tokens, self.cache,
                max_new_tokens, k=k, n=n, eos=eos,
                start_pos=self.start_pos, mesh=self.mesh,
            )
        else:
            if device_loop is None:
                device_loop = jax.default_backend() == "tpu" or sampled
            if sampled and not device_loop:
                raise ValueError("sampled speculation (gen.temperature "
                                 "> 0) requires device_loop=True")
            if device_loop:
                out_ids, stats = spec_decode_device(
                    self.params, self.cfg, tokens, self.cache,
                    max_new_tokens, k=k, n=n, eos=eos,
                    start_pos=self.start_pos, gen=gen,
                )
            else:
                out_ids, stats = generate_speculative(
                    self.params, self.cfg, tokens, self.cache,
                    max_new_tokens, k=k, n=n, eos=eos,
                    start_pos=self.start_pos,
                )
        self.cache = stats.pop("cache")
        if continue_dialogue:
            self.start_pos += tokens.shape[1] + len(out_ids)
        out: Dict[str, Any] = {"output_ids": out_ids, "stats": stats}
        if self.tokenizer is not None:
            out["text"] = self.tokenizer.decode(list(map(int, out_ids)))
        return out

    def stream(
        self, gen: GenConfig, stop_ids: Sequence[int] = (), stream_interval: int = 2
    ) -> StreamGenerator:
        return StreamGenerator(
            self.params, self.cfg, self.tokenizer, gen, self.cache,
            stop_ids=stop_ids, stream_interval=stream_interval,
            mesh=self.mesh,
        )
