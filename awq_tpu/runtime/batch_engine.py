"""Continuous-batching inference engine.

NEW capability beyond the reference (its engine is strictly batch-1,
``tinychat/utils/constants.py: max_batch_size=1``): a slot-based scheduler
over the batch axis of one shared static KV cache. Requests are admitted
into free slots (prefill writes that slot's cache rows), and every engine
step runs ONE batched decode for all active slots at their own lengths
(``models.llama.decode_step_batched`` — per-row rope positions, per-row
flash-decode lengths). Finished slots free immediately and new requests
join between steps — decode never drains the batch.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, Deque, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import GenConfig, ModelConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.llama import decode_step_batched
from awq_tpu.runtime.sampling import sample_logits


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    gen: GenConfig
    stop_ids: frozenset
    out_ids: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    submitted_at: float = dataclasses.field(default_factory=time.time)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None


class BatchEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        # default 8: multiples of 8 ride the batched whole-token
        # megakernel on TPU (ops/megakernel_batched.py) — one Pallas
        # launch per step instead of ~5 x n_layers
        n_slots: int = 8,
        max_seq_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        quantize_head: bool = False,
        runtime=None,   # Optional[RuntimeConfig]: mesh + quantize_head
        # speculative verify (prompt-lookup drafting): each engine step
        # verifies a k+1-token window per slot instead of decoding one
        # token — free accepted tokens multiply across the batch. Greedy
        # rows accept by argmax identity (spec greedy == vanilla greedy,
        # tested invariant); temperature>0 rows accept by speculative
        # rejection sampling (exact target distribution — tested
        # distributionally).
        spec_k: int = 0,
        spec_n: int = 3,
    ):
        self.cfg = cfg
        self.spec_k = int(spec_k)
        self.spec_n = int(spec_n)
        from awq_tpu.models.llama import fuse_linears
        from awq_tpu.models.llama import quantize_head as _qhead

        self.mesh = getattr(runtime, "mesh", None)
        if runtime is not None and runtime.quantize_head:
            quantize_head = True
        if self.mesh is not None:
            from awq_tpu.parallel import build_tp_params

            shape = dict(zip(self.mesh.axis_names,
                             self.mesh.devices.shape))
            if shape.get("dp", 1) != 1:
                raise ValueError(
                    "BatchEngine requires a dp=1 mesh (slots are the "
                    f"batch axis); got {dict(shape)}")
            self.params = build_tp_params(
                params, cfg, self.mesh, quantize_head=quantize_head,
                prefill_w8=getattr(runtime, "prefill_w8", False))
            if getattr(runtime, "prefill_w8", False):
                import dataclasses as _dc

                self.cfg = cfg = _dc.replace(cfg, prefill_a8=True)
        else:
            if quantize_head:
                params = _qhead(params, cfg)
            self.params = fuse_linears(params, cfg)
            if runtime is not None and getattr(runtime, "prefill_w8",
                                               False):
                # int8 prefill weight cache (TTFT mode) — same wiring as
                # InferenceEngine; admission prefills skip the W4A8
                # in-kernel requant and its minimum-length gate
                import dataclasses as _dc

                from awq_tpu.ops.w4a16 import attach_w8_caches

                budget = int(getattr(runtime, "prefill_w8_budget_gb",
                                     0.0) * 2**30) or None
                self.params = {
                    **self.params,
                    "layers": attach_w8_caches(self.params["layers"],
                                               budget_bytes=budget)}
                self.cfg = cfg = _dc.replace(cfg, prefill_a8=True)
        self.n_slots = n_slots
        self._init_cache(cfg, n_slots, max_seq_len, cache_dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            tp = dict(zip(self.mesh.axis_names,
                          self.mesh.devices.shape)).get("tp", 1)
            self.cache = jax.device_put(
                self.cache,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(self.mesh, s),
                    self._cache_pspecs(tp),
                    is_leaf=lambda x: isinstance(x, _P)))
        self.lengths = np.zeros(n_slots, np.int32)     # host copy
        self.tokens = np.zeros(n_slots, np.int32)      # next input per slot
        # per-slot sampling params (requests carry their own GenConfig)
        self.temps = np.ones(n_slots, np.float32)
        self.top_ks = np.zeros(n_slots, np.int32)
        self.top_ps = np.ones(n_slots, np.float32)
        self.greedy = np.ones(n_slots, bool)
        self.slots: List[Optional[Request]] = [None] * n_slots
        self.waiting: Deque[Request] = deque()
        self.finished: Dict[int, Request] = {}
        self._next_rid = 0
        self._key = jax.random.PRNGKey(0)

    # ---- cache strategy (overridden by PagedBatchEngine) ------------------

    def _cache_pspecs(self, tp: int):
        from awq_tpu.parallel.tp import cache_specs

        return cache_specs(self.cache, shard_kv=tp > 1)

    def _init_cache(self, cfg, n_slots, max_seq_len, cache_dtype) -> None:
        if cache_dtype in ("int8", jnp.int8):
            from awq_tpu.models.llama import init_kv_cache8

            self.cache = init_kv_cache8(cfg, n_slots, max_seq_len)
        else:
            self.cache = init_kv_cache(cfg, n_slots, max_seq_len,
                                       cache_dtype)
        from awq_tpu.models.llama import cache_seq_len

        self.max_seq = cache_seq_len(self.cache)

    def _can_admit(self, req: "Request") -> bool:
        return len(req.prompt_ids) + req.gen.max_new_tokens <= self.max_seq

    def _prefill_slot(self, slot: int, toks: jnp.ndarray) -> jnp.ndarray:
        """Prefill ``toks [1, S]`` into ``slot``'s cache rows; returns the
        final-position logits ``[1, V]``."""
        row = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(a, slot, slot + 1, axis=2),
            self.cache,
        )
        if self.mesh is not None:
            from awq_tpu.parallel import tp_forward

            logits, row = tp_forward(
                self.params, self.cfg, toks, row, jnp.int32(0), self.mesh
            )
        else:
            logits, row = forward(
                self.params, self.cfg, toks, row, jnp.int32(0)
            )
        self.cache = jax.tree_util.tree_map(
            lambda full, part: jax.lax.dynamic_update_slice(
                full, part, (0, 0, slot) + (0,) * (full.ndim - 3)
            ),
            self.cache, row,
        )
        return logits[:, -1]

    def _decode(self) -> jnp.ndarray:
        """One batched decode step over all slots -> logits [n_slots, V]."""
        if self.mesh is not None:
            from awq_tpu.parallel import tp_decode_step_batched

            logits, self.cache = tp_decode_step_batched(
                self.params, self.cfg,
                jnp.asarray(self.tokens), self.cache,
                jnp.asarray(self.lengths), self.mesh,
            )
            return logits
        logits, self.cache = decode_step_batched(
            self.params, self.cfg,
            jnp.asarray(self.tokens), self.cache,
            jnp.asarray(self.lengths),
        )
        return logits

    def _on_release(self, slot: int) -> None:
        """Slot freed (request finished or preempted)."""

    # ---- request API ------------------------------------------------------

    def submit(self, prompt_ids: Sequence[int], gen: GenConfig,
               stop_ids: Sequence[int] = ()) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.waiting.append(Request(
            rid=rid, prompt_ids=list(prompt_ids), gen=gen,
            stop_ids=frozenset(int(t) for t in stop_ids),
        ))
        return rid

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.slots)

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.slots):
            if r is None:
                return i
        return None

    # ---- scheduling -------------------------------------------------------

    def _admit(self) -> None:
        """Prefill waiting requests into free slots (continuous admission)."""
        while self.waiting:
            slot = self._free_slot()
            if slot is None:
                return
            req = self.waiting[0]
            n = len(req.prompt_ids)
            if n + req.gen.max_new_tokens > self.max_seq:
                self.waiting.popleft()
                req.done = True
                req.finished_at = time.time()
                self.finished[req.rid] = req
                continue
            if not self._can_admit(req):
                return  # no capacity right now (e.g. page pool exhausted)
            self.waiting.popleft()
            toks = jnp.asarray([req.prompt_ids], jnp.int32)
            last_logits = self._prefill_slot(slot, toks)
            self._key, sub = jax.random.split(self._key)
            first = int(sample_logits(last_logits, sub, req.gen,
                                      jnp.zeros((1, self.cfg.vocab_size),
                                                bool))[0])
            req.slot = slot
            req.first_token_at = time.time()
            self.slots[slot] = req
            self.lengths[slot] = n
            self.tokens[slot] = first
            self.temps[slot] = req.gen.temperature
            self.top_ks[slot] = req.gen.top_k
            self.top_ps[slot] = req.gen.top_p
            self.greedy[slot] = req.gen.greedy
            self._record(req, first)

    def _finish(self, req: Request) -> None:
        req.done = True
        req.finished_at = time.time()
        self.finished[req.rid] = req
        self.slots[req.slot] = None
        self._on_release(req.slot)

    def _record(self, req: Request, token: int) -> None:
        req.out_ids.append(token)
        if (token in req.stop_ids
                or len(req.out_ids) >= req.gen.max_new_tokens):
            if req.out_ids and req.out_ids[-1] in req.stop_ids:
                req.out_ids.pop()
            self._finish(req)

    # ---- speculative verify ------------------------------------------------

    def _spec_eligible(self, active) -> bool:
        # contiguous caches only (fp OR int8; the verify step quantizes
        # window rows on append) — the paged engine overrides this off.
        # A tp mesh composes: _step_spec routes through
        # tp_verify_step_batched. Sampled rows (temperature > 0) compose
        # via device-side rejection sampling (spec_accept_sample), so
        # greediness no longer gates eligibility.
        if not self.spec_k:
            return False
        # verify_step_batched has no ALiBi path: alibi archs (mpt/bloom)
        # fall back to plain decode instead of crashing at trace time
        if self.cfg.pos_embed not in ("rope", "learned", "none"):
            return False
        w = self.spec_k + 1
        return all(self.lengths[i] + w <= self.max_seq for i in active)

    def _step_spec(self, active) -> Dict[int, List[int]]:
        """One verify step: per-slot prompt-lookup drafts, ONE batched
        W=k+1 forward, device-side window acceptance per row (longest
        argmax prefix for greedy rows; speculative rejection sampling
        for temperature>0 rows — ``sampling.spec_accept_sample``). Same
        single device fetch per step as the plain decode."""
        from awq_tpu.models.llama import verify_step_batched
        from awq_tpu.runtime.sampling import spec_accept_sample
        from awq_tpu.runtime.speculative import ngram_propose

        k = self.spec_k
        drafts = np.zeros((self.n_slots, k), np.int32)
        m_cap = np.zeros(self.n_slots, np.int32)
        for i in active:
            req = self.slots[i]
            ctx = np.asarray(list(req.prompt_ids) + list(req.out_ids),
                             np.int32)
            d = ngram_propose(ctx, k, self.spec_n)
            drafts[i, :len(d)] = d
            budget = req.gen.max_new_tokens - len(req.out_ids)
            m_cap[i] = max(min(len(d), budget - 1), 0)
        windows = np.concatenate([self.tokens[:, None], drafts], axis=1)
        if self.mesh is not None:
            from awq_tpu.parallel import tp_verify_step_batched

            logits, self.cache = tp_verify_step_batched(
                self.params, self.cfg, jnp.asarray(windows), self.cache,
                jnp.asarray(self.lengths), self.mesh,
            )
        else:
            logits, self.cache = verify_step_batched(
                self.params, self.cfg, jnp.asarray(windows), self.cache,
                jnp.asarray(self.lengths),
            )
        self._key, sub = jax.random.split(self._key)
        emit_d, take_d = spec_accept_sample(
            logits, jnp.asarray(windows), jnp.asarray(m_cap), sub,
            jnp.asarray(self.temps), jnp.asarray(self.top_ks),
            jnp.asarray(self.top_ps), jnp.asarray(self.greedy),
        )
        emit_all = np.asarray(emit_d)                     # [B, W]
        take_all = np.asarray(take_d)                     # [B]
        out: Dict[int, List[int]] = {}
        for i in active:
            req = self.slots[i]
            take = int(take_all[i])
            emit = [int(t) for t in emit_all[i, :take]]
            self.lengths[i] += take
            self.tokens[i] = emit[-1]
            got = []
            for tok in emit:
                if req.done:
                    break
                got.append(tok)
                self._record(req, tok)
            out[req.rid] = got
            if not req.done and self.lengths[i] + 1 >= self.max_seq:
                self._finish(req)
        return out

    def step(self) -> Dict[int, int]:
        """Admit + one batched decode step. Returns {rid: new_token} for
        slots that produced a token this step (with ``spec_k`` a slot may
        produce SEVERAL tokens; the dict value is then a list)."""
        self._admit()
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return {}
        if self._spec_eligible(active):
            return self._step_spec(active)
        logits = self._decode()
        self._key, sub = jax.random.split(self._key)
        from awq_tpu.runtime.sampling import sample_logits_batched

        nxt = np.asarray(sample_logits_batched(
            logits, sub,
            jnp.asarray(self.temps), jnp.asarray(self.top_ks),
            jnp.asarray(self.top_ps), jnp.asarray(self.greedy),
        ))
        out: Dict[int, int] = {}
        for i in active:
            req = self.slots[i]
            self.lengths[i] += 1
            tok = int(nxt[i])
            self.tokens[i] = tok
            out[req.rid] = tok
            self._record(req, tok)
            if not req.done and self.lengths[i] + 1 >= self.max_seq:
                self._finish(req)  # out of cache slots
        return out

    def run(self) -> Dict[int, Request]:
        """Drain all submitted requests; returns {rid: Request}."""
        while self.waiting or self.n_active:
            self.step()
        return self.finished
