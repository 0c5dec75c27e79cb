"""Paged KV-cache continuous-batching engine.

Extends :class:`~awq_tpu.runtime.batch_engine.BatchEngine` with a
block-table cache: one shared page pool ``[L, 2, n_pages, n_kv, page,
hd]`` plus a per-slot table of physical page ids. HBM held per request is
proportional to its ACTUAL length (page granularity, default 256
positions) instead of ``n_slots x max_seq`` — the difference between
B=32 fitting on a squeezed shared chip and OOM (the slot engine's static
buckets are ~4 GB at B=32/T=2048 for 7B).

The reference has no counterpart (tinychat serves batch-1 from one
static buffer, ``tinychat/utils/constants.py``); the design is vLLM's
PagedAttention re-derived for the manual-DMA TPU flash kernel
(``ops/decode_attn.py::flash_decode_paged`` — one DMA per page was
already the loop structure, so paging only changes the address math).

Scheduling policy on pool exhaustion: preempt-youngest with recompute —
the most recently admitted active request frees its pages and re-queues
with its generated prefix folded into the prompt (vLLM's recompute
preemption). Admission requires pages for the whole prompt plus one
decode page.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from awq_tpu.config import ModelConfig
from awq_tpu.models import forward, init_kv_cache
from awq_tpu.models.llama import decode_step_paged
from awq_tpu.runtime.batch_engine import BatchEngine, Request


class PageAllocator:
    """Host-side free list over the physical page pool.

    ``reserved`` low pages are never handed out — page 0 is the TRASH
    page: inactive slots' table entries point at it so their (masked,
    never read) decode writes land somewhere harmless instead of
    clobbering a live page via index clamping."""

    def __init__(self, n_pages: int, reserved: int = 1):
        self.n_pages = n_pages
        self.reserved = reserved
        self._free: List[int] = list(range(n_pages - 1, reserved - 1, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, pages: List[int]) -> None:
        for p in pages:
            assert self.reserved <= p < self.n_pages and p not in self._free
            self._free.append(p)


class PagedBatchEngine(BatchEngine):
    """BatchEngine with pages instead of per-slot static rows.

    ``n_pages`` defaults to ``n_slots * max_seq_len / page_size / 2`` —
    half the slot engine's footprint, on the observation that average
    occupancy is well under the cap; size it to your workload.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        # multiples of 8 (up to 64) ride the paged batched megakernel
        n_slots: int = 8,
        max_seq_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        page_size: int = 256,
        n_pages: Optional[int] = None,
        runtime=None,   # Optional[RuntimeConfig]: prefill_w8 etc.
    ):
        self.page_size = page_size
        self.n_pages = n_pages  # resolved in _init_cache
        super().__init__(cfg, params, n_slots=n_slots,
                         max_seq_len=max_seq_len, cache_dtype=cache_dtype,
                         runtime=runtime)

    # ---- cache strategy ---------------------------------------------------

    def _cache_pspecs(self, tp: int):
        # pool [L, 2, n_pages, n_kv, page, hd]: KV heads shard over tp;
        # pages are shared by all rows, so the page axis never shards
        from jax.sharding import PartitionSpec as P

        return P(None, None, None, "tp" if tp > 1 else None, None, None)

    def _spec_eligible(self, active) -> bool:
        return False   # verify-window appends need contiguous rows

    def _init_cache(self, cfg, n_slots, max_seq_len, cache_dtype) -> None:
        if cache_dtype in ("int8", jnp.int8):
            raise NotImplementedError(
                "paged int8 KV not implemented yet; use the slot engine")
        p = self.page_size
        assert max_seq_len % p == 0, (max_seq_len, p)
        if self.n_pages is None:
            self.n_pages = max(n_slots * max_seq_len // p // 2,
                               n_slots + 2)
        self.max_pages = max_seq_len // p
        # pool [L, 2, n_pages, n_kv, page, hd]
        self.cache = jnp.zeros(
            (cfg.num_layers, 2, self.n_pages,
             cfg.num_kv_heads, p, cfg.head_dim),
            jnp.bfloat16 if cache_dtype in ("bfloat16",) else cache_dtype,
        )
        self.max_seq = max_seq_len
        self.alloc = PageAllocator(self.n_pages)
        # 0 = the trash page (see PageAllocator): unassigned entries must
        # still resolve to a harmless physical page under index clamping
        self.tables = np.zeros((n_slots, self.max_pages), np.int32)
        self.slot_pages: List[List[int]] = [[] for _ in range(n_slots)]

    def _can_admit(self, req: Request) -> bool:
        need = math.ceil((len(req.prompt_ids) + 1) / self.page_size)
        return self.alloc.n_free >= need

    def _prefill_slot(self, slot: int, toks: jnp.ndarray) -> jnp.ndarray:
        """Prefill through a CONTIGUOUS scratch cache (page-multiple
        bucket — a handful of compile shapes), then copy each page-sized
        slab into its allocated physical page."""
        n = toks.shape[1]
        p = self.page_size
        n_pg = math.ceil((n + 1) / p)
        pages = self.alloc.alloc(n_pg)
        assert pages is not None, "checked by _can_admit"
        self.slot_pages[slot] = pages
        self.tables[slot, :] = 0
        self.tables[slot, :n_pg] = pages

        scratch = init_kv_cache(self.cfg, 1, n_pg * p, self.cache.dtype)
        if self.mesh is not None:
            from awq_tpu.parallel import tp_forward

            logits, scratch = tp_forward(
                self.params, self.cfg, toks, scratch, jnp.int32(0),
                self.mesh
            )
        else:
            logits, scratch = forward(
                self.params, self.cfg, toks, scratch, jnp.int32(0)
            )
        for j, pid in enumerate(pages):
            self.cache = _copy_page(self.cache, scratch, jnp.int32(pid),
                                    jnp.int32(j * p))
        return logits[:, -1]

    def _decode(self) -> jnp.ndarray:
        self._grow_tables()
        if self.mesh is not None:
            from awq_tpu.parallel import tp_decode_step_paged

            logits, self.cache = tp_decode_step_paged(
                self.params, self.cfg,
                jnp.asarray(self.tokens), self.cache,
                jnp.asarray(self.tables), jnp.asarray(self.lengths),
                self.mesh,
            )
            return logits
        logits, self.cache = decode_step_paged(
            self.params, self.cfg,
            jnp.asarray(self.tokens), self.cache,
            jnp.asarray(self.tables), jnp.asarray(self.lengths),
        )
        return logits

    def _on_release(self, slot: int) -> None:
        if self.slot_pages[slot]:
            self.alloc.free(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.tables[slot, :] = 0

    # ---- page growth / preemption ----------------------------------------

    def _grow_tables(self) -> None:
        """Ensure every active slot has a page for this step's write
        position; preempt the youngest other request on exhaustion."""
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            need_idx = int(self.lengths[i]) // self.page_size
            while need_idx >= len(self.slot_pages[i]):
                got = self.alloc.alloc(1)
                if got is None and not self._preempt(exclude=i):
                    raise RuntimeError(
                        f"page pool exhausted: {self.n_pages} pages can't "
                        f"hold slot {i} at length {self.lengths[i]} with "
                        "nothing left to preempt")
                if got is None:
                    continue
                self.slot_pages[i].append(got[0])
                self.tables[i, len(self.slot_pages[i]) - 1] = got[0]

    def _preempt(self, exclude: int) -> bool:
        """Free the youngest other active request, re-queueing it with
        its generated prefix folded into the prompt (recompute)."""
        victims = [(r.rid, i) for i, r in enumerate(self.slots)
                   if r is not None and i != exclude]
        if not victims:
            return False
        _, vi = max(victims)
        req = self.slots[vi]
        req.prompt_ids = list(req.prompt_ids) + list(req.out_ids)
        req.slot = None
        self.slots[vi] = None
        self._on_release(vi)
        self.waiting.appendleft(req)
        return True


import functools


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_page(pool, scratch, pid, t0):
    """Copy scratch cache positions [t0, t0+page) into physical ``pid``.

    ``scratch`` is [L, 2, 1, n_kv, T, hd]; pool [L, 2, NP, n_kv, P, hd].
    """
    p = pool.shape[4]
    sl = jax.lax.dynamic_slice_in_dim(scratch[:, :, 0], t0, p, axis=3)
    return jax.lax.dynamic_update_slice(
        pool, sl[:, :, None].astype(pool.dtype), (0, 0, pid, 0, 0, 0)
    )
