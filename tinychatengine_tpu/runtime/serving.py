"""Serving runtime: continuous batching over slot-based KV.

The reference is hard-wired to batch 1 (assert at
llm/src/nn_modules/non_cuda/Int4llamaAttention.cc:309, model_config.batch=1 in
llm/include/model.h:68-83) and has no request scheduler at all — this module
is the TPU framework's serving layer above the single-request Engine:

- a fixed pool of B decode *slots*, each a row of one shared KV cache
  [L, B, H_kv, S_max, D] (jit shapes never change — no recompiles as
  requests come and go);
- **continuous batching**: new requests are admitted the moment a slot
  frees, not at generation boundaries. Admission runs a bucketed single-
  request prefill into a scratch cache (reusing Engine bucketing) and then
  splices the prefix into the slot with one device-to-device copy;
- **ragged decode**: one jit'd step decodes every active slot at its own
  position (vector ``start``; per-slot causal lengths flow into the flash
  decode kernel's per-batch ``lengths``);
- inactive slots still run (dead rows keep shapes static) but their cache
  writes land beyond their frozen lengths and their outputs are discarded.

Sampling is per-REQUEST without recompiles: every parameter the llama.cpp
pipeline exposes (temp/top_k/top_p/tfs/typical/penalties, mirostat v1/v2
with its per-row carried mu state) rides as a traced [slots] array into one
compiled ``sampling.sample_rows`` executable — including logit_bias
(fixed-width scatter) — and each request carries its own PRNG key
(reproducible per request_id). The only engine-global fallback left is an
oversized engine-level logit_bias table (> RowParams.MAX_BIAS entries),
which keeps the static per-engine sampler for every request.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import itertools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.generation import sampling
from tinychatengine_tpu.generation.engine import Engine, _bucket, _hashable_gcfg
from tinychatengine_tpu.models import llama


@dataclasses.dataclass(eq=False)  # identity equality: the generated __eq__
# would compare the ndarray prompt field ("truth value ambiguous" inside
# deque.remove) and two distinct requests with equal fields must not alias
class Request:
    """One generation request."""

    prompt_ids: np.ndarray                    # [n] int32
    n_predict: int
    # optional multimodal prompt: [n, E] embeddings covering the WHOLE prompt
    # (vlm.build_multimodal_inputs layout — text rows are embed-table rows,
    # image spans are CLIP/mm_projector outputs; prompt_ids carries 0 at
    # image slots and feeds only penalty windows / history). When set, the
    # prefill consumes these instead of the embedding lookup. llama-family
    # forwards (the reference's VLM decoder family, LLaVAGenerate.cc).
    input_embeds: Optional[np.ndarray] = None
    stop_token_ids: tuple = ()
    on_token: Optional[Callable[[int, "Request"], None]] = None
    request_id: int = 0
    gcfg: Optional[GenerationConfig] = None   # per-request sampling params
    logprobs: Optional[int] = None  # None=off; 0=chosen only; k<=engine k
    # filled by the engine:
    output_ids: list = dataclasses.field(default_factory=list)
    output_logprobs: list = dataclasses.field(default_factory=list)  # [f32]
    output_top_logprobs: list = dataclasses.field(default_factory=list)
    # ^ per emitted token: list of (token_id, logprob), length = .logprobs
    finished: bool = False
    finish_reason: Optional[str] = None       # "stop" | "length"
    submit_t: float = 0.0
    first_token_t: float = 0.0
    done_t: float = 0.0


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    length: int = 0          # valid KV positions
    remaining: int = 0
    admitting: bool = False  # reserved for an in-flight chunked admission

    @property
    def active(self) -> bool:
        return self.request is not None and not self.admitting


class ServingEngine:
    """Continuous-batching server for one model replica."""

    def __init__(self, params, cfg: ModelConfig, qcfg: QuantConfig | None = None,
                 slots: int = 8, max_len: Optional[int] = None,
                 gcfg: GenerationConfig | None = None,
                 forward_fn=llama.forward, paged: bool = False,
                 page_size: int = 128, n_pages: Optional[int] = None,
                 admission_chunk: int = 512, tick_batch: int = 8,
                 speculative: bool = False, spec_K: int = 7,
                 prefix_cache_entries: int = 0,
                 prefix_cache_len: Optional[int] = None,
                 prefix_min: int = 64, logprobs_k: int = 8,
                 sp_mesh=None, sp_threshold: int = 512, sp_params=None):
        """paged=True swaps the slot-reserved cache (slots x max_len) for a
        page pool (runtime/paged.py): sequences borrow pages as they grow, so
        capacity is ~total resident tokens instead of worst-case per slot.

        admission_chunk: long prompts prefill in chunks of this many tokens,
        ONE chunk per scheduler tick, interleaved with decode steps — an
        admission never stalls the running batch for a full prefill.

        tick_batch: when the queue is idle and every active slot has this
        much budget/page headroom, run this many decode+sample ticks in ONE
        device dispatch (amortizes per-tick host dispatch overhead; slots
        stopping mid-burst discard their overshoot). 1 disables.

        speculative: prompt-lookup draft+verify ticks (generation/
        speculative.py semantics, batched): when EVERY active slot is
        greedy-eligible (temp<=0, no penalties/mirostat), one dispatch
        verifies spec_K self-drafted tokens per slot — on repetitive text
        several tokens land per tick, and exactness vs plain greedy decode
        is preserved (verification recomputes the argmax chain). Dense KV
        only (spec_K+1 rows must fit below the smallest insert bucket).

        prefix_cache_entries: KV prefix cache (vLLM-style automatic prefix
        caching; no reference counterpart — SURVEY §2.8 serving gap). After
        each admission the prompt's KV (first prefix_cache_len positions) is
        stored in a device-side pool; a later request whose prompt shares a
        token prefix of >= prefix_min with a stored entry splices the cached
        KV into the prefill scratch and prefills only the uncovered tail
        (causality makes KV[0:m) a function of tokens[0:m) alone, so any
        matching head is reusable regardless of how the stored prompt
        continued). LRU eviction; hit/store counters in self.prefix_stats.

        sp_mesh: a ("seq", "model") jax Mesh (parallel/sp.make_sp_mesh).
        Long prompts (>= sp_threshold tokens) are admitted through the
        sequence-parallel ring-attention prefill (parallel/sp.py): the
        largest power-of-two head of the prompt runs as ONE SP dispatch
        over the mesh (per-chip attention FLOPs ~1/n_seq), the filled
        seq-sharded cache is spliced into the prefill scratch
        (sp_cache_into — XLA inserts the gather on the sharding boundary),
        and the ordinary chunked admission finishes the tail — so decode
        proceeds on whatever mesh forward_fn uses (single-chip or TP).
        llama-family forwards only (the ring lives in llama.forward's
        sp_axis hook). Counters in self.sp_stats.

        sp_params: parameters placed/laid out for sp_mesh (tp_degree ==
        sp_mesh model-axis size). Defaults to the decode params — pass this
        when decode runs on a DIFFERENT mesh/device set than sp_mesh (e.g.
        TP decode on 2 chips, ring prefill over 4): jit forbids mixing
        committed arrays from different device sets, so each dispatch must
        see params resident on its own mesh; the filled prefill cache is
        device_put back to the decode side before the splice."""
        self.params = params
        self.cfg = cfg
        self.qcfg = qcfg or QuantConfig()
        self.n_slots = slots
        self.max_len = max_len or cfg.max_sqlen
        self.gcfg = gcfg or GenerationConfig()
        self._hcfg = _hashable_gcfg(self.gcfg)
        self._forward = forward_fn
        self.paged = paged

        quantized = self.qcfg.kv_cache_dtype == "int8"
        # OPT W8A8 stores raw static-scale int8 KV (Int8OPTAttention.cc
        # semantics) — mirror Engine's dtype selection so the slot cache
        # matches the prefill scratch (engine.py:88-89)
        kv_dtype = jnp.int8 if (cfg.family == "opt"
                                and self.qcfg.scheme == "w8a8") else None
        if paged and kv_dtype is not None:
            raise NotImplementedError(
                "paged serving rides the page_table hook in llama.forward / "
                "gptbigcode.forward; OPT W8A8's static-scale int8 KV "
                "attention (the ×127 requant 2-pass int8_decode kernel) has "
                "no paged variant — OPT serves with the dense slot cache")
        if paged:
            from tinychatengine_tpu.runtime import paged as pg
            self.max_pages = -(-self.max_len // page_size)
            n_pages = n_pages or slots * self.max_pages  # dense-equivalent cap
            self.page_cache = pg.init_paged_cache(
                cfg.num_layers, n_pages, cfg.num_kv_heads, page_size,
                cfg.head_dim, quantized=quantized)
            self.allocator = pg.PageAllocator(n_pages, page_size,
                                              self.max_pages)
            # page 0 is the reserved dead page: inactive slots' table rows
            # point at it, so their dummy decode writes never touch live pages
            self._dead_page = self.allocator.alloc(1)[0]
            self._tables = np.full((slots, self.max_pages), self._dead_page,
                                   np.int32)
            self._slot_pages: list[list[int]] = [[] for _ in range(slots)]
            self.cache = None
        elif kv_dtype is not None:
            self.cache = kvc.init_cache(
                cfg.num_layers, slots, self.max_len, cfg.num_kv_heads,
                cfg.head_dim, dtype=kv_dtype)
        else:
            self.cache = kvc.init_cache(
                cfg.num_layers, slots, self.max_len, cfg.num_kv_heads,
                cfg.head_dim, quantized=quantized)
        # single-request prefill engine writing into a scratch cache
        self._prefill_engine = Engine(params, cfg, self.qcfg, batch=1,
                                      max_len=self.max_len, forward_fn=forward_fn)
        self._scratch = self._prefill_engine.new_cache()

        self.slots = [_Slot() for _ in range(slots)]
        # dispatch-mix observability (each key is ~one device round-trip):
        # what the scheduler actually spent its ticks on (surfaced in
        # /metrics and scripts/bench_serving.py)
        self.tick_stats = {"bursts": 0, "burst_ticks": 0, "single_ticks": 0,
                           "admit_chunks": 0, "spec_ticks": 0}
        self.queue: collections.deque[Request] = collections.deque()
        self.done: list[Request] = []
        self._ids = itertools.count()
        self.admission_chunk = admission_chunk
        self._pending = None  # in-flight chunked admission: (slot_idx, done)

        # repeat_last_n < 0 means "context size" (Generate.h:58 / engine.py
        # semantics) — size the shared history window accordingly
        window = max(self._resolve_window(self.gcfg), 1)
        self._last = np.full((slots, window), -1, np.int32)
        self._next_tok = np.zeros((slots,), np.int32)
        self._state = sampling.SamplerState.init(
            self.gcfg.seed, slots, self.gcfg.mirostat_tau)
        # per-request sampling (one compiled sample_rows; params are traced
        # [slots] arrays, logit_bias as a fixed-width scatter, mirostat mu as
        # carried per-row state). An oversized engine-level bias table keeps
        # the static per-engine sampler for every request instead.
        self._per_row = (len(self.gcfg.logit_bias or ())
                         <= sampling.RowParams.MAX_BIAS)
        self._row_cfgs = [self.gcfg] * slots
        self._row_params = sampling.RowParams.from_configs(self._row_cfgs)
        self._mu = jnp.full((slots,), 2.0 * self.gcfg.mirostat_tau,
                            jnp.float32)
        self._row_window = np.full((slots,), window, np.int32)
        base = jax.random.PRNGKey(max(self.gcfg.seed, 0))
        self._keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(slots, dtype=jnp.uint32))
        self._jit_sample_rows = jax.jit(
            sampling.sample_rows,
            static_argnames=("use_bias", "use_tfs_typical", "use_mirostat",
                             "top_k_max", "pen_lower"))

        self._jit_decode = jax.jit(
            functools.partial(_decode_step, forward_fn),
            static_argnames=("cfg", "ctx_cap"), donate_argnames=("cache",))
        self._jit_decode_paged = jax.jit(
            functools.partial(_decode_step_paged, forward_fn),
            static_argnames=("cfg",), donate_argnames=("cache",))
        self.tick_batch = max(int(tick_batch), 1)
        self._jit_decode_multi = jax.jit(
            functools.partial(_decode_multi, forward_fn),
            static_argnames=("cfg", "n_ticks", "ctx_cap", "lp_k",
                             "use_bias", "use_tfs_typical", "use_mirostat",
                             "top_k_max", "pen_lower"),
            donate_argnames=("cache",))
        # OpenAI-style logprobs: one top-k width per engine (requests clamp
        # to it) so the logprobs-variant executables stay one per bucket
        self.logprobs_k = int(logprobs_k)
        self._jit_token_lp = jax.jit(_token_logprobs,
                                     static_argnames=("lp_k",))
        self._jit_insert = _insert_slot  # jitted below (donates cache)
        # fused admission: final prefill chunk + slot/page splice + row-state
        # fold-in + first-token sample in ONE dispatch (the unfused path cost
        # ~5 dispatch round-trips per admission — at the 25-30 ms tunnel RTT
        # that dominated serving aggregate throughput)
        self._jit_admit = jax.jit(
            functools.partial(_admit_fused, forward_fn),
            static_argnames=("cfg", "insert_bucket", "lp_k", "features"),
            donate_argnames=("cache", "scratch"))
        self._jit_admit_paged = jax.jit(
            functools.partial(_admit_fused_paged, forward_fn),
            static_argnames=("cfg", "insert_bucket", "lp_k", "features"),
            donate_argnames=("cache", "scratch"))
        # batched admission (r5): R queue-head single-chunk admissions in ONE
        # dispatch — ragged batched prefill into an R-row scratch, R slot
        # splices, R first-token samples. At a wave boundary (all slots
        # freeing together, the steady state of a loaded server) the single
        # path paid R dispatch RTTs + R full weight streams serialized
        # against decode; this pays one of each. llama-family dense only
        # (vector true_len rides llama.forward; paged/SP/multimodal/prefix-
        # hit requests keep the single path).
        self._batch_admit = (self._per_row and not paged
                             and forward_fn is llama.forward
                             and sp_mesh is None)
        self._jit_admit_multi = jax.jit(
            functools.partial(_admit_fused_multi, forward_fn),
            static_argnames=("cfg", "insert_bucket", "n_rows", "lp_k",
                             "features"),
            donate_argnames=("cache", "scratch"))
        self._multi_scratch: dict[int, kvc.KVCache] = {}
        self.tick_stats["batch_admits"] = 0
        self.tick_stats["batch_admit_reqs"] = 0

        # prefix cache: a KVCache whose batch axis is the entry pool
        self._pfx_entries = int(prefix_cache_entries)
        self._prefix_min = int(prefix_min)
        if self._pfx_entries:
            w = min(prefix_cache_len or self.max_len, self.max_len)
            # mirror the scratch cache's storage (bf16 / int8+scales / raw
            # int8 for the OPT W8A8 static-scale path)
            self._pfx_store = kvc.init_cache(
                cfg.num_layers, self._pfx_entries, w, cfg.num_kv_heads,
                cfg.head_dim, dtype=self._scratch.k.dtype,
                quantized=self._scratch.quantized)
            self._pfx_tokens: list[Optional[np.ndarray]] = \
                [None] * self._pfx_entries
            self._pfx_lru: list[int] = list(range(self._pfx_entries))
            self.prefix_stats = {"hits": 0, "hit_tokens": 0, "stores": 0}

        # sequence-parallel admission (VERDICT r3 #5): ring prefill for long
        # prompts, decode untouched
        self._sp_mesh = sp_mesh
        self.sp_threshold = int(sp_threshold)
        if sp_mesh is not None:
            from tinychatengine_tpu.parallel.sp import (make_sp_prefill,
                                                        sp_cache_into)
            n_seq = sp_mesh.shape["seq"]
            assert self.sp_threshold % n_seq == 0, (sp_threshold, n_seq)
            assert cfg.family == "llama", \
                "SP admission rides llama.forward's sp_axis hook (llama-family only)"
            self._jit_sp_prefill = jax.jit(
                make_sp_prefill(sp_mesh), static_argnames=("cfg",))
            self._jit_sp_splice = jax.jit(sp_cache_into,
                                          donate_argnames=("dst",))
            self._sp_caches: dict[int, kvc.KVCache] = {}
            self._sp_params = params if sp_params is None else sp_params
            self.sp_stats = {"admissions": 0, "tokens": 0}

        # speculative (prompt-lookup) serving state
        self.speculative = bool(speculative) and not paged and self._per_row
        self.spec_K = int(spec_K)
        assert self.spec_K + 1 < 16, "spec_K+1 must stay below the smallest bucket"
        self._row_greedy = [False] * slots
        if self.speculative:
            self.hist_len = self.max_len + self.spec_K + 1
            self._hist = jnp.zeros((slots, self.hist_len), jnp.int32)
            self._h = np.zeros((slots,), np.int64)
            self._hist_dirty = [True] * slots
            self._in_spec = False
            self._spec_stats = {"ticks": 0, "tokens": 0}
            self._jit_spec = jax.jit(
                functools.partial(_spec_verify, forward_fn),
                static_argnames=("cfg", "n_spec"), donate_argnames=("cache",))

    def _resolve_window(self, g: GenerationConfig) -> int:
        """Penalty-history window for a config: -1 = context size
        (Generate.h:58), 0 = penalties disabled (window stays all -1)."""
        return min(g.n_ctx, self.max_len) if g.repeat_last_n < 0 \
            else g.repeat_last_n

    # -- public API ----------------------------------------------------------
    def submit(self, prompt_ids, n_predict: Optional[int] = None,
               stop_token_ids=(), on_token=None,
               gcfg: Optional[GenerationConfig] = None,
               logprobs: Optional[int] = None,
               input_embeds=None) -> Request:
        """gcfg: per-request sampling parameters (temp/top_k/top_p/tfs_z/
        typical_p/penalties/mirostat/seed) — served by ONE compiled
        row-sampler, no recompile per distinct config.
        logprobs: return the chosen token's raw-model logprob per emitted
        token, plus the top-``logprobs`` alternatives when > 0 (OpenAI API
        semantics). Served by logprobs-variant executables selected per
        dispatch — batches with no logprobs request pay nothing."""
        if gcfg is not None:
            if not self._per_row:
                raise ValueError(
                    "per-request gcfg unavailable: the engine gcfg uses the "
                    "engine-global sampler (oversized logit_bias)")
            if len(gcfg.logit_bias or ()) > sampling.RowParams.MAX_BIAS:
                raise ValueError(
                    f"per-request logit_bias supports at most "
                    f"{sampling.RowParams.MAX_BIAS} entries")
        if logprobs is not None and not 0 <= int(logprobs) <= self.logprobs_k:
            raise ValueError(
                f"logprobs must be in [0, {self.logprobs_k}] "
                f"(engine logprobs_k); got {logprobs}")
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if input_embeds is not None:
            input_embeds = np.asarray(input_embeds, np.float32)
            if input_embeds.ndim == 3 and input_embeds.shape[0] == 1:
                input_embeds = input_embeds[0]
            if input_embeds.shape != (len(ids), self.cfg.embed_dim):
                raise ValueError(
                    f"input_embeds must be [{len(ids)}, "
                    f"{self.cfg.embed_dim}]; got {input_embeds.shape}")
        req = Request(
            prompt_ids=ids, input_embeds=input_embeds,
            n_predict=n_predict or (gcfg or self.gcfg).n_predict,
            stop_token_ids=tuple(int(t) for t in stop_token_ids),
            on_token=on_token, request_id=next(self._ids), gcfg=gcfg,
            logprobs=None if logprobs is None else int(logprobs),
            submit_t=time.perf_counter())
        self.queue.append(req)
        return req

    def run(self) -> list:
        """Drain the queue; returns finished requests in completion order."""
        while (self.queue or self._pending is not None
               or any(s.active for s in self.slots)):
            self.step()
        return self.done

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.slots if s.active)

    def cancel(self, req: Request, reason: str = "cancelled") -> bool:
        """Abort a request at any lifecycle stage (queued, mid-admission,
        actively decoding). Returns True if it was live and is now finished,
        False if it had already finished. The reference has no cancellation
        (its REPL blocks on one generation, llm/application/chat.cc); a
        network serving surface needs it for client disconnects and
        host-side stop-string matches (runtime/server.py)."""
        if req.finished:
            return False
        done = False
        try:  # still queued (or requeued by preemption)
            self.queue.remove(req)
            done = True
        except ValueError:
            pass
        if not done and self._pending is not None \
                and self.slots[self._pending[0]].request is req:
            # in-flight chunked admission: drop it (only prefill work lost)
            slot_idx = self._pending[0]
            self._pending = None
            slot = self.slots[slot_idx]
            slot.request = None
            slot.admitting = False
            if self.paged:
                self.allocator.free(self._slot_pages[slot_idx])
                self._slot_pages[slot_idx] = []
            done = True
        if not done:
            for i, slot in enumerate(self.slots):
                if slot.request is req:  # active: free the slot mid-stream
                    slot.request = None
                    slot.length = 0
                    if self.paged:
                        self.allocator.free(self._slot_pages[i])
                        self._slot_pages[i] = []
                        self._tables[i] = self._dead_page
                    done = True
                    break
        if not done:
            return False
        req.finished = True
        req.finish_reason = reason
        req.done_t = time.perf_counter()
        self.done.append(req)
        return True

    # -- scheduler core --------------------------------------------------------
    def step(self):
        """One scheduler tick: advance at most ONE admission prefill chunk,
        then one batched decode step for every active slot (continuous
        batching with chunked-admission interleaving: a long prompt admits
        one chunk per tick, so active slots keep emitting a token per tick
        throughout — the reference has no scheduler at all, SURVEY §2.8).
        Page-pool exhaustion applies backpressure: admission waits, decode
        growth preempts (the preempted request resumes with progress
        intact)."""
        if self._pending is not None:
            self._admit_chunk()
        while (self._pending is None and self.queue
               and self._free_slot() is not None):
            if self.paged and self.allocator.n_free < \
                    self.allocator.pages_needed(
                        _bucket(min(len(self.queue[0].prompt_ids),
                                    self.max_len - 2))):
                break  # not enough pages: hold the queue until some free
            batch = self._eligible_batch()
            if len(batch) >= 2:
                self._admit_batch(batch)
                continue
            self._begin_admission(self._free_slot(), self.queue.popleft())
            if self._pending is not None:
                break  # a long prompt: continue its chunks on later ticks
        if not any(s.active for s in self.slots):
            if self.queue and self._pending is None:
                raise MemoryError(
                    "paged KV pool cannot fit the next request's prefill "
                    f"({self.allocator.n_free} pages free)")
            return
        if self._spec_ok():
            self._decode_spec()
            return
        k = self._burst_ticks()
        if k >= 2:
            self.tick_stats["bursts"] += 1
            self.tick_stats["burst_ticks"] += k
            self._decode_burst(k)
        else:
            self.tick_stats["single_ticks"] += 1
            self._decode_once()

    # -- speculative (prompt-lookup) ticks -----------------------------------
    def _spec_ok(self) -> bool:
        """A spec tick needs: enabled, no pending admission/admittable queue,
        and EVERY active slot greedy-eligible with K+1 of cache headroom."""
        if not self.speculative or self._pending is not None:
            return False
        if self.queue and self._free_slot() is not None:
            return False
        act = [i for i, s in enumerate(self.slots) if s.active]
        if not act:
            return False
        for i in act:
            s = self.slots[i]
            if not self._row_greedy[i]:
                return False
            if s.request.logprobs is not None:
                return False  # verify ticks don't ship per-token logprobs
            if s.length + self.spec_K + 1 >= self.max_len:
                return False
            if self._h[i] + self.spec_K + 1 > self.hist_len:
                return False
        return True

    def _refresh_hist(self, i: int):
        """Rebuild slot i's device-side lookup history from the host record
        (prompt + emitted so far) — needed after admissions and after any
        non-spec ticks, which don't maintain the device history."""
        req = self.slots[i].request
        n = len(req.prompt_ids)
        row = np.zeros((self.hist_len,), np.int32)
        row[:n] = req.prompt_ids
        row[n:n + len(req.output_ids)] = req.output_ids
        self._hist = self._hist.at[i].set(jnp.asarray(row))
        self._h[i] = n + len(req.output_ids)
        self._hist_dirty[i] = False

    def _decode_spec(self):
        """One draft+verify dispatch: every active slot drafts spec_K tokens
        from its own history (prompt-lookup) and verifies them in a single
        ragged [B, K+1] forward; accepted runs emit several tokens per tick
        with EXACT greedy semantics (the verify recomputes the argmax
        chain). Slots stopping mid-run discard their overshoot, as in
        tick bursts."""
        for i, s in enumerate(self.slots):
            if s.active and self._hist_dirty[i]:
                self._refresh_hist(i)
        lengths = jnp.asarray([s.length for s in self.slots], jnp.int32)
        active0 = [s.active for s in self.slots]
        seq, emitted, self.cache, self._hist = self._jit_spec(
            self.params, self.cfg, jnp.asarray(self._next_tok), self.cache,
            lengths, self._hist, jnp.asarray(self._h, jnp.int32),
            n_spec=self.spec_K)
        seq = np.asarray(seq)                # [slots, K+1]
        emitted = np.asarray(emitted)
        self._in_spec = True
        try:
            for i, slot in enumerate(self.slots):
                if not active0[i]:
                    continue
                self._h[i] += int(emitted[i])
                for t in range(int(emitted[i])):
                    if not slot.active:
                        break                 # stopped mid-run: discard rest
                    slot.length += 1
                    self._emit(i, int(seq[i, t]))
                    self._spec_stats["tokens"] += 1
        finally:
            self._in_spec = False
        self._spec_stats["ticks"] += 1
        self.tick_stats["spec_ticks"] += 1

    def _burst_ticks(self) -> int:
        """How many decode ticks can run as one device dispatch without the
        host needing to intervene: requires the per-row sampler, no
        in-flight chunked admission, and tick_batch tokens of budget +
        cache/page headroom on every active slot. All-or-nothing (a single
        extra executable, not one per burst length). A standing queue does
        NOT disable bursting — waiting requests admit at the next burst
        boundary (admission delay bounded by tick_batch-1 ticks; set
        tick_batch=1 for a latency-first engine)."""
        # NOTE (r5, measured): while a chunked admission is in flight,
        # decode stays SINGLE-tick on purpose. Small decode bursts during
        # the admission phase were tried twice on the long-context bench
        # (unconditional burst-4: 47.4 tok/s; full-occupancy-gated burst-4:
        # 45.8) and both LOST to the single-tick throttle (52.8) — bursting
        # front-loads decode into lower-occupancy dispatches and stretches
        # the admission phase, which outweighs the RTT amortization.
        if self.tick_batch < 2 or not self._per_row \
                or self._pending is not None:
            return 1
        if self.queue and self._free_slot() is not None:
            return 1  # an admission is actually possible right now — take it
        k = self.tick_batch
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            k = min(k, s.remaining, self.max_len - s.length - 1)
            if self.paged:
                # grant the burst's pages UP-FRONT when the pool allows:
                # page-boundary clamping fragmented the r5 paged bench into
                # 44 bursts + 27 single ticks (vs 30 dense) — each an extra
                # dispatch RTT. Slots free every page at release/preemption,
                # so an early grant is never leaked; on pool pressure the
                # clamp below still applies backpressure.
                want = min(self.tick_batch, s.remaining,
                           self.max_len - s.length - 1)
                need_pg = self.allocator.pages_needed(s.length + want) \
                    - len(self._slot_pages[i])
                if need_pg > 0 and self.allocator.n_free >= need_pg:
                    for pg_id in self.allocator.alloc(need_pg):
                        self._slot_pages[i].append(pg_id)
                        self._tables[i, len(self._slot_pages[i]) - 1] = pg_id
                k = min(k, len(self._slot_pages[i])
                        * self.allocator.page_size - s.length)
        # quantize to a power of two: one executable per size {2,4,8,...},
        # not one per arbitrary burst length — keeps the tail (a slot close
        # to its budget) bursting instead of collapsing to single ticks
        p2 = 1
        while p2 * 2 <= k:
            p2 *= 2
        return p2

    def _decode_burst(self, k: int):
        """K decode+sample ticks in one dispatch; host-side bookkeeping
        (emit, stop, window mask) replays the [K, B] token burst in order."""
        window = self._last.shape[1]
        keep_mask = jnp.asarray(
            np.arange(window)[None, :] >= (window - self._row_window[:, None]))
        lengths = jnp.asarray([s.length for s in self.slots], jnp.int32)
        active0 = [s.active for s in self.slots]
        lp_k = self.logprobs_k if self._want_lp() else None
        ub, ut, um, kmax, pl = self._row_features()
        if self.paged:
            seq, self.page_cache, self._keys, self._mu = self._jit_decode_multi(
                self.params, self.cfg, jnp.asarray(self._next_tok),
                self.page_cache, lengths, self._keys, self._row_params,
                jnp.asarray(self._last), keep_mask, self._mu,
                jnp.asarray(self._tables), n_ticks=k, lp_k=lp_k,
                use_bias=ub, use_tfs_typical=ut, use_mirostat=um,
                top_k_max=kmax, pen_lower=pl)
        else:
            cap = _cap_bucket(
                max(s_.length for s_ in self.slots) + k, self.max_len)
            seq, self.cache, self._keys, self._mu = self._jit_decode_multi(
                self.params, self.cfg, jnp.asarray(self._next_tok),
                self.cache, lengths, self._keys, self._row_params,
                jnp.asarray(self._last), keep_mask, self._mu, None,
                n_ticks=k, ctx_cap=cap, lp_k=lp_k,
                use_bias=ub, use_tfs_typical=ut, use_mirostat=um,
                top_k_max=kmax, pen_lower=pl)
        lps = tops = None
        if lp_k is not None:
            seq, lps, top_i, top_lp = (np.asarray(a) for a in seq)
            tops = _zip_tops(top_i, top_lp)                 # [K][B][(id, lp)]
        seq = np.asarray(seq)                               # [K, B]
        for t in range(k):
            for i, slot in enumerate(self.slots):
                # only slots live since the burst started emit; a slot that
                # stopped mid-burst discards its overshoot tokens
                if active0[i] and slot.active:
                    slot.length += 1
                    self._emit(i, int(seq[t, i]),
                               lp=None if lps is None else lps[t, i],
                               top=None if tops is None else tops[t][i])

    def _cancel_admission(self):
        """Abort the in-flight chunked admission: requeue its request (front
        of queue — it keeps its turn), free the slot and any reserved
        pages. Only prefill work is lost; no tokens were emitted yet."""
        slot_idx, _ = self._pending
        self._pending = None
        slot = self.slots[slot_idx]
        req = slot.request
        slot.request = None
        slot.admitting = False
        if self.paged:
            self.allocator.free(self._slot_pages[slot_idx])
            self._slot_pages[slot_idx] = []
        self.queue.appendleft(req)

    def _preempt(self, slot_idx: int):
        """Free a slot mid-generation and requeue its request with progress
        folded into the prompt (vLLM-style recompute preemption): the cache
        is rebuilt by a future prefill of prompt+emitted, so nothing is
        re-emitted and greedy output is unchanged."""
        slot = self.slots[slot_idx]
        req = slot.request
        if req.input_embeds is not None and req.output_ids:
            # the folded-in emitted tokens are ordinary text: extend the
            # embeds with their table rows (device gather + small fetch —
            # never the whole [V, E] table over the tunnel)
            rows = jnp.take(self.params.embed,
                            jnp.asarray(np.asarray(req.output_ids, np.int32)),
                            axis=0)
            req.input_embeds = np.concatenate(
                [req.input_embeds, np.asarray(rows, np.float32)])
        req.prompt_ids = np.concatenate(
            [req.prompt_ids, np.asarray(req.output_ids, np.int32)])
        slot.request = None
        slot.length = 0
        if self.paged:
            self.allocator.free(self._slot_pages[slot_idx])
            self._slot_pages[slot_idx] = []
            self._tables[slot_idx] = self._dead_page
        self.queue.appendleft(req)

    def _free_slot(self) -> Optional[int]:
        for i, s in enumerate(self.slots):
            if not s.active:
                return i
        return None

    # -- batched admission (r5) ------------------------------------------------
    def _eligible_batch(self) -> list:
        """Maximal contiguous queue-head prefix admissible through the ONE-
        dispatch batched path: per-row sampler engines, dense llama-family,
        single-chunk text prompts with no prefix-cache hit. FIFO order is
        preserved — the scan stops at the first ineligible request (which
        then takes the single path first)."""
        if not self._batch_admit:
            return []
        cap = min(self.admission_chunk, self.max_len - 2)
        out = []
        free = sum(1 for s in self.slots if not s.active)
        for req in self.queue:
            if len(out) >= free:
                break
            if req.input_embeds is not None or len(req.prompt_ids) > cap:
                break
            if self._pfx_entries and \
                    self._prefix_match(req.prompt_ids) is not None:
                break  # cached-prefix reuse beats a batched fresh prefill
            out.append(req)
        if len(out) < 2:
            return []
        # R rounded DOWN to a power of two and the COMMON max bucket keep
        # the executable space tiny ((R, bucket) pairs compile in 20-240 s
        # over this tunnel — a bucket-GROUPED variant was measured and
        # reverted: it saved ~0.2 s/wave of padded prefill but novel
        # (R, bucket) combos compiling mid-run cost 17 s of TTFT on the
        # 24-req bench). Stragglers ride the next loop iteration or the
        # single fused path.
        r = 1 << (len(out).bit_length() - 1)
        return out[:r] if r >= 2 else []

    def _admit_batch(self, reqs: list):
        """Admit R queue-head requests in ONE device dispatch
        (_admit_fused_multi): ragged batched prefill (per-row true_lens),
        R slot splices, R-row sampler-state fold-in, R first-token samples.
        Numerics per request match the single fused path (same forward
        math, same per-request keys/params through sample_rows).
        Prefix-cache STORES are skipped for batched admissions (the store
        executable copies scratch row 0; hits still route via the single
        path through _eligible_batch)."""
        slots = []
        for req in reqs:
            self.queue.remove(req)
            slots.append(self._free_slot())
            self.slots[slots[-1]].request = req
        n_rows = len(reqs)
        self.tick_stats["batch_admits"] += 1
        self.tick_stats["batch_admit_reqs"] += n_rows

        rcfgs, mu0s, keys = [], [], []
        for slot_idx, req in zip(slots, reqs):
            rcfg = self._admit_host_prep(slot_idx, req)
            self._row_cfgs[slot_idx] = rcfg
            rcfgs.append(rcfg)
            mu0s.append(2.0 * rcfg.mirostat_tau)
            keys.append(self._row_key_for(req, rcfg))
        rp_rows = sampling.RowParams.from_configs(rcfgs)
        row_keys = jnp.stack(keys)
        mu0s = jnp.asarray(mu0s, jnp.float32)
        last_rows = jnp.asarray(self._last[np.asarray(slots)])

        bucket = max(_bucket(len(r.prompt_ids)) for r in reqs)
        ids = np.zeros((n_rows, bucket), np.int32)
        true_lens = np.zeros((n_rows,), np.int32)
        for r, req in enumerate(reqs):
            n = len(req.prompt_ids)
            ids[r, :n] = req.prompt_ids
            true_lens[r] = n

        ub = any(bool(c.logit_bias) for c in rcfgs)
        ut = any((c.tfs_z < 1.0) or (c.typical_p < 1.0) for c in rcfgs)
        um = any(c.mirostat != 0 for c in rcfgs)
        ks = [c.top_k for c in rcfgs]
        kmax = _kmax_bucket(max(ks) if min(ks) > 0 else 0)
        pl = all(c.repeat_penalty >= 1.0 and c.frequency_penalty >= 0.0
                 and c.presence_penalty >= 0.0 for c in rcfgs)
        lp_k = self.logprobs_k \
            if any(r.logprobs is not None for r in reqs) else None

        scratch = self._multi_scratch.pop(n_rows, None)
        if scratch is None:
            w = min(_bucket(self.admission_chunk), self.max_len)
            scratch = kvc.init_cache(
                self.cfg.num_layers, n_rows, w, self.cfg.num_kv_heads,
                self.cfg.head_dim, dtype=self._scratch.k.dtype,
                quantized=self._scratch.quantized)
        (tok, self.cache, scratch, self._keys, self._row_params, self._mu,
         lp) = self._jit_admit_multi(
            self.params, self.cfg, jnp.asarray(ids), scratch, self.cache,
            jnp.asarray(true_lens), self._keys, self._row_params, self._mu,
            row_keys, rp_rows, last_rows, mu0s,
            jnp.asarray(slots, jnp.int32), insert_bucket=bucket,
            n_rows=n_rows, lp_k=lp_k, features=(ub, ut, um, kmax, pl))
        self._multi_scratch[n_rows] = scratch
        tok = np.asarray(tok)
        lps = tops = None
        if lp is not None:
            lps = np.asarray(lp[0])
            tops = _zip_tops(np.asarray(lp[1])[None], np.asarray(lp[2])[None])
        now = time.perf_counter()
        for r, (slot_idx, req) in enumerate(zip(slots, reqs)):
            req.first_token_t = now
            self._emit(slot_idx, int(tok[r]),
                       lp=None if lps is None else lps[r],
                       top=None if tops is None else tops[0][r])

    def _begin_admission(self, slot_idx: int, req: Request):
        """Reserve a slot (and, paged, the prefill's pages) and start the
        possibly-chunked prefill. Pages are RESERVED UP-FRONT: the admission
        check in step() sees the free count at tick 0, but a chunked prefill
        finishes ticks later — by which time interleaved decode growth may
        have consumed the pool (that race crashed the engine with a
        MemoryError out of _finish_admission)."""
        n = len(req.prompt_ids)
        cap = self.max_len - 2
        if n > cap:
            req.prompt_ids = req.prompt_ids[-cap:]  # keep the tail
            if req.input_embeds is not None:
                req.input_embeds = req.input_embeds[-cap:]
            n = cap
        slot = self.slots[slot_idx]
        slot.request = req
        slot.admitting = True
        if self.paged:
            n_pg = self.allocator.pages_needed(min(_bucket(n), self.max_len))
            self._slot_pages[slot_idx] = self.allocator.alloc(n_pg)
        self._scratch = _reset(self._scratch)
        done0 = 0
        # multimodal prompts bypass the prefix cache and the SP ring: their
        # ids carry 0 at image slots, so token-keyed KV reuse would be
        # semantically wrong, and the ring prefill embeds ids itself
        if self._pfx_entries and req.input_embeds is None:
            hit = self._prefix_match(req.prompt_ids)
            if hit is not None:
                entry, m = hit
                self._scratch = _jit_prefix_load(
                    self._scratch, self._pfx_store, jnp.int32(entry),
                    jnp.int32(m))
                done0 = m
                self.prefix_stats["hits"] += 1
                self.prefix_stats["hit_tokens"] += m
        if self._sp_mesh is not None and done0 == 0 \
                and req.input_embeds is None:
            done0 = self._sp_admit_head(req)
        self._pending = [slot_idx, done0]
        self._admit_chunk()

    # -- sequence-parallel admission ------------------------------------------
    def _sp_len_for(self, n: int) -> int:
        """Largest power-of-two prompt head >= sp_threshold that leaves at
        least one token for the ordinary final chunk (which produces the
        first-token logits — the SP dispatch's own logits are unused)."""
        best, b = 0, self.sp_threshold
        while b <= min(n - 1, self.max_len):
            best, b = b, b * 2
        return best

    def _sp_cache_for(self, sp_len: int) -> kvc.KVCache:
        """Per-bucket seq-sharded prefill cache (every position is fully
        overwritten by each SP prefill, so entries are reusable as-is)."""
        c = self._sp_caches.get(sp_len)
        if c is None:
            from tinychatengine_tpu.parallel.sp import shard_sp_cache
            c = shard_sp_cache(
                kvc.init_cache(self.cfg.num_layers, 1, sp_len,
                               self.cfg.num_kv_heads, self.cfg.head_dim,
                               dtype=self._scratch.k.dtype,
                               quantized=self._scratch.quantized),
                self._sp_mesh)
            self._sp_caches[sp_len] = c
        return c

    def _sp_admit_head(self, req: Request) -> int:
        """Ring-prefill the prompt's power-of-two head in one SP dispatch
        and splice it into the scratch cache; returns tokens covered (the
        chunked admission continues from there). Fresh-prefill only (the
        ring sees no prior KV), hence the done0 == 0 gate at the call site."""
        sp_len = self._sp_len_for(len(req.prompt_ids))
        if not sp_len:
            return 0
        ids = jnp.asarray(
            np.asarray(req.prompt_ids[:sp_len], np.int32)[None])
        _, filled = self._jit_sp_prefill(
            self._sp_params, self.cfg, ids, self._sp_cache_for(sp_len))
        if self._sp_params is not self.params:
            # decode lives on a different mesh/device set: move the filled
            # prefill KV across before the splice (jit cannot mix committed
            # arrays from two device sets in one call)
            filled = jax.device_put(filled, self._sp_landing_sharding())
        self._scratch = self._jit_sp_splice(self._scratch, filled)
        self.sp_stats["admissions"] += 1
        self.sp_stats["tokens"] += sp_len
        return sp_len

    def _sp_landing_sharding(self):
        """Where SP-prefilled KV lands on the decode side: replicated over
        the decode params' mesh when those are mesh-committed, else the
        default device."""
        from jax.sharding import NamedSharding, PartitionSpec
        for leaf in jax.tree.leaves(self.params):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding):
                return NamedSharding(sh.mesh, PartitionSpec())
        return jax.devices()[0]

    # -- prefix cache ---------------------------------------------------------
    def _prefix_match(self, prompt: np.ndarray):
        """Longest common token prefix against the stored entries (capped at
        n-1 so the final chunk always prefills >= 1 token and produces the
        first-token logits). Returns (entry, m) or None; refreshes LRU."""
        n = len(prompt)
        best, best_m = None, 0
        for e, toks in enumerate(self._pfx_tokens):
            if toks is None:
                continue
            k = min(len(toks), n)
            neq = np.nonzero(toks[:k] != prompt[:k])[0]
            m = int(neq[0]) if len(neq) else k
            if m > best_m:
                best, best_m = e, m
        best_m = min(best_m, n - 1)
        if best is None or best_m < self._prefix_min:
            return None
        self._pfx_lru.remove(best)
        self._pfx_lru.append(best)
        return best, best_m

    def _maybe_store_prefix(self, req: Request):
        """After an admission, store the prompt's KV head (up to the pool
        width) unless an existing entry already covers it. Evicts LRU."""
        if req.input_embeds is not None:
            return  # image KV is not a function of the 0-filled ids
        w = self._pfx_store.max_len
        keep = min(len(req.prompt_ids), w)
        if keep < self._prefix_min:
            return
        head = req.prompt_ids[:keep]
        for toks in self._pfx_tokens:
            if toks is not None and len(toks) >= keep and \
                    np.array_equal(toks[:keep], head):
                return  # already covered by a same-or-longer entry
        victim = self._pfx_lru.pop(0)
        self._pfx_lru.append(victim)
        self._pfx_store = _jit_prefix_store(
            self._pfx_store, self._scratch, jnp.int32(victim))
        self._pfx_tokens[victim] = head.copy()
        self.prefix_stats["stores"] += 1

    def _admit_chunk(self):
        """Prefill ONE chunk of the pending admission; finalize on the last
        chunk (first-token sample + slot splice). With the per-row sampler,
        the FINAL chunk runs through the fused admission executable — prefill
        + splice + row-state fold-in + sample in one dispatch."""
        slot_idx, done = self._pending
        self.tick_stats["admit_chunks"] += 1
        req = self.slots[slot_idx].request
        n = len(req.prompt_ids)
        take = min(self.admission_chunk, n - done)
        if done + take >= n and self._per_row:
            self._pending = None
            self._finish_admission_fused(slot_idx, req, done, take)
            return
        emb = None if req.input_embeds is None else \
            jnp.asarray(req.input_embeds[None, done:done + take],
                        jnp.bfloat16)
        logits, self._scratch = self._prefill_engine.prefill(
            req.prompt_ids[None, done:done + take], self._scratch, start=done,
            input_embeds=emb)
        done += take
        if done < n:
            self._pending[1] = done
            return
        self._pending = None
        self._finish_admission(slot_idx, req, logits)

    def _admit_host_prep(self, slot_idx: int, req: Request):
        """Host-side per-admission bookkeeping shared by the fused and
        unfused paths: slot budget, penalty window, per-row config/key."""
        n = len(req.prompt_ids)
        slot = self.slots[slot_idx]
        slot.admitting = False  # slot joins the decode batch this tick
        slot.length = n
        # resumed (preempted) requests keep their budget: n_predict counts
        # TOTAL emitted tokens, of which len(output_ids) already happened
        slot.remaining = min(req.n_predict - len(req.output_ids),
                             self.max_len - n - 1)
        window = self._last.shape[1]
        self._last[slot_idx] = -1
        tail = min(window, n)
        self._last[slot_idx, window - tail:] = req.prompt_ids[n - tail:]
        rcfg = req.gcfg or self.gcfg
        self._row_window[slot_idx] = min(
            max(self._resolve_window(rcfg), 0), window)
        self._mask_row_window(slot_idx)
        # PLD eligibility: exactness requires a pure greedy argmax chain
        # (the verify computes raw argmax — penalties/bias would be dropped)
        self._row_greedy[slot_idx] = (
            rcfg.temp <= 0 and rcfg.repeat_penalty == 1.0
            and rcfg.frequency_penalty == 0.0
            and rcfg.presence_penalty == 0.0 and rcfg.mirostat == 0
            and not rcfg.logit_bias)
        if self.speculative:
            self._hist_dirty[slot_idx] = True
        return rcfg

    def _row_key_for(self, req: Request, rcfg: GenerationConfig):
        return (jax.random.PRNGKey(rcfg.seed)
                if req.gcfg is not None and rcfg.seed >= 0
                else jax.random.fold_in(
                    jax.random.PRNGKey(max(self.gcfg.seed, 0)),
                    req.request_id + 1 + len(self.slots)))

    def _finish_admission_fused(self, slot_idx: int, req: Request,
                                done: int, take: int):
        """Final-chunk admission as ONE device dispatch (VERDICT r2 item 3):
        prefill of the last chunk, scratch→slot/page splice, per-row
        key/params/mu fold-in and the first-token sample all run inside a
        single jit — the unfused path cost ~5 dispatch RTTs per admission."""
        n = len(req.prompt_ids)
        rcfg = self._admit_host_prep(slot_idx, req)
        self._row_cfgs[slot_idx] = rcfg
        rp_row = sampling.RowParams.from_configs([rcfg])
        row_key = self._row_key_for(req, rcfg)
        mu0 = jnp.float32(2.0 * rcfg.mirostat_tau)

        bucket_p = _bucket(take)
        ids = np.zeros((1, bucket_p), np.int32)
        ids[0, :take] = req.prompt_ids[done:done + take]
        embeds = None
        if req.input_embeds is not None:
            pad = np.zeros((1, bucket_p, req.input_embeds.shape[1]),
                           np.float32)
            pad[0, :take] = req.input_embeds[done:done + take]
            embeds = jnp.asarray(pad, jnp.bfloat16)
        last_row = jnp.asarray(self._last[slot_idx][None])
        insert_bucket = min(_bucket(n), self.max_len)
        lp_k = self.logprobs_k if req.logprobs is not None else None
        feat = (bool(rcfg.logit_bias),
                (rcfg.tfs_z < 1.0) or (rcfg.typical_p < 1.0),
                rcfg.mirostat != 0,
                _kmax_bucket(max(rcfg.top_k, 0)),
                rcfg.repeat_penalty >= 1.0 and rcfg.frequency_penalty >= 0.0
                and rcfg.presence_penalty >= 0.0)
        if self.paged:
            p = self.allocator.page_size
            pages = self._slot_pages[slot_idx]   # reserved at admission start
            n_pg = len(pages)
            assert n_pg == self.allocator.pages_needed(insert_bucket), (
                n_pg, insert_bucket)
            self._tables[slot_idx] = self._dead_page
            self._tables[slot_idx, :n_pg] = pages
            (tok, self.page_cache, self._scratch, self._keys,
             self._row_params, self._mu, lp) = self._jit_admit_paged(
                self.params, self.cfg, jnp.asarray(ids), self._scratch,
                self.page_cache, jnp.asarray(pages, jnp.int32),
                jnp.asarray(done, jnp.int32), jnp.asarray(take, jnp.int32),
                self._keys, self._row_params, self._mu, row_key, rp_row,
                last_row, mu0, jnp.int32(slot_idx), embeds,
                insert_bucket=n_pg * p, lp_k=lp_k, features=feat)
        else:
            (tok, self.cache, self._scratch, self._keys,
             self._row_params, self._mu, lp) = self._jit_admit(
                self.params, self.cfg, jnp.asarray(ids), self._scratch,
                self.cache, jnp.asarray(done, jnp.int32),
                jnp.asarray(take, jnp.int32), self._keys, self._row_params,
                self._mu, row_key, rp_row, last_row, mu0,
                jnp.int32(slot_idx), embeds,
                insert_bucket=insert_bucket, lp_k=lp_k, features=feat)
        req.first_token_t = time.perf_counter()
        if self._pfx_entries:
            self._maybe_store_prefix(req)
        lp1 = top1 = None
        if lp is not None:
            lp1 = float(np.asarray(lp[0])[0])
            top1 = _zip_tops(np.asarray(lp[1])[None],
                             np.asarray(lp[2])[None])[0][0]
        self._emit(slot_idx, int(np.asarray(tok)), lp=lp1, top=top1)

    def _finish_admission(self, slot_idx: int, req: Request, logits):
        """Unfused finalization (engine-global sampler path only)."""
        n = len(req.prompt_ids)
        scratch = self._scratch
        bucket = min(_bucket(n), self.max_len)
        if self.paged:
            p = self.allocator.page_size
            pages = self._slot_pages[slot_idx]   # reserved at admission start
            n_pg = len(pages)
            assert n_pg == self.allocator.pages_needed(bucket), (n_pg, bucket)
            self._tables[slot_idx] = self._dead_page
            self._tables[slot_idx, :n_pg] = pages
            # splice a page-aligned span (scratch columns past the bucket are
            # garbage but sit beyond `length`, so they are never attended)
            self.page_cache = _jit_insert_pages(
                self.page_cache, scratch, jnp.asarray(pages, jnp.int32),
                bucket=n_pg * p)
        else:
            self.cache = self._jit_insert(
                self.cache, scratch, jnp.asarray(slot_idx, jnp.int32),
                bucket=bucket)

        self._admit_host_prep(slot_idx, req)
        mu0 = jnp.asarray(2.0 * self.gcfg.mirostat_tau, jnp.float32)
        state_b = sampling.SamplerState(key=self._state.key, mu=mu0[None])
        tok, state_b = self._prefill_engine._jit_sample(
            logits, state_b, jnp.asarray(self._last[slot_idx][None]),
            self._hcfg)
        self._state = sampling.SamplerState(
            key=state_b.key,
            mu=self._state.mu.at[slot_idx].set(state_b.mu[0]))
        t = int(np.asarray(tok)[0])
        req.first_token_t = time.perf_counter()
        if self._pfx_entries:
            self._maybe_store_prefix(req)
        lp1 = top1 = None
        if req.logprobs is not None:
            lp, ti, tl = self._jit_token_lp(logits, tok,
                                            lp_k=self.logprobs_k)
            lp1 = float(np.asarray(lp)[0])
            top1 = _zip_tops(np.asarray(ti)[None],
                             np.asarray(tl)[None])[0][0]
        self._emit(slot_idx, t, lp=lp1, top=top1)

    def _decode_once(self):
        if self.paged:
            # grow: a slot writing at a page boundary needs a fresh page;
            # on exhaustion, preempt later-admitted slots until it fits
            for i, slot in enumerate(self.slots):
                if not slot.active:
                    continue
                p = self.allocator.page_size
                if slot.length == len(self._slot_pages[i]) * p:
                    while self.allocator.n_free < 1:
                        if self._pending is not None:
                            # cheapest victim: the in-flight admission —
                            # cancelling loses only prefill work and frees
                            # its up-front page reservation
                            self._cancel_admission()
                            continue
                        victim = max(
                            (j for j, s in enumerate(self.slots)
                             if s.active and j != i),
                            key=lambda j: len(self.slots[j].request.output_ids),
                            default=None)
                        if victim is None:
                            raise MemoryError(
                                "paged KV pool exhausted with one sequence")
                        self._preempt(victim)
                    pg_id = self.allocator.alloc(1)[0]
                    self._slot_pages[i].append(pg_id)
                    self._tables[i, len(self._slot_pages[i]) - 1] = pg_id
        lengths = jnp.asarray([s.length for s in self.slots], jnp.int32)
        toks = jnp.asarray(self._next_tok)
        if self.paged:
            logits, self.page_cache = self._jit_decode_paged(
                self.params, self.cfg, toks, self.page_cache, lengths,
                jnp.asarray(self._tables))
        else:
            logits, self.cache = self._jit_decode(
                self.params, self.cfg, toks, self.cache, lengths,
                ctx_cap=_cap_bucket(
                    max(s_.length for s_ in self.slots) + 1, self.max_len))
        if self._per_row:
            ub, ut, um, kmax, pl = self._row_features()
            tok, self._keys, self._mu = self._jit_sample_rows(
                logits, self._keys, self._row_params, jnp.asarray(self._last),
                self._mu, use_bias=ub, use_tfs_typical=ut, use_mirostat=um,
                top_k_max=kmax, pen_lower=pl)
        else:
            tok, self._state = self._prefill_engine._jit_sample(
                logits, self._state, jnp.asarray(self._last), self._hcfg)
        tok_host = np.asarray(tok)
        lps = tops = None
        if self._want_lp():  # slow path: one extra dispatch is acceptable
            lp, ti, tl = self._jit_token_lp(logits, tok,
                                            lp_k=self.logprobs_k)
            lps = np.asarray(lp)
            tops = _zip_tops(np.asarray(ti)[None], np.asarray(tl)[None])[0]
        for i, slot in enumerate(self.slots):
            if slot.active:
                slot.length += 1
                self._emit(i, int(tok_host[i]),
                           lp=None if lps is None else lps[i],
                           top=None if tops is None else tops[i])

    def _row_features(self):
        """STATIC sampler-stage gates over the ACTIVE rows: each off stage
        is the identity (sampling.sample_rows docstring) but costs full-vocab
        sorts/softmaxes on device (~25 ms/tick at B=8 x 128k in the r4
        serving trace), so executables are keyed on which stages any live
        request actually uses. Inactive rows' draws are discarded, so their
        stale configs cannot affect emitted tokens."""
        ub = ut = um = False
        pl = True  # every active row's penalties lowering-only → the
        # candidate-domain sampler is exact (sampling._sample_rows_candidates)
        ks = []
        for i, s in enumerate(self.slots):
            if not s.active:
                continue
            c = self._row_cfgs[i]
            ub |= bool(c.logit_bias)
            ut |= (c.tfs_z < 1.0) or (c.typical_p < 1.0)
            um |= c.mirostat != 0
            pl &= (c.repeat_penalty >= 1.0 and c.frequency_penalty >= 0.0
                   and c.presence_penalty >= 0.0)
            ks.append(c.top_k)
        # top_k_max: sort-free path bound; 0 = disabled (some row runs
        # full-vocab top_k, or no active rows). BUCKETED to a fixed set so a
        # REST client cycling top_k values cannot trigger a recompile of the
        # decode-scan/admission executables per distinct value (each compile
        # is 20-240 s over the tunnel): exactness is preserved because
        # sample_rows clips per-row k_eff to the row's own top_k and masks
        # candidate positions >= k_eff.
        kmax = max(ks) if ks and min(ks) > 0 else 0
        return ub, ut, um, _kmax_bucket(kmax), pl

    def _want_lp(self) -> bool:
        """Any active slot wants logprobs → this dispatch uses the
        logprobs-variant executable (whole-batch arrays; per-slot storage
        filters in _emit)."""
        return any(s.active and s.request.logprobs is not None
                   for s in self.slots)

    def _mask_row_window(self, slot_idx: int):
        """Per-request repeat_last_n: blank history older than the row's
        window (the shared ``_last`` buffer is sized by the ENGINE gcfg —
        a request asking for a larger window is capped at it)."""
        w = int(self._row_window[slot_idx])
        full = self._last.shape[1]
        if w < full:
            self._last[slot_idx, :full - w] = -1

    def _emit(self, slot_idx: int, token: int, lp=None, top=None):
        """Record a sampled token for a slot; finish/free on stop or length.
        lp/top: chosen-token logprob and [(id, logprob)] top-k alternatives
        from the logprobs-variant executables (only stored when the request
        asked; the whole-batch arrays carry rows for every slot)."""
        slot = self.slots[slot_idx]
        req = slot.request
        req.output_ids.append(token)
        if req.logprobs is not None and lp is not None:
            req.output_logprobs.append(float(lp))
            req.output_top_logprobs.append(
                [] if not req.logprobs else top[:req.logprobs])
        if self.speculative and not self._in_spec:
            self._hist_dirty[slot_idx] = True  # device history went stale
        if req.on_token is not None:
            req.on_token(token, req)
        self._next_tok[slot_idx] = token
        self._last[slot_idx] = np.roll(self._last[slot_idx], -1)
        self._last[slot_idx, -1] = token
        self._mask_row_window(slot_idx)
        slot.remaining -= 1

        if token in req.stop_token_ids:
            req.finish_reason = "stop"
        elif slot.remaining <= 0 or slot.length + 1 >= self.max_len:
            req.finish_reason = "length"
        else:
            return
        req.finished = True
        req.done_t = time.perf_counter()
        self.done.append(req)
        slot.request = None
        slot.length = 0  # frozen; dead-row writes land at pos 0 and are masked
        if self.paged:  # recycle every page; dead slots write to the dead page
            self.allocator.free(self._slot_pages[slot_idx])
            self._slot_pages[slot_idx] = []
            self._tables[slot_idx] = self._dead_page


def _reset(cache: kvc.KVCache) -> kvc.KVCache:
    return kvc.KVCache(k=cache.k, v=cache.v,
                       length=jnp.zeros((), jnp.int32),
                       k_scale=cache.k_scale, v_scale=cache.v_scale)


def _insert_body(cache: kvc.KVCache, scratch: kvc.KVCache, slot_idx,
                 bucket: int) -> kvc.KVCache:
    """Splice scratch[:, 0, :, :bucket] into cache[:, slot_idx] (one D2D copy
    per buffer; bucket is the jit-static prefill bucket length)."""
    def put(dst, src):
        piece = jax.lax.slice_in_dim(src, 0, bucket, axis=3)
        return jax.lax.dynamic_update_slice(
            dst, piece, (0, slot_idx, 0, 0, 0))

    def put_scale(dst, src):
        piece = jax.lax.slice_in_dim(src, 0, bucket, axis=3)
        return jax.lax.dynamic_update_slice(dst, piece, (0, slot_idx, 0, 0))

    return kvc.KVCache(
        k=put(cache.k, scratch.k), v=put(cache.v, scratch.v),
        length=cache.length,
        k_scale=None if cache.k_scale is None else put_scale(cache.k_scale,
                                                             scratch.k_scale),
        v_scale=None if cache.v_scale is None else put_scale(cache.v_scale,
                                                             scratch.v_scale))


@functools.partial(jax.jit, static_argnames=("bucket",),
                   donate_argnames=("cache",))
def _insert_slot(cache: kvc.KVCache, scratch: kvc.KVCache, slot_idx,
                 bucket: int) -> kvc.KVCache:
    return _insert_body(cache, scratch, slot_idx, bucket)


def _fold_row_and_sample(logits, slot_idx, keys, rparams, mu, row_key,
                         rp_row, last_row, mu0,
                         features=(True, True, True, 0, False)):
    """Fold one admission's row state into the resident [slots] arrays and
    draw the first token — the traced body shared by both fused admits.
    ``features`` statically gates the sampler stages for the admitted row
    (sampling.sample_rows)."""
    keys = keys.at[slot_idx].set(row_key)
    rparams = jax.tree.map(lambda f, r: f.at[slot_idx].set(r[0]),
                           rparams, rp_row)
    mu = mu.at[slot_idx].set(mu0)
    ub, ut, um, kmax, pl = features
    tok, k1, mu1 = sampling.sample_rows(
        logits, keys[slot_idx][None],
        jax.tree.map(lambda a: a[slot_idx][None], rparams),
        last_row, mu[slot_idx][None], use_bias=ub, use_tfs_typical=ut,
        use_mirostat=um, top_k_max=kmax, pen_lower=pl)
    keys = keys.at[slot_idx].set(k1[0])
    mu = mu.at[slot_idx].set(mu1[0])
    return tok[0], keys, rparams, mu


def _insert_multi_body(cache: kvc.KVCache, scratch: kvc.KVCache,
                       slot_idxs, bucket: int, n_rows: int) -> kvc.KVCache:
    """Splice scratch rows 0..n_rows into cache slots slot_idxs[r] (r5
    batched admission — n_rows is static, slot_idxs traced [R] int32)."""
    def put(dst, src, r, slot):
        piece = jax.lax.slice_in_dim(
            jax.lax.dynamic_slice_in_dim(src, r, 1, axis=1), 0, bucket,
            axis=3)
        return jax.lax.dynamic_update_slice(dst, piece, (0, slot, 0, 0, 0))

    def put_scale(dst, src, r, slot):
        piece = jax.lax.slice_in_dim(
            jax.lax.dynamic_slice_in_dim(src, r, 1, axis=1), 0, bucket,
            axis=3)
        return jax.lax.dynamic_update_slice(dst, piece, (0, slot, 0, 0))

    k, v = cache.k, cache.v
    ks, vs = cache.k_scale, cache.v_scale
    for r in range(n_rows):
        slot = slot_idxs[r]
        k = put(k, scratch.k, r, slot)
        v = put(v, scratch.v, r, slot)
        if ks is not None:
            ks = put_scale(ks, scratch.k_scale, r, slot)
            vs = put_scale(vs, scratch.v_scale, r, slot)
    return kvc.KVCache(k=k, v=v, length=cache.length, k_scale=ks, v_scale=vs)


def _admit_fused_multi(forward_fn, params, cfg, ids, scratch, cache,
                       true_lens, keys, rparams, mu, row_keys, rp_rows,
                       last_rows, mu0s, slot_idxs, *, insert_bucket,
                       n_rows, lp_k=None,
                       features=(True, True, True, 0, False)):
    """R admissions in ONE dispatch (r5): a ragged batched prefill (fresh
    prompts, per-row true_lens → per-row last-position logits via llama
    vector-true_len), R slot splices, R-row state fold-in and the R first-
    token samples. The per-request FIFO single path (_admit_fused) handled
    one request per dispatch; a deep queue at a wave boundary paid
    R dispatch RTTs + R weight streams — this pays one of each."""
    logits, scratch = forward_fn(params, cfg, ids, scratch,
                                 jnp.zeros_like(true_lens),
                                 true_len=true_lens)        # [R, V]
    cache = _insert_multi_body(cache, scratch, slot_idxs, insert_bucket,
                               n_rows)
    ub, ut, um, kmax, pl = features
    tok, k1, mu1 = sampling.sample_rows(
        logits, row_keys, rp_rows, last_rows, mu0s, use_bias=ub,
        use_tfs_typical=ut, use_mirostat=um, top_k_max=kmax, pen_lower=pl)
    keys = keys.at[slot_idxs].set(k1)
    rparams = jax.tree.map(lambda f, r: f.at[slot_idxs].set(r), rparams,
                           rp_rows)
    mu = mu.at[slot_idxs].set(mu1)
    lp = None if lp_k is None else _token_logprobs(logits, tok, lp_k=lp_k)
    return tok, cache, scratch, keys, rparams, mu, lp


def _admit_fused(forward_fn, params, cfg, ids, scratch, cache, start,
                 true_len, keys, rparams, mu, row_key, rp_row, last_row,
                 mu0, slot_idx, embeds=None, *, insert_bucket, lp_k=None,
                 features=(True, True, True, 0, False)):
    """Final-chunk admission in ONE dispatch: prefill + slot splice + row
    fold-in + first-token sample. Numerically identical to the unfused
    sequence (same forward, same splice, same sample_rows call).
    ``embeds`` (optional [1, bucket, E]) is a multimodal prompt chunk —
    forwarded as input_embeds (a separate executable variant; text-only
    admissions pay nothing)."""
    logits, scratch = forward_fn(params, cfg, ids, scratch, start,
                                 true_len=true_len, input_embeds=embeds)
    cache = _insert_body(cache, scratch, slot_idx, insert_bucket)
    tok, keys, rparams, mu = _fold_row_and_sample(
        logits, slot_idx, keys, rparams, mu, row_key, rp_row, last_row, mu0,
        features)
    lp = None if lp_k is None else _token_logprobs(
        logits, tok.reshape(1), lp_k=lp_k)
    return tok, cache, scratch, keys, rparams, mu, lp


def _admit_fused_paged(forward_fn, params, cfg, ids, scratch, cache,
                       page_ids, start, true_len, keys, rparams, mu,
                       row_key, rp_row, last_row, mu0, slot_idx,
                       embeds=None, *, insert_bucket, lp_k=None,
                       features=(True, True, True, 0, False)):
    logits, scratch = forward_fn(params, cfg, ids, scratch, start,
                                 true_len=true_len, input_embeds=embeds)
    cache = _insert_pages_body(cache, scratch, page_ids, insert_bucket)
    tok, keys, rparams, mu = _fold_row_and_sample(
        logits, slot_idx, keys, rparams, mu, row_key, rp_row, last_row, mu0,
        features)
    lp = None if lp_k is None else _token_logprobs(
        logits, tok.reshape(1), lp_k=lp_k)
    return tok, cache, scratch, keys, rparams, mu, lp


@jax.jit
def _set_param_row(full, row, idx):
    """Write a 1-row RowParams into row ``idx`` of the resident [slots]
    arrays — one dispatch per admission instead of a full rebuild."""
    return jax.tree.map(lambda f, r: f.at[idx].set(r[0]), full, row)


def _zip_tops(top_i, top_lp):
    """[K, B, k] id/logprob arrays → [K][B] lists of (id, logprob) pairs."""
    return [[list(zip(ti.tolist(), tl.tolist()))
             for ti, tl in zip(top_i[t], top_lp[t])]
            for t in range(top_i.shape[0])]


_KMAX_BUCKETS = (8, 64, 256, 1024)


def _kmax_bucket(kmax: int) -> int:
    """Round a batch's max top_k up to a fixed bucket so the set of
    top_k_max-keyed executables is bounded (ADVICE r4: an unbucketed static
    kmax recompiles the decode scan per distinct client top_k). Rows keep
    their exact per-row k (sample_rows clips k_eff and masks candidates
    beyond it). Values above the largest bucket fall back to 0 — the
    full-vocab sorted path, exact for any k."""
    if kmax <= 0:
        return 0
    for b in _KMAX_BUCKETS:
        if kmax <= b:
            return b
    return 0


def _cap_bucket(needed: int, smax: int) -> int:
    """Static ctx_cap bucket for the decode-tick jits: next power-of-two
    multiple of 512 >= needed (so the per-tick recompile count is bounded by
    log2(smax/512) while the flash kernel still skips dead KV blocks —
    ops/attention.py ctx_cap)."""
    cap = 512
    while cap < needed:
        cap *= 2
    return min(cap, smax)


def _decode_step(forward_fn, params, cfg, tokens, cache, lengths,
                 ctx_cap=None):
    """One ragged decode step: tokens [B], lengths [B] → logits [B, V]."""
    logits, cache = forward_fn(params, cfg, tokens[:, None], cache, lengths,
                               ctx_cap=ctx_cap)
    return logits, cache


def _decode_step_paged(forward_fn, params, cfg, tokens, cache, lengths,
                       tables):
    logits, cache = forward_fn(params, cfg, tokens[:, None], cache, lengths,
                               page_table=tables)
    return logits, cache


def _token_logprobs(logits, tok, *, lp_k: int):
    """Chosen-token logprob [B] (+ exact top-k ids/logprobs [B, k] when
    lp_k > 0) from the RAW model logits — the pre-sampling distribution, so
    a greedy and a sampled request over the same prefix report the same
    numbers. Costs one logsumexp (+ one lax.top_k) over [B, V]: ~0.1% of a
    decode step, but only the logprobs-variant executables pay it."""
    lg = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lg, axis=-1)
    lp = jnp.take_along_axis(lg, tok[:, None], 1)[:, 0] - lse
    if lp_k > 0:
        top_v, top_i = jax.lax.top_k(lg, lp_k)
        return lp, top_i.astype(jnp.int32), top_v - lse[:, None]
    b = logits.shape[0]
    return lp, jnp.zeros((b, 0), jnp.int32), jnp.zeros((b, 0), jnp.float32)


def _decode_multi(forward_fn, params, cfg, tokens, cache, lengths, keys,
                  rparams, last, keep_mask, mu, tables, *, n_ticks,
                  ctx_cap=None, lp_k=None, use_bias=True,
                  use_tfs_typical=True, use_mirostat=True, top_k_max=0,
                  pen_lower=False):
    """K decode+sample ticks in ONE dispatch (lax.scan): the host-driven
    per-token scheduler costs 2-3 dispatch round-trips per tick (tunnel RTT
    ~25-30 ms makes that THE serving bottleneck; even local dispatch is
    ~100 us/tick of pure overhead). When no admission is pending and every
    active slot has ≥ K tokens of budget/page capacity, the scheduler hands
    the device a whole K-tick burst and gets back [K, B] tokens. Per-tick
    scheduling (admission interleave, stop detection) resumes on the host
    afterwards — slots that stop mid-burst simply have their overshoot
    tokens discarded (bounded by K; dead-row cache writes land beyond the
    live lengths or under the next splice). ``last`` is maintained on
    device with the same roll+append+window-mask semantics as the host copy
    (keep_mask encodes each row's repeat window)."""
    def tick(carry, _):
        toks, cache, lengths, keys, last, mu = carry
        if tables is None:
            logits, cache = forward_fn(params, cfg, toks[:, None], cache,
                                       lengths, ctx_cap=ctx_cap)
        else:
            logits, cache = forward_fn(params, cfg, toks[:, None], cache,
                                       lengths, page_table=tables)
        tok, keys, mu = sampling.sample_rows(
            logits, keys, rparams, last, mu, use_bias=use_bias,
            use_tfs_typical=use_tfs_typical, use_mirostat=use_mirostat,
            top_k_max=top_k_max, pen_lower=pen_lower)
        last = jnp.where(keep_mask,
                         jnp.concatenate([last[:, 1:], tok[:, None]], axis=1),
                         -1)
        ys = tok if lp_k is None else (
            tok, *_token_logprobs(logits, tok, lp_k=lp_k))
        return (tok, cache, lengths + 1, keys, last, mu), ys

    (tokens, cache, lengths, keys, last, mu), seq = jax.lax.scan(
        tick, (tokens, cache, lengths, keys, last, mu), None, length=n_ticks)
    return seq, cache, keys, mu


def _insert_pages_body(cache, scratch: kvc.KVCache, page_ids, bucket: int):
    """Splice a bucketed single-request prefill (contiguous scratch) into the
    allocated pages (runtime/paged.py insert_prefix)."""
    from tinychatengine_tpu.runtime import paged as pg
    sk = jax.lax.slice_in_dim(scratch.k[:, 0], 0, bucket, axis=2)
    sv = jax.lax.slice_in_dim(scratch.v[:, 0], 0, bucket, axis=2)
    sks = svs = None
    if scratch.quantized:
        sks = jax.lax.slice_in_dim(scratch.k_scale[:, 0], 0, bucket, axis=2)
        svs = jax.lax.slice_in_dim(scratch.v_scale[:, 0], 0, bucket, axis=2)
    return pg.insert_prefix(cache, sk, sv, page_ids, sks, svs)


@functools.partial(jax.jit, static_argnames=("bucket",),
                   donate_argnames=("cache",))
def _jit_insert_pages(cache, scratch: kvc.KVCache, page_ids, bucket: int):
    return _insert_pages_body(cache, scratch, page_ids, bucket)


@functools.partial(jax.jit, donate_argnames=("scratch",))
def _jit_prefix_load(scratch: kvc.KVCache, store: kvc.KVCache, entry, m):
    """Splice prefix-cache entry ``entry`` into the prefill scratch (row 0).

    The full pool width is copied unconditionally (one executable for every
    hit length): positions in [m, n) are overwritten by the tail prefill
    chunks, positions >= n sit beyond the admitted length and are never
    attended (the same invariant the bucketed slot splice relies on)."""
    def put(dst, src):  # src [L, P, H, W, D] / dst [L, 1, H, S, D]
        piece = jax.lax.dynamic_slice_in_dim(src, entry, 1, axis=1)
        return jax.lax.dynamic_update_slice(
            dst, piece.astype(dst.dtype), (0, 0, 0, 0, 0))

    def put_scale(dst, src):
        piece = jax.lax.dynamic_slice_in_dim(src, entry, 1, axis=1)
        return jax.lax.dynamic_update_slice(dst, piece, (0, 0, 0, 0))

    return kvc.KVCache(
        k=put(scratch.k, store.k), v=put(scratch.v, store.v),
        length=jnp.asarray(m, jnp.int32),
        k_scale=None if scratch.k_scale is None
        else put_scale(scratch.k_scale, store.k_scale),
        v_scale=None if scratch.v_scale is None
        else put_scale(scratch.v_scale, store.v_scale))


@functools.partial(jax.jit, donate_argnames=("store",))
def _jit_prefix_store(store: kvc.KVCache, scratch: kvc.KVCache, entry):
    """Copy the scratch prompt KV (row 0, first pool-width positions) into
    pool entry ``entry``. Positions beyond the prompt length hold garbage —
    masked out at match time by the host-side token record."""
    w = store.max_len

    def put(dst, src):  # src [L, 1, H, S, D] / dst [L, P, H, W, D]
        piece = jax.lax.slice_in_dim(src, 0, w, axis=3)
        return jax.lax.dynamic_update_slice(
            dst, piece.astype(dst.dtype), (0, entry, 0, 0, 0))

    def put_scale(dst, src):
        piece = jax.lax.slice_in_dim(src, 0, w, axis=3)
        return jax.lax.dynamic_update_slice(dst, piece, (0, entry, 0, 0))

    return kvc.KVCache(
        k=put(store.k, scratch.k), v=put(store.v, scratch.v),
        length=store.length,
        k_scale=None if store.k_scale is None
        else put_scale(store.k_scale, scratch.k_scale),
        v_scale=None if store.v_scale is None
        else put_scale(store.v_scale, scratch.v_scale))


def _spec_verify(forward_fn, params, cfg, last_tok, cache, lengths, hist, h,
                 *, n_spec):
    """One batched draft+verify step (prompt-lookup speculation inside
    serving; per-row generation/speculative.py semantics):

    - each row drafts n_spec tokens from its own history (most recent
      bigram continuation),
    - ONE ragged [B, K+1] forward verifies all rows at their own offsets
      (flash_prefill per-batch start/length),
    - row b accepts its longest matching draft prefix: emitted = a+1 greedy
      tokens, bit-equal to a+1 plain decode ticks.

    Cache rows are written at lengths..lengths+K; only lengths+emitted are
    valid afterwards (the host advances slot lengths; unaccepted rows sit
    beyond every consumer's length mask — free rollback).
    Returns (tokens [B, K+1], emitted [B], cache, hist)."""
    from tinychatengine_tpu.generation.speculative import _lookup_draft

    b = last_tok.shape[0]
    rows = jnp.arange(b)
    prev = hist[rows, jnp.maximum(h - 2, 0)]
    draft, _ = jax.vmap(_lookup_draft, in_axes=(0, 0, 0, 0, None))(
        hist, h, prev, last_tok, n_spec)                     # [B, K]
    tokens_in = jnp.concatenate([last_tok[:, None], draft], axis=1)
    logits, cache = forward_fn(params, cfg, tokens_in, cache, lengths,
                               full_logits=True)             # [B, K+1, V]
    g = jnp.argmax(logits, axis=-1).astype(jnp.int32)        # [B, K+1]
    match = (draft == g[:, :n_spec]).astype(jnp.int32)
    a = jnp.sum(jnp.cumprod(match, axis=1), axis=1)          # [B]
    emitted = a + 1
    hist = jax.vmap(
        lambda hrow, grow, hh: jax.lax.dynamic_update_slice(hrow, grow, (hh,))
    )(hist, g, h)
    return g, emitted, cache, hist
