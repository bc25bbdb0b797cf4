"""Inference engine: jit'd prefill + decode loops.

Replaces the reference's generation drivers (LLaMAGenerate.cc /
LLaMA3Generate.cc / MistralGenerate.cc decode loops — near-duplicate
while-loops over model->forward + sample, SURVEY.md §2.4) with one engine:

- **prefill**: prompt right-padded to a power-of-two bucket (one compile per
  bucket, not per length) — the jit shape-discipline replacing the
  reference's any-length CPU loops.
- **host decode loop** (`generate`): one jit'd step per token, streaming
  tokens to a callback, stop-token handling — the interactive chat path.
- **device decode loop** (`generate_device`): the whole token loop inside one
  jit (lax.scan with donated cache) — no per-token host round-trip; this is
  the serving/bench path and has no CPU-side analog in the reference.

Sampling runs on device in both paths (generation/sampling.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.generation import sampling
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.utils.profiler import Profiler

PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def forward_for_family(family: str):
    """Family → forward fn (the reference's per-family Generate drivers)."""
    if family == "llama":
        return llama.forward
    if family == "opt":
        from tinychatengine_tpu.models import opt
        return opt.forward
    if family == "gptbigcode":
        from tinychatengine_tpu.models import gptbigcode
        return gptbigcode.forward
    raise ValueError(f"no generation driver for family {family!r}")


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket")


@dataclasses.dataclass
class GenerationResult:
    tokens: list  # per-sequence list of generated token ids
    n_prompt: int
    ttft_s: float
    decode_s: float
    cache: object = None  # updated KV cache (the input cache is donated)

    @property
    def tokens_per_s(self) -> float:
        n = len(self.tokens[0]) if self.tokens else 0
        return n / self.decode_s if self.decode_s > 0 else 0.0


class Engine:
    """Single-model inference engine (one replica; sharding via parallel/)."""

    def __init__(self, params, cfg: ModelConfig, qcfg: QuantConfig | None = None,
                 batch: int = 1, max_len: Optional[int] = None,
                 forward_fn=None, kv_dtype=None):
        self.params = params
        self.cfg = cfg
        self.qcfg = qcfg or QuantConfig()
        self.batch = batch
        self.max_len = max_len or cfg.max_sqlen
        self._forward = forward_fn or forward_for_family(cfg.family)
        # OPT's SmoothQuant path stores raw int8 K/V (static scales folded
        # into the BMM alphas, Int8OPTAttention.cc:27-58) — no dynamic scales
        self.kv_dtype = kv_dtype
        if kv_dtype is None and cfg.family == "opt" and self.qcfg.scheme == "w8a8":
            self.kv_dtype = jnp.int8
        self.profiler = Profiler()

        self._jit_step = jax.jit(
            functools.partial(self._forward, full_logits=False),
            static_argnames=("cfg",), donate_argnames=("cache",))

        self._jit_sample = jax.jit(
            lambda logits, state, last, gcfg_static: sampling.sample(
                logits, state, gcfg_static, last),
            static_argnames=("gcfg_static",))

    # -- cache -------------------------------------------------------------
    def new_cache(self) -> kvc.KVCache:
        if self.kv_dtype is not None:
            return kvc.init_cache(
                self.cfg.num_layers, self.batch, self.max_len,
                self.cfg.num_kv_heads, self.cfg.head_dim, dtype=self.kv_dtype)
        return kvc.init_cache(
            self.cfg.num_layers, self.batch, self.max_len,
            self.cfg.num_kv_heads, self.cfg.head_dim,
            quantized=(self.qcfg.kv_cache_dtype == "int8"))

    # -- prefill -----------------------------------------------------------
    CHUNK = 2048  # long prompts prefill in fixed chunks (bounds activation
    # memory and jit shapes; flash_prefill attends chunks to the cached past)

    def prefill(self, input_ids: np.ndarray, cache: kvc.KVCache,
                start: int = 0, input_embeds=None):
        """input_ids: [B, L] (unpadded). Returns (last-pos logits [B, V], cache).

        Prompts longer than CHUNK run as a chunked prefill (the final chunk's
        logits are the ones generation needs)."""
        b, n = input_ids.shape
        while n > self.CHUNK:
            head, input_ids = input_ids[:, :self.CHUNK], input_ids[:, self.CHUNK:]
            if input_embeds is not None:
                he, input_embeds = (input_embeds[:, :self.CHUNK],
                                    input_embeds[:, self.CHUNK:])
            else:
                he = None
            _, cache = self._jit_step(
                self.params, self.cfg, jnp.asarray(head), cache,
                jnp.asarray(start, jnp.int32), input_embeds=he,
                true_len=jnp.asarray(self.CHUNK, jnp.int32))
            start += self.CHUNK
            n -= self.CHUNK
        p = _bucket(n)
        ids = np.zeros((b, p), np.int32)
        ids[:, :n] = input_ids
        embeds = None
        if input_embeds is not None:
            e = input_embeds.shape[-1]
            embeds = jnp.zeros((b, p, e), jnp.bfloat16)
            embeds = embeds.at[:, :n].set(input_embeds.astype(jnp.bfloat16))
        return self._jit_step(
            self.params, self.cfg, jnp.asarray(ids), cache,
            jnp.asarray(start, jnp.int32), input_embeds=embeds,
            true_len=jnp.asarray(n, jnp.int32))

    # -- host-streaming generation (chat path) ------------------------------
    def generate(self, input_ids, gcfg: GenerationConfig,
                 stop_token_ids: Sequence[int] = (),
                 on_token: Optional[Callable[[int], None]] = None,
                 cache: Optional[kvc.KVCache] = None,
                 start: int = 0, input_embeds=None) -> GenerationResult:
        """Streaming decode (reference decode-loop semantics,
        LLaMA3Generate.cc:78-258): prefill → [sample → forward]* until
        n_predict or a stop token."""
        input_ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        b, n_prompt = input_ids.shape
        assert b == self.batch, (b, self.batch)
        if on_token is not None and b != 1:
            # the callback streams ONE sequence (chat path); with batch > 1
            # rows >= 1 would be silently dropped — refuse instead
            raise ValueError("on_token streaming requires batch == 1; "
                             "use per-row stop_token_ids for batched runs")
        if cache is None:
            cache = self.new_cache()

        hcfg = _hashable_gcfg(gcfg)
        state = sampling.SamplerState.init(gcfg.seed, b, gcfg.mirostat_tau)
        window = gcfg.n_ctx if gcfg.repeat_last_n < 0 else gcfg.repeat_last_n
        window = max(window, 1)  # -1 = context size (Generate.h:58 semantics)
        last_tokens = np.full((b, window), -1, np.int32)
        # repeat_last_n == 0 disables penalties (config.py:167) — keep the
        # window all -1 so Engine matches the serving row sampler exactly
        if gcfg.repeat_last_n != 0:
            for i in range(min(window, n_prompt)):
                last_tokens[:, -(i + 1)] = input_ids[:, -(i + 1)]

        t0 = time.perf_counter()
        logits, cache = self.prefill(input_ids, cache, start=start,
                                     input_embeds=input_embeds)
        tok, state = self._jit_sample(logits, state, jnp.asarray(last_tokens), hcfg)
        tok_host = np.asarray(tok)
        ttft = time.perf_counter() - t0
        self.profiler.ttft_s = ttft

        out = [[] for _ in range(b)]
        stop = set(int(t) for t in stop_token_ids)
        finished = [False] * b  # per-row stop-token state (batch > 1)
        t_decode0 = time.perf_counter()
        pos = start + n_prompt
        for step in range(gcfg.n_predict):
            for i in range(b):
                if not finished[i]:
                    out[i].append(int(tok_host[i]))
                    if int(tok_host[i]) in stop:
                        finished[i] = True
            if on_token is not None and on_token(int(tok_host[0])) is False:
                break  # callback requested stop (e.g. stop-string hit)
            if all(finished):
                break
            if pos + 1 >= self.max_len:
                break
            if gcfg.repeat_last_n != 0:
                last_tokens = np.roll(last_tokens, -1, axis=1)
                last_tokens[:, -1] = tok_host
            with self.profiler.section("decode"):
                logits, cache = self._jit_step(
                    self.params, self.cfg, jnp.asarray(tok_host[:, None]),
                    cache, jnp.asarray(pos, jnp.int32))
                tok, state = self._jit_sample(
                    logits, state, jnp.asarray(last_tokens), hcfg)
                tok_host = np.asarray(tok)  # forces completion
            pos += 1
        decode_s = time.perf_counter() - t_decode0
        return GenerationResult(tokens=out, n_prompt=n_prompt, ttft_s=ttft,
                                decode_s=decode_s, cache=cache)

    # -- device-loop generation (bench/serving path) -------------------------
    def generate_device(self, input_ids, gcfg: GenerationConfig,
                        n_tokens: Optional[int] = None,
                        cache: Optional[kvc.KVCache] = None,
                        return_cache: bool = False):
        """Run prefill + n_tokens decode steps entirely on device.

        Returns tokens [B, n_tokens] (and the final cache if return_cache).
        No early stopping (fixed trip count keeps the XLA program static);
        the host checks stop tokens after.
        """
        input_ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        b, n_prompt = input_ids.shape
        n_tokens = n_tokens or gcfg.n_predict
        # the loop's maximum context is known at trace time: trimming the
        # flash-decode grid to it cuts the per-layer KV DMA at short
        # contexts (ops/attention.py ctx_cap). Bucketed to powers of two so
        # raw prompt lengths don't fragment the jit cache.
        base = 0 if cache is None else int(np.asarray(cache.length).max())
        ctx_cap = 512
        while ctx_cap < base + n_prompt + n_tokens:
            ctx_cap *= 2
        ctx_cap = min(ctx_cap, self.max_len)
        if cache is None:
            cache = self.new_cache()
        hcfg = _hashable_gcfg(gcfg)

        logits, cache = self.prefill(input_ids, cache)
        state = sampling.SamplerState.init(gcfg.seed, b, gcfg.mirostat_tau)

        window = gcfg.n_ctx if gcfg.repeat_last_n < 0 else gcfg.repeat_last_n
        window = max(window, 1)
        last = jnp.full((b, window), -1, jnp.int32)
        if gcfg.repeat_last_n != 0:  # 0 = penalties disabled
            tail = min(window, n_prompt)
            last = last.at[:, window - tail:].set(
                jnp.asarray(input_ids[:, n_prompt - tail:]))

        tokens, cache = _device_decode_loop(
            self.params, self.cfg, logits, cache, state, last,
            jnp.asarray(n_prompt, jnp.int32), hcfg, n_tokens, self._forward,
            ctx_cap)
        return (tokens, cache) if return_cache else tokens


@functools.partial(jax.jit,
                   static_argnames=("cfg", "gcfg", "n_tokens", "forward_fn",
                                    "ctx_cap"),
                   donate_argnames=("cache",))
def _device_decode_loop(params, cfg, logits, cache, state, last, pos, gcfg,
                        n_tokens, forward_fn, ctx_cap=None):
    def step(carry, _):
        logits, cache, state, last, pos = carry
        tok, state = sampling.sample(logits, state, gcfg, last)
        if gcfg.repeat_last_n != 0:  # 0 = penalties disabled: never record
            last = jnp.roll(last, -1, axis=1).at[:, -1].set(tok)
        logits, cache = forward_fn(params, cfg, tok[:, None], cache, pos,
                                   ctx_cap=ctx_cap)
        return (logits, cache, state, last, pos + 1), tok

    # The final cache MUST be an output: a donated input buffer is only
    # reusable when it aliases some output — returning tokens alone made XLA
    # copy the full 2x134 MB cache at loop entry every call ("Some donated
    # buffers were not usable", BENCH_r01 tail).
    (_, cache, _, _, _), tokens = jax.lax.scan(
        step, (logits, cache, state, last, pos), None, length=n_tokens)
    return tokens.T, cache  # [B, n_tokens], final KV cache


@dataclasses.dataclass(frozen=True)
class HashableGenerationConfig:
    """Frozen/hashable view of GenerationConfig so jit can treat it as static
    (logit_bias becomes a sorted tuple of pairs)."""

    seed: int
    n_predict: int
    n_ctx: int
    n_keep: int
    top_k: int
    top_p: float
    tfs_z: float
    typical_p: float
    temp: float
    repeat_penalty: float
    repeat_last_n: int
    frequency_penalty: float
    presence_penalty: float
    mirostat: int
    mirostat_tau: float
    mirostat_eta: float
    logit_bias: Optional[tuple] = None


def _hashable_gcfg(g: GenerationConfig) -> HashableGenerationConfig:
    return HashableGenerationConfig(
        seed=g.seed, n_predict=g.n_predict, n_ctx=g.n_ctx, n_keep=g.n_keep,
        top_k=g.top_k, top_p=g.top_p, tfs_z=g.tfs_z, typical_p=g.typical_p,
        temp=g.temp, repeat_penalty=g.repeat_penalty,
        repeat_last_n=g.repeat_last_n, frequency_penalty=g.frequency_penalty,
        presence_penalty=g.presence_penalty, mirostat=g.mirostat,
        mirostat_tau=g.mirostat_tau, mirostat_eta=g.mirostat_eta,
        logit_bias=tuple(sorted(g.logit_bias.items())) if g.logit_bias else None)
