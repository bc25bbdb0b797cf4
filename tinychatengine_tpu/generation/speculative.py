"""Prompt-lookup (self-speculative) greedy decoding.

Beyond-reference serving feature with a TPU-shaped justification: a decode
step is HBM-bandwidth-bound on weight streaming, so verifying K draft tokens
(a [K+1, E] activation matrix instead of [1, E]) costs nearly the same wall
time as one token. Draft tokens come from the sequence ITSELF — the longest
recent continuation of the current bigram (prompt-lookup decoding) — so no
draft model is needed. On repetitive text (code, structured chat) several
tokens are accepted per step; on incompressible text it degrades to vanilla
greedy, same cost per step.

Exactness: with greedy sampling (temp == 0, no repetition penalties) the
emitted tokens are IDENTICAL to vanilla greedy decoding — verification
recomputes the same argmax chain. The engine gates this path accordingly.

Cache rollback is free in this architecture: draft K/V rows are written
beyond the accepted length and simply overwritten later (kv_cache positions
past ``length`` are masked by every consumer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _lookup_draft(hist, h, prev_tok, last_tok, K: int):
    """Most recent bigram match: find the largest i < h-1 with
    hist[i-1] == prev and hist[i] == last; draft = hist[i+1 : i+1+K].

    hist: [T] int32 (prompt + emitted so far; entries >= h are garbage).
    Returns (draft [K] int32, found bool)."""
    T = hist.shape[0]
    idx = jnp.arange(T)
    prev_h = jnp.concatenate([jnp.full((1,), -1, hist.dtype), hist[:-1]])
    match = (hist == last_tok) & (prev_h == prev_tok) & (idx < h - 1) & (idx >= 1)
    i = jnp.max(jnp.where(match, idx, -1))
    found = i >= 0
    start = jnp.where(found, i + 1, 0)
    draft = jax.lax.dynamic_slice(jnp.concatenate([hist, hist[:K]]),
                                  (start,), (K,))
    return draft, found


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "forward_fn", "n_tokens", "K", "hist_len"),
    donate_argnames=("cache",))
def pld_decode_loop(params, cfg, forward_fn, first_tok, cache, pos0, hist0,
                    h0, n_tokens: int, K: int, hist_len: int):
    """Greedy decode with prompt-lookup speculation (batch 1).

    first_tok: [1] int32 (already-sampled first token, from prefill logits);
    pos0: scalar valid-cache length; hist0 [hist_len] prompt+first token;
    h0: scalar number of valid entries in hist0.
    Returns (tokens [n_tokens] int32, n_steps, cache)."""
    out0 = jnp.zeros((n_tokens + K + 1,), jnp.int32)

    # jax.lax.while_loop needs a flat carry; write it out explicitly
    def body2(carry):
        out, cache, hist, h, last, prev, n_out, pos, steps = carry
        draft, _ = _lookup_draft(hist, h, prev, last, K)
        tokens_in = jnp.concatenate([last[None], draft])[None, :]
        logits, cache = forward_fn(params, cfg, tokens_in, cache, pos,
                                   full_logits=True)
        g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        match = draft == g[:K]
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
        emitted = a + 1
        out = jax.lax.dynamic_update_slice(out, g, (n_out,))
        hist = jax.lax.dynamic_update_slice(hist, g, (h,))
        new_last = g[a]
        new_prev = jnp.where(a > 0, g[a - 1], last)
        # cache wrote K+1 rows at pos; only 1 + a are valid context
        from tinychatengine_tpu.generation import kv_cache as kvc
        cache = kvc.KVCache(k=cache.k, v=cache.v,
                            length=pos + emitted,
                            k_scale=cache.k_scale, v_scale=cache.v_scale)
        return (out, cache, hist, h + emitted, new_last, new_prev,
                n_out + emitted, pos + emitted, steps + 1)

    def cond2(carry):
        _, _, _, _, _, _, n_out, pos, _ = carry
        return (n_out < n_tokens) & (pos + K + 1 < cfg.max_sqlen)

    prev0 = hist0[jnp.maximum(h0 - 2, 0)]
    carry = (out0, cache, hist0, h0, first_tok[0], prev0,
             jnp.int32(0), pos0, jnp.int32(0))
    out, cache, _, _, _, _, n_out, _, steps = jax.lax.while_loop(
        cond2, body2, carry)
    return out[:n_tokens], steps, n_out, cache


def generate_pld(engine, input_ids, n_tokens: int, K: int = 7,
                 cache=None, start: int = 0):
    """Greedy prompt-lookup generation through an Engine (batch 1).

    cache/start: continue a multi-turn conversation (chat semantics) — the
    lookup history covers only tokens seen this call.
    Returns (tokens [n_tokens] np.ndarray, n_forward_steps, cache). Tokens
    are bit-identical to engine.generate_device with temp=0, no penalties.
    """
    input_ids = np.atleast_2d(np.asarray(input_ids, np.int32))
    assert input_ids.shape[0] == 1, "speculative decoding is batch-1"
    n_prompt = input_ids.shape[1]
    if cache is None:
        cache = engine.new_cache()
    logits, cache = engine.prefill(input_ids, cache, start=start)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [1]

    hist_len = engine.max_len + K + 1
    hist = np.zeros((hist_len,), np.int32)
    hist[:n_prompt] = input_ids[0]
    hist[n_prompt] = int(np.asarray(first)[0])

    toks, steps, n_out, cache = pld_decode_loop(
        engine.params, engine.cfg, engine._forward, first, cache,
        jnp.asarray(start + n_prompt, jnp.int32), jnp.asarray(hist),
        jnp.asarray(n_prompt + 1, jnp.int32), n_tokens=n_tokens - 1, K=K,
        hist_len=hist_len)
    all_toks = np.concatenate([np.asarray(first), np.asarray(toks)])

    # Multi-turn cache hygiene. The loop only writes a token's K/V when it is
    # FED on the next step, so the final emitted token's K/V is missing unless
    # the last verify step overshot; and on overshoot, rows past the returned
    # window hold speculative K/V that the loop counted as valid. Make the
    # cache exactly cover [0, start + n_prompt + n_tokens): feed the unfed
    # tail token (discard logits), or clamp length below the overshoot.
    from tinychatengine_tpu.generation import kv_cache as kvc
    n_emitted = 1 + int(np.asarray(n_out))       # includes `first`
    keep = min(n_emitted, n_tokens)              # tokens the caller may resume from
    if n_emitted <= n_tokens:
        # final emitted token was never fed — write its K/V (length +1 inside)
        tail = jnp.asarray([[int(all_toks[n_emitted - 1])]], jnp.int32)
        _, cache = engine._jit_step(
            engine.params, engine.cfg, tail, cache,
            jnp.asarray(start + n_prompt + n_emitted - 1, jnp.int32))
    else:
        cache = kvc.KVCache(k=cache.k, v=cache.v,
                            length=jnp.asarray(start + n_prompt + keep, jnp.int32),
                            k_scale=cache.k_scale, v_scale=cache.v_scale)
    return all_toks[:n_tokens], int(np.asarray(steps)) + 1, cache
