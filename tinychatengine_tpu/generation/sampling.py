"""Sampling suite — on-device JAX equivalents of the reference's 13
llama.cpp-derived ``sample_*`` functions (llm/src/Generate.cc:14-327,
llm/include/Generate.h:74-119).

The reference mutates a sorted candidate list on the CPU per token; on TPU we
keep logits [B, V] on device and express every truncation filter as a mask to
-inf (sort-based, static shapes, jit-friendly), then draw via Gumbel trick.
All filters preserve the llama.cpp semantics the reference implements:

- repetition penalty (Generate.cc:14): positive logits /= penalty, negative *= penalty
- frequency/presence (:36): logit -= count*alpha_freq + (count>0)*alpha_pres
- greedy (:62), temperature (:72), softmax (:81), multinomial (:103)
- top-k (:120), top-p (:304), tail-free (:203), typical (:248)
- mirostat v1 (:138) / v2 (:176) with carried mu state
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import GenerationConfig

NEG_INF = -1e30


def apply_repetition_penalty(logits: jax.Array, last_tokens: jax.Array,
                             penalty: float) -> jax.Array:
    """logits [B, V]; last_tokens [B, T] int32 (pad with -1).

    llama.cpp rule: for penalized tokens, logit>0 → /penalty, else *penalty.
    """
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    counts = _token_counts(last_tokens, v)                    # [B, V]
    hit = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(hit, penalized, logits)


def apply_frequency_presence(logits: jax.Array, last_tokens: jax.Array,
                             alpha_freq: float, alpha_pres: float) -> jax.Array:
    if alpha_freq == 0.0 and alpha_pres == 0.0:
        return logits
    counts = _token_counts(last_tokens, logits.shape[-1])
    return logits - counts * alpha_freq - (counts > 0) * alpha_pres


_COUNT_CHUNK = 128  # one-hot window chunk: bounds the [B, chunk, V]
# intermediate at ~256 MB for B=8, V=128k (a repeat_last_n of e.g. 1024
# would otherwise imply a ~2 GiB one-hot inside the decode scan if XLA
# fails to fuse the contraction — ADVICE r4)


def _token_counts(last_tokens: jax.Array, vocab: int) -> jax.Array:
    """Occurrence counts per vocab id; -1 entries ignored. [B, T] -> [B, V].

    One-hot contraction instead of a scatter-add: TPU lowers a [B, T]
    scatter to T serial row updates, which the r4 serving device trace
    billed at ~5 ms/tick; the [B, T, V] bf16 one-hot streams at HBM rate
    (~0.4 ms) and is exact (counts <= T << 256 are exactly representable
    in bf16). Windows larger than _COUNT_CHUNK are summed chunk-by-chunk
    (identical result — addition over disjoint position slices) so the
    intermediate stays O(B * chunk * V) regardless of repeat_last_n."""
    valid = (last_tokens >= 0)
    clipped = jnp.clip(last_tokens, 0, vocab - 1)

    def counts_of(tok_chunk, valid_chunk):
        hot = jax.nn.one_hot(tok_chunk, vocab, dtype=jnp.bfloat16)
        hot = hot * valid_chunk[..., None].astype(jnp.bfloat16)
        return jnp.sum(hot, axis=1, dtype=jnp.float32)

    t = last_tokens.shape[1]
    if t <= _COUNT_CHUNK:
        return counts_of(clipped, valid)
    total = jnp.zeros((last_tokens.shape[0], vocab), jnp.float32)
    for s in range(0, t, _COUNT_CHUNK):
        e = min(s + _COUNT_CHUNK, t)
        total = total + counts_of(clipped[:, s:e], valid[:, s:e])
    return total


def greedy(logits: jax.Array) -> jax.Array:
    """sample_token_greedy (Generate.cc:62) — also ops/arg_max.cc."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def greedy_penalized(logits: jax.Array, last_tokens, gcfg) -> jax.Array:
    """Greedy sampling with penalties, skipping the full-vocab penalty
    scatter when it cannot change the answer.

    With repeat_penalty >= 1 and non-negative frequency/presence alphas,
    penalties only LOWER the logits of window tokens (logit>0 → /p,
    logit<=0 → *p; -count*alpha). So if no row's plain argmax lands in its
    penalty window, the penalized argmax equals the plain argmax exactly
    (every other token's penalized value <= its original <= the max; ties at
    the max are preserved or lowered, never promoted past the first max
    index). The full scatter+argmax costs ~90 us/step on a 128k vocab
    (scripts/bisect_decode.py); the guard costs one [B, T] compare."""
    no_pen = (gcfg.repeat_penalty == 1.0 and gcfg.frequency_penalty == 0.0
              and gcfg.presence_penalty == 0.0)
    if last_tokens is None or no_pen:
        return greedy(logits)

    def slow(_):
        lp = apply_repetition_penalty(logits, last_tokens,
                                      gcfg.repeat_penalty)
        lp = apply_frequency_presence(lp, last_tokens, gcfg.frequency_penalty,
                                      gcfg.presence_penalty)
        return greedy(lp)

    if gcfg.repeat_penalty < 1.0 or gcfg.frequency_penalty < 0.0 \
            or gcfg.presence_penalty < 0.0:
        return slow(None)  # boosting penalties can promote a window token

    # lowering-only penalties: the penalized argmax provably lies in the raw
    # top-(1+T) candidates (at most T window tokens can drop, every other
    # token keeps its value), so penalize and argmax in the CANDIDATE domain
    # — no [B, T, V] one-hot, no full-vocab second argmax. The r1-r4 version
    # guarded a full-vocab slow path behind a "argmax in window" lax.cond;
    # on random/repetitive text the guard fires most steps at batch > 1
    # (any row's hit runs the slow path for all rows), which the r5 batched
    # ladder billed at ~3 ms/tick at B=8-16.
    b, v = logits.shape
    t = last_tokens.shape[1]
    c = min(1 + t, v)
    cvals, cidx = jax.lax.top_k(logits, c)                 # [B, C]
    cnt = jnp.sum((cidx[:, :, None] == last_tokens[:, None, :])
                  & (last_tokens[:, None, :] >= 0), axis=-1
                  ).astype(jnp.float32)
    pen = jnp.where(cvals > 0, cvals / gcfg.repeat_penalty,
                    cvals * gcfg.repeat_penalty)
    cvals = jnp.where(cnt > 0, pen, cvals)
    cvals = (cvals - cnt * gcfg.frequency_penalty
             - (cnt > 0) * gcfg.presence_penalty)
    amax = jnp.argmax(cvals, axis=-1)
    return jnp.take_along_axis(cidx, amax[:, None], 1)[:, 0].astype(jnp.int32)


def apply_temperature(logits: jax.Array, temp: float) -> jax.Array:
    return logits / max(temp, 1e-6)


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Keep the k highest logits (sample_top_k, Generate.cc:120)."""
    v = logits.shape[-1]
    if k <= 0 or k >= v:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_mask(logits: jax.Array, p: float, min_keep: int = 1) -> jax.Array:
    """Nucleus sampling mask (sample_top_p, Generate.cc:304)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep entries until cumulative prob exceeds p (inclusive), >= min_keep
    keep_sorted = (cum - probs) < p                       # first idx always kept
    keep_sorted = keep_sorted.at[..., :min_keep].set(True)
    # threshold logit = smallest kept sorted logit
    n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def tail_free_mask(logits: jax.Array, z: float, min_keep: int = 1) -> jax.Array:
    """Tail-free sampling (sample_tail_free, Generate.cc:203): drop the tail
    where the normalized |second derivative| of sorted probs accumulates > z."""
    if z >= 1.0:
        return logits
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d1 = probs[..., :-1] - probs[..., 1:]
    d2 = jnp.abs(d1[..., :-1] - d1[..., 1:])               # [B, V-2]
    # llama.cpp computes d2 over the SURVIVING candidate list only (an
    # upstream top_k has already shrunk it); with full-vocab arrays the
    # masked (-inf → prob 0) tail would add two spurious boundary terms per
    # row — drop d2 entries whose window reaches past the last live token
    n_live = jnp.sum(sorted_logits > NEG_INF / 2, axis=-1, keepdims=True)
    d2 = jnp.where(
        jnp.arange(v - 2)[None, :] < n_live - 2, d2, 0.0)
    d2 = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-12)
    cum = jnp.cumsum(d2, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool),
         cum < z,
         jnp.zeros_like(cum[..., :1], bool)], axis=-1)     # [B, V]
    keep_sorted = keep_sorted.at[..., :min_keep].set(True)
    n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits < thresh, NEG_INF, logits)


def typical_mask(logits: jax.Array, p: float, min_keep: int = 1) -> jax.Array:
    """Locally-typical sampling (sample_typical, Generate.cc:248): keep tokens
    whose surprise is closest to the entropy, until cum prob > p."""
    if p >= 1.0:
        return logits
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1, keepdims=True)
    shifted = jnp.abs(-log_probs - entropy)                # deviation from typicality
    order = jnp.argsort(shifted, axis=-1)                  # ascending deviation
    probs_sorted = jnp.take_along_axis(probs, order, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    keep_sorted = (cum - probs_sorted) < p
    keep_sorted = keep_sorted.at[..., :min_keep].set(True)
    # gather through the inverse permutation (argsort(order)) — TPU
    # serializes the row scatter (~8 ms at [8, 128k], r4 serving trace)
    keep = jnp.take_along_axis(keep_sorted, jnp.argsort(order, axis=-1),
                               axis=-1)
    return jnp.where(keep, logits, NEG_INF)


def sample_token(logits: jax.Array, key: jax.Array) -> jax.Array:
    """Multinomial draw (sample_token, Generate.cc:103) via Gumbel-max."""
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@dataclasses.dataclass
class SamplerState:
    """Carried sampler state: PRNG key + mirostat mu [B]."""

    key: jax.Array
    mu: jax.Array

    @staticmethod
    def init(seed: int, batch: int, tau: float) -> "SamplerState":
        return SamplerState(key=jax.random.PRNGKey(max(seed, 0)),
                            mu=jnp.full((batch,), 2.0 * tau, jnp.float32))


jax.tree_util.register_pytree_node(
    SamplerState,
    lambda s: ((s.key, s.mu), None),
    lambda aux, ch: SamplerState(*ch),
)


def mirostat_v2_step(logits: jax.Array, state: SamplerState, tau: float,
                     eta: float, temp: float):
    """sample_token_mirostat_v2 (Generate.cc:176): truncate tokens with
    surprise > mu, sample, then mu += -eta*(surprise_drawn - tau)."""
    key, sub = jax.random.split(state.key)
    logits = apply_temperature(logits, temp)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    surprise = -log_probs / jnp.log(2.0)                   # bits
    masked = jnp.where(surprise > state.mu[:, None], NEG_INF, logits)
    # guarantee at least the argmax survives
    rows = jnp.arange(logits.shape[0])
    best = jnp.argmax(logits, axis=-1)
    masked = masked.at[rows, best].set(
        jnp.take_along_axis(logits, best[:, None], axis=-1)[:, 0])
    tok = sample_token(masked, sub)
    s_drawn = jnp.take_along_axis(surprise, tok[:, None], axis=-1)[:, 0]
    mu = state.mu - eta * (s_drawn - tau)
    return tok, SamplerState(key=key, mu=mu)


def mirostat_v1_step(logits: jax.Array, state: SamplerState, tau: float,
                     eta: float, temp: float, n_vocab: int, m: int = 100):
    """sample_token_mirostat (v1, Generate.cc:138): estimate Zipf s from the
    top-m probs, derive k, top-k sample, update mu by observed surprise."""
    key, sub = jax.random.split(state.key)
    logits = apply_temperature(logits, temp)
    probs = jax.nn.softmax(logits, axis=-1)
    topm = jax.lax.top_k(probs, m)[0]                      # [B, m]
    i = jnp.arange(1, m, dtype=jnp.float32)
    t_i = jnp.log((i + 1.0) / i)
    b_i = jnp.log(topm[:, :-1] / jnp.maximum(topm[:, 1:], 1e-12))
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps = s_hat - 1.0
    k = jnp.power((eps * jnp.power(2.0, state.mu)) /
                  (1.0 - jnp.power(float(n_vocab), -eps)), 1.0 / s_hat)
    k = jnp.clip(k, 1, n_vocab).astype(jnp.int32)          # dynamic k
    # static-shape masking: keep ranks < k
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    ranks = jnp.zeros_like(order).at[
        jnp.arange(logits.shape[0])[:, None], order].set(
        jnp.broadcast_to(jnp.arange(logits.shape[-1]), logits.shape))
    masked = jnp.where(ranks < k[:, None], logits, NEG_INF)
    tok = sample_token(masked, sub)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    s_drawn = -jnp.take_along_axis(log_probs, tok[:, None], axis=-1)[:, 0] / jnp.log(2.0)
    mu = state.mu - eta * (s_drawn - tau)
    return tok, SamplerState(key=key, mu=mu)


@dataclasses.dataclass
class RowParams:
    """Per-ROW sampling parameters as traced [B] arrays — one compiled
    sampler serves any mix of requests (the engine-global ``sample`` keeps
    its static GenerationConfig and recompiles per distinct config; a real
    serving request mix cannot afford that). Mirostat needs carried per-row
    state machines and stays engine-global — reject such requests upstream.
    """

    temp: jax.Array              # [B] f32; <= 0 → greedy for that row
    top_k: jax.Array             # [B] i32; <= 0 → off
    top_p: jax.Array             # [B] f32; >= 1 → off
    tfs_z: jax.Array             # [B] f32; >= 1 → off
    typical_p: jax.Array         # [B] f32; >= 1 → off
    repeat_penalty: jax.Array    # [B] f32; 1 → off
    frequency_penalty: jax.Array  # [B] f32
    presence_penalty: jax.Array   # [B] f32
    bias_ids: jax.Array          # [B, MAX_BIAS] i32; -1 = unused entry
    bias_vals: jax.Array         # [B, MAX_BIAS] f32
    mirostat: jax.Array          # [B] i32; 0 = off, 1/2 = mirostat version
    mirostat_tau: jax.Array      # [B] f32
    mirostat_eta: jax.Array      # [B] f32

    MAX_BIAS = 16  # per-request logit_bias entries (static scatter width)

    @staticmethod
    def from_configs(gcfgs: Sequence[GenerationConfig]) -> "RowParams":
        import numpy as np
        def arr(f, dt=np.float32):
            return jnp.asarray(np.asarray([f(g) for g in gcfgs], dt))
        nb = RowParams.MAX_BIAS
        ids = np.full((len(gcfgs), nb), -1, np.int32)
        vals = np.zeros((len(gcfgs), nb), np.float32)
        for r, g in enumerate(gcfgs):
            if g.logit_bias:
                items = (g.logit_bias.items()
                         if hasattr(g.logit_bias, "items") else g.logit_bias)
                for c, (t, v) in enumerate(list(items)[:nb]):
                    ids[r, c] = int(t)
                    vals[r, c] = float(v)
        return RowParams(
            temp=arr(lambda g: g.temp),
            top_k=arr(lambda g: g.top_k, np.int32),
            top_p=arr(lambda g: g.top_p),
            tfs_z=arr(lambda g: g.tfs_z),
            typical_p=arr(lambda g: g.typical_p),
            repeat_penalty=arr(lambda g: g.repeat_penalty),
            frequency_penalty=arr(lambda g: g.frequency_penalty),
            presence_penalty=arr(lambda g: g.presence_penalty),
            bias_ids=jnp.asarray(ids), bias_vals=jnp.asarray(vals),
            mirostat=arr(lambda g: g.mirostat, np.int32),
            mirostat_tau=arr(lambda g: g.mirostat_tau),
            mirostat_eta=arr(lambda g: g.mirostat_eta),
        )


jax.tree_util.register_pytree_node(
    RowParams,
    lambda p: ((p.temp, p.top_k, p.top_p, p.tfs_z, p.typical_p,
                p.repeat_penalty, p.frequency_penalty, p.presence_penalty,
                p.bias_ids, p.bias_vals, p.mirostat, p.mirostat_tau,
                p.mirostat_eta),
               None),
    lambda aux, ch: RowParams(*ch),
)


def _sample_rows_candidates(logits, keys, params, last_tokens, mu,
                            top_k_max: int):
    """Candidate-domain row sampler (r5): penalties, top_k, nucleus,
    temperature and the token draw all run on the ``[B, C]`` candidate list
    (C = top_k_max + window), never on the full [B, V] vocab.

    Exactness (the r5 serving-tick bisect billed the full-vocab sampler at
    ~4.1 ms/tick vs the model's 7.25 — scripts/bisect_serving_tick.py):

    * gate: every used row has 0 < top_k <= top_k_max AND lowering-only
      penalties (repeat_penalty >= 1, frequency/presence >= 0) — enforced
      statically by the caller (``pen_lower``).
    * candidate sufficiency: penalties only LOWER the values of window
      tokens (<= T of them). Any token outside the raw top-(top_k_max + T)
      is dominated post-penalty by >= top_k_max unpenalized candidates, so
      the post-penalty top-k_eff set — and therefore the nucleus set inside
      it, and the penalized argmax — always lies in the candidate list.
    * the kept set, its penalized logits, and the softmax the draw uses are
      identical to the full-vocab pipeline's; the Gumbel draw consumes the
      same per-row subkey over the C candidates instead of V logits (a
      different but identically-distributed stream; serving uses one path
      consistently so burst/single/admission outputs agree bit-for-bit).
    * tie-break among EXACTLY-equal penalized logits may differ from the
      full argsort path (equal logits = equal probability, so the sampled
      distribution is unchanged; greedy ties between bit-equal logits
      resolve by candidate order instead of token id).
    """
    b, v = logits.shape
    t = last_tokens.shape[1]
    c = min(top_k_max + t, v)
    cvals, cidx = jax.lax.top_k(logits, c)                    # [B, C]

    # per-candidate window counts: [B, C, T] compare — tiny (no [B, V]
    # one-hot, no scatter)
    hit = (cidx[:, :, None] == last_tokens[:, None, :]) \
        & (last_tokens[:, None, :] >= 0)
    cnt = jnp.sum(hit, axis=-1).astype(jnp.float32)           # [B, C]

    rp = params.repeat_penalty[:, None]
    pen = jnp.where(cvals > 0, cvals / rp, cvals * rp)
    cvals = jnp.where(cnt > 0, pen, cvals)
    cvals = (cvals - cnt * params.frequency_penalty[:, None]
             - (cnt > 0) * params.presence_penalty[:, None])

    amax = jnp.argmax(cvals, axis=-1)                         # penalized argmax
    greedy_tok = jnp.take_along_axis(cidx, amax[:, None], 1)[:, 0]

    # top_k within candidates: threshold at the k_eff-th penalized value
    svals = -jnp.sort(-cvals, axis=-1)                        # desc [B, C]
    k_eff = jnp.clip(params.top_k, 1, top_k_max)[:, None]
    kth = jnp.take_along_axis(svals, k_eff - 1, axis=-1)
    keep = cvals >= kth
    # ties at the kth value could keep > k_eff: trim like the sort-free
    # path (by candidate order) so the kept count is exactly k_eff
    over = jnp.cumsum(keep.astype(jnp.int32), axis=-1) > k_eff
    keep &= ~over
    masked = jnp.where(keep, cvals, NEG_INF)

    # nucleus on the kept candidates (softmax over the kept set == the full
    # path's softmax over the top_k-masked vocab)
    s_logits = jnp.where(jnp.arange(c)[None, :] < k_eff, svals, NEG_INF)
    s_probs = jax.nn.softmax(s_logits, axis=-1)
    s_cum = jnp.cumsum(s_probs, axis=-1)
    keep_p = (s_cum - s_probs) < params.top_p[:, None]
    keep_p = keep_p.at[..., :1].set(True)
    n_keep = jnp.sum(keep_p, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(s_logits, n_keep - 1, axis=-1)
    masked = jnp.where(masked < thresh, NEG_INF, masked)

    masked = masked / jnp.maximum(params.temp, 1e-6)[:, None]
    splits = jax.vmap(jax.random.split)(keys)
    new_keys, subs = splits[:, 0], splits[:, 1]
    win = jax.vmap(lambda l, k: jax.random.categorical(k, l))(masked, subs)
    drawn = jnp.take_along_axis(cidx, win[:, None], 1)[:, 0].astype(jnp.int32)
    tok = jnp.where(params.temp <= 0, greedy_tok, drawn).astype(jnp.int32)
    # contract guard (same as the sort-free path): rows whose top_k exceeds
    # the static bound poison to -1 rather than sample over-truncated
    tok = jnp.where(params.top_k > top_k_max, jnp.int32(-1), tok)
    if mu is None:
        return tok, new_keys
    return tok, new_keys, mu


def sample_rows(logits: jax.Array, keys: jax.Array, params: RowParams,
                last_tokens: Optional[jax.Array] = None,
                mu: Optional[jax.Array] = None, *,
                use_bias: bool = True, use_tfs_typical: bool = True,
                use_mirostat: bool = True, top_k_max: int = 0,
                pen_lower: bool = False):
    """Per-row sampling pipeline, reference order (top_k → tfs → typical →
    top_p → temp → draw), every parameter a traced [B] array.

    logits [B, V] f32; keys [B, 2] uint32 (one PRNG key per row — requests
    keep their own reproducible streams). Returns (tokens [B] i32,
    new_keys [B, 2]).

    mu: optional [B] f32 carried mirostat state. When given, rows with
    params.mirostat == 1/2 sample via mirostat v1/v2 (Generate.cc:138,176)
    instead of the truncation pipeline, and the return becomes
    (tokens, new_keys, new_mu). When None, mirostat rows are not supported
    (the caller must route them elsewhere).

    use_bias / use_tfs_typical / use_mirostat: STATIC stage gates. When a
    stage is off for every row its math is the identity (empty bias table
    adds 0; tfs_z >= 1 and typical_p >= 1 keep everything; mirostat == 0
    rows pass through), so skipping it is exact — but the identity still
    costs full-vocab sorts/scans/softmaxes on device (~25 ms/tick at
    B=8 x 128k vocab in the r4 serving trace). The serving engine keys its
    executables on which stages any active row actually uses.

    top_k_max: STATIC upper bound on every row's top_k when all rows have
    top_k > 0 (0 = unknown/disabled-for-some-row). With tfs/typical off it
    unlocks the sort-free path: ``lax.top_k(top_k_max)`` + per-row kth-value
    threshold replaces the [B, V] argsort (~8 ms at [8, 128k] — the
    largest single op in the r4 serving trace), with ties at the kth value
    broken exactly like the rank path (highest original index first, the
    argsort[::-1] order), and nucleus runs on the [B, top_k_max] candidate
    values instead of [B, V]. Token draws are bit-identical: the kept set,
    masked logits and key stream are unchanged.

    pen_lower: STATIC caller guarantee that every used row's penalties are
    lowering-only (repeat_penalty >= 1, frequency/presence >= 0). Combined
    with top_k_max > 0 and bias/tfs/typical/mirostat off, the whole
    pipeline runs in the candidate domain (_sample_rows_candidates): no
    [B, V] one-hot, no full-vocab softmax/cumsum, and the Gumbel draw is
    [B, C] instead of [B, V] — the r5 fix for the ~4.1 ms/tick sampler the
    serving bisect found (identical kept sets + penalized logits; the draw
    stream differs from the full-vocab path but serving uses one path
    consistently, so burst/single-tick/admission stay bit-equal)."""
    logits = logits.astype(jnp.float32)
    if (pen_lower and top_k_max > 0 and not use_bias and not use_tfs_typical
            and not use_mirostat and last_tokens is not None):
        return _sample_rows_candidates(logits, keys, params, last_tokens,
                                       mu, top_k_max)
    b, v = logits.shape
    rows = jnp.arange(b)[:, None]

    if use_bias:
        # per-row logit_bias: fixed-width scatter-add ([-1]-padded ids
        # no-op via zero values; clip keeps the index in range)
        logits = logits.at[rows, jnp.clip(params.bias_ids, 0, v - 1)].add(
            jnp.where(params.bias_ids >= 0, params.bias_vals, 0.0))

    if last_tokens is not None:
        counts = _token_counts(last_tokens, v)                       # [B, V]
        pen = params.repeat_penalty[:, None]
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(counts > 0, penalized, logits)
        logits = (logits - counts * params.frequency_penalty[:, None]
                  - (counts > 0) * params.presence_penalty[:, None])

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if not use_tfs_typical and top_k_max > 0:
        # sort-free top_k: per-row kth-value threshold from one
        # lax.top_k(top_k_max) call. Ties AT the kth value are broken like
        # the rank path (argsort[::-1] places equal values by descending
        # index, so the kept tied positions are the highest indices): keep
        # every strictly-greater logit plus the `need` right-most tied ones.
        topvals = jax.lax.top_k(logits, top_k_max)[0]        # [B, K] desc
        k_eff = jnp.clip(params.top_k, 1, top_k_max)[:, None]
        kth = jnp.take_along_axis(topvals, k_eff - 1, axis=-1)
        tied = logits == kth
        need = k_eff - jnp.sum(logits > kth, axis=-1, keepdims=True)
        from_right = jnp.cumsum(tied[..., ::-1], axis=-1)[..., ::-1]
        masked = jnp.where((logits > kth) | (tied & (from_right <= need)),
                           logits, NEG_INF)
        # nucleus runs on the candidate VALUES (identical to the kept
        # set's descending sort, whichever tied indices were kept)
        s_logits = jnp.where(jnp.arange(top_k_max)[None, :] < k_eff,
                             topvals, NEG_INF)
        tok, *rest = _sample_rows_tail(logits, masked, s_logits, greedy_tok,
                                       keys, params, mu, use_mirostat, rows)
        # CONTRACT GUARD (ADVICE r4): top_k_max must bound every used row's
        # top_k (the serving engine upholds this via _row_features). A
        # direct caller understating it would get silently over-truncated
        # sampling; poison such rows' draws to -1 instead — loud downstream,
        # never a plausible-but-wrong token.
        tok = jnp.where(params.top_k > top_k_max, jnp.int32(-1), tok)
        return (tok, *rest)

    # one descending sort powers top_k (ranks) + tfs; top_p/typical keep
    # their own orderings (probability vs typicality). ranks = the INVERSE
    # of the `order` permutation, computed as argsort(order) — a second
    # int sort (~1.2 ms at [8, 128k]) instead of the row scatter TPU
    # serializes (~8 ms in the r4 serving trace); argsort of a permutation
    # is exactly its inverse.
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    ranks = jnp.argsort(order, axis=-1)
    k_eff = jnp.where(params.top_k <= 0, v, params.top_k)[:, None]
    masked = jnp.where(ranks < k_eff, logits, NEG_INF)

    sorted_logits = jnp.take_along_axis(masked, order, axis=-1)

    if use_tfs_typical:
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # tail-free: |d2| of sorted probs, normalized, cum < z (cum <= 1 so
        # a z >= 1 row keeps everything — the off case needs no branch)
        d1 = probs[..., :-1] - probs[..., 1:]
        d2 = jnp.abs(d1[..., :-1] - d1[..., 1:])
        # llama.cpp runs tfs over the post-top_k candidate LIST; with
        # full-vocab arrays the masked tail (prob 0) adds two spurious
        # boundary d2 terms — drop d2 windows reaching past the last live
        # (non-masked) token
        n_live = jnp.sum(sorted_logits > NEG_INF / 2, axis=-1, keepdims=True)
        d2 = jnp.where(jnp.arange(v - 2)[None, :] < n_live - 2, d2, 0.0)
        d2 = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-12)
        cum2 = jnp.cumsum(d2, axis=-1)
        # PREFIX keep-count (n_keep indexes into the sorted order): the
        # first token always survives, then tokens while cum|d2| < z; a
        # z >= 1 row is "off" and must keep ALL v tokens (cum2 can round to
        # exactly 1.0, so deriving the off case from the comparison would
        # mask the tail token)
        z = params.tfs_z[:, None]
        n_keep = jnp.where(z >= 1.0, v,
                           1 + jnp.sum(cum2 < z, axis=-1, keepdims=True))
        thresh = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
        masked = jnp.where(masked < thresh, NEG_INF, masked)

        # typical: deviation-from-entropy ordering, cum prob < typical_p.
        # keep_t lives in t_order space; gather it back through the inverse
        # permutation (argsort(t_order)) instead of scattering.
        log_probs = jax.nn.log_softmax(masked, axis=-1)
        p_full = jnp.exp(log_probs)
        entropy = -jnp.sum(jnp.where(p_full > 0, p_full * log_probs, 0.0),
                           axis=-1, keepdims=True)
        shifted = jnp.abs(-log_probs - entropy)
        t_order = jnp.argsort(shifted, axis=-1)
        p_sorted = jnp.take_along_axis(p_full, t_order, axis=-1)
        cum = jnp.cumsum(p_sorted, axis=-1)
        keep_t = (cum - p_sorted) < params.typical_p[:, None]
        keep_t = keep_t.at[..., :1].set(True)
        keep = jnp.take_along_axis(keep_t, jnp.argsort(t_order, axis=-1),
                                   axis=-1)
        masked = jnp.where(keep, masked, NEG_INF)

        # nucleus needs a fresh descending sort: tfs/typical masking is not
        # order-preserving on the original sorted array
        s_logits = jnp.sort(masked, axis=-1)[..., ::-1]
    else:
        # with tfs/typical off, the only masking so far is the top_k prefix
        # cut, which PRESERVES the descending order — reuse sorted_logits
        s_logits = sorted_logits

    return _sample_rows_tail(logits, masked, s_logits, greedy_tok, keys,
                             params, mu, use_mirostat, rows)


def _sample_rows_tail(logits, masked, s_logits, greedy_tok, keys, params,
                      mu, use_mirostat, rows):
    """Nucleus -> temperature -> draw -> (mirostat), shared by the sorted
    and the sort-free top_k paths of sample_rows. ``s_logits`` holds the
    live candidates in descending order (full [B, V] or the [B, top_k_max]
    value list — the nucleus math is width-agnostic)."""
    b, v = logits.shape
    # nucleus: cumulative prob (descending) < top_p
    s_probs = jax.nn.softmax(s_logits, axis=-1)
    s_cum = jnp.cumsum(s_probs, axis=-1)
    keep_p = (s_cum - s_probs) < params.top_p[:, None]
    keep_p = keep_p.at[..., :1].set(True)
    n_keep = jnp.sum(keep_p, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(s_logits, n_keep - 1, axis=-1)
    masked = jnp.where(masked < thresh, NEG_INF, masked)

    masked = masked / jnp.maximum(params.temp, 1e-6)[:, None]
    splits = jax.vmap(jax.random.split)(keys)                # [B, 2, 2]
    new_keys, subs = splits[:, 0], splits[:, 1]
    drawn = jax.vmap(
        lambda l, k: jax.random.categorical(k, l))(masked, subs
                                                   ).astype(jnp.int32)
    tok = jnp.where(params.temp <= 0, greedy_tok, drawn)
    if mu is None:
        return tok, new_keys
    if not use_mirostat:  # no active row uses mirostat: mu passes through
        return tok, new_keys, mu

    # -- per-row mirostat v1/v2 (Generate.cc:138,176): rows with
    # params.mirostat != 0 replace the truncation pipeline above; mu is the
    # carried [B] state (2*tau at admission). All rows share the same
    # per-row subkey, so a row's draw stream is independent of its mode.
    lt = logits / jnp.maximum(params.temp, 1e-6)[:, None]
    log_probs_t = jax.nn.log_softmax(lt, axis=-1)
    surprise = -log_probs_t / jnp.log(2.0)                   # bits
    draw = jax.vmap(lambda l, k: jax.random.categorical(k, l))

    # v2: truncate tokens whose surprise exceeds mu; argmax always survives
    m2 = jnp.where(surprise > mu[:, None], NEG_INF, lt)
    best = jnp.argmax(lt, axis=-1)
    m2 = m2.at[rows[:, 0], best].set(
        jnp.take_along_axis(lt, best[:, None], axis=-1)[:, 0])
    tok2 = draw(m2, subs).astype(jnp.int32)

    # v1: Zipf-estimated dynamic k from the top-m probs, then top-k draw
    mtop = min(100, v)
    probs_t = jnp.exp(log_probs_t)
    topm = jax.lax.top_k(probs_t, mtop)[0]
    i_idx = jnp.arange(1, mtop, dtype=jnp.float32)
    t_i = jnp.log((i_idx + 1.0) / i_idx)
    b_i = jnp.log(topm[:, :-1] / jnp.maximum(topm[:, 1:], 1e-12))
    s_hat = jnp.sum(t_i * b_i, axis=-1) / jnp.sum(t_i * t_i)
    eps_h = s_hat - 1.0
    k_dyn = jnp.power((eps_h * jnp.power(2.0, mu)) /
                      (1.0 - jnp.power(float(v), -eps_h)), 1.0 / s_hat)
    k_dyn = jnp.clip(jnp.nan_to_num(k_dyn, nan=1.0), 1, v).astype(jnp.int32)
    # inverse permutation by argsort (see the ranks comment above)
    ranks_t = jnp.argsort(jnp.argsort(lt, axis=-1)[..., ::-1], axis=-1)
    m1 = jnp.where(ranks_t < k_dyn[:, None], lt, NEG_INF)
    tok1 = draw(m1, subs).astype(jnp.int32)

    tok_m = jnp.where(params.mirostat == 1, tok1, tok2)
    s_drawn = jnp.take_along_axis(surprise, tok_m[:, None], axis=-1)[:, 0]
    mu_upd = mu - params.mirostat_eta * (s_drawn - params.mirostat_tau)
    use_m = params.mirostat > 0
    tok = jnp.where(use_m & (params.temp > 0), tok_m, tok)
    new_mu = jnp.where(use_m & (params.temp > 0), mu_upd, mu)
    return tok, new_keys, new_mu


def sample(logits: jax.Array, state: SamplerState, gcfg: GenerationConfig,
           last_tokens: Optional[jax.Array] = None):
    """Full sampling pipeline in the reference's order (LLaMA3Generate.cc:142-181:
    penalties → [greedy | mirostat | top_k→tfs→typical→top_p→temp→draw]).

    logits: [B, V] f32. Returns (token [B] int32, new state).
    """
    logits = logits.astype(jnp.float32)
    if gcfg.logit_bias:
        items = (gcfg.logit_bias.items() if hasattr(gcfg.logit_bias, "items")
                 else gcfg.logit_bias)  # hashable configs carry a tuple
        ids = jnp.asarray([int(t) for t, _ in items], jnp.int32)
        biases = jnp.asarray([float(v) for _, v in items], jnp.float32)
        logits = logits.at[:, ids].add(biases)
    if gcfg.temp <= 0:  # penalty scatter skipped when it can't change argmax
        return greedy_penalized(logits, last_tokens, gcfg), state
    if last_tokens is not None:
        logits = apply_repetition_penalty(logits, last_tokens, gcfg.repeat_penalty)
        logits = apply_frequency_presence(
            logits, last_tokens, gcfg.frequency_penalty, gcfg.presence_penalty)
    if gcfg.mirostat == 1:
        return mirostat_v1_step(logits, state, gcfg.mirostat_tau,
                                gcfg.mirostat_eta, gcfg.temp, logits.shape[-1])
    if gcfg.mirostat == 2:
        return mirostat_v2_step(logits, state, gcfg.mirostat_tau,
                                gcfg.mirostat_eta, gcfg.temp)

    logits = top_k_mask(logits, gcfg.top_k)
    logits = tail_free_mask(logits, gcfg.tfs_z)
    logits = typical_mask(logits, gcfg.typical_p)
    logits = top_p_mask(logits, gcfg.top_p)
    logits = apply_temperature(logits, gcfg.temp)
    key, sub = jax.random.split(state.key)
    tok = sample_token(logits, sub)
    return tok, SamplerState(key=key, mu=state.mu)
