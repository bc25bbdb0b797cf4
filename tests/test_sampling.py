"""Sampler tests (reference: llm/src/Generate.cc llama.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import GenerationConfig
from tinychatengine_tpu.generation import sampling as smp


def _logits(vals):
    return jnp.asarray(np.array([vals], np.float32))


def test_greedy():
    assert int(smp.greedy(_logits([0.1, 5.0, -1.0]))[0]) == 1


def test_repetition_penalty_signs():
    logits = _logits([2.0, -2.0, 1.0])
    last = jnp.asarray([[0, 1, -1, -1]], jnp.int32)
    out = np.asarray(smp.apply_repetition_penalty(logits, last, 2.0))[0]
    assert out[0] == 1.0     # positive → /penalty
    assert out[1] == -4.0    # negative → *penalty
    assert out[2] == 1.0     # untouched


def test_frequency_presence():
    logits = _logits([1.0, 1.0, 1.0])
    last = jnp.asarray([[0, 0, 1, -1]], jnp.int32)
    out = np.asarray(smp.apply_frequency_presence(logits, last, 0.5, 0.25))[0]
    np.testing.assert_allclose(out, [1.0 - 1.0 - 0.25, 1.0 - 0.5 - 0.25, 1.0])


def test_top_k_mask():
    out = np.asarray(smp.top_k_mask(_logits([1.0, 3.0, 2.0, 0.0]), 2))[0]
    assert out[1] == 3.0 and out[2] == 2.0
    assert out[0] <= smp.NEG_INF and out[3] <= smp.NEG_INF


def test_top_p_mask_keeps_nucleus():
    # probs ~ [0.665, 0.245, 0.090]; p=0.7 keeps first two (first exceeds at 0.665)
    logits = _logits([3.0, 2.0, 1.0])
    out = np.asarray(smp.top_p_mask(logits, 0.7))[0]
    assert out[0] == 3.0 and out[1] == 2.0 and out[2] <= smp.NEG_INF


def test_top_p_min_keep():
    logits = _logits([10.0, 0.0, 0.0])
    out = np.asarray(smp.top_p_mask(logits, 0.01, min_keep=1))[0]
    assert out[0] == 10.0  # argmax always survives


def test_typical_and_tfs_preserve_some_mass():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    for masked in (smp.typical_mask(logits, 0.5), smp.tail_free_mask(logits, 0.5)):
        m = np.asarray(masked)
        assert ((m > smp.NEG_INF / 2).sum(axis=-1) >= 1).all()
        assert (m > smp.NEG_INF / 2).sum() < m.size  # actually truncates


def test_sample_token_distribution():
    logits = jnp.log(jnp.asarray([[0.8, 0.2, 0.0001]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    toks = np.array([int(smp.sample_token(logits, k)[0]) for k in keys[:300]])
    frac0 = (toks == 0).mean()
    assert 0.7 < frac0 < 0.9


def test_mirostat_v2_mu_updates():
    state = smp.SamplerState.init(0, 1, tau=5.0)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32) * 3)
    tok, s2 = smp.mirostat_v2_step(logits, state, 5.0, 0.1, 1.0)
    assert tok.shape == (1,) and float(s2.mu[0]) != float(state.mu[0])


def test_mirostat_v1_runs():
    state = smp.SamplerState.init(0, 1, tau=5.0)
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32) * 2)
    tok, s2 = smp.mirostat_v1_step(logits, state, 5.0, 0.1, 1.0, 256)
    assert 0 <= int(tok[0]) < 256


def test_full_pipeline_greedy_when_temp_zero():
    g = GenerationConfig(temp=0.0)
    state = smp.SamplerState.init(0, 1, g.mirostat_tau)
    logits = _logits([0.0, 9.0, 1.0])
    tok, _ = smp.sample(logits, state, g)
    assert int(tok[0]) == 1


def test_full_pipeline_respects_penalties():
    g = GenerationConfig(temp=0.7, top_k=0, top_p=1.0, repeat_penalty=1e9)
    state = smp.SamplerState.init(0, 1, g.mirostat_tau)
    logits = _logits([5.0, 4.9, -10.0])
    last = jnp.asarray([[0, -1]], jnp.int32)  # token 0 heavily penalized
    tok, _ = smp.sample(logits, state, g, last)
    assert int(tok[0]) == 1


# -- per-row (serving) sampler ------------------------------------------------

def test_sample_rows_mixed_modes_deterministic_rows():
    """One batch, three configs: greedy / top_k=1 / penalty-flip — every row
    deterministic, each obeying ONLY its own [B]-array parameters."""
    cfgs = [
        GenerationConfig(temp=0.0, repeat_penalty=1.0),
        GenerationConfig(temp=2.0, top_k=1, repeat_penalty=1.0),
        GenerationConfig(temp=0.0, repeat_penalty=1e9, repeat_last_n=2),
    ]
    params = smp.RowParams.from_configs(cfgs)
    logits = jnp.asarray(np.tile([[5.0, 4.9, -10.0]], (3, 1)), jnp.float32)
    last = jnp.asarray([[0, 0], [0, 0], [0, -1]], jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(3, dtype=jnp.uint32))
    tok, keys2 = smp.sample_rows(logits, keys, params, last)
    toks = [int(t) for t in np.asarray(tok)]
    # rows 0/1: no penalty → argmax 0; row 2: token 0 penalized → argmax 1
    assert toks == [0, 0, 1]
    assert keys2.shape == keys.shape


def test_sample_rows_top_p_truncates_per_row():
    """top_p≈0 forces argmax on its row; top_p=1 leaves the other row free
    to draw the second token at high temperature (statistically)."""
    cfgs = [GenerationConfig(temp=5.0, top_p=1e-6, top_k=0,
                             repeat_penalty=1.0),
            GenerationConfig(temp=5.0, top_p=1.0, top_k=0,
                             repeat_penalty=1.0)]
    params = smp.RowParams.from_configs(cfgs)
    logits = jnp.asarray(np.tile([[1.0, 0.9, 0.8, 0.7]], (2, 1)), jnp.float32)
    row0, row1_seen = [], set()
    for seed in range(24):
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(2, dtype=jnp.uint32) + seed * 7)
        tok, _ = smp.sample_rows(logits, keys, params, None)
        row0.append(int(tok[0]))
        row1_seen.add(int(tok[1]))
    assert set(row0) == {0}          # nucleus collapsed to argmax
    assert len(row1_seen) > 1        # hot row explores


def test_sample_rows_matches_static_sampler_when_uniform_greedy():
    g = GenerationConfig(temp=0.0, repeat_penalty=1.3, repeat_last_n=4)
    params = smp.RowParams.from_configs([g, g])
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    last = jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    tok_rows, _ = smp.sample_rows(logits, keys, params, last)
    state = smp.SamplerState.init(0, 2, g.mirostat_tau)
    tok_static, _ = smp.sample(logits, state, g, last)
    assert list(np.asarray(tok_rows)) == list(np.asarray(tok_static))


def test_sample_rows_mu_does_not_disturb_plain_rows():
    """Passing mu (mirostat-capable 3-return form) must not change the
    tokens of rows whose mirostat is off — and mu must pass through
    unchanged for them."""
    cfgs = [GenerationConfig(temp=0.9, top_p=0.9, repeat_penalty=1.0, seed=1),
            GenerationConfig(temp=0.0, repeat_penalty=1.0)]
    params = smp.RowParams.from_configs(cfgs)
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    tok2, keys2 = smp.sample_rows(logits, keys, params, None)
    mu = jnp.asarray([10.0, 10.0], jnp.float32)
    tok3, keys3, mu3 = smp.sample_rows(logits, keys, params, None, mu)
    assert list(np.asarray(tok2)) == list(np.asarray(tok3))
    np.testing.assert_array_equal(np.asarray(keys2), np.asarray(keys3))
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu3))


@pytest.mark.parametrize("version", [1, 2])
def test_sample_rows_mirostat_updates_mu(version):
    """Mirostat rows draw and move mu toward tau (Generate.cc:138,176):
    after a draw, mu -= eta*(surprise - tau) — with a sharply peaked
    distribution the drawn surprise is ~0 bits, so mu must increase by
    ~eta*tau."""
    g = GenerationConfig(temp=1.0, mirostat=version, mirostat_tau=3.0,
                         mirostat_eta=0.5, repeat_penalty=1.0)
    params = smp.RowParams.from_configs([g])
    logits = jnp.asarray([[20.0] + [0.0] * 127], jnp.float32)
    keys = jax.random.PRNGKey(0)[None]
    mu = jnp.asarray([2.0 * g.mirostat_tau], jnp.float32)
    tok, _, mu2 = smp.sample_rows(logits, keys, params, None, mu)
    assert int(tok[0]) == 0                       # peak token dominates
    # surprise(argmax) ≈ 0 bits → mu grows by ≈ eta*tau = 1.5
    assert float(mu2[0]) > float(mu[0]) + 1.0


def test_sample_rows_tfs_off_keeps_min_token():
    """tfs_z=1.0 is 'off': the minimum-logit token must stay sampleable
    (regression: a non-prefix keep mask used as a prefix count masked the
    tail token whenever the |d2| cumsum rounded to 1.0)."""
    cfgs = [GenerationConfig(temp=8.0, top_k=0, top_p=1.0, tfs_z=1.0,
                             typical_p=1.0, repeat_penalty=1.0)]
    params = smp.RowParams.from_configs(cfgs)
    logits = jnp.asarray([[2.0, 1.5, 1.0, 0.5]], jnp.float32)
    seen = set()
    for seed in range(64):
        keys = jax.random.PRNGKey(seed)[None]
        tok, _ = smp.sample_rows(logits, keys, params, None)
        seen.add(int(tok[0]))
    assert seen == {0, 1, 2, 3}, seen  # nothing masked at high temperature


@pytest.mark.slow
def test_greedy_penalized_fast_path_exact():
    """greedy_penalized's argmax-shortcut must equal the full penalty path in
    every regime: argmax outside the window (fast branch), argmax inside the
    window (slow branch), ties at 0.0, and boosting penalties (<1)."""
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import GenerationConfig

    def slow(logits, last, g):
        lp = smp.apply_repetition_penalty(logits, last, g.repeat_penalty)
        lp = smp.apply_frequency_presence(lp, last, g.frequency_penalty,
                                          g.presence_penalty)
        return smp.greedy(lp)

    rng = np.random.default_rng(0)
    v = 64
    for trial in range(50):
        logits = jnp.asarray(rng.standard_normal((1, v)) * 3, jnp.float32)
        last = jnp.asarray(rng.integers(-1, v, (1, 8)), jnp.int32)
        for rp, af, ap in ((1.3, 0.0, 0.0), (1.0, 0.5, 0.2), (2.0, 0.1, 0.0),
                           (0.5, 0.0, 0.0), (1.0, 0.0, 0.0)):
            g = GenerationConfig(temp=0.0, repeat_penalty=rp,
                                 frequency_penalty=af, presence_penalty=ap)
            got = smp.greedy_penalized(logits, last, g)
            want = slow(logits, last, g)
            assert int(got[0]) == int(want[0]), (trial, rp, af, ap)

    # tie at exactly 0.0 with the tied token in the window
    logits = jnp.zeros((1, v), jnp.float32)
    last = jnp.asarray([[3]], jnp.int32)
    g = GenerationConfig(temp=0.0, repeat_penalty=1.5)
    assert int(smp.greedy_penalized(logits, last, g)[0]) == \
        int(slow(logits, last, g)[0])


def test_sample_rows_sort_free_top_k_exact():
    """The sort-free top_k path (static top_k_max, r4) must produce BIT-
    IDENTICAL tokens/keys/mu to the full argsort path — including ties at
    the kth value (broken like argsort[::-1]: highest index first) and
    interaction with top_p on the candidate list."""
    import jax

    rng = np.random.default_rng(17)
    b, v = 4, 1024
    logits = rng.standard_normal((b, v)).astype(np.float32) * 3
    # engineered ties straddling the kth boundary on row 0: five equal
    # values around rank 38-42 with top_k=40
    tie_val = np.sort(logits[0])[-40]
    logits[0, [7, 99, 500, 777, 901]] = tie_val
    logits = jnp.asarray(logits)

    cfgs = [
        GenerationConfig(temp=0.9, top_k=40, top_p=0.9, seed=1),
        GenerationConfig(temp=1.3, top_k=7, top_p=1.0, seed=2),
        GenerationConfig(temp=0.0, top_k=40, top_p=0.95, seed=3,
                         repeat_penalty=1.2),
        GenerationConfig(temp=0.7, top_k=100, top_p=0.5, seed=4,
                         frequency_penalty=0.3),
    ]
    params = smp.RowParams.from_configs(cfgs)
    keys = jnp.asarray(
        np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(b)]))
    last = jnp.asarray(rng.integers(-1, v, (b, 16)), jnp.int32)
    mu = jnp.full((b,), 8.0, jnp.float32)

    want = smp.sample_rows(logits, keys, params, last, mu,
                                use_tfs_typical=True, top_k_max=0)
    got = smp.sample_rows(logits, keys, params, last, mu,
                               use_tfs_typical=False, top_k_max=100)
    for a, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))

    # and without mu (the 2-tuple signature)
    w2 = smp.sample_rows(logits, keys, params, last,
                              use_tfs_typical=True, top_k_max=0)
    g2 = smp.sample_rows(logits, keys, params, last,
                              use_tfs_typical=False, top_k_max=100)
    for a, g in zip(w2, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_token_counts_chunked_equals_direct():
    """Windows past _COUNT_CHUNK are summed chunk-by-chunk (ADVICE r4 memory
    bound) — counts must equal the direct one-hot for any T, including -1
    padding and chunk-straddling repeats."""
    rng = np.random.default_rng(3)
    b, v, t = 4, 512, 2 * smp._COUNT_CHUNK + 37   # forces 3 chunks, ragged tail
    last = rng.integers(-1, v, (b, t)).astype(np.int32)
    last[0, :] = 5                                 # one id repeated T times
    got = np.asarray(smp._token_counts(jnp.asarray(last), v))
    want = np.zeros((b, v), np.float32)
    for r in range(b):
        for tok in last[r]:
            if tok >= 0:
                want[r, tok] += 1
    np.testing.assert_array_equal(got, want)
    assert got[0, 5] == t


def test_sample_rows_top_k_over_bound_poisoned():
    """A direct caller understating top_k_max gets -1 tokens for the
    violating rows (loud), never silently over-truncated draws (ADVICE r4).
    Rows within the bound are unaffected."""
    rng = np.random.default_rng(11)
    b, v = 3, 256
    logits = jnp.asarray(rng.standard_normal((b, v)).astype(np.float32))
    cfgs = [GenerationConfig(temp=0.8, top_k=8, seed=1),
            GenerationConfig(temp=0.8, top_k=999, seed=2),   # > top_k_max
            GenerationConfig(temp=0.8, top_k=16, seed=3)]
    params = smp.RowParams.from_configs(cfgs)
    keys = jnp.asarray(
        np.stack([np.asarray(jax.random.PRNGKey(i)) for i in range(b)]))
    tok, _ = smp.sample_rows(logits, keys, params,
                             use_tfs_typical=False, top_k_max=16)
    tok = np.asarray(tok)
    assert tok[1] == -1
    assert tok[0] >= 0 and tok[2] >= 0
    # reference: the exact full-sort path with an adequate bound
    want, _ = smp.sample_rows(logits, keys, params,
                              use_tfs_typical=True, top_k_max=0)
    want = np.asarray(want)
    np.testing.assert_array_equal(tok[[0, 2]], want[[0, 2]])
