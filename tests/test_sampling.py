"""Sampler tests (reference: llm/src/Generate.cc llama.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

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
