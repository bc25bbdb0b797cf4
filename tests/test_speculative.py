"""Prompt-lookup speculative decoding: exactness + acceptance."""

import numpy as np
import pytest

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.generation.speculative import generate_pld
from tinychatengine_tpu.models import llama


def _engine():
    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=256, embed_dim=128, hidden_dim=256,
        vocab_size=256, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    return Engine(params, cfg, qcfg, batch=1)


def test_pld_matches_vanilla_greedy():
    eng = _engine()
    g = GenerationConfig(temp=0.0, n_predict=24, repeat_penalty=1.0,
                         repeat_last_n=1)
    for prompt in ([5, 9, 11, 42],
                   [7, 3, 7, 3, 7, 3, 7, 3],          # repetitive
                   list(range(30, 60))):
        ids = np.asarray([prompt], np.int32)
        want = np.asarray(eng.generate_device(ids, g, n_tokens=24))[0]
        got, steps, _ = generate_pld(eng, ids, n_tokens=24, K=7)
        np.testing.assert_array_equal(got, want)
        assert steps <= 24  # never more forwards than tokens


def test_pld_accepts_on_repetitive_continuations():
    """Greedy decoding of a tiny random model quickly enters a loop; the
    lookup must then accept multi-token drafts (fewer steps than tokens)."""
    eng = _engine()
    ids = np.asarray([[7, 3, 7, 3]], np.int32)
    got, steps, _ = generate_pld(eng, ids, n_tokens=48, K=7)
    assert len(got) == 48
    assert steps < 40, steps  # speculation must have accepted something


def test_pld_multi_turn_cache_continuation():
    """PLD with a carried cache (chat turns) matches a fresh full-prompt run."""
    eng = _engine()
    ids1 = np.asarray([[5, 9, 11]], np.int32)
    t1, _, cache = generate_pld(eng, ids1, n_tokens=6, K=7)
    ids2 = np.asarray([[20, 21]], np.int32)
    t2, _, _ = generate_pld(eng, ids2, n_tokens=6, K=7, cache=cache,
                            start=3 + 6)

    full = np.asarray([[5, 9, 11] + t1.tolist() + [20, 21]], np.int32)
    eng2 = _engine()
    want, _, _ = generate_pld(eng2, full, n_tokens=6, K=7)
    np.testing.assert_array_equal(t2, want)


@pytest.mark.slow
def test_pld_multi_turn_no_overshoot_luck():
    """Continuation must match a fresh run even when the final verify step
    does NOT overshoot (the final token's K/V must be written explicitly) —
    sweep n_tokens so both exit modes (exact landing and overshoot) occur."""
    eng = _engine()
    for n1 in (2, 3, 4, 5, 6, 7):
        ids1 = np.asarray([[100, 50, 25]], np.int32)
        t1, _, cache = generate_pld(eng, ids1, n_tokens=n1, K=4)
        ids2 = np.asarray([[60, 61]], np.int32)
        t2, _, _ = generate_pld(eng, ids2, n_tokens=5, K=4, cache=cache,
                                start=3 + n1)

        full = np.asarray([[100, 50, 25] + t1.tolist() + [60, 61]], np.int32)
        want, _, _ = generate_pld(eng, full, n_tokens=5, K=4)
        np.testing.assert_array_equal(t2, want, err_msg=f"n_tokens={n1}")
