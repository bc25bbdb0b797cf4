"""Pipeline-parallel forward on the virtual CPU mesh: 1-dev equality
(SURVEY §4 sharding-invariance), bubbles masked, collective structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.parallel.pp import (
    make_pp_forward,
    make_pp_mesh,
    shard_pp,
)

TINY = ModelConfig(
    name="tiny", family="llama", num_heads=8, num_kv_heads=4, num_layers=4,
    max_sqlen=64, embed_dim=1024, hidden_dim=1024, vocab_size=512,
    rms_norm_eps=1e-5,
)


def _cache(cfg, batch, quantized=False):
    return kvc.init_cache(cfg.num_layers, batch, cfg.max_sqlen,
                          cfg.num_kv_heads, cfg.head_dim,
                          quantized=quantized)


@pytest.mark.parametrize("scheme,n_pipe,n_micro", [
    ("fp", 4, 4), ("fp", 2, 2), ("w4a16", 4, 2),
])
def test_pp_prefill_matches_single_device(scheme, n_pipe, n_micro):
    """PP prefill: logits and every stage's KV slice equal 1-device, across
    microbatch counts that do (M=B) and don't (M<B) fill the pipeline."""
    cfg = TINY
    b, s = 4, 8
    params = llama.init_random_params(cfg, QuantConfig(scheme=scheme), seed=0)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)

    logits_1, cache_1 = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, ids, _cache(cfg, b), jnp.int32(0))

    mesh = make_pp_mesh(n_pipe)
    sp, sc = shard_pp(params, _cache(cfg, b), mesh)
    pp_fwd = make_pp_forward(mesh, n_micro)
    logits_n, cache_n = jax.jit(pp_fwd, static_argnames=("cfg",))(
        sp, cfg, ids, sc, jnp.int32(0))

    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)
    assert int(cache_n.length) == s
    np.testing.assert_allclose(
        np.asarray(cache_1.k[:, :, :, :s]).astype(np.float32),
        np.asarray(cache_n.k[:, :, :, :s]).astype(np.float32),
        rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(cache_1.v[:, :, :, :s]).astype(np.float32),
        np.asarray(cache_n.v[:, :, :, :s]).astype(np.float32),
        rtol=2e-2, atol=2e-2)


def test_pp_decode_steps_match_single_device():
    """Greedy decode chain through the pipeline: prefill + 3 decode steps,
    token-exact vs the single-device engine-forward path."""
    cfg = TINY
    b, s = 4, 8
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=1)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)

    fwd1 = jax.jit(llama.forward, static_argnames=("cfg",))
    mesh = make_pp_mesh(4)
    sp, sc = shard_pp(params, _cache(cfg, b), mesh)
    fwdn = jax.jit(make_pp_forward(mesh, 2), static_argnames=("cfg",))

    logits_1, cache_1 = fwd1(params, cfg, ids, _cache(cfg, b), jnp.int32(0))
    logits_n, cache_n = fwdn(sp, cfg, ids, sc, jnp.int32(0))
    pos = s
    for _ in range(3):
        tok1 = jnp.argmax(logits_1, -1).astype(jnp.int32)
        tokn = jnp.argmax(logits_n, -1).astype(jnp.int32)
        assert (np.asarray(tok1) == np.asarray(tokn)).all()
        logits_1, cache_1 = fwd1(params, cfg, tok1[:, None], cache_1,
                                 jnp.int32(pos))
        logits_n, cache_n = fwdn(sp, cfg, tokn[:, None], cache_n,
                                 jnp.int32(pos))
        pos += 1
        np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                                   rtol=2e-2, atol=2e-2)


def test_pp_int8_kv_cache():
    """PP with the quantized KV cache: scales commit per microbatch too."""
    cfg = TINY
    b, s = 4, 8
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=2)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)
    logits_1, cache_1 = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, ids, _cache(cfg, b, quantized=True), jnp.int32(0))

    mesh = make_pp_mesh(4)
    sp, sc = shard_pp(params, _cache(cfg, b, quantized=True), mesh)
    logits_n, cache_n = jax.jit(make_pp_forward(mesh, 4),
                                static_argnames=("cfg",))(
        sp, cfg, ids, sc, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(cache_1.k_scale[:, :, :, :s]),
        np.asarray(cache_n.k_scale[:, :, :, :s]), rtol=2e-2, atol=1e-6)
    assert (np.asarray(cache_1.k[:, :, :, :s])
            == np.asarray(cache_n.k[:, :, :, :s])).all()


def test_pp_collective_structure():
    """One activation ppermute per tick (once in the scan-body text) and one
    logits psum — a resharding typo shows up as extra collectives."""
    import re

    cfg = TINY
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0)
    mesh = make_pp_mesh(4)
    sp, sc = shard_pp(params, _cache(cfg, 4), mesh)
    ids = jnp.zeros((4, 8), jnp.int32)
    txt = jax.jit(make_pp_forward(mesh, 4), static_argnames=("cfg",)).lower(
        sp, cfg, ids, sc, jnp.int32(0)).as_text()
    got = {op: len(re.findall(r"stablehlo\." + op + r"\b", txt))
           for op in ("all_reduce", "all_gather", "collective_permute",
                      "all_to_all")}
    assert got == {"all_reduce": 1, "all_gather": 0,
                   "collective_permute": 1, "all_to_all": 0}, got


@pytest.mark.parametrize("scheme", ["fp", "w4a16"])
def test_pp_tp_matches_single_device(scheme):
    """2 pipe x 2 model: Megatron TP inside each stage (psums on "model")
    composed with the pipeline hop — prefill + one greedy decode step equal
    the single-device run."""
    cfg = TINY
    b, s = 4, 8
    params = llama.init_random_params(cfg, QuantConfig(scheme=scheme), seed=0)
    params_n = llama.init_random_params(cfg, QuantConfig(scheme=scheme),
                                        seed=0, tp_degree=2)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)

    fwd1 = jax.jit(llama.forward, static_argnames=("cfg",))
    logits_1, cache_1 = fwd1(params, cfg, ids, _cache(cfg, b), jnp.int32(0))

    mesh = make_pp_mesh(2, 2)
    sp, sc = shard_pp(params_n, _cache(cfg, b), mesh)
    fwdn = jax.jit(make_pp_forward(mesh, 2), static_argnames=("cfg",))
    logits_n, cache_n = fwdn(sp, cfg, ids, sc, jnp.int32(0))

    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)
    tok = jnp.argmax(logits_1, -1).astype(jnp.int32)
    assert (np.asarray(tok) == np.argmax(np.asarray(logits_n), -1)).all()
    logits_1d, _ = fwd1(params, cfg, tok[:, None], cache_1, jnp.int32(s))
    logits_nd, _ = fwdn(sp, cfg, tok[:, None], cache_n, jnp.int32(s))
    np.testing.assert_allclose(np.asarray(logits_1d), np.asarray(logits_nd),
                               rtol=2e-2, atol=2e-2)


def test_pp_tp_collective_structure():
    """PP x TP budget: per tick 1 activation ppermute + (in the layer scan)
    2 Megatron psums + 1 lm_head all-gather, plus the final logits psum."""
    import re

    cfg = TINY
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0,
                                      tp_degree=2)
    mesh = make_pp_mesh(2, 2)
    sp, sc = shard_pp(params, _cache(cfg, 4), mesh)
    ids = jnp.zeros((4, 8), jnp.int32)
    txt = jax.jit(make_pp_forward(mesh, 2), static_argnames=("cfg",)).lower(
        sp, cfg, ids, sc, jnp.int32(0)).as_text()
    got = {op: len(re.findall(r"stablehlo\." + op + r"\b", txt))
           for op in ("all_reduce", "all_gather", "collective_permute",
                      "all_to_all")}
    assert got == {"all_reduce": 3, "all_gather": 1,
                   "collective_permute": 1, "all_to_all": 0}, got


@pytest.mark.parametrize("family", ["gptbigcode", "opt"])
def test_pp_family_agnostic_matches_single_device(family):
    """PP over the non-llama families (r5, VERDICT r4 weak #5): GPTBigCode
    (MQA, learned positions, LayerNorm head) and OPT (f32 activations,
    position offset 2) run the same GPipe schedule via the family adapter
    — prefill logits + 2 greedy decode steps equal the single device."""
    if family == "gptbigcode":
        from tinychatengine_tpu.models import gptbigcode as mod
        cfg = ModelConfig(
            name="tiny_bc", family="gptbigcode", num_heads=4, num_kv_heads=1,
            num_layers=4, max_sqlen=64, embed_dim=128, hidden_dim=256,
            vocab_size=300)
        params = mod.init_random_params(cfg, seed=0)
    else:
        from tinychatengine_tpu.models import opt as mod
        cfg = ModelConfig(
            name="tiny_opt", family="opt", num_heads=4, num_kv_heads=4,
            num_layers=4, max_sqlen=64, embed_dim=128, hidden_dim=256,
            vocab_size=300)
        params = mod.init_random_params(cfg, seed=0)

    b, s = 4, 8
    ids = jnp.asarray(
        np.random.default_rng(2).integers(5, cfg.vocab_size, (b, s)),
        jnp.int32)
    fwd1 = jax.jit(mod.forward, static_argnames=("cfg",))
    logits_1, cache_1 = fwd1(params, cfg, ids, _cache(cfg, b), jnp.int32(0))

    mesh = make_pp_mesh(4)
    sp, sc = shard_pp(params, _cache(cfg, b), mesh)
    fwdn = jax.jit(make_pp_forward(mesh, 2, forward=mod.forward),
                   static_argnames=("cfg",))
    logits_n, cache_n = fwdn(sp, cfg, ids, sc, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)

    # greedy decode chain, token-exact
    t1 = jnp.argmax(logits_1, -1).astype(jnp.int32)
    tn = jnp.argmax(logits_n, -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(tn))
    pos = s
    for _ in range(2):
        logits_1, cache_1 = fwd1(params, cfg, t1[:, None], cache_1,
                                 jnp.int32(pos))
        logits_n, cache_n = fwdn(sp, cfg, tn[:, None], cache_n,
                                 jnp.int32(pos))
        t1 = jnp.argmax(logits_1, -1).astype(jnp.int32)
        tn = jnp.argmax(logits_n, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(tn))
        pos += 1


def test_pp_generic_specs_reject_tp():
    """The generic (non-llama) PP specs are pure-pipe: composing in-stage
    TP must fail loudly, not shard wrong."""
    from tinychatengine_tpu.models import gptbigcode as mod
    from tinychatengine_tpu.parallel.pp import _pp_param_specs
    cfg = ModelConfig(
        name="tiny_bc", family="gptbigcode", num_heads=4, num_kv_heads=1,
        num_layers=2, max_sqlen=32, embed_dim=128, hidden_dim=256,
        vocab_size=300)
    params = mod.init_random_params(cfg, seed=0)
    with pytest.raises(AssertionError, match="llama-only"):
        _pp_param_specs(params, tp=True)
