"""OPT model tests — FP and W8A8 paths, prefill/decode equivalence
(mirrors tests/non_cuda/test_Int8OPTDecoderLayer.cc strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import opt

TINY = ModelConfig(
    name="tiny_opt", family="opt", num_heads=4, num_kv_heads=4, num_layers=2,
    max_sqlen=32, embed_dim=128, hidden_dim=256, vocab_size=300,
)


def _cache(quantized, batch=1):
    return kvc.init_cache(TINY.num_layers, batch, TINY.max_sqlen,
                          TINY.num_kv_heads, TINY.head_dim,
                          dtype=jnp.int8 if quantized else jnp.bfloat16)


@pytest.mark.parametrize("quantized", [False, True])
def test_prefill_decode_equivalence(quantized):
    params = opt.init_random_params(TINY, quantized=quantized, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 300, (1, 8)), jnp.int32)

    fwd = jax.jit(opt.forward, static_argnames=("cfg",))
    la, _ = fwd(params, TINY, ids, _cache(quantized), jnp.int32(0))
    lb, cache = fwd(params, TINY, ids[:, :5], _cache(quantized), jnp.int32(0))
    for t in range(5, 8):
        lb, cache = fwd(params, TINY, ids[:, t:t + 1], cache, jnp.int32(t))

    a, b = np.asarray(la), np.asarray(lb)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2 * np.abs(a).max())


def test_position_offset_used():
    """OPT's +2 learned-position offset must be applied."""
    params = opt.init_random_params(TINY, seed=1)
    ids = jnp.asarray([[5, 6]], jnp.int32)
    la, _ = opt.forward(params, TINY, ids, _cache(False), jnp.int32(0))
    # zero out positions 0..1 (would be used WITHOUT offset); logits unchanged
    import dataclasses
    ep = params.embed_positions.at[:2].set(0.0)
    p2 = jax.tree.map(lambda x: x, params)
    p2 = opt.OPTParams(embed_tokens=params.embed_tokens, embed_positions=ep,
                       layers=params.layers, final_ln_w=params.final_ln_w,
                       final_ln_b=params.final_ln_b, lm_head=params.lm_head)
    lb, _ = opt.forward(p2, TINY, ids, _cache(False), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb))
    # but zeroing 2..3 (used WITH offset) must change them
    ep2 = params.embed_positions.at[2:4].set(0.0)
    p3 = opt.OPTParams(embed_tokens=params.embed_tokens, embed_positions=ep2,
                       layers=params.layers, final_ln_w=params.final_ln_w,
                       final_ln_b=params.final_ln_b, lm_head=params.lm_head)
    lc, _ = opt.forward(p3, TINY, ids, _cache(False), jnp.int32(0))
    assert not np.allclose(np.asarray(la), np.asarray(lc))


# the QM_TPU packer needs K % 256 == 0 (SUPERBLOCK): the int4 OPT test
# model is wider than TINY
TINY4 = ModelConfig(
    name="tiny_opt4", family="opt", num_heads=4, num_kv_heads=4,
    num_layers=2, max_sqlen=32, embed_dim=256, hidden_dim=512,
    vocab_size=300,
)


@pytest.mark.parametrize("scheme", ["w4a16", "w4a8"])
def test_int4_prefill_decode_equivalence(scheme):
    """The Int4OPT stack (Int4OPTAttention.cc / Int4OPTDecoderLayer.cc):
    prefill and step-by-step decode agree through the quantized
    projections."""
    from tinychatengine_tpu.core.config import QuantConfig
    from tinychatengine_tpu.ops.linear import Int4A8Linear, Int4Linear

    TINY = TINY4
    qcfg = QuantConfig(scheme=scheme, group_size=64)
    params = opt.init_random_params(TINY, qcfg=qcfg, seed=5)
    want_cls = Int4A8Linear if scheme == "w4a8" else Int4Linear
    assert isinstance(params.layers.q_proj, want_cls)
    assert isinstance(params.layers.fc2, want_cls)   # every projection int4
    assert isinstance(params.lm_head, want_cls)

    def cache4():
        return kvc.init_cache(TINY.num_layers, 1, TINY.max_sqlen,
                              TINY.num_kv_heads, TINY.head_dim,
                              dtype=jnp.bfloat16)

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 300, (1, 8)),
                      jnp.int32)
    fwd = jax.jit(opt.forward, static_argnames=("cfg",))
    la, _ = fwd(params, TINY, ids, cache4(), jnp.int32(0))
    lb, cache = fwd(params, TINY, ids[:, :5], cache4(), jnp.int32(0))
    for t in range(5, 8):
        lb, cache = fwd(params, TINY, ids[:, t:t + 1], cache, jnp.int32(t))
    a, b = np.asarray(la), np.asarray(lb)
    assert a.shape == (1, TINY.vocab_size)  # padded head sliced back
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2 * np.abs(a).max())


@pytest.mark.parametrize("scheme", ["w4a16", "w4a8"])
def test_int4_opt_generates_and_checkpoint_roundtrips(tmp_path, scheme):
    """Int4 OPT end-to-end under the Engine (greedy, deterministic) and
    through save/load (the int4 container template path)."""
    from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.tools.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    qcfg = QuantConfig(scheme=scheme, group_size=64)
    params = opt.init_random_params(TINY4, qcfg=qcfg, seed=7)
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, TINY4, qcfg, batch=1, max_len=TINY4.max_sqlen)
    toks = eng.generate(np.asarray([[5, 9, 11]], np.int32), g).tokens[0]
    assert len(toks) == 8
    assert all(0 <= t < TINY4.vocab_size for t in toks)

    save_checkpoint(str(tmp_path / "c"), params, TINY4, qcfg,
                    extra_meta={"family": "opt"})
    loaded, q2 = load_checkpoint(str(tmp_path / "c"), cfg=TINY4)
    assert q2.scheme == scheme
    eng2 = Engine(loaded, TINY4, q2, batch=1, max_len=TINY4.max_sqlen)
    toks2 = eng2.generate(np.asarray([[5, 9, 11]], np.int32), g).tokens[0]
    assert toks2 == toks


def test_w8a8_path_is_int8_on_wire():
    """The quantized path must put int8 through the projections (not fp)."""
    params = opt.init_random_params(TINY, quantized=True, seed=2)
    from tinychatengine_tpu.ops.linear import W8A8Linear
    assert isinstance(params.layers.q_proj, W8A8Linear)
    assert params.layers.q_proj.weight.dtype == jnp.int8
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, cache = opt.forward(params, TINY, ids, _cache(True), jnp.int32(0))
    assert cache.k.dtype == jnp.int8  # int8 KV cache
    assert np.isfinite(np.asarray(logits)).all()


def test_return_hidden_matches_logits_path():
    """return_hidden yields the pre-final-LN states: applying final LN +
    lm_head reproduces forward's full logits (embeddings endpoint contract,
    same as models.llama)."""
    from tinychatengine_tpu.ops import ref
    from tinychatengine_tpu.ops.linear import apply_linear

    params = opt.init_random_params(TINY, seed=3)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 300, (1, 6)),
                      jnp.int32)
    fwd = jax.jit(opt.forward, static_argnames=("cfg", "full_logits",
                                                "return_hidden"))
    want, _ = fwd(params, TINY, ids, _cache(False), jnp.int32(0),
                  full_logits=True)
    hidden, cache = fwd(params, TINY, ids, _cache(False), jnp.int32(0),
                        return_hidden=True)
    assert hidden.shape == (1, 6, TINY.embed_dim)
    assert int(cache.length) == 6
    x = ref.layer_norm_ref(hidden, params.final_ln_w, params.final_ln_b)
    got = apply_linear(params.lm_head, x.astype(jnp.bfloat16)).astype(
        jnp.float32)[..., :TINY.vocab_size]
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=2e-2, atol=2e-2)
