"""Sequence-parallel (ring-attention) prefill on the virtual CPU mesh.

SURVEY §4 sharding-invariance style: every SP configuration must equal the
single-device oracle bit-for-tolerance — ring attention vs attention_xla,
and the full sp_prefill (logits + cache + decode continuation) vs
llama.forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops.attention import attention_xla, ring_attention
from tinychatengine_tpu.parallel.sp import (
    make_sp_mesh,
    make_sp_prefill,
    shard_sp_cache,
    sp_cache_into,
)
from tinychatengine_tpu.parallel.sharding import shard_params

TINY = ModelConfig(
    name="tiny", family="llama", num_heads=8, num_kv_heads=4, num_layers=2,
    max_sqlen=64, embed_dim=1024, hidden_dim=1024, vocab_size=512,
    rms_norm_eps=1e-5,
)


def _cache(cfg, batch=1, max_len=None):
    return kvc.init_cache(cfg.num_layers, batch, max_len or cfg.max_sqlen,
                          cfg.num_kv_heads, cfg.head_dim)


@pytest.mark.parametrize("window", [None, 8])
def test_ring_attention_matches_oracle(window):
    b, s, hq, hkv, d = 2, 32, 4, 2, 16
    n_seq = 4
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
    v = jax.random.normal(kv_, (b, s, hkv, d), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    want = attention_xla(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                         positions, s, window=window)

    mesh = make_sp_mesh(n_seq)
    f = shard_map(
        lambda q, k, v, p: ring_attention(q, k, v, p, "seq", window=window),
        mesh=mesh,
        in_specs=(P(None, "seq", None, None), P(None, "seq", None, None),
                  P(None, "seq", None, None), P(None, "seq")),
        out_specs=P(None, "seq", None), check_vma=False)
    got = jax.jit(f)(q, k, v, positions)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("scheme,n_seq,n_model", [
    ("fp", 4, 1), ("fp", 2, 2), ("w4a16", 4, 1), ("w4a16", 2, 4),
])
def test_sp_prefill_matches_single_device(scheme, n_seq, n_model):
    """Full-model SP (xTP) prefill: last-token logits, cache contents, and a
    decode step continued from the spliced cache all match 1-device."""
    cfg = TINY
    s, b = 16, 2
    params = llama.init_random_params(cfg, QuantConfig(scheme=scheme), seed=0)
    params_n = llama.init_random_params(cfg, QuantConfig(scheme=scheme),
                                        seed=0, tp_degree=n_model)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)

    # single-device oracle: prefill + one greedy decode step
    logits_1, cache_1 = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, ids, _cache(cfg, b), jnp.int32(0))
    tok = jnp.argmax(logits_1, -1).astype(jnp.int32)
    logits_1d, _ = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, tok[:, None], cache_1, jnp.int32(s))

    mesh = make_sp_mesh(n_seq, n_model)
    sp = shard_params(params_n, mesh)
    sc = shard_sp_cache(_cache(cfg, b, max_len=s), mesh)
    sp_fwd = make_sp_prefill(mesh)
    logits_n, cache_n = jax.jit(sp_fwd, static_argnames=("cfg",))(
        sp, cfg, ids, sc)

    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)
    assert int(cache_n.length) == s
    np.testing.assert_allclose(
        np.asarray(cache_1.k[:, :, :, :s]).astype(np.float32),
        np.asarray(cache_n.k).astype(np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(cache_1.v[:, :, :, :s]).astype(np.float32),
        np.asarray(cache_n.v).astype(np.float32), rtol=2e-2, atol=2e-2)

    # splice into a decode-sized cache and continue on one device: the SP
    # prefill artifact must be decode-ready (greedy chain unbroken)
    cache_d = jax.jit(sp_cache_into)(_cache(cfg, b), cache_n)
    logits_nd, _ = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, tok[:, None], cache_d, jnp.int32(s))
    assert (np.argmax(np.asarray(logits_1d), -1)
            == np.argmax(np.asarray(logits_nd), -1)).all()
    np.testing.assert_allclose(np.asarray(logits_1d), np.asarray(logits_nd),
                               rtol=2e-2, atol=2e-2)


def test_sp_prefill_padded_bucket():
    """Right-padded prompt bucket: true_len selects the owner shard's last
    real token; pad garbage stays beyond length, as in the dense path."""
    cfg = TINY
    s, true = 16, 11                       # last real token on shard 2 of 4
    b = 1
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s)), jnp.int32)

    logits_1, cache_1 = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, ids, _cache(cfg, b), jnp.int32(0),
        true_len=jnp.int32(true))

    mesh = make_sp_mesh(4)
    sp = shard_params(params, mesh)
    sc = shard_sp_cache(_cache(cfg, b, max_len=s), mesh)
    sp_fwd = make_sp_prefill(mesh)
    logits_n, cache_n = jax.jit(sp_fwd, static_argnames=("cfg",))(
        sp, cfg, ids, sc, true_len=jnp.int32(true))

    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)
    assert int(cache_n.length) == true
    np.testing.assert_allclose(          # real positions only — pads differ
        np.asarray(cache_1.k[:, :, :, :true]).astype(np.float32),
        np.asarray(cache_n.k[:, :, :, :true]).astype(np.float32),
        rtol=2e-2, atol=2e-2)


def test_sp_prefill_sliding_window():
    """Mistral-style sliding window must hold across shard boundaries in the
    ring masks."""
    cfg = ModelConfig(
        name="tiny-win", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=64, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5, sliding_window=6,
    )
    s, b = 24, 1
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=3)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)

    logits_1, _ = jax.jit(llama.forward, static_argnames=("cfg",))(
        params, cfg, ids, _cache(cfg, b), jnp.int32(0))

    mesh = make_sp_mesh(4)
    sp = shard_params(params, mesh)
    sc = shard_sp_cache(_cache(cfg, b, max_len=s), mesh)
    logits_n, _ = jax.jit(make_sp_prefill(mesh), static_argnames=("cfg",))(
        sp, cfg, ids, sc)
    np.testing.assert_allclose(np.asarray(logits_1), np.asarray(logits_n),
                               rtol=2e-2, atol=2e-2)


def test_sp_full_logits():
    """full_logits=True returns the seq-sharded [B, S, V] without the owner
    psum (distillation/scoring path)."""
    cfg = TINY
    s, b = 16, 1
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0)
    ids = jnp.asarray(
        np.random.default_rng(4).integers(0, cfg.vocab_size, (b, s)),
        jnp.int32)
    want, _ = jax.jit(llama.forward,
                      static_argnames=("cfg", "full_logits"))(
        params, cfg, ids, _cache(cfg, b), jnp.int32(0), full_logits=True)

    mesh = make_sp_mesh(4)
    sp = shard_params(params, mesh)
    sc = shard_sp_cache(_cache(cfg, b, max_len=s), mesh)
    got, _ = jax.jit(make_sp_prefill(mesh),
                     static_argnames=("cfg", "full_logits"))(
        sp, cfg, ids, sc, full_logits=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=2e-2, atol=2e-2)


def test_ring_attention_16k_blocked():
    """VERDICT r3 #3: the flash-blocked ring must handle 16k+ prompts — per
    hop memory is O(block_q x block_k), not O(S_loc x T) (the old dense hop
    would materialize a [B,Hkv,G,S/8,S/8] f32 score tensor per hop; at 16k
    that is the activation wall this test guards against re-growing). The
    oracle is attention_xla evaluated per query chunk (the dense oracle at
    16k would itself need an 8+ GB score tensor)."""
    b, s, hq, hkv, d = 1, 16384, 2, 1, 64
    n_seq = 8
    key = jax.random.PRNGKey(7)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, hq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, hkv, d), jnp.bfloat16)
    v = jax.random.normal(kv_, (b, s, hkv, d), jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    mesh = make_sp_mesh(n_seq)
    f = shard_map(
        lambda q, k, v, p: ring_attention(q, k, v, p, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq", None, None), P(None, "seq", None, None),
                  P(None, "seq", None, None), P(None, "seq")),
        out_specs=P(None, "seq", None), check_vma=False)
    got = np.asarray(jax.jit(f)(q, k, v, positions)).astype(np.float32)

    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    chunk = 2048
    oracle = jax.jit(attention_xla, static_argnames=())
    for q0 in range(0, s, chunk):
        want = np.asarray(oracle(
            q[:, q0:q0 + chunk], kt, vt, positions[:, q0:q0 + chunk],
            jnp.int32(s))).astype(np.float32)
        np.testing.assert_allclose(want, got[:, q0:q0 + chunk],
                                   rtol=5e-2, atol=5e-2)


def test_sp_tp_prefill_collective_structure():
    """Guard the COLLECTIVE STRUCTURE of the 2-D (seq x model) prefill the
    same way test_parallel.py guards TP decode: the lowered program must
    contain exactly the designed pattern — per layer (once, in the scan
    body text) 2 Megatron psums + 3x(n_seq-1) ring ppermutes (k, v,
    positions x 3 hops), plus 1 lm_head all-gather and 1 owner-logits psum.
    Any resharding a spec typo introduces fails here even though numerics
    tests would still pass."""
    import re

    cfg = TINY
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"),
                                      seed=0, tp_degree=2)
    mesh = make_sp_mesh(4, 2)
    sp = shard_params(params, mesh)
    sc = shard_sp_cache(_cache(cfg, 1, max_len=16), mesh)
    ids = jnp.zeros((1, 16), jnp.int32)
    txt = jax.jit(make_sp_prefill(mesh), static_argnames=("cfg",)).lower(
        sp, cfg, ids, sc).as_text()
    got = {op: len(re.findall(r"stablehlo\." + op + r"\b", txt))
           for op in ("all_reduce", "all_gather", "collective_permute",
                      "all_to_all")}
    assert got == {"all_reduce": 3, "all_gather": 1,
                   "collective_permute": 9, "all_to_all": 0}, got
