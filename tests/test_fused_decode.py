"""Fused decode path (models/llama.py FUSED_DECODE): forward-level glue test.

The kernel-level composition tests live in test_int4_matmul.py; this file
forces the fused branch ON via llama.FUSED_FORCE (interpret-mode Pallas on
CPU) and checks the FULL forward wiring — norm/rope folded into the qkv
kernel, residuals into wo/down epilogues, final norm into lm_head — against
the production unfused path, for both the contiguous and the paged (serving)
decode. This is exactly the code a TPU-only eligibility gate would otherwise
leave untested on CPU (the round-2 Int4-OPT lesson)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops import int4_matmul as int4m
from tinychatengine_tpu.runtime.paged import init_paged_cache, insert_prefix

# smallest config satisfying the fused kernel's shape gates: every matmul K
# (E and F) a SUPERBLOCK multiple with K/G % 8 == 0, head_dim in {64,128,256}
FUSABLE = ModelConfig(
    name="tiny-fusable", family="llama", num_heads=8, num_kv_heads=4,
    num_layers=2, max_sqlen=64, embed_dim=1024, hidden_dim=1024,
    vocab_size=512, rms_norm_eps=1e-5, rope_theta=10000.0,
)


@pytest.fixture
def force_fused(monkeypatch):
    monkeypatch.setattr(int4m, "FUSED_DECODE", True)
    monkeypatch.setattr(int4m, "FUSED_FORCE", True)


def _rel(got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    return float(np.max(np.abs(got - want)) / (np.abs(want).max() + 1e-6))


@pytest.mark.parametrize("quantized_kv", [False, True])
def test_fused_forward_contiguous_matches_unfused(force_fused, quantized_kv):
    cfg, qcfg = FUSABLE, QuantConfig(scheme="w4a16")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1)), jnp.int32)

    def cache():
        return kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen,
                              cfg.num_kv_heads, cfg.head_dim,
                              quantized=quantized_kv)

    # prefill runs unfused either way (S > 1); decode step is the A/B
    _, c0 = llama.forward(params, cfg, ids, cache(), jnp.int32(0))
    lg_f, c_f = llama.forward(params, cfg, tok, c0, jnp.int32(6))

    int4m.FUSED_DECODE = False
    _, c1 = llama.forward(params, cfg, ids, cache(), jnp.int32(0))
    lg_u, c_u = llama.forward(params, cfg, tok, c1, jnp.int32(6))

    # logits pass through 2 layers of (interpret-Pallas vs XLA-dequant)
    # matmuls — identical math, different accumulation order: small rel tol
    assert _rel(lg_f, lg_u) < 2e-2, _rel(lg_f, lg_u)
    # the KV written at position 6 includes the IN-KERNEL rope (k) — it must
    # match the unfused ref.apply_rotary k within the same tolerance
    k_f = np.asarray(c_f.k[:, :, :, 6], np.float32)
    k_u = np.asarray(c_u.k[:, :, :, 6], np.float32)
    v_f = np.asarray(c_f.v[:, :, :, 6], np.float32)
    v_u = np.asarray(c_u.v[:, :, :, 6], np.float32)
    if quantized_kv:  # int8 codes: compare dequantized values
        k_f = k_f * np.asarray(c_f.k_scale[:, :, :, 6], np.float32)[..., None]
        k_u = k_u * np.asarray(c_u.k_scale[:, :, :, 6], np.float32)[..., None]
        v_f = v_f * np.asarray(c_f.v_scale[:, :, :, 6], np.float32)[..., None]
        v_u = v_u * np.asarray(c_u.v_scale[:, :, :, 6], np.float32)[..., None]
    assert float(np.abs(k_f - k_u).max()) < 2e-2 * (np.abs(k_u).max() + 1e-6)
    assert float(np.abs(v_f - v_u).max()) < 2e-2 * (np.abs(v_u).max() + 1e-6)


def test_fused_forward_batched_rows_independent(force_fused):
    """B=2 decode: each row's fused logits match its own B=1 run (the rope
    cos/sin operand is per-ROW — a row mixup would show instantly)."""
    cfg, qcfg = FUSABLE, QuantConfig(scheme="w4a16")
    params = llama.init_random_params(cfg, qcfg, seed=1)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 1)), jnp.int32)
    starts = jnp.asarray([3, 9], jnp.int32)  # different positions per row

    def cache(b):
        return kvc.init_cache(cfg.num_layers, b, cfg.max_sqlen,
                              cfg.num_kv_heads, cfg.head_dim)

    lg2, _ = llama.forward(params, cfg, toks, cache(2), starts)
    for r in range(2):
        lg1, _ = llama.forward(params, cfg, toks[r:r + 1], cache(1),
                               starts[r:r + 1])
        assert _rel(lg2[r:r + 1], lg1) < 1e-3, r


def test_fused_forward_paged_matches_unfused(force_fused):
    """Paged (serving) decode branch with the fused wo-residual/gate_up/down
    epilogues, against the same step unfused."""
    cfg, qcfg = FUSABLE, QuantConfig(scheme="w4a16")
    params = llama.init_random_params(cfg, qcfg, seed=2)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1)), jnp.int32)
    P = 16

    # build the paged prefix from an unfused contiguous prefill
    int4m.FUSED_DECODE = False
    c0 = kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen, cfg.num_kv_heads,
                        cfg.head_dim)
    _, c0 = llama.forward(params, cfg, ids, c0, jnp.int32(0))

    def paged():
        pc = init_paged_cache(cfg.num_layers, n_pages=8,
                              num_kv_heads=cfg.num_kv_heads, page_size=P,
                              head_dim=cfg.head_dim)
        return insert_prefix(pc, c0.k[:, 0, :, :P], c0.v[:, 0, :, :P],
                             jnp.asarray([3], jnp.int32))

    table = jnp.asarray([[3, 5]], jnp.int32)
    lengths = jnp.asarray([6], jnp.int32)

    lg_u, pc_u = llama.forward(params, cfg, tok, paged(), lengths,
                               page_table=table)
    int4m.FUSED_DECODE = True
    lg_f, pc_f = llama.forward(params, cfg, tok, paged(), lengths,
                               page_table=table)
    assert _rel(lg_f, lg_u) < 2e-2, _rel(lg_f, lg_u)
    k_f = np.asarray(pc_f.k[:, 3, :, 6], np.float32)  # page 3, offset 6
    k_u = np.asarray(pc_u.k[:, 3, :, 6], np.float32)
    assert float(np.abs(k_f - k_u).max()) < 2e-2 * (np.abs(k_u).max() + 1e-6)


def test_fused_gate_ineligible_shapes_fall_back(force_fused):
    """A non-superblock embed dim must silently use the unfused path (the
    eligibility gate, not an assert, handles it)."""
    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=32, embed_dim=256, hidden_dim=512,
        vocab_size=128, rms_norm_eps=1e-5, rope_theta=10000.0,
    )
    params = llama.init_random_params(cfg, QuantConfig(scheme="w4a16"),
                                      seed=3)
    tok = jnp.asarray([[5]], jnp.int32)
    cache = kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen,
                           cfg.num_kv_heads, cfg.head_dim)
    lg, _ = llama.forward(params, cfg, tok, cache, jnp.int32(0))
    int4m.FUSED_DECODE = False
    lg_u, _ = llama.forward(params, cfg, tok, cache, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_u))


def test_fused_forward_gptbigcode_matches_unfused(force_fused):
    """GPTBigCode (StarCoder) fused decode: LayerNorm prologues, c_attn/
    c_proj/fc biases, residual epilogues, lnf+lm_head — vs the unfused path.
    Norm weights are randomized (init's ones/zeros would mask a missing
    weight-mul or bias-add in the kernel)."""
    import dataclasses

    from tinychatengine_tpu.models import gptbigcode

    cfg = ModelConfig(
        name="tiny_sc_fusable", family="gptbigcode", num_heads=8,
        num_kv_heads=1, num_layers=2, max_sqlen=64, embed_dim=1024,
        hidden_dim=1024, vocab_size=256,
    )
    params = gptbigcode.init_random_params(cfg, seed=4,
                                           qcfg=QuantConfig(scheme="w4a16"))
    key = jax.random.PRNGKey(9)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    L, E = cfg.num_layers, cfg.embed_dim
    params = dataclasses.replace(
        params,
        layers=dataclasses.replace(
            params.layers,
            ln1_w=jax.random.normal(k1, (L, E), jnp.bfloat16) * 0.3 + 1.0,
            ln1_b=jax.random.normal(k2, (L, E), jnp.bfloat16) * 0.2,
            ln2_w=jax.random.normal(k3, (L, E), jnp.bfloat16) * 0.3 + 1.0,
            ln2_b=jax.random.normal(k4, (L, E), jnp.bfloat16) * 0.2),
        lnf_w=jax.random.normal(k5, (E,), jnp.bfloat16) * 0.3 + 1.0,
        lnf_b=jax.random.normal(k6, (E,), jnp.bfloat16) * 0.2)

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 5)), jnp.int32)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1)), jnp.int32)

    def cache():
        return kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen, 1,
                              cfg.head_dim)

    _, c0 = gptbigcode.forward(params, cfg, ids, cache(), jnp.int32(0))
    lg_f, c_f = gptbigcode.forward(params, cfg, tok, c0, jnp.int32(5))

    int4m.FUSED_DECODE = False
    _, c1 = gptbigcode.forward(params, cfg, ids, cache(), jnp.int32(0))
    lg_u, c_u = gptbigcode.forward(params, cfg, tok, c1, jnp.int32(5))

    assert _rel(lg_f, lg_u) < 2e-2, _rel(lg_f, lg_u)
    k_f = np.asarray(c_f.k[:, :, :, 5], np.float32)
    k_u = np.asarray(c_u.k[:, :, :, 5], np.float32)
    assert float(np.abs(k_f - k_u).max()) < 2e-2 * (np.abs(k_u).max() + 1e-6)
