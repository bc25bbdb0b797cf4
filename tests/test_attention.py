"""Flash attention Pallas kernels vs the XLA dense oracle (interpret mode).

Mirrors the reference's fast-kernel-vs-naive-reference test pattern
(kernels/matmul_int4.cc golden loops checked by tests/non_cuda/test_ops.cc):
attention_xla is the naive oracle, the Pallas kernels are the fast path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.ops.attention import (
    attention_xla,
    flash_decode,
    flash_prefill,
)


def _mk_cache(rng, L, B, H, S, D, quantized=False):
    cache = kvc.init_cache(L, B, S, H, D, quantized=quantized)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    for li in range(L):
        cache = kvc.update_layer(cache, k, v, li, jnp.int32(0))
    return kvc.advance(cache, jnp.int32(S))


@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 4), (8, 1)])
def test_flash_decode_matches_xla(hq, hkv):
    rng = np.random.default_rng(0)
    L, B, S, D = 3, 2, 512, 128
    cache = _mk_cache(rng, L, B, hkv, S, D)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)

    for li in (0, 2):
        for length in (1, 100, 512):
            lengths = jnp.full((B,), length, jnp.int32)
            out = flash_decode(q, cache.k, cache.v, jnp.int32(li), lengths,
                               interpret=True)
            ck, cv = kvc.read_layer(cache, li)
            pos = jnp.full((B, 1), length - 1, jnp.int32)
            want = attention_xla(q[:, None], ck, cv, pos, length)[:, 0]
            np.testing.assert_allclose(
                np.asarray(out, np.float32),
                np.asarray(want.reshape(B, hq * D), np.float32).reshape(B, hq, D),
                rtol=0.05, atol=0.05)


def test_flash_decode_ragged_batch_lengths():
    rng = np.random.default_rng(1)
    L, B, hq, hkv, S, D = 2, 3, 4, 2, 256, 128
    cache = _mk_cache(rng, L, B, hkv, S, D)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([7, 130, 256], jnp.int32)

    out = flash_decode(q, cache.k, cache.v, jnp.int32(1), lengths,
                       interpret=True)
    ck, cv = kvc.read_layer(cache, 1)
    for b in range(B):
        pos = jnp.full((1, 1), int(lengths[b]) - 1, jnp.int32)
        want = attention_xla(q[b:b + 1, None], ck[b:b + 1], cv[b:b + 1], pos,
                             int(lengths[b]))[:, 0]
        np.testing.assert_allclose(
            np.asarray(out[b], np.float32).ravel(),
            np.asarray(want, np.float32).ravel(), rtol=0.05, atol=0.05)


def test_flash_decode_int8_kv():
    rng = np.random.default_rng(2)
    L, B, hq, hkv, S, D = 2, 1, 8, 2, 256, 128
    cache = _mk_cache(rng, L, B, hkv, S, D, quantized=True)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([200], jnp.int32)

    out = flash_decode(q, cache.k, cache.v, jnp.int32(0), lengths,
                       cache.k_scale, cache.v_scale, interpret=True)
    ck, cv = kvc.read_layer(cache, 0)  # dequantized oracle view
    pos = jnp.full((B, 1), 199, jnp.int32)
    want = attention_xla(q[:, None], ck, cv, pos, 200)[:, 0]
    np.testing.assert_allclose(
        np.asarray(out, np.float32).ravel(),
        np.asarray(want, np.float32).ravel(), rtol=0.07, atol=0.07)


@pytest.mark.parametrize("start,true_s", [(0, 256), (100, 100), (0, 100)])
def test_flash_prefill_matches_xla(start, true_s):
    """Prefill (incl. chunked prefill with past context and q padded to a
    jit bucket) matches the dense-masked oracle on the real rows."""
    rng = np.random.default_rng(3)
    L, B, hq, hkv, D = 2, 2, 8, 2, 128
    S_max, s_bucket = 512, 256
    cache = _mk_cache(rng, L, B, hkv, S_max, D)
    q = jnp.asarray(rng.standard_normal((B, s_bucket, hq, D)), jnp.bfloat16)

    length = start + true_s
    out = flash_prefill(q, cache.k, cache.v, jnp.int32(1), jnp.int32(start),
                        jnp.int32(length), interpret=True, block_q=128,
                        block_s=128)
    ck, cv = kvc.read_layer(cache, 1)
    pos = start + jnp.arange(s_bucket, dtype=jnp.int32)[None, :]
    pos = jnp.broadcast_to(pos, (B, s_bucket))
    want = attention_xla(q, ck, cv, pos, length)
    np.testing.assert_allclose(
        np.asarray(out[:, :true_s], np.float32),
        np.asarray(want[:, :true_s], np.float32), rtol=0.05, atol=0.05)


def test_flash_prefill_int8_kv():
    rng = np.random.default_rng(4)
    L, B, hq, hkv, D, S = 2, 1, 4, 1, 128, 256
    cache = _mk_cache(rng, L, B, hkv, S, D, quantized=True)
    q = jnp.asarray(rng.standard_normal((B, 128, hq, D)), jnp.bfloat16)

    out = flash_prefill(q, cache.k, cache.v, jnp.int32(0), jnp.int32(0),
                        jnp.int32(128), cache.k_scale, cache.v_scale,
                        interpret=True, block_q=128, block_s=128)
    ck, cv = kvc.read_layer(cache, 0)
    pos = jnp.arange(128, dtype=jnp.int32)[None, :]
    want = attention_xla(q, ck, cv, pos, 128)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=0.07, atol=0.07)


def test_prefill_then_decode_equivalence():
    """Decode path (token-by-token) reproduces prefill attention outputs —
    the reference's 1st/2nd golden-pair KV-cache test pattern
    (tests/non_cuda/test_Int4llamaForCausalLM.cc:18-50), kernel-level."""
    rng = np.random.default_rng(5)
    L, B, hq, hkv, D, S_max = 1, 1, 4, 2, 128, 256
    n = 8
    ks = jnp.asarray(rng.standard_normal((B, n, hkv, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, n, hkv, D)), jnp.bfloat16)
    qs = jnp.asarray(rng.standard_normal((B, n, hq, D)), jnp.bfloat16)

    # prefill all at once
    cache_a = kvc.init_cache(L, B, S_max, hkv, D)
    cache_a = kvc.update_layer(cache_a, ks, vs, 0, jnp.int32(0))
    out_pre = flash_prefill(qs, cache_a.k, cache_a.v, jnp.int32(0),
                            jnp.int32(0), jnp.int32(n), interpret=True,
                            block_q=8, block_s=128)

    # decode one token at a time
    cache_b = kvc.init_cache(L, B, S_max, hkv, D)
    outs = []
    for t in range(n):
        cache_b = kvc.update_layer(cache_b, ks[:, t:t + 1], vs[:, t:t + 1],
                                   0, jnp.int32(t))
        o = flash_decode(qs[:, t], cache_b.k, cache_b.v, jnp.int32(0),
                         jnp.asarray([t + 1], jnp.int32), interpret=True)
        outs.append(o.reshape(B, hq * D))
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, axis=1), np.float32),
        np.asarray(out_pre, np.float32), rtol=0.05, atol=0.05)


def test_sliding_window_decode():
    """Mistral-style windowed attention (beyond the reference, which ignores
    the window — SURVEY.md §5): only the last `window` keys participate."""
    rng = np.random.default_rng(7)
    L, B, hq, hkv, S, D = 2, 2, 8, 2, 512, 128
    cache = _mk_cache(rng, L, B, hkv, S, D)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    lengths = jnp.asarray([300, 64], jnp.int32)
    win = 128

    out = flash_decode(q, cache.k, cache.v, jnp.int32(1), lengths,
                       window=win, interpret=True, block_s=128)
    ck, cv = kvc.read_layer(cache, 1)
    for b in range(B):
        ln = int(lengths[b])
        pos = jnp.full((1, 1), ln - 1, jnp.int32)
        want = attention_xla(q[b:b + 1, None], ck[b:b + 1], cv[b:b + 1],
                             pos, ln, window=win)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out[b], np.float32).ravel(),
            np.asarray(want, np.float32).ravel(), rtol=0.05, atol=0.05)


def test_sliding_window_prefill():
    rng = np.random.default_rng(8)
    L, B, hq, hkv, D, S_max = 1, 1, 4, 2, 128, 512
    s_q, start, win = 256, 100, 96
    cache = _mk_cache(rng, L, B, hkv, S_max, D)
    q = jnp.asarray(rng.standard_normal((B, s_q, hq, D)), jnp.bfloat16)

    out = flash_prefill(q, cache.k, cache.v, jnp.int32(0), jnp.int32(start),
                        jnp.int32(start + s_q), window=win, interpret=True,
                        block_q=128, block_s=128)
    ck, cv = kvc.read_layer(cache, 0)
    pos = start + jnp.arange(s_q, dtype=jnp.int32)[None, :]
    want = attention_xla(q, ck, cv, jnp.broadcast_to(pos, (B, s_q)),
                         start + s_q, window=win)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_int8_decode_matches_dense_dataflow():
    """Length-bounded int8 OPT decode kernel (ops/attention.py int8_decode)
    vs the dense Int8OPTAttention.cc dataflow: logits=(q·k)·α_qk → f32
    softmax → ×127 requant → (p_s8·v_s8)·α_pv. Ragged per-batch lengths."""
    rng = np.random.default_rng(3)
    L, B, H, S, D = 2, 2, 4, 512, 128
    ck_all = rng.integers(-127, 128, (L, B, H, S, D)).astype(np.int8)
    cv_all = rng.integers(-127, 128, (L, B, H, S, D)).astype(np.int8)
    q = jnp.asarray(rng.integers(-127, 128, (B, H, D)), jnp.int8)
    qk_alpha, pv_alpha = 1.7e-4, 2.3e-3

    for li in range(L):
        lengths = np.asarray([37, 512], np.int32)
        got = np.asarray(
            __import__("tinychatengine_tpu.ops.attention",
                       fromlist=["int8_decode"]).int8_decode(
                q, jnp.asarray(ck_all), jnp.asarray(cv_all), jnp.int32(li),
                jnp.asarray(lengths), qk_alpha, pv_alpha, interpret=True),
            np.float32)

        # dense oracle (the exact model-code formula, models/opt.py int8 path)
        for b in range(B):
            n = int(lengths[b])
            kk = ck_all[li, b, :, :n].astype(np.float32)      # [H, n, D]
            vv = cv_all[li, b, :, :n].astype(np.float32)
            qq = np.asarray(q, np.float32)[b]                 # [H, D]
            s = np.einsum("hd,hnd->hn", qq, kk) * qk_alpha
            p = np.exp(s - s.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            p127 = np.clip(np.round(p * 127.0), -128, 127)
            want = np.einsum("hn,hnd->hd", p127, vv) * pv_alpha
            np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=5e-3)


def test_flash_prefill_ragged_starts():
    """Per-batch start/length prefill (the serving speculative-verify
    shape): each row attends causally from ITS OWN offset; must match the
    XLA oracle row by row."""
    rng = np.random.default_rng(5)
    L, B, H, S, D, sq = 2, 3, 2, 256, 128, 8
    cache = _mk_cache(rng, L, B, H, S, D)
    q = jnp.asarray(rng.standard_normal((B, sq, 4, D)), jnp.bfloat16)
    starts = jnp.asarray([0, 37, 100], jnp.int32)

    out = flash_prefill(q, cache.k, cache.v, jnp.int32(1), starts,
                        starts + sq, interpret=True)
    ck, cv = kvc.read_layer(cache, 1)
    positions = starts[:, None] + jnp.arange(sq)[None, :]
    want = attention_xla(q, ck, cv, positions, (starts + sq)[:, None, None])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_flash_decode_ctx_cap_matches_uncapped():
    """ctx_cap trims the streamed grid (and drops to 128-row blocks for
    short caps) without changing results, for lengths at/below the cap."""
    import jax

    from tinychatengine_tpu.ops.attention import flash_decode

    rng = np.random.default_rng(7)
    L, B, H, S, D, hq = 2, 2, 2, 2048, 128, 4
    ck = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    for lengths, cap in (([96, 40], 336), ([500, 512], 512),
                         ([1, 2], 64), ([700, 300], 1024)):
        lv = jnp.asarray(lengths, jnp.int32)
        want = flash_decode(q, ck, cv, jnp.int32(1), lv, interpret=True)
        got = flash_decode(q, ck, cv, jnp.int32(1), lv, ctx_cap=cap,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=3e-2, atol=3e-2), (lengths, cap)


def test_flash_decode_ctx_cap_sliding_window():
    import jax

    from tinychatengine_tpu.ops.attention import flash_decode

    rng = np.random.default_rng(8)
    L, B, H, S, D, hq = 1, 1, 2, 1024, 128, 4
    ck = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, B, H, S, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    lv = jnp.asarray([300], jnp.int32)
    want = flash_decode(q, ck, cv, jnp.int32(0), lv, window=128,
                        interpret=True)
    got = flash_decode(q, ck, cv, jnp.int32(0), lv, window=128, ctx_cap=320,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
