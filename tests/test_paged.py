"""Paged KV cache: allocator, page writes, paged flash decode vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.ops.attention import attention_xla, flash_decode_paged
from tinychatengine_tpu.runtime.paged import (
    PageAllocator,
    gather_contiguous,
    init_paged_cache,
    insert_prefix,
    paged_update_layer,
)


def test_allocator_alloc_free_cycle():
    a = PageAllocator(n_pages=10, page_size=64, max_pages_per_seq=4)
    p1 = a.alloc(3)
    p2 = a.alloc(4)
    assert len(set(p1) | set(p2)) == 7 and a.n_free == 3
    a.free(p1)
    assert a.n_free == 6
    with pytest.raises(MemoryError):
        a.alloc(7)
    assert a.pages_needed(1) == 1 and a.pages_needed(65) == 2


def _fill_paged(rng, L, n_pages, H, P, D, table, lengths, quantized=False):
    """Build a paged cache whose logical sequences hold random K/V, plus the
    equivalent contiguous arrays for the oracle."""
    cache = init_paged_cache(L, n_pages, H, P, D, quantized=quantized)
    B, max_pages = table.shape
    smax = max_pages * P
    ck = np.zeros((B, H, smax, D), np.float32)
    cv = np.zeros((B, H, smax, D), np.float32)
    for b in range(B):
        n_tok = int(lengths[b])
        k = rng.standard_normal((L, H, ((n_tok + P - 1) // P) * P, D)).astype(np.float32)
        v = rng.standard_normal(k.shape).astype(np.float32)
        ids = jnp.asarray(table[b, : k.shape[2] // P], jnp.int32)
        cache = insert_prefix(cache, jnp.asarray(k, jnp.bfloat16),
                              jnp.asarray(v, jnp.bfloat16), ids)
        ck[b, :, :k.shape[2]] = k[-1]   # oracle uses the LAST layer below
        cv[b, :, :k.shape[2]] = v[-1]
    return cache, jnp.asarray(ck, jnp.bfloat16), jnp.asarray(cv, jnp.bfloat16)


def test_paged_decode_matches_oracle():
    rng = np.random.default_rng(0)
    L, H, P, D, hq = 2, 2, 64, 128, 8
    B, max_pages = 3, 4
    # non-trivial page assignment: interleaved across sequences
    table = np.asarray([[0, 3, 6, 9], [1, 4, 7, 10], [2, 5, 8, 11]], np.int32)
    lengths = np.asarray([200, 64, 37], np.int32)
    cache, ck, cv = _fill_paged(rng, L, 12, H, P, D, table, lengths)

    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    out = flash_decode_paged(q, cache.k, cache.v, jnp.int32(L - 1),
                             jnp.asarray(lengths), jnp.asarray(table),
                             interpret=True)
    for b in range(B):
        ln = int(lengths[b])
        pos = jnp.full((1, 1), ln - 1, jnp.int32)
        want = attention_xla(q[b:b + 1, None], ck[b:b + 1], cv[b:b + 1],
                             pos, ln)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out[b], np.float32).ravel(),
            np.asarray(want, np.float32).ravel(), rtol=0.05, atol=0.05)


def test_paged_decode_sliding_window():
    """Paged decode with a sliding window matches the windowed oracle
    (Mistral under paged serving — ADVICE r1: the paged kernel previously
    attended the full context)."""
    rng = np.random.default_rng(7)
    L, H, P, D, hq = 2, 2, 64, 128, 8
    B = 2
    table = np.asarray([[0, 2, 4, 6], [1, 3, 5, 7]], np.int32)
    lengths = np.asarray([230, 80], np.int32)
    cache, ck, cv = _fill_paged(rng, L, 8, H, P, D, table, lengths)

    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    for window in (64, 100, 256):
        out = flash_decode_paged(q, cache.k, cache.v, jnp.int32(L - 1),
                                 jnp.asarray(lengths), jnp.asarray(table),
                                 window=window, interpret=True)
        for b in range(B):
            ln = int(lengths[b])
            pos = jnp.full((1, 1), ln - 1, jnp.int32)
            want = attention_xla(q[b:b + 1, None], ck[b:b + 1], cv[b:b + 1],
                                 pos, ln, window=window)[:, 0]
            np.testing.assert_allclose(
                np.asarray(out[b], np.float32).ravel(),
                np.asarray(want, np.float32).ravel(), rtol=0.05, atol=0.05,
                err_msg=f"window={window} b={b}")


def test_paged_update_then_decode():
    """Token-by-token paged writes reproduce contiguous attention."""
    rng = np.random.default_rng(1)
    L, H, P, D, hq = 1, 2, 16, 128, 4
    B, max_pages = 2, 3
    table = np.asarray([[0, 2, 4], [1, 3, 5]], np.int32)
    cache = init_paged_cache(L, 6, H, P, D)

    n = 20  # crosses a page boundary
    ks = rng.standard_normal((B, n, H, D)).astype(np.float32)
    vs = rng.standard_normal((B, n, H, D)).astype(np.float32)
    for t in range(n):
        cache = paged_update_layer(
            cache, jnp.asarray(ks[:, t:t + 1], jnp.bfloat16),
            jnp.asarray(vs[:, t:t + 1], jnp.bfloat16), jnp.int32(0),
            jnp.full((B,), t, jnp.int32), jnp.asarray(table))

    q = jnp.asarray(rng.standard_normal((B, hq, D)), jnp.bfloat16)
    out = flash_decode_paged(q, cache.k, cache.v, jnp.int32(0),
                             jnp.full((B,), n, jnp.int32), jnp.asarray(table),
                             interpret=True)
    for b in range(B):
        k_seq, v_seq = gather_contiguous(cache, table[b], 0)
        np.testing.assert_allclose(
            np.asarray(k_seq[:, :n], np.float32),
            ks[b].transpose(1, 0, 2), rtol=0.02, atol=0.02)
        pos = jnp.full((1, 1), n - 1, jnp.int32)
        want = attention_xla(q[b:b + 1, None], k_seq[None], v_seq[None],
                             pos, n)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out[b], np.float32).ravel(),
            np.asarray(want, np.float32).ravel(), rtol=0.05, atol=0.05)


def test_paged_int8_kv():
    rng = np.random.default_rng(2)
    L, H, P, D, hq = 1, 2, 64, 128, 4
    table = np.asarray([[0, 1]], np.int32)
    lengths = np.asarray([100], np.int32)
    cache = init_paged_cache(L, 2, H, P, D, quantized=True)

    n = 100
    ks = rng.standard_normal((1, n, H, D)).astype(np.float32)
    vs = rng.standard_normal((1, n, H, D)).astype(np.float32)
    for t in range(n):
        cache = paged_update_layer(
            cache, jnp.asarray(ks[:, t:t + 1], jnp.bfloat16),
            jnp.asarray(vs[:, t:t + 1], jnp.bfloat16), jnp.int32(0),
            jnp.full((1,), t, jnp.int32), jnp.asarray(table))
    q = jnp.asarray(rng.standard_normal((1, hq, D)), jnp.bfloat16)
    out = flash_decode_paged(q, cache.k, cache.v, jnp.int32(0),
                             jnp.asarray(lengths), jnp.asarray(table),
                             cache.k_scale, cache.v_scale, interpret=True)
    k_seq, v_seq = gather_contiguous(cache, table[0], 0)
    pos = jnp.full((1, 1), n - 1, jnp.int32)
    want = attention_xla(q[:, None], k_seq[None], v_seq[None], pos, n)[:, 0]
    np.testing.assert_allclose(
        np.asarray(out, np.float32).ravel(),
        np.asarray(want, np.float32).ravel(), rtol=0.07, atol=0.07)
