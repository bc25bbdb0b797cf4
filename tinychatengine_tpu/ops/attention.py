"""Fused flash attention over the stacked KV cache — Pallas TPU kernels.

TPU-native replacement for the reference's dense-masked attention dataflow
(QK^T BMM → +mask → inf-clamp → softmax → PV BMM,
llm/src/nn_modules/non_cuda/Int4llamaAttention.cc:288-433 + ops/BMM_F32T.cc,
ops/softmax.cc, ops/batch_add.cc). Instead of materializing [S, S_max]
logits in HBM and reading a transposed copy of the whole preallocated cache,
these kernels:

- stream K/V blocks straight from the LAYER-STACKED cache buffer
  [L, B, H_kv, S_max, D] (``layer_idx`` selects the layer inside the
  BlockSpec via scalar prefetch — the lax.scan over layers never slices a
  per-layer copy);
- run online (flash) softmax entirely in VMEM with fp32 accumulators;
- read only the VALID prefix of the cache: KV blocks past ``length`` (and,
  at prefill, past the causal diagonal) are remapped to the last needed
  block in the index map, and Mosaic's revolving-buffer pipeline skips the
  re-DMA of a repeated block — bandwidth is O(context), not O(max_len);
- GQA/MQA: at decode the q heads sharing one KV head form the rows of a
  single [G, D] MXU operand, so each KV block is fetched once per KV head
  (not once per q head);
- INT8 KV option: int8 codes are converted to bf16 in-register and the
  per-position scales multiply the [rows, block] score/prob columns — the
  in-kernel analog of BMM_S8T_S8N_* dequant (Int8OPTAttention.cc:27-58),
  at half the cache bandwidth of bf16.

The XLA fallback (attention_xla) is the correctness oracle and the CPU path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# shared flash update
# ---------------------------------------------------------------------------

def _flash_update(s, v, vs_row, m_ref, l_ref, acc_ref):
    """One online-softmax block update. s: [R, T] f32 masked scores;
    v: [T, D] bf16 or int8 codes; vs_row: [1, T] f32 or None (int8 V scales,
    applied to the prob columns so the int8→bf16 code conversion is exact)."""
    v = v.astype(jnp.bfloat16)
    m_prev = m_ref[:, :1]                                   # [R, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                         # [R, 1]
    p = jnp.exp(s - m_new)                                  # [R, T]
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :1] = m_new
    if vs_row is not None:
        p = p * vs_row
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)


def _mask_cols(s, col0: jax.Array, limit, block: int):
    """Mask score columns at absolute position >= limit. limit: [R,1] or scalar."""
    r, t = s.shape
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    return jnp.where(col < limit, s, NEG_INF)


# ---------------------------------------------------------------------------
# decode kernel: q_len == 1, rows = G query heads per KV head
# ---------------------------------------------------------------------------

def _decode_kernel(info_ref, q_ref, k_ref, v_ref, *rest, block_s: int,
                   sm_scale: float, quantized: bool, hkv: int,
                   window: int | None):
    """Grid (B, KB). One block carries ALL local KV heads ([Hkv, T, D]) so a
    2048-context decode step is ~8 grid steps of 0.5 MB DMAs instead of 64
    steps of 64 KB ones — the decode kernel is latency-bound, not FLOP-bound,
    so fewer/fatter grid steps is the whole game."""
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    length = info_ref[1 + b]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo = jnp.int32(0) if window is None else jnp.maximum(length - window, 0)

    @pl.when((j * block_s < length) & ((j + 1) * block_s > lo))
    def _block():
        # ONE MXU contraction for all heads: rows = (head, group) query
        # pairs, cols = (head, position) keys; off-diagonal head pairs are
        # masked to -inf (8x redundant MXU flops, but decode is
        # bandwidth/latency-bound — one fat dot beats Hkv thin ones).
        g = q_ref.shape[2]
        d = q_ref.shape[3]
        rows, cols = hkv * g, hkv * block_s
        q = q_ref[0].reshape(rows, d)                       # [Hkv*G, D]
        k = k_ref[0, 0].reshape(cols, d)                    # [Hkv*T, D]
        v = v_ref[0, 0].reshape(cols, d)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [rows, cols]
        vs_row = None
        if quantized:
            s = s * ks_ref[0, 0].reshape(1, cols)
            vs_row = vs_ref[0, 0].reshape(1, cols)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
        col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        col_h = col_i // block_s
        pos = j * block_s + col_i % block_s
        ok = (row_h == col_h) & (pos < length) & (pos >= lo)
        s = jnp.where(ok, s, NEG_INF)
        _flash_update(s, v, vs_row, m_ref, l_ref, acc_ref)

    @pl.when(j == nb - 1)
    def _fin():
        hg, d = acc_ref.shape
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype).reshape(
            hkv, hg // hkv, d)


@functools.partial(
    jax.jit,
    static_argnames=("block_s", "sm_scale", "window", "n_blocks",
                     "interpret"))
def _flash_decode_impl(info, q, ck, cv, ks, vs, *, block_s, sm_scale,
                       window, n_blocks=None, interpret=False):
    bq, hkv, g, d = q.shape
    smax = ck.shape[3]
    nb = n_blocks or smax // block_s
    quantized = ks is not None
    grid = (bq, nb)

    def clamp_blk(info_ref, b, j):
        last = jnp.minimum(
            jax.lax.div(jnp.maximum(info_ref[1 + b], 1) - 1, block_s), nb - 1)
        j = jnp.minimum(j, last)
        if window is not None:  # skip blocks wholly below the sliding window
            first = jax.lax.div(
                jnp.maximum(info_ref[1 + b] - window, 0), block_s)
            j = jnp.maximum(j, jnp.minimum(first, last))
        return j

    def kv_map(b, j, info_ref):
        return (info_ref[0], b, 0, clamp_blk(info_ref, b, j), 0)

    def kvs_map(b, j, info_ref):
        return (info_ref[0], b, 0, clamp_blk(info_ref, b, j))

    in_specs = [
        pl.BlockSpec((1, hkv, g, d), lambda b, j, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hkv, block_s, d), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hkv, block_s, d), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q, ck, cv]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, hkv, block_s), kvs_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, block_s), kvs_map, memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda b, j, i: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv * g, 128), jnp.float32),   # m
            pltpu.VMEM((hkv * g, 128), jnp.float32),   # l
            pltpu.VMEM((hkv * g, d), jnp.float32),     # acc
        ],
    )
    kernel = functools.partial(_decode_kernel, block_s=block_s,
                               sm_scale=sm_scale, quantized=quantized,
                               hkv=hkv, window=window)
    bytes_kv = 2 * hkv * smax * d * (1 if quantized else 2)
    cost = pl.CostEstimate(flops=2 * 2 * bq * hkv * g * smax * d,
                           bytes_accessed=bq * bytes_kv, transcendentals=bq * hkv * g * smax)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, hkv, g, d), q.dtype),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(info, *args)


def flash_decode(q: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                 layer_idx, lengths, k_scale=None, v_scale=None, *,
                 sm_scale: float | None = None, block_s: int = 512,
                 window: int | None = None, ctx_cap: int | None = None,
                 interpret: bool = False) -> jax.Array:
    """Single-step attention: q [B, Hq, D] against the stacked cache.

    cache_k/v: [L, B, H_kv, S_max, D] (bf16 or int8 with k/v_scale
    [L, B, H_kv, S_max]); layer_idx: traced scalar; lengths: [B] int32 valid
    KV lengths (keys at positions < lengths[b] participate).
    ctx_cap: optional STATIC bound on every lengths[b] (the device decode
    loop knows prompt+n_tokens at trace time). Blocks past the cap are cut
    from the grid, and short caps drop to 128-row KV blocks: at the
    default 512-row blocking a 96-token context still DMAs a full
    [Hkv, 512, D] k+v pair per layer (~2 MB); capped, it fetches only the
    128-row blocks that exist (~0.5 MB) — ~50 MB/step across 32 layers.
    Returns [B, Hq, D] in q.dtype.
    """
    b, hq, d = q.shape
    hkv, smax = cache_k.shape[2], cache_k.shape[3]
    g = hq // hkv
    block_s = min(block_s, smax)
    n_blocks = None
    if os.environ.get("TCE_NO_CTXCAP"):  # emergency kill-switch: fall back
        ctx_cap = None                   # to full-grid streaming
    if ctx_cap is not None and ctx_cap < smax:
        bs = 128 if ctx_cap <= 512 else block_s  # small-DMA short-ctx mode
        cap = min(-(-max(ctx_cap, 1) // bs) * bs, smax)
        if cap < smax or bs != block_s:
            block_s, n_blocks = bs, cap // bs
    assert smax % block_s == 0, (smax, block_s)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    info = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(lengths, jnp.int32).reshape(-1), (b,)),
    ])
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    out = _flash_decode_impl(
        info, qg, cache_k, cache_v, k_scale, v_scale,
        block_s=block_s, sm_scale=float(sm_scale), window=window,
        n_blocks=n_blocks, interpret=interpret)
    return out.reshape(b, hq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# paged decode: KV lives in pages, a per-sequence block table maps block j to
# a physical page (the vLLM idea, TPU-style: the page id comes out of a
# scalar-prefetch table inside the BlockSpec index map, so "gathering" pages
# is just DMA addressing — no gather op, no contiguous copy)
# ---------------------------------------------------------------------------

def _paged_decode_kernel(info_ref, table_ref, q_ref, k_ref, v_ref, *rest,
                         page_size: int, sm_scale: float, quantized: bool,
                         hkv: int, window: int | None):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    length = info_ref[1 + b]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # sliding window (Mistral): keys at pos < length - window do not attend
    lo = jnp.int32(0) if window is None else jnp.maximum(length - window, 0)

    @pl.when((j * page_size < length) & ((j + 1) * page_size > lo))
    def _block():
        g = q_ref.shape[2]
        d = q_ref.shape[3]
        rows, cols = hkv * g, hkv * page_size
        q = q_ref[0].reshape(rows, d)
        k = k_ref[0, 0].reshape(cols, d)
        v = v_ref[0, 0].reshape(cols, d)
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        vs_row = None
        if quantized:
            s = s * ks_ref[0, 0].reshape(1, cols)
            vs_row = vs_ref[0, 0].reshape(1, cols)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // g
        col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        col_h = col_i // page_size
        pos = j * page_size + col_i % page_size
        s = jnp.where((row_h == col_h) & (pos < length) & (pos >= lo),
                      s, NEG_INF)
        _flash_update(s, v, vs_row, m_ref, l_ref, acc_ref)

    @pl.when(j == nb - 1)
    def _fin():
        hg, d = acc_ref.shape
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype).reshape(
            hkv, hg // hkv, d)


@functools.partial(
    jax.jit, static_argnames=("page_size", "sm_scale", "window", "interpret"))
def _flash_decode_paged_impl(info, table, q, pk, pv, ks, vs, *, page_size,
                             sm_scale, window, interpret):
    bq, hkv, g, d = q.shape
    max_pages = table.shape[1]
    quantized = ks is not None
    grid = (bq, max_pages)

    def page_of(b, j, info_ref, table_ref):
        last = jnp.minimum(
            jax.lax.div(jnp.maximum(info_ref[1 + b], 1) - 1, page_size),
            max_pages - 1)
        j = jnp.minimum(j, last)
        if window is not None:  # skip pages wholly below the sliding window
            first = jax.lax.div(
                jnp.maximum(info_ref[1 + b] - window, 0), page_size)
            j = jnp.maximum(j, jnp.minimum(first, last))
        return table_ref[b, j]

    def kv_map(b, j, info_ref, table_ref):
        return (info_ref[0], page_of(b, j, info_ref, table_ref), 0, 0, 0)

    def kvs_map(b, j, info_ref, table_ref):
        return (info_ref[0], page_of(b, j, info_ref, table_ref), 0, 0)

    in_specs = [
        pl.BlockSpec((1, hkv, g, d), lambda b, j, i, t: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hkv, page_size, d), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hkv, page_size, d), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [q, pk, pv]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, hkv, page_size), kvs_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, page_size), kvs_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, g, d), lambda b, j, i, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv * g, 128), jnp.float32),
            pltpu.VMEM((hkv * g, 128), jnp.float32),
            pltpu.VMEM((hkv * g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_paged_decode_kernel, page_size=page_size,
                               sm_scale=sm_scale, quantized=quantized,
                               hkv=hkv, window=window)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, hkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(info, table, *args)


def flash_decode_paged(q: jax.Array, pages_k: jax.Array, pages_v: jax.Array,
                       layer_idx, lengths, page_table, k_scale=None,
                       v_scale=None, *, sm_scale: float | None = None,
                       window: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Single-step attention over PAGED KV storage.

    q [B, Hq, D]; pages_k/v [L, n_pages, H_kv, page_size, D]; page_table
    [B, max_pages] int32 (page_table[b, j] holds sequence b's j-th page);
    lengths [B]. Returns [B, Hq, D].
    """
    b, hq, d = q.shape
    hkv, page_size = pages_k.shape[2], pages_k.shape[3]
    g = hq // hkv
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    info = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(lengths, jnp.int32).reshape(-1), (b,)),
    ])
    qg = q.reshape(b, hkv, g, d).astype(jnp.bfloat16)
    out = _flash_decode_paged_impl(
        info, jnp.asarray(page_table, jnp.int32), qg, pages_k, pages_v,
        k_scale, v_scale, page_size=page_size, sm_scale=float(sm_scale),
        window=window, interpret=interpret)
    return out.reshape(b, hq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# prefill kernel: rows = a block of query positions for ONE query head
# ---------------------------------------------------------------------------

def _prefill_kernel(info_ref, q_ref, k_ref, v_ref, *rest, block_q: int,
                    block_s: int, sm_scale: float, quantized: bool,
                    window: int | None, n_batch: int, groups: int = 1):
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    hk = pl.program_id(1) // groups   # this query head's KV-head row
    qb = pl.program_id(2)
    j = pl.program_id(3)
    nb = pl.num_programs(3)
    # per-batch start/length (ragged prefill: serving speculative verify);
    # uniform callers broadcast the scalar into both B-blocks of info
    start, length = info_ref[1 + b], info_ref[1 + n_batch + b]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    needed = jnp.minimum(length, start + (qb + 1) * block_q)
    lo = (jnp.int32(0) if window is None else
          jnp.maximum(start + qb * block_q - window + 1, 0))

    @pl.when((j * block_s < needed) & ((j + 1) * block_s > lo))
    def _block():
        q = q_ref[0, 0]                                     # [Bq, D]
        k = k_ref[0, 0, 0]                                  # [T, D]
        v = v_ref[0, 0, 0]
        s = jax.lax.dot_general(
            q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [Bq, T]
        vs_row = None
        if quantized:
            # scale blocks carry ALL hkv rows (a (1, block_s) one-head block
            # is Mosaic-illegal when H isn't 8-aligned, and dynamic
            # sublane-start slicing silently miscompiles — PERF.md negative
            # result #5); select this query head's KV row by one-hot reduce
            hkv_rows = ks_ref.shape[2]
            sel = (jax.lax.broadcasted_iota(
                jnp.int32, (hkv_rows, block_s), 0) == hk).astype(jnp.float32)
            s = s * (ks_ref[0, 0] * sel).sum(axis=0).reshape(1, block_s)
            vs_row = (vs_ref[0, 0] * sel).sum(axis=0).reshape(1, block_s)
        # causal: key pos <= query pos; and key pos < length
        qpos = start + qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_s), 0)
        limit = jnp.minimum(qpos + 1, length)                # [Bq, T] elementwise
        col = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_s), 1)
        ok = col < limit
        if window is not None:
            ok = ok & (col > qpos - window)
        s = jnp.where(ok, s, NEG_INF)
        _flash_update(s, v, vs_row, m_ref, l_ref, acc_ref)

    @pl.when(j == nb - 1)
    def _fin():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "block_q", "block_s", "sm_scale", "window",
                     "interpret"))
def _flash_prefill_impl(info, q, ck, cv, ks, vs, *, groups, block_q, block_s,
                        sm_scale, window, interpret):
    bq, hq, sq, d = q.shape
    smax = ck.shape[3]
    nb = smax // block_s
    nqb = sq // block_q
    quantized = ks is not None
    grid = (bq, hq, nqb, nb)

    def clamp_blk(info_ref, b, qb, j):
        st, ln = info_ref[1 + b], info_ref[1 + bq + b]
        needed = jnp.minimum(ln, st + (qb + 1) * block_q)
        last = jnp.minimum(
            jax.lax.div(jnp.maximum(needed, 1) - 1, block_s), nb - 1)
        j = jnp.minimum(j, last)
        if window is not None:
            lo = jnp.maximum(st + qb * block_q - window + 1, 0)
            j = jnp.maximum(j, jnp.minimum(jax.lax.div(lo, block_s), last))
        return j

    def kv_map(b, h, qb, j, info_ref):
        return (info_ref[0], b, h // groups, clamp_blk(info_ref, b, qb, j), 0)

    def kvs_map(b, h, qb, j, info_ref):
        # full-H block (head picked in-kernel by one-hot; see _prefill_kernel)
        return (info_ref[0], b, 0, clamp_blk(info_ref, b, qb, j))

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, qb, j, i: (b, h, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, block_s, d), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, block_s, d), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q, ck, cv]
    if quantized:
        hkv = ck.shape[2]
        in_specs += [
            pl.BlockSpec((1, 1, hkv, block_s), kvs_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hkv, block_s), kvs_map,
                         memory_space=pltpu.VMEM),
        ]
        args += [ks, vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, qb, j, i: (b, h, qb, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_prefill_kernel, block_q=block_q,
                               block_s=block_s, sm_scale=sm_scale,
                               quantized=quantized, window=window,
                               n_batch=bq, groups=groups)
    cost = pl.CostEstimate(
        flops=2 * 2 * bq * hq * sq * smax * d,
        bytes_accessed=bq * hq * sq * d * 2 + 2 * bq * hq * smax * d * 2,
        transcendentals=bq * hq * sq * smax)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, hq, sq, d), q.dtype),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(info, *args)


def flash_prefill(q: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                  layer_idx, start, length, k_scale=None, v_scale=None, *,
                  sm_scale: float | None = None, block_q: int = 256,
                  block_s: int = 256, window: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """Causal attention for a prompt chunk: q [B, S, Hq, D] (positions
    start..start+S-1) against the stacked cache (which already holds the
    chunk's own K/V — the caller runs kv_cache.update_layer first).

    start/length: scalar int32 — or [B] int32 for RAGGED chunks (each batch
    row at its own offset; the serving speculative-verify path). length is
    the total valid KV length (= start + true_len). Rows past the true
    prompt length attend to the full valid prefix (never an empty row, so no
    NaNs; their outputs are discarded downstream).
    Returns [B, S, Hq * D].
    """
    b, s, hq, d = q.shape
    hkv = cache_k.shape[2]
    g = hq // hkv
    block_q = min(block_q, s)
    block_s = min(block_s, cache_k.shape[3])
    pad = (-s) % block_q
    qt = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)       # [B, Hq, S, D]
    if pad:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    info = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(start, jnp.int32).reshape(-1), (b,)),
        jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (b,)),
    ])
    out = _flash_prefill_impl(
        info, qt, cache_k, cache_v, k_scale, v_scale, groups=g,
        block_q=block_q, block_s=block_s, sm_scale=float(sm_scale),
        window=window, interpret=interpret)
    out = out[:, :, :s, :].transpose(0, 2, 1, 3)             # [B, S, Hq, D]
    return out.reshape(b, s, hq * d).astype(q.dtype)


# ---------------------------------------------------------------------------
# int8 OPT decode: length-bounded streaming attention that PRESERVES the
# Int8OPTAttention.cc dataflow (logits = (q_s8·k_s8)·α_qk → f32 softmax →
# probs ×127 requant to s8 → (p_s8·v_s8)_i32 · α_pv). The ×127 requant needs
# the GLOBAL softmax max/sum before probs can be quantized, so the kernel
# makes two passes over the valid KV prefix (phase 0: online max/sum stats;
# phase 1: exact-normalized quantized probs, i32 PV accumulation) — 2x K +
# 1x V reads of O(context) instead of the dense path's O(S_max) read +
# [B,H,S,S_max] logits materialization (llm/src/nn_modules/
# Int8OPTAttention.cc:27-58; the reference itself is dense).
# ---------------------------------------------------------------------------

def _int8_decode_kernel(info_ref, q_ref, k_ref, v_ref, alpha_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, block_s: int, h: int):
    """Grid (B, 2, NB): phase 0 accumulates flash max/sum over K blocks,
    phase 1 quantizes probs against the final stats and accumulates the
    int8 PV dot in an i32 scratch (exact: |sum p*v| <= 127*127*S)."""
    b = pl.program_id(0)
    ph = pl.program_id(1)
    j = pl.program_id(2)
    nb = pl.num_programs(2)
    length = info_ref[1 + b]
    d = q_ref.shape[2]

    @pl.when((ph == 0) & (j == 0))
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    rows, cols = h, h * block_s

    @pl.when(j * block_s < length)
    def _block():
        q = q_ref[0].reshape(rows, d)                        # int8
        k = k_ref[0, 0].reshape(cols, d)                     # int8
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * alpha_ref[0, 0]              # [H, H*T]
        row_h = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        col_h = col_i // block_s
        pos = j * block_s + col_i % block_s
        s = jnp.where((row_h == col_h) & (pos < length), s, NEG_INF)

        @pl.when(ph == 0)
        def _stats():
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, :1] = (l_ref[:, :1] * alpha
                            + jnp.sum(jnp.exp(s - m_new), axis=-1,
                                      keepdims=True))
            m_ref[:, :1] = m_new

        @pl.when(ph == 1)
        def _accum():
            # exact softmax against the FINAL stats, then the reference's
            # ×127 prob requant; masked columns exp(-inf) == 0 → p_s8 == 0
            p = jnp.exp(s - m_ref[:, :1]) / jnp.maximum(l_ref[:, :1], 1e-30)
            p_s8 = jnp.clip(jnp.round(p * 127.0), -128, 127).astype(jnp.int8)
            v = v_ref[0, 0].reshape(cols, d)                 # int8
            acc_ref[:] += jax.lax.dot_general(
                p_s8, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

    @pl.when((ph == 1) & (j == nb - 1))
    def _fin():
        o_ref[0] = (acc_ref[:].astype(jnp.float32)
                    * alpha_ref[0, 1]).reshape(h, d)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def _int8_decode_impl(info, q, ck, cv, alphas, *, block_s, interpret):
    bq, h, d = q.shape
    smax = ck.shape[3]
    nb = smax // block_s
    grid = (bq, 2, nb)

    def clamp_blk(info_ref, b, j):
        last = jnp.minimum(
            jax.lax.div(jnp.maximum(info_ref[1 + b], 1) - 1, block_s), nb - 1)
        return jnp.minimum(j, last)

    def k_map(b, ph, j, info_ref):
        return (info_ref[0], b, 0, clamp_blk(info_ref, b, j), 0)

    def v_map(b, ph, j, info_ref):
        # V is phase-1-only: during phase 0 park the index on block 0 so the
        # revolving buffer serves it without fresh DMAs (CLAUDE.md trick)
        return (info_ref[0], b, 0,
                jnp.where(ph == 0, 0, clamp_blk(info_ref, b, j)), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, d), lambda b, ph, j, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, block_s, d), k_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, block_s, d), v_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda b, ph, j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda b, ph, j, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),   # m
            pltpu.VMEM((h, 128), jnp.float32),   # l
            pltpu.VMEM((h, d), jnp.int32),       # i32 PV accumulator
        ],
    )
    kernel = functools.partial(_int8_decode_kernel, block_s=block_s, h=h)
    cost = pl.CostEstimate(flops=2 * 2 * bq * h * smax * d,
                           bytes_accessed=3 * bq * h * smax * d,
                           transcendentals=2 * bq * h * smax)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, h, d), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(info, q, ck, cv, alphas)


def int8_decode(q_s8: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                layer_idx, lengths, qk_alpha, pv_alpha, *,
                block_s: int = 512, interpret: bool = False) -> jax.Array:
    """Single-step Int8OPT attention: q_s8 [B, H, D] int8 against the int8
    stacked cache [L, B, H, S_max, D] (no scales — SmoothQuant's static
    scales live in the BMM alphas). Returns pre-requant attn f32 [B, H, D]
    == softmax((q·k)·qk_alpha) ×127-requantized, PV-dotted, ·pv_alpha."""
    b, h, d = q_s8.shape
    smax = cache_k.shape[3]
    block_s = min(block_s, smax)
    assert smax % block_s == 0, (smax, block_s)
    info = jnp.concatenate([
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.broadcast_to(jnp.asarray(lengths, jnp.int32).reshape(-1), (b,)),
    ])
    alphas = jnp.stack([jnp.asarray(qk_alpha, jnp.float32).reshape(()),
                        jnp.asarray(pv_alpha, jnp.float32).reshape(())]
                       ).reshape(1, 2)
    return _int8_decode_impl(info, q_s8, cache_k, cache_v, alphas,
                             block_s=block_s, interpret=interpret)


# ---------------------------------------------------------------------------
# XLA reference (correctness oracle + CPU fallback)
# ---------------------------------------------------------------------------

def attention_xla(q, cache_k, cache_v, positions, kv_valid_len,
                  window: int | None = None):
    """Dense masked GQA attention, new cache layout.

    q [B, S, Hq, D]; cache_k/v [B, H_kv, S_max, D] (bf16, pre-dequantized);
    positions [B, S] absolute query positions; kv_valid_len scalar or [B].
    Returns [B, S, Hq*D].
    """
    b, s, hq, d = q.shape
    hkv = cache_k.shape[1]
    groups = hq // hkv
    smax = cache_k.shape[2]

    qh = q.transpose(0, 2, 1, 3).reshape(b, hkv, groups, s, d)
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhgsd,bhtd->bhgst", qh, cache_k,
                        preferred_element_type=jnp.float32) * scale

    col = jnp.arange(smax)
    valid = jnp.asarray(kv_valid_len).reshape(-1, 1, 1)
    allowed = (col[None, None, :] <= positions[:, :, None]) & (
        col[None, None, :] < valid)                            # [B, S, Smax]
    if window is not None:  # sliding window (Mistral): keys within `window`
        allowed = allowed & (col[None, None, :] > positions[:, :, None] - window)
    logits = jnp.where(allowed[:, None, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)                    # fp32 island
    out = jnp.einsum("bhgst,bhtd->bhgsd", probs.astype(cache_v.dtype), cache_v,
                     preferred_element_type=jnp.float32)
    return (out.astype(q.dtype)
            .reshape(b, hq, s, d).transpose(0, 2, 1, 3).reshape(b, s, hq * d))


# ---------------------------------------------------------------------------
# ring attention: sequence-parallel prefill over a mesh axis
# ---------------------------------------------------------------------------

def _fit_block(size: int, want: int) -> int:
    """Largest power-of-two-ish divisor of ``size`` that is <= ``want``."""
    blk = min(want, size)
    while size % blk:
        blk //= 2
    return max(blk, 1)


def _ring_hop_blocked(qh, q_pos, kh, vh, kv_pos, m, l, acc, *, scale,
                      window, block_q: int, block_k: int):
    """Fold one ring hop's KV slice into the online-softmax state with
    O(block_q x block_k) score memory (flash blocking at the XLA level).

    qh [B, Hkv, G, S, D] bf16; kh/vh [B, Hkv, T, D]; q_pos [B, S];
    kv_pos [B, T]; m/l [B, Hkv, G, S] f32; acc [B, Hkv, G, S, D] f32.
    An outer lax.scan walks query blocks, an inner lax.scan walks KV
    chunks; chunks that are FULLY masked for the block (all keys after the
    block's last query, or all keys below its sliding window) are skipped
    via lax.cond — which also skips the whole hop on ring steps whose KV
    slice is entirely in this shard's causal future. The recurrence is the
    same as the unblocked form, so results match up to fp re-association.
    """
    b, hkv, g, s_loc, d = qh.shape
    t_len = kh.shape[2]
    bq = _fit_block(s_loc, block_q)
    bk = _fit_block(t_len, block_k)
    nq, nk = s_loc // bq, t_len // bk

    # [nq, B, Hkv, G, Bq, ...] query blocks with their softmax state
    def qblk(x, axis):
        moved = jnp.moveaxis(
            x.reshape(x.shape[:axis] + (nq, bq) + x.shape[axis + 1:]), axis, 0)
        return moved
    q_blocks = qblk(qh, 3)
    qp_blocks = jnp.moveaxis(q_pos.reshape(b, nq, bq), 1, 0)
    m_blocks, l_blocks = qblk(m, 3), qblk(l, 3)
    acc_blocks = qblk(acc, 3)

    # [nk, B, Hkv, Bk, D] KV chunks
    k_chunks = jnp.moveaxis(kh.reshape(b, hkv, nk, bk, d), 2, 0)
    v_chunks = jnp.moveaxis(vh.reshape(b, hkv, nk, bk, d), 2, 0)
    kp_chunks = jnp.moveaxis(kv_pos.reshape(b, nk, bk), 1, 0)

    def per_qblock(_, xs):
        qb, qp, mb, lb, accb = xs                   # [B,Hkv,G,Bq,(D)]
        qp_max = jnp.max(qp)
        qp_min = jnp.min(qp)

        def per_chunk(state, ys):
            kc, vc, kp = ys                         # [B,Hkv,Bk,D], [B,Bk]

            def update(state):
                mb, lb, accb = state
                s = jnp.einsum("bhgsd,bhtd->bhgst", qb, kc,
                               preferred_element_type=jnp.float32) * scale
                ok = kp[:, None, :] <= qp[:, :, None]        # [B, Bq, Bk]
                if window is not None:
                    ok &= kp[:, None, :] > qp[:, :, None] - window
                okx = ok[:, None, None, :, :]
                s = jnp.where(okx, s, NEG_INF)
                m_new = jnp.maximum(mb, jnp.max(s, axis=-1))
                # rows can still be FULLY masked: zero their exp terms
                # explicitly rather than trusting exp(NEG_INF - NEG_INF)
                corr = jnp.where(mb <= NEG_INF / 2, 0.0, jnp.exp(mb - m_new))
                p = jnp.where(okx, jnp.exp(s - m_new[..., None]), 0.0)
                lb2 = lb * corr + jnp.sum(p, axis=-1)
                accb2 = (accb * corr[..., None]
                         + jnp.einsum("bhgst,bhtd->bhgsd",
                                      p.astype(vc.dtype), vc,
                                      preferred_element_type=jnp.float32))
                return m_new, lb2, accb2

            live = jnp.min(kp) <= qp_max            # some key is not future
            if window is not None:                  # ...or all below window
                live &= jnp.max(kp) > qp_min - window
            return jax.lax.cond(live, update, lambda st: st, state), None

        (mb, lb, accb), _ = jax.lax.scan(
            per_chunk, (mb, lb, accb), (k_chunks, v_chunks, kp_chunks))
        return None, (mb, lb, accb)

    _, (m_blocks, l_blocks, acc_blocks) = jax.lax.scan(
        per_qblock, None,
        (q_blocks, qp_blocks, m_blocks, l_blocks, acc_blocks))

    def unblk(x, axis):
        moved = jnp.moveaxis(x, 0, axis)
        return moved.reshape(moved.shape[:axis] + (s_loc,)
                             + moved.shape[axis + 2:])
    return unblk(m_blocks, 3), unblk(l_blocks, 3), unblk(acc_blocks, 3)


def ring_attention(q, k, v, q_positions, axis_name: str,
                   window: int | None = None, block_q: int = 512,
                   block_k: int = 512):
    """Exact causal GQA attention with SEQUENCE-sharded Q/K/V (Ring
    Attention, Liu et al. 2023 — the TPU-native long-context prefill the
    single-device reference has no counterpart for, SURVEY §2.8).

    Each device holds one S/n slice of the freshly projected q/k/v. The KV
    slice (plus its absolute positions) rotates around the ring via
    ``lax.ppermute`` while an online-softmax accumulator (same recurrence as
    the Pallas ``_flash_update``) folds in one chunk-pair per hop; after n
    hops every query has seen every key once. Per chip: compute and KV
    residency scale 1/n, and the n-1 ICI hops of [B, S/n, H_kv, D] overlap
    with the chunk einsums (XLA schedules ppermute async).

    Each hop is FLASH-BLOCKED (``_ring_hop_blocked``): scores materialize
    only per [block_q, block_k] tile, so per-hop memory is O(block), not
    O(S_loc*T) — a 32k prompt on 8 devices peaks at the tile plus the
    O(S_loc*D) accumulator instead of a 2 GiB score tensor. Fully-causal-
    future (and wholly-below-window) chunks are skipped, which drops ~half
    of the ring's tile matmuls.

    Masking is positional (kv_pos <= q_pos, optional sliding window), so
    right-padded prompt buckets work unchanged — pad queries produce garbage
    rows that sit beyond ``true_len`` downstream, exactly like the dense
    oracle (attention_xla) semantics.

    q: [B, S_loc, Hq, D]; k/v: [B, S_loc, H_kv, D] (this shard's slice);
    q_positions: [B, S_loc] absolute positions of the local tokens (queries
    AND keys — Q and KV share the sequence sharding). Returns [B, S_loc,
    Hq*D] in q.dtype.
    """
    n = jax.lax.psum(1, axis_name)                     # static mesh-axis size
    b, s_loc, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = 1.0 / (d ** 0.5)
    qh = (q.transpose(0, 2, 1, 3).reshape(b, hkv, g, s_loc, d)
          .astype(jnp.bfloat16))
    q_pos = jnp.asarray(q_positions, jnp.int32)

    m = jnp.full((b, hkv, g, s_loc), NEG_INF, jnp.float32)
    l = jnp.zeros((b, hkv, g, s_loc), jnp.float32)
    acc = jnp.zeros((b, hkv, g, s_loc, d), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]
    k_t, v_t, pos_t = k, v, q_pos

    for t in range(n):
        kh = k_t.transpose(0, 2, 1, 3).astype(jnp.bfloat16)  # [B, Hkv, T, D]
        vh = v_t.transpose(0, 2, 1, 3)
        m, l, acc = _ring_hop_blocked(
            qh, q_pos, kh, vh, pos_t, m, l, acc, scale=scale, window=window,
            block_q=block_q, block_k=block_k)
        if t < n - 1:  # rotate: receive the left neighbour's KV chunk
            k_t = jax.lax.ppermute(k_t, axis_name, perm)
            v_t = jax.lax.ppermute(v_t, axis_name, perm)
            pos_t = jax.lax.ppermute(pos_t, axis_name, perm)

    out = acc / jnp.maximum(l[..., None], 1e-20)
    return (out.astype(q.dtype).reshape(b, hq, s_loc, d)
            .transpose(0, 2, 1, 3).reshape(b, s_loc, hq * d))
