"""Paged KV cache: block-table memory management for serving.

The reference preallocates two max_sqlen-sized KV buffers per layer per model
(llm/src/nn_modules/non_cuda/Int4llamaAttention.cc:45-60) — one sequence,
worst-case sized. The slot-pool ServingEngine generalizes that to B slots but
still reserves B x max_len. This module removes the reservation entirely
(the vLLM idea, TPU-style):

- KV storage is a pool of fixed-size PAGES [L, n_pages, H_kv, page, D];
- each sequence owns a list of pages (``page_table`` row); pages are
  allocated as sequences grow and recycled the moment a request finishes;
- the paged flash-decode kernel (ops/attention.py flash_decode_paged)
  resolves page ids inside its BlockSpec index map from the scalar-prefetched
  table — page indirection costs addressing, not gathers;
- page allocation is host-side (a free list) — it changes at most once per
  decode step per sequence, never inside jit.

Capacity planning: n_pages * page_size ≈ total tokens resident, vs
slots * max_len for the slot pool — at mixed sequence lengths this is the
difference between "8 slots of 2048" and "as many requests as fit".
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PagedKVCache:
    k: jax.Array           # [L, n_pages, H_kv, page, D] (bf16 or int8)
    v: jax.Array
    k_scale: Optional[jax.Array] = None  # [L, n_pages, H_kv, page] (int8 mode)
    v_scale: Optional[jax.Array] = None

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


jax.tree_util.register_pytree_node(
    PagedKVCache,
    lambda c: ((c.k, c.v, c.k_scale, c.v_scale), None),
    lambda aux, ch: PagedKVCache(*ch),
)


def init_paged_cache(num_layers: int, n_pages: int, num_kv_heads: int,
                     page_size: int, head_dim: int, dtype=jnp.bfloat16,
                     quantized: bool = False) -> PagedKVCache:
    shape = (num_layers, n_pages, num_kv_heads, page_size, head_dim)
    if quantized:
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.ones(shape[:-1], jnp.float32),
            v_scale=jnp.ones(shape[:-1], jnp.float32))
    return PagedKVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side page free list (one per PagedKVCache)."""

    def __init__(self, n_pages: int, page_size: int, max_pages_per_seq: int):
        self.page_size = page_size
        self.max_pages_per_seq = max_pages_per_seq
        self._free = list(range(n_pages - 1, -1, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def alloc(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(f"paged KV: need {n} pages, {len(self._free)} free")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        self._free.extend(int(p) for p in pages)


# ---------------------------------------------------------------------------
# device-side writes
# ---------------------------------------------------------------------------

def paged_update_layer(cache: PagedKVCache, layer_k, layer_v, layer_idx,
                       lengths, page_table) -> PagedKVCache:
    """Decode-step write: new_k/new_v [B, 1, H_kv, D] land at each sequence's
    position lengths[b] — page page_table[b, lengths[b] // page] offset
    lengths[b] % page. One scatter per buffer (in place under donation)."""
    p = cache.page_size
    b = layer_k.shape[0]
    lengths = jnp.asarray(lengths, jnp.int32)
    page_ids = jnp.take_along_axis(
        jnp.asarray(page_table, jnp.int32), (lengths // p)[:, None],
        axis=1)[:, 0]                                         # [B]
    offs = lengths % p                                        # [B]
    kq = layer_k[:, 0].astype(cache.k.dtype)                  # [B, H, D]
    vq = layer_v[:, 0].astype(cache.v.dtype)

    # One tiny [1, 1, H, 1, D] dynamic_update_slice PER ROW (B is the slot
    # count — small and static), same as the dense _update_layer_per_slot.
    # The r1-r4 form was a batched `.at[layer, pages, :, offs].set` scatter
    # across rows, which TPU lowers to a SERIALIZED full-buffer
    # read-modify-write per row — the r5 paged probe billed it ~200 ms/tick
    # (34.7 tok/s on bench_serving --paged vs 576 dense).
    def write(buf, val):  # buf [L, P, H, page, D]; val [B, H, D]
        for r in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, val[r][None, None, :, None, :],
                (layer_idx, page_ids[r], 0, offs[r], 0))
        return buf

    def write_scale(buf, val):  # buf [L, P, H, page]; val [B, H]
        for r in range(b):
            buf = jax.lax.dynamic_update_slice(
                buf, val[r][None, None, :, None],
                (layer_idx, page_ids[r], 0, offs[r]))
        return buf

    if cache.quantized:
        from tinychatengine_tpu.generation.kv_cache import _quantize_kv
        kq8, ks = _quantize_kv(layer_k.transpose(0, 2, 1, 3))  # [B,H,1,D]
        vq8, vs = _quantize_kv(layer_v.transpose(0, 2, 1, 3))
        return PagedKVCache(
            k=write(cache.k, kq8[:, :, 0, :]),
            v=write(cache.v, vq8[:, :, 0, :]),
            k_scale=write_scale(cache.k_scale, ks[:, :, 0]),
            v_scale=write_scale(cache.v_scale, vs[:, :, 0]))
    return PagedKVCache(k=write(cache.k, kq), v=write(cache.v, vq),
                        k_scale=cache.k_scale, v_scale=cache.v_scale)


def insert_prefix(cache: PagedKVCache, scratch_k, scratch_v, page_ids,
                  scratch_k_scale=None, scratch_v_scale=None) -> PagedKVCache:
    """Splice a contiguous prefill result into allocated pages.

    scratch_k/v: [L, H, S_bucket, D] (one sequence's prefix, S_bucket a
    multiple of page_size); page_ids: [n] int32 device array with
    n = S_bucket // page_size. One [L, 1, H, p, D] dynamic_update_slice per
    PAGE (n is static) — the r1-r4 `.at[:, page_ids].set` scatter lowered to
    a serialized full-buffer read-modify-write per page on TPU (the same
    class as the paged_update_layer scatter the r5 probe caught)."""
    L, H, S, D = scratch_k.shape
    p = cache.page_size
    n = S // p
    pages_k = scratch_k.reshape(L, H, n, p, D).transpose(0, 2, 1, 3, 4)
    pages_v = scratch_v.reshape(L, H, n, p, D).transpose(0, 2, 1, 3, 4)

    def put(buf, pages):  # pages [L, n, H, p, D]
        for i in range(n):
            buf = jax.lax.dynamic_update_slice(
                buf, pages[:, i:i + 1].astype(buf.dtype),
                (0, page_ids[i], 0, 0, 0))
        return buf

    def put_scale(buf, pages):  # pages [L, n, H, p]
        for i in range(n):
            buf = jax.lax.dynamic_update_slice(
                buf, pages[:, i:i + 1], (0, page_ids[i], 0, 0))
        return buf

    k = put(cache.k, pages_k)
    v = put(cache.v, pages_v)
    ks = vs = None
    if cache.quantized:
        ks = put_scale(cache.k_scale,
                       scratch_k_scale.reshape(L, H, n, p).transpose(0, 2, 1, 3))
        vs = put_scale(cache.v_scale,
                       scratch_v_scale.reshape(L, H, n, p).transpose(0, 2, 1, 3))
    return PagedKVCache(k=k, v=v, k_scale=ks, v_scale=vs)


def gather_contiguous(cache: PagedKVCache, page_table_row, layer_idx: int):
    """Test/debug helper: materialize one sequence's contiguous K/V view
    [H, n_pages*page, D] for a layer by gathering its pages."""
    ids = jnp.asarray(page_table_row, jnp.int32)
    k = cache.k[layer_idx, ids]      # [n, H, page, D]
    v = cache.v[layer_idx, ids]
    n, h, p, d = k.shape
    k = k.transpose(1, 0, 2, 3).reshape(h, n * p, d)
    v = v.transpose(1, 0, 2, 3).reshape(h, n * p, d)
    if cache.quantized:
        ks = cache.k_scale[layer_idx, ids].transpose(1, 0, 2).reshape(h, n * p)
        vs = cache.v_scale[layer_idx, ids].transpose(1, 0, 2).reshape(h, n * p)
        k = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    return k, v
