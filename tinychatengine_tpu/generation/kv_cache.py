"""KV cache — functional, preallocated, jit-shaped.

Replaces the reference's per-layer ping-pong buffers + memcpy concat
(llm/src/nn_modules/non_cuda/Int4llamaAttention.cc:45-60,327-387) with a
single stacked device array updated in place under jit via
``lax.dynamic_update_slice`` (XLA aliases the donated buffer, so decode
appends are true in-place writes, no copy of past context).

Layout: [num_layers, batch, num_kv_heads, max_len, head_dim] — layer-stacked
so the decoder can ``lax.scan`` over layers; kv-heads BEFORE sequence so (a) a
``model``-axis sharding of heads also shards the cache and (b) the minor two
dims of any (layer, batch, head) slice are [seq_block, head_dim] — exactly the
sublane×lane tile the Pallas flash-attention kernels stream (a seq-major
layout would make each cached position its own (1, 128) tile, an 8x DMA
waste).

Supports bf16 (default) and int8 (per-position absmax scale) storage — the
INT8 KV option mirrors the Int8OPT int8 KV cache semantics
(llm/src/nn_modules/Int8OPTAttention.cc:27-58) generalized to all models.
Scales are stored [L, B, H, S_max] (seq on lanes) so the attention kernels
can fetch a [seq_block] scale row per KV block.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class KVCache:
    k: jax.Array  # [L, B, H_kv, S_max, D] (bf16 or int8)
    v: jax.Array
    length: jax.Array  # scalar int32: number of valid positions
    k_scale: Optional[jax.Array] = None  # [L, B, H_kv, S_max] f32 (int8 mode)
    v_scale: Optional[jax.Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v, c.length, c.k_scale, c.v_scale), None),
    lambda aux, ch: KVCache(*ch),
)


def init_cache(num_layers: int, batch: int, max_len: int, num_kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
    if quantized:
        return KVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            length=jnp.zeros((), jnp.int32),
            k_scale=jnp.ones(shape[:-1], jnp.float32),
            v_scale=jnp.ones(shape[:-1], jnp.float32),
        )
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   length=jnp.zeros((), jnp.int32))


def _quantize_kv(x: jax.Array):
    """Per (head, position) symmetric int8: scale = absmax/127 over head_dim.

    x: [B, H, S, D] → (q int8 [B, H, S, D], scale f32 [B, H, S])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    return q, scale[..., 0]


def update_layer(cache: KVCache, layer_k: jax.Array, layer_v: jax.Array,
                 layer_idx, start: jax.Array) -> KVCache:
    """Write new_k/new_v [B, S_new, H_kv, D] into layer ``layer_idx`` at
    position ``start``. Returns the updated cache (same buffers under jit
    donation). Does NOT advance ``length`` — call advance() once per step.

    ``start`` may be a scalar (all rows at the same offset — the single-
    request engine) or a [B] vector (each batch row at its own offset — the
    continuous-batching serving path, where slots hold different sequence
    lengths)."""
    layer_k = layer_k.transpose(0, 2, 1, 3)  # [B, H, S_new, D]
    layer_v = layer_v.transpose(0, 2, 1, 3)
    start = jnp.asarray(start, jnp.int32)
    if start.ndim == 1:
        return _update_layer_per_slot(cache, layer_k, layer_v, layer_idx, start)
    if cache.quantized:
        qk, sk = _quantize_kv(layer_k)
        qv, sv = _quantize_kv(layer_v)
        k = jax.lax.dynamic_update_slice(
            cache.k, qk[None], (layer_idx, 0, 0, start, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, qv[None], (layer_idx, 0, 0, start, 0))
        ks = jax.lax.dynamic_update_slice(
            cache.k_scale, sk[None], (layer_idx, 0, 0, start))
        vs = jax.lax.dynamic_update_slice(
            cache.v_scale, sv[None], (layer_idx, 0, 0, start))
        return KVCache(k=k, v=v, length=cache.length, k_scale=ks, v_scale=vs)
    k = jax.lax.dynamic_update_slice(
        cache.k, layer_k[None].astype(cache.k.dtype), (layer_idx, 0, 0, start, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, layer_v[None].astype(cache.v.dtype), (layer_idx, 0, 0, start, 0))
    return KVCache(k=k, v=v, length=cache.length,
                   k_scale=cache.k_scale, v_scale=cache.v_scale)


def _update_layer_per_slot(cache: KVCache, layer_k, layer_v, layer_idx,
                           starts: jax.Array) -> KVCache:
    """Ragged write: row b of [B, H, S_new, D] lands at position starts[b].

    One tiny 5-D dynamic_update_slice PER ROW straight into the (donated)
    stacked buffer — a [1, 1, H, S_new, D] touched-region write. The r3
    form (index out the whole layer, vmap a per-row update, write the
    whole layer back) lowered to a full-layer read-modify-write: the r4
    serving device trace billed it ~180 us x 32 layers x {k,v} ~= 7 ms of
    a 23 ms decode tick. B is the slot count (small, static), so the
    unrolled row loop stays a handful of ~us-scale copies."""
    def write(buf, new):  # buf [L, B, H, S, D]; new [B, H, S_new, D]
        new = new.astype(buf.dtype)
        for b in range(new.shape[0]):
            buf = jax.lax.dynamic_update_slice(
                buf, new[None, b:b + 1], (layer_idx, b, 0, starts[b], 0))
        return buf

    def write_scale(buf, new):  # buf [L, B, H, S]; new [B, H, S_new]
        for b in range(new.shape[0]):
            buf = jax.lax.dynamic_update_slice(
                buf, new[None, b:b + 1], (layer_idx, b, 0, starts[b]))
        return buf

    if cache.quantized:
        qk, sk = _quantize_kv(layer_k)
        qv, sv = _quantize_kv(layer_v)
        return KVCache(k=write(cache.k, qk), v=write(cache.v, qv),
                       length=cache.length,
                       k_scale=write_scale(cache.k_scale, sk),
                       v_scale=write_scale(cache.v_scale, sv))
    return KVCache(k=write(cache.k, layer_k), v=write(cache.v, layer_v),
                   length=cache.length, k_scale=cache.k_scale,
                   v_scale=cache.v_scale)


def read_layer(cache: KVCache, layer_idx):
    """Full-length K/V views [B, H_kv, S_max, D] for a layer, dequantized to
    bf16 if int8 (the Pallas attention kernels instead read the raw stacked
    buffers and dequantize in-kernel; positions beyond ``length`` must be
    masked by the consumer)."""
    k = cache.k[layer_idx]
    v = cache.v[layer_idx]
    if cache.quantized:
        k = (k.astype(jnp.float32) * cache.k_scale[layer_idx][..., None]
             ).astype(jnp.bfloat16)
        v = (v.astype(jnp.float32) * cache.v_scale[layer_idx][..., None]
             ).astype(jnp.bfloat16)
    return k, v


def advance(cache: KVCache, n: jax.Array) -> KVCache:
    return KVCache(k=cache.k, v=cache.v, length=cache.length + n,
                   k_scale=cache.k_scale, v_scale=cache.v_scale)
