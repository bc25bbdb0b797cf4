"""Sequence-parallel (ring-attention) prefill over a ("seq", "model") mesh.

Long-context prefill is the one phase whose per-chip cost grows O(S²) with
the prompt; the single-device reference simply eats it (SURVEY §2.8 — no
distribution at all). TPU-native answer: shard the PROMPT over the mesh's
"seq" axis. Each chip embeds and projects its S/n slice, attention runs as
a ring (ops/attention.ring_attention — KV chunks rotate via ``ppermute``
over ICI while an online-softmax accumulator folds one chunk-pair per hop),
and everything else in the layer is per-token and needs no communication.
Per chip: activations, KV residency and matmul FLOPs all scale 1/n; the ICI
traffic is (n-1) hops of the local [B, S/n, H_kv, D] KV slice, overlapped
with the chunk einsums.

Composes with tensor parallelism on the second mesh axis: heads/columns
shard over "model" exactly as parallel/tp.py (the ring only ever names
"seq"), giving a 2-D prefill mesh for prompts that exceed one chip either
in time (seq) or in weight residency (model).

The artifacts come back ready for decode: last-real-token logits
(psum-replicated from the shard owning position true_len-1) and the filled
prefill cache, which ``sp_cache_into`` splices into a standard decode cache
(XLA inserts the all-gather/reshard on the sharding boundary).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinychatengine_tpu.generation.kv_cache import KVCache
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.parallel.sharding import llama_param_specs


def make_sp_mesh(n_seq: int, n_model: int = 1, devices=None) -> Mesh:
    """("seq", "model") mesh: ring attention over seq, Megatron TP over
    model. Lay seq along the outer device axis so ring hops ride ICI
    neighbours."""
    devices = devices if devices is not None else jax.devices()
    assert n_seq * n_model <= len(devices), (n_seq, n_model, len(devices))
    dev = np.asarray(devices[: n_seq * n_model]).reshape(n_seq, n_model)
    return Mesh(dev, ("seq", "model"))


def _sp_cache_specs(cache: KVCache):
    cs = P(None, None, "model", "seq", None)   # [L, B, H_kv, S, D]
    ss = P(None, None, "model", "seq")
    return KVCache(
        k=cs, v=cs, length=P(),
        k_scale=None if cache.k_scale is None else ss,
        v_scale=None if cache.v_scale is None else ss,
    )


def shard_sp_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """Place a PREFILL-sized cache (max_len == prompt bucket S) with its
    sequence axis sharded over "seq" (and heads over "model")."""
    specs = _sp_cache_specs(cache)
    return jax.tree.map(
        lambda x, s: None if x is None else jax.device_put(
            x, NamedSharding(mesh, s)),
        cache, specs, is_leaf=lambda x: x is None)


def make_sp_prefill(mesh: Mesh, forward=llama.forward,
                    param_specs_fn=llama_param_specs):
    """Returns sp_prefill(params, cfg, input_ids, cache, true_len=None,
    full_logits=False) -> (logits, cache): a fresh-prompt prefill running
    sequence-parallel over mesh axis "seq" (+ tensor-parallel over "model"
    when that axis is >1).

    Constraints: ``cache.max_len == S`` (the seq-sharded chunks must tile
    the cache contiguously — splice into the decode cache with
    ``sp_cache_into``), S divisible by the seq axis, scalar start of 0
    (fresh prefill; the ring sees only this call's K/V).
    """
    n_seq = mesh.shape["seq"]
    tp = mesh.shape["model"] > 1

    def sp_prefill(params, cfg, input_ids, cache, true_len=None,
                   full_logits: bool = False):
        b, s = input_ids.shape
        assert s % n_seq == 0, (s, n_seq)
        assert cache.max_len == s, \
            f"SP prefill cache must be prompt-sized ({cache.max_len} != {s})"
        pspecs = param_specs_fn(params)
        in_specs = (pspecs, P(None, "seq"), _sp_cache_specs(cache))
        args = (params, input_ids, cache)
        if true_len is not None:
            in_specs += (P(),)
            args += (jnp.asarray(true_len, jnp.int32),)

        def local(params, ids, cache, *rest):
            tlen = rest[0] if true_len is not None else None
            return forward(params, cfg, ids, cache, jnp.int32(0),
                           true_len=tlen, full_logits=full_logits,
                           sp_axis="seq", tp_axis="model" if tp else None)

        out_specs = (P(None, "seq", None) if full_logits else P(None, None),
                     _sp_cache_specs(cache))
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        return f(*args)

    return sp_prefill


def sp_cache_into(dst: KVCache, src: KVCache) -> KVCache:
    """Splice a (sequence-sharded) prefill cache into a decode cache at
    position 0. Under jit the sharding boundary becomes the one all-gather
    that moves the prefill KV into the decode layout; lengths carry over."""
    assert dst.quantized == src.quantized
    assert dst.max_len >= src.max_len, (dst.max_len, src.max_len)
    zero5 = (0, 0, 0, 0, 0)
    k = jax.lax.dynamic_update_slice(dst.k, src.k.astype(dst.k.dtype), zero5)
    v = jax.lax.dynamic_update_slice(dst.v, src.v.astype(dst.v.dtype), zero5)
    ks = vs = None
    if dst.quantized:
        zero4 = (0, 0, 0, 0)
        ks = jax.lax.dynamic_update_slice(dst.k_scale, src.k_scale, zero4)
        vs = jax.lax.dynamic_update_slice(dst.v_scale, src.v_scale, zero4)
    return KVCache(k=k, v=v, length=src.length, k_scale=ks, v_scale=vs)
