"""GSPMD mesh + sharding rules — the multi-device layer.

The reference has NO distribution (SURVEY.md §2.8: pthread pool intra-op only,
no MPI/NCCL/sockets). This module is the TPU-native replacement for both: a
``("data", "model")`` mesh where

- the ``model`` axis tensor-parallelizes weights and KV heads over ICI
  (column-parallel q/k/v/gate/up, row-parallel o/down — GSPMD inserts the
  psum/all-gathers that Megatron-style TP implies),
- the ``data`` axis batch-parallelizes independent sequences (multi-host DCN).

Everything is expressed as PartitionSpecs on the parameter/cache pytrees and
applied with jax.device_put + jit sharding propagation (pjit); no explicit
collectives in model code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinychatengine_tpu.models.llama import LlamaLayerParams, LlamaParams
from tinychatengine_tpu.ops.linear import (
    DenseLinear,
    Int4A8Linear,
    Int4Linear,
    W8A8Linear,
)


def make_mesh(n_data: int = 1, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def _linear_spec(p, shard_axis: str, logical_k: int | None = None):
    """PartitionSpec pytree for one (possibly layer-stacked) linear.

    shard_axis: "col" → shard output features N on "model" (q/k/v/gate/up);
                "row" → shard input features K on "model" (o/down).
    logical_k: the model's true input width for a row-parallel linear —
    rejects even-slice K sharding of pack-time-padded weights (see below).
    Works for both [K, N]-shaped leaves and stacked [L, K, N]: the spec names
    the trailing two axes and pads leading axes with None.
    """
    def spec(leaf, k_axis_shard, n_axis_shard):
        nd = leaf.ndim if hasattr(leaf, "ndim") else 2
        lead = (None,) * (nd - 2)
        return P(*lead, k_axis_shard, n_axis_shard)

    col = shard_axis == "col"
    if isinstance(p, (Int4Linear, Int4A8Linear)):
        if not col and logical_k is not None \
                and 2 * p.packed.shape[-2] != logical_k:
            # row-parallel shards the packed K axis by even slicing; with
            # pack-time K padding (packing.padded_ic — llama-2-family
            # hidden dims) the pad sits at the END of K, so an even split
            # would misalign every later shard's weight rows against its x
            # slice: silently wrong. Such models need per-shard conversion
            # (quantize each K/tp slice separately) for row-parallel TP.
            raise ValueError(
                f"row-parallel TP over pack-time-padded K "
                f"({2 * p.packed.shape[-2]} stored vs logical {logical_k}): "
                f"convert per-shard instead")
        return type(p)(
            packed=spec(p.packed, None if col else "model", "model" if col else None),
            scales=spec(p.scales, None if col else "model", "model" if col else None),
            bias=None if p.bias is None else P(*((None,) * (p.bias.ndim - 1)),
                                               "model" if col else None),
        )
    if isinstance(p, DenseLinear):
        return DenseLinear(
            weight=spec(p.weight, None if col else "model", "model" if col else None),
            bias=None if p.bias is None else P(*((None,) * (p.bias.ndim - 1)),
                                               "model" if col else None),
        )
    if isinstance(p, W8A8Linear):
        return W8A8Linear(
            weight=spec(p.weight, None if col else "model", "model" if col else None),
            alpha=P(),
            bias=None if p.bias is None else P(*((None,) * (p.bias.ndim - 1)),
                                               "model" if col else None),
        )
    raise TypeError(type(p))


def llama_param_specs(params: LlamaParams) -> LlamaParams:
    """Megatron-style TP specs for the LLaMA parameter pytree."""
    def norm_spec(leaf):
        return P(*((None,) * leaf.ndim))

    layers = params.layers
    embed_dim = params.embed.shape[-1]
    # down-proj logical K = hidden_dim, recoverable from gate_up's N (=2h);
    # wo logical K = embed_dim — both catch pack-time-padded K before an
    # even row-parallel slice silently misaligns shards
    hidden = getattr(layers.wgate_up, "weight",
                     getattr(layers.wgate_up, "packed", None)).shape[-1] // 2
    layer_specs = LlamaLayerParams(
        input_norm=norm_spec(layers.input_norm),
        wqkv=_linear_spec(layers.wqkv, "col"),
        wo=_linear_spec(layers.wo, "row", logical_k=embed_dim),
        post_norm=norm_spec(layers.post_norm),
        wgate_up=_linear_spec(layers.wgate_up, "col"),
        down=_linear_spec(layers.down, "row", logical_k=hidden),
    )
    return LlamaParams(
        embed=P(None, None),  # replicated (gather-heavy; revisit with V-sharding)
        layers=layer_specs,
        final_norm=norm_spec(params.final_norm),
        lm_head=_linear_spec(params.lm_head, "col"),
        rope_cos=P(None, None),
        rope_sin=P(None, None),
    )


def opt_param_specs(params) -> "object":
    """Megatron TP specs for the OPT pytree (MHA: heads divide evenly)."""
    from tinychatengine_tpu.models.opt import OPTLayerParams, OPTParams

    def norm_spec(leaf):
        return P(*((None,) * leaf.ndim))

    ly = params.layers
    layer_specs = OPTLayerParams(
        attn_ln_w=norm_spec(ly.attn_ln_w), attn_ln_b=norm_spec(ly.attn_ln_b),
        q_proj=_linear_spec(ly.q_proj, "col"),
        k_proj=_linear_spec(ly.k_proj, "col"),
        v_proj=_linear_spec(ly.v_proj, "col"),
        out_proj=_linear_spec(ly.out_proj, "row"),
        final_ln_w=norm_spec(ly.final_ln_w), final_ln_b=norm_spec(ly.final_ln_b),
        fc1=_linear_spec(ly.fc1, "col"),
        fc2=_linear_spec(ly.fc2, "row"),
        qk_alpha=None if ly.qk_alpha is None else norm_spec(ly.qk_alpha),
        pv_alpha=None if ly.pv_alpha is None else norm_spec(ly.pv_alpha),
    )
    return OPTParams(
        embed_tokens=P(None, None), embed_positions=P(None, None),
        layers=layer_specs,
        final_ln_w=norm_spec(params.final_ln_w),
        final_ln_b=norm_spec(params.final_ln_b),
        lm_head=_linear_spec(params.lm_head, "col"),
    )


def cache_spec() -> P:
    """KV cache [L, B, H_kv, S, D]: batch on data, kv-heads on model."""
    return P(None, "data", "model", None, None)


def shard_params(params, mesh: Mesh, specs_fn=None):
    specs_fn = specs_fn or llama_param_specs
    specs = specs_fn(params)
    return jax.tree.map(
        lambda x, s: None if x is None else jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: x is None)


def shard_cache(cache, mesh: Mesh):
    ns = NamedSharding(mesh, cache_spec())
    scalar = NamedSharding(mesh, P())
    from tinychatengine_tpu.generation.kv_cache import KVCache
    return KVCache(
        k=jax.device_put(cache.k, ns), v=jax.device_put(cache.v, ns),
        length=jax.device_put(cache.length, scalar),
        k_scale=None if cache.k_scale is None else jax.device_put(
            cache.k_scale, NamedSharding(mesh, P(*cache_spec()[:-1]))),
        v_scale=None if cache.v_scale is None else jax.device_put(
            cache.v_scale, NamedSharding(mesh, P(*cache_spec()[:-1]))),
    )


def shard_paged_cache(cache, mesh: Mesh):
    """Paged KV pages sharded on KV heads over the model axis."""
    from tinychatengine_tpu.runtime.paged import PagedKVCache
    cs = NamedSharding(mesh, P(None, None, "model", None, None))
    ss = NamedSharding(mesh, P(None, None, "model", None))
    return PagedKVCache(
        k=jax.device_put(cache.k, cs), v=jax.device_put(cache.v, cs),
        k_scale=None if cache.k_scale is None else jax.device_put(cache.k_scale, ss),
        v_scale=None if cache.v_scale is None else jax.device_put(cache.v_scale, ss))
