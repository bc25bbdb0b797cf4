"""Tensor/data-parallel forward via shard_map.

Pallas kernels must see per-shard (local) shapes, so the multi-device path
wraps the model forward in ``shard_map`` over the ("data", "model") mesh
rather than relying on GSPMD auto-partitioning of the custom calls. Model
code is unchanged — it derives head counts from its (local) projection widths
and emits psum/all-gather via the ``tp_axis`` hook (models/llama.py).

Collectives per layer under TP: 2 psums (o_proj, down_proj) riding ICI —
the Megatron inference pattern; XLA overlaps them with subsequent compute.
"""

from __future__ import annotations

from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tinychatengine_tpu.generation.kv_cache import KVCache
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.parallel.sharding import cache_spec, llama_param_specs


def _cache_specs(cache):
    from tinychatengine_tpu.runtime.paged import PagedKVCache
    if isinstance(cache, PagedKVCache):
        cs = P(None, None, "model", None, None)   # [L, pages, H_kv, page, D]
        ss = P(None, None, "model", None)
        return PagedKVCache(
            k=cs, v=cs,
            k_scale=None if cache.k_scale is None else ss,
            v_scale=None if cache.v_scale is None else ss)
    cs = cache_spec()                        # [L, B, H_kv, S, D]
    ss = P(*cs[:-1])                         # scales drop the head_dim axis
    return KVCache(
        k=cs, v=cs, length=P(),
        k_scale=None if cache.k_scale is None else ss,
        v_scale=None if cache.v_scale is None else ss,
    )


def make_tp_forward(mesh: Mesh, forward=llama.forward,
                    param_specs_fn=llama_param_specs):
    """Returns a drop-in replacement for models.llama.forward that executes
    tensor-parallel over mesh axis "model" and data-parallel over "data"."""

    def tp_forward(params, cfg, input_ids, cache, start, input_embeds=None,
                   full_logits: bool = False, true_len=None, page_table=None,
                   ctx_cap=None):
        pspecs = param_specs_fn(params)
        in_specs = (pspecs, P("data", None), _cache_specs(cache), P())
        args = (params, input_ids, cache, start)
        n_extra = 0
        if input_embeds is not None:
            in_specs = in_specs + (P("data", None, None),)
            args = args + (input_embeds,)
        if true_len is not None:
            in_specs = in_specs + (P(),)
            args = args + (true_len,)
        if page_table is not None:  # replicated block tables (paged serving)
            in_specs = in_specs + (P(None, None),)
            args = args + (page_table,)

        def local(params, input_ids, cache, start, *rest):
            rest = list(rest)
            embeds = rest.pop(0) if input_embeds is not None else None
            tlen = rest.pop(0) if true_len is not None else None
            kw = {}
            if page_table is not None:  # only llama supports paged decode
                kw["page_table"] = rest.pop(0)
            return forward(params, cfg, input_ids, cache, start,
                           input_embeds=embeds, full_logits=full_logits,
                           true_len=tlen, tp_axis="model", ctx_cap=ctx_cap,
                           **kw)

        out_specs = (P("data", None, None) if full_logits else P("data", None),
                     _cache_specs(cache))
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
        return f(*args)

    return tp_forward
