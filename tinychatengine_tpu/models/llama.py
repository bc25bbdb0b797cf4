"""LLaMA-family decoder — functional, layer-scanned, GSPMD-shardable.

One implementation covers LLaMA 1/2/3, CodeLlama, Mistral and the LLaVA/VILA
decoder via ModelConfig (GQA head counts, rope theta, vocab), replacing the
reference's Fp32llama*/Int4llama* class stacks
(llm/src/nn_modules/non_cuda/Int4llama{Attention,DecoderLayer,Decoder,ForCausalLM}.cc).

TPU-first design decisions vs the reference:
- pure functions over parameter pytrees; precision is a property of the
  params (DenseLinear vs Int4Linear), not a separate class hierarchy.
- layers are stacked and iterated with ``lax.scan`` (one compiled layer body
  instead of 32 inlined copies).
- KV cache is a carried pytree updated in place under jit
  (generation/kv_cache.py) instead of ping-pong memcpy buffers
  (Int4llamaAttention.cc:327-387).
- causal masking is computed from positions (no dense [S,S] mask tensor
  materialized in HBM as in Int4llamaDecoder.cc:8-25).
- activations bf16, softmax/norm accumulation fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.ops import ref
from tinychatengine_tpu.ops.attention import (
    attention_xla,
    flash_decode,
    flash_decode_paged,
    flash_prefill,
    ring_attention,
)
from tinychatengine_tpu.ops.int4_matmul import SUPERBLOCK, int4_matmul_fused
from tinychatengine_tpu.ops.linear import (
    DenseLinear,
    Int4Linear,
    apply_linear,
    random_int4_linear,
)

NEG_INF = -1e30

def _fusable(p, group_size: int) -> bool:
    """The fused kernel needs an Int4Linear without bias whose K is
    superblock-tileable with f32-sublane-aligned scale rows."""
    if not isinstance(p, Int4Linear) or p.bias is not None:
        return False
    k = 2 * p.packed.shape[-2]
    return (k % SUPERBLOCK == 0 and (k // group_size) % 8 == 0
            and p.packed.shape[-1] % 128 == 0)


def _pytree(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_with_keys(
        cls,
        lambda obj: ([(jax.tree_util.GetAttrKey(f), getattr(obj, f)) for f in fields], None),
        lambda aux, ch: cls(*ch),
    )
    return cls


@_pytree
class LlamaLayerParams:
    """One decoder layer; in the full model every leaf is stacked [L, ...].

    q/k/v and gate/up are FUSED column-wise (ops/linear.py fuse_linears —
    the reference's offline qkv merge, llm/tools/llama_qkv_merger.py): one
    kernel dispatch per group instead of three/two. Under TP the fused
    layout is shard-block interleaved so each device's column slice is its
    own [q|k|v] block."""

    input_norm: jax.Array   # [E]  (RMSNorm weight)
    wqkv: object            # E -> (Hq + 2*Hkv)*D
    wo: object              # Hq*D -> E
    post_norm: jax.Array    # [E]
    wgate_up: object        # E -> 2F  (SiLU gate | up, Int4llamaDecoderLayer.cc:33-46)
    down: object            # F -> E


@_pytree
class LlamaParams:
    embed: jax.Array        # [V, E]
    layers: LlamaLayerParams  # stacked
    final_norm: jax.Array   # [E]
    lm_head: object         # E -> V
    rope_cos: jax.Array     # [max_pos, D] f32
    rope_sin: jax.Array


def forward(params: LlamaParams, cfg: ModelConfig, input_ids: jax.Array,
            cache, start: jax.Array,
            input_embeds: Optional[jax.Array] = None,
            full_logits: bool = False, true_len: Optional[jax.Array] = None,
            tp_axis: Optional[str] = None, sp_axis: Optional[str] = None,
            page_table=None, ctx_cap: Optional[int] = None,
            return_hidden: bool = False):
    """One forward pass (prefill S>1 or decode S=1).

    input_ids: [B, S] int32; start: scalar int32 = number of cached tokens.
    input_embeds: optional [B, S, E] — replaces the embedding lookup entirely
    (LLaVA image-embedding splice, Int4llamaDecoder.cc:81-92: the caller
    pre-splices text embeddings and CLIP image embeddings).
    true_len: optional scalar int32 <= S. When the prompt is right-padded to a
    jit bucket, pass the unpadded length: cache.length advances by true_len
    (pad slots hold garbage but sit beyond length, and decode overwrites them
    one by one), and the returned last-position logits are taken at
    true_len-1. Causality keeps real tokens from attending to pad slots.
    page_table: optional [B, max_pages] int32 — the cache is then a
    runtime.paged.PagedKVCache and S must be 1 (paged serving decode);
    ``start`` carries the per-sequence lengths.
    ctx_cap: optional STATIC upper bound on start+s, forwarded to the flash
    decode kernel (short-context KV-DMA trimming; see ops/attention.py).
    return_hidden: return the full pre-final-norm hidden states [B, S, E]
    instead of logits — a pipeline stage's output (parallel/pp.py runs each
    stage as a forward over its local layer stack with input_embeds in and
    hidden out; only the last stage computes the head).
    sp_axis: sequence-parallel FRESH prefill (parallel/sp.py): input_ids is
    this shard's S/n slice, ``start`` must be scalar 0, attention runs as a
    ring over the mesh axis, ``true_len`` (when given) is the GLOBAL prompt
    length, and the returned last-position logits are psum-replicated from
    the shard that owns position true_len-1.
    Returns (logits [B, V] of the LAST position — or [B, S, V] if
    full_logits — and the updated cache).
    """
    b, s = input_ids.shape
    if input_embeds is not None:
        x = input_embeds.astype(jnp.bfloat16)
    else:
        x = params.embed[input_ids].astype(jnp.bfloat16)  # gather (ops/embedding.cc:11)

    # start: scalar (uniform batch) or [B] (per-slot offsets, serving path)
    start = jnp.asarray(start, jnp.int32)
    start_col = start[:, None] if start.ndim == 1 else start[None, None]
    positions = start_col + jnp.arange(s, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (b, s))
    if sp_axis is not None:  # this shard's slice of the global sequence
        positions = positions + jax.lax.axis_index(sp_axis) * s

    # RoPE cos/sin are position-dependent but layer-INdependent: gather them
    # once here instead of 32 times inside the scan (the reference re-reads
    # its rotary cache per layer, ops/RotaryPosEmb.cc:7).
    cos = params.rope_cos[positions].astype(jnp.float32)   # [B, S, D]
    sin = params.rope_sin[positions].astype(jnp.float32)

    layers = params.layers  # stacked [L, ...]; indexed INSIDE the step so the
    # Pallas kernels stream tiles from the stacked HBM buffers directly —
    # consuming scan xs slices would materialize a per-layer weight copy
    # (measured at 35% of decode-step device time).

    # decode fast path eligibility (static at trace time); applies to both
    # the contiguous and the paged (serving) decode — the norm/rope/residual
    # fusions are independent of the KV layout
    from tinychatengine_tpu.ops import int4_matmul as int4m
    fused = (int4m.FUSED_DECODE and s == 1
             and cfg.head_dim in (64, 128, 256)  # rope epilogue tiling
             and (jax.default_backend() == "tpu" or int4m.FUSED_FORCE))
    interp = jax.default_backend() != "tpu"  # forced-on CPU tests interpret
    if fused:
        gs = (layers.wqkv.group_size if isinstance(layers.wqkv, Int4Linear)
              else 0)
        fused = gs > 0 and all(
            _fusable(p, gs) for p in (layers.wqkv, layers.wo,
                                      layers.wgate_up, layers.down))
        # pack-time-padded K (packing.padded_ic, llama-2-family hidden dims)
        # can't fuse: the in-kernel norm would run over the zero-padded x
        fused = fused and all(
            2 * p.packed.shape[-2] == k_in for p, k_in in
            ((layers.wqkv, cfg.embed_dim), (layers.wo, cfg.embed_dim),
             (layers.wgate_up, cfg.embed_dim), (layers.down, cfg.hidden_dim)))

    def step(carry, layer_idx):
        x, cache = carry
        d = cfg.head_dim

        def norm_w(stacked):
            return jax.lax.dynamic_index_in_dim(stacked, layer_idx, 0,
                                                keepdims=False)

        ratio = cfg.num_heads // cfg.num_kv_heads
        if fused:  # norm folded into the qkv kernel prologue, RoPE into its
            # epilogue (both were standalone [1, E] XLA kernels per layer)
            hkv_w = layers.wqkv.packed.shape[-1] // (d * (ratio + 2))
            qkv = int4_matmul_fused(
                x, layers.wqkv.packed, layers.wqkv.scales, gs,
                layer_idx=layer_idx, norm_w=layers.input_norm,
                norm_eps=cfg.rms_norm_eps,
                rope_cos=cos[:, 0], rope_sin=sin[:, 0],
                rope_qk_cols=(ratio + 1) * hkv_w * d, head_dim=d,
                interpret=interp)
        else:
            h = ref.rms_norm_ref(x, norm_w(layers.input_norm),
                                 cfg.rms_norm_eps)
            # head counts derived from projection widths so the same code
            # runs unsharded and inside shard_map with a tensor-parallel head
            # slice (the local fused block is [q_local | k_local | v_local])
            qkv = apply_linear(layers.wqkv, h, layer_idx=layer_idx)
        hkv = qkv.shape[-1] // (d * (ratio + 2))
        hq = ratio * hkv
        q = qkv[..., :hq * d].reshape(b, s, hq, d)
        k = qkv[..., hq * d:(hq + hkv) * d].reshape(b, s, hkv, d)
        v = qkv[..., (hq + hkv) * d:].reshape(b, s, hkv, d)
        if not fused:
            q, k = ref.apply_rotary(q, k, cos, sin)

        if page_table is not None:  # paged serving decode (S == 1)
            from tinychatengine_tpu.runtime import paged as pg
            cache2 = pg.paged_update_layer(cache, k, v, layer_idx, start,
                                           page_table)
            if jax.default_backend() == "tpu" and d % 128 == 0:
                attn = flash_decode_paged(
                    q[:, 0], cache2.k, cache2.v, layer_idx, start + 1,
                    page_table, cache2.k_scale, cache2.v_scale,
                    window=cfg.sliding_window).reshape(b, 1, hq * d)
            else:  # gather pages into a contiguous view, dense oracle
                ids = jnp.asarray(page_table, jnp.int32)        # [B, MP]
                ck = cache2.k[layer_idx][ids]                   # [B,MP,H,P,D]
                cv = cache2.v[layer_idx][ids]
                B_, MP, H_, P_, D_ = ck.shape
                ck = ck.transpose(0, 2, 1, 3, 4).reshape(B_, H_, MP * P_, D_)
                cv = cv.transpose(0, 2, 1, 3, 4).reshape(B_, H_, MP * P_, D_)
                if cache2.quantized:
                    ks = cache2.k_scale[layer_idx][ids].transpose(
                        0, 2, 1, 3).reshape(B_, H_, MP * P_)
                    vs = cache2.v_scale[layer_idx][ids].transpose(
                        0, 2, 1, 3).reshape(B_, H_, MP * P_)
                    ck = (ck.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
                    cv = (cv.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
                attn = attention_xla(q, ck, cv, positions, start + 1,
                                     window=cfg.sliding_window)
            if fused and tp_axis is None:
                x2 = int4_matmul_fused(attn.astype(x.dtype), layers.wo.packed,
                                       layers.wo.scales, gs,
                                       layer_idx=layer_idx, residual=x,
                                       interpret=interp)
                gu_ = int4_matmul_fused(
                    x2, layers.wgate_up.packed, layers.wgate_up.scales, gs,
                    layer_idx=layer_idx, norm_w=layers.post_norm,
                    norm_eps=cfg.rms_norm_eps, interpret=interp)
            else:
                attn = apply_linear(layers.wo, attn.astype(x.dtype),
                                    layer_idx=layer_idx)
                if tp_axis is not None:
                    attn = jax.lax.psum(attn, tp_axis)
                x2 = x + attn
                h2_ = ref.rms_norm_ref(x2, norm_w(layers.post_norm),
                                       cfg.rms_norm_eps)
                gu_ = apply_linear(layers.wgate_up, h2_, layer_idx=layer_idx)
            fl = gu_.shape[-1] // 2
            act_ = (jax.nn.silu(gu_[..., :fl].astype(jnp.float32))
                    * gu_[..., fl:].astype(jnp.float32)).astype(x2.dtype)
            if fused and tp_axis is None:
                return (int4_matmul_fused(act_, layers.down.packed,
                                          layers.down.scales, gs,
                                          layer_idx=layer_idx, residual=x2,
                                          interpret=interp),
                        cache2), None
            mlp_ = apply_linear(layers.down, act_, layer_idx=layer_idx)
            if tp_axis is not None:
                mlp_ = jax.lax.psum(mlp_, tp_axis)
            return (x2 + mlp_, cache2), None

        cache2 = kvc.update_layer(cache, k, v, layer_idx, start)

        use_flash = jax.default_backend() == "tpu" and d % 128 == 0
        win = cfg.sliding_window
        if sp_axis is not None:
            # sequence-parallel prefill: attention is a ring over the mesh
            # axis on the freshly projected local q/k/v (the cache holds
            # nothing prior — fresh prefill only); masking is positional so
            # right-padded buckets behave like the dense oracle
            attn = ring_attention(q, k, v, positions, sp_axis, window=win)
        elif use_flash:
            # Pallas flash kernels stream the raw stacked cache (int8 codes
            # dequantized in-kernel); O(context) HBM traffic, no transposes.
            if s == 1:
                attn = flash_decode(
                    q[:, 0], cache2.k, cache2.v, layer_idx,
                    jnp.broadcast_to(start + 1, (b,)),
                    cache2.k_scale, cache2.v_scale,
                    window=win, ctx_cap=ctx_cap).reshape(b, 1, hq * d)
            else:
                attn = flash_prefill(
                    q, cache2.k, cache2.v, layer_idx, start, start + s,
                    cache2.k_scale, cache2.v_scale, window=win)
        else:
            ck, cv = kvc.read_layer(cache2, layer_idx)
            attn = attention_xla(q, ck, cv, positions, start + s, window=win)
        if fused and tp_axis is None:  # residual add in the o-proj epilogue
            x = int4_matmul_fused(attn.astype(x.dtype), layers.wo.packed,
                                  layers.wo.scales, gs, layer_idx=layer_idx,
                                  residual=x, interpret=interp)
        else:  # under TP the psum must run BEFORE the residual add
            attn = apply_linear(layers.wo, attn.astype(x.dtype),
                                layer_idx=layer_idx)
            if tp_axis is not None:  # row-parallel o_proj partial sums
                attn = jax.lax.psum(attn, tp_axis)
            x = x + attn

        if fused:
            gu = int4_matmul_fused(
                x, layers.wgate_up.packed, layers.wgate_up.scales, gs,
                layer_idx=layer_idx, norm_w=layers.post_norm,
                norm_eps=cfg.rms_norm_eps, interpret=interp)
        else:
            h2 = ref.rms_norm_ref(x, norm_w(layers.post_norm),
                                  cfg.rms_norm_eps)
            gu = apply_linear(layers.wgate_up, h2, layer_idx=layer_idx)
        f_local = gu.shape[-1] // 2
        gated = jax.nn.silu(gu[..., :f_local].astype(jnp.float32))
        upd = gu[..., f_local:].astype(jnp.float32)
        act = (gated * upd).astype(x.dtype)
        if fused and tp_axis is None:
            x = int4_matmul_fused(act, layers.down.packed, layers.down.scales,
                                  gs, layer_idx=layer_idx, residual=x,
                                  interpret=interp)
        else:
            mlp = apply_linear(layers.down, act, layer_idx=layer_idx)
            if tp_axis is not None:  # row-parallel down_proj partial sums
                mlp = jax.lax.psum(mlp, tp_axis)
            x = x + mlp
        return (x, cache2), None

    n_layers = cfg.num_layers
    (x, cache), _ = jax.lax.scan(
        step, (x, cache), jnp.arange(n_layers, dtype=jnp.int32))
    n_new = jnp.asarray(s, jnp.int32) if true_len is None else true_len
    if sp_axis is not None and true_len is None:
        n_new = n_new * jax.lax.psum(1, sp_axis)  # global prompt length
    ragged = n_new.ndim == 1  # per-ROW true lengths [B]: batched ragged
    # prefill (r5 batched admission) — each row's last real position is
    # gathered per row; the cache length advances by the longest row (the
    # caller owns per-row lengths host-side, serving._admit_batch)

    if page_table is None:
        cache = kvc.advance(cache, jnp.max(n_new) if ragged else n_new)

    if return_hidden:
        return x, cache

    sp_owner = None
    if not full_logits:
        # last *real* position only — avoids the reference's full-sequence
        # lm_head waste (Int4llamaForCausalLM.cc:48-51)
        if sp_axis is not None:
            # the global last token lives on shard (n_new-1)//s_loc; every
            # shard computes a 1-token lm_head on its candidate, the owner's
            # row is selected by the psum below
            sp_owner = (n_new - 1) // s
            local_ix = jnp.clip(n_new - 1 - sp_owner * s, 0, s - 1)
            x = jax.lax.dynamic_slice_in_dim(x, local_ix, 1, axis=1)
        elif ragged:
            x = jnp.take_along_axis(x, (n_new - 1)[:, None, None], axis=1)
        else:
            x = jax.lax.dynamic_slice_in_dim(x, n_new - 1, 1, axis=1)
    if fused and isinstance(params.lm_head, Int4Linear) \
            and _fusable(params.lm_head, params.lm_head.group_size):
        logits = int4_matmul_fused(
            x, params.lm_head.packed, params.lm_head.scales,
            params.lm_head.group_size, norm_w=params.final_norm,
            norm_eps=cfg.rms_norm_eps, interpret=interp).astype(jnp.float32)
    else:
        x = ref.rms_norm_ref(x, params.final_norm, cfg.rms_norm_eps)
        logits = apply_linear(params.lm_head, x).astype(jnp.float32)
    if tp_axis is not None:  # column-parallel lm_head → full vocab for sampling
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    # lm_head N may be padded to a tile-friendly width (LMHEAD_PAD) — the
    # pad columns are dead weight rows sliced off here, never sampled
    logits = logits[..., :cfg.vocab_size]
    if sp_owner is not None:  # replicate the owner shard's last-token logits
        mine = sp_owner == jax.lax.axis_index(sp_axis)
        logits = jax.lax.psum(jnp.where(mine, logits, 0.0), sp_axis)
    return (logits if full_logits else logits[:, 0, :]), cache


def init_random_params(cfg: ModelConfig, qcfg: QuantConfig, seed: int = 0,
                       max_pos: Optional[int] = None,
                       fast: bool = False, tp_degree: int = 1) -> LlamaParams:
    """Random weights in the right structure (bench + tests; real checkpoints
    via tools.convert). fast=True generates packed bytes directly on device
    (layout-only fidelity — use for perf benchmarks of big models).
    tp_degree: shard-interleave the fused qkv/gate-up columns for an
    n-way tensor-parallel mesh (1 = single device)."""
    import numpy as np

    from tinychatengine_tpu.ops.linear import fuse_linears, random_int4_linear_fast

    key = jax.random.PRNGKey(seed)
    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    hq, hkv, d, nl = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    max_pos = max_pos or cfg.max_sqlen

    def lin(key, k, n):
        if qcfg.scheme in ("w4a16", "w4a8"):
            if fast:
                p = random_int4_linear_fast(key, k, n, qcfg.group_size,
                                            scale_dtype=qcfg.scale_dtype)
            else:
                p = random_int4_linear(key, k, n, qcfg.group_size,
                                       scale_dtype=qcfg.scale_dtype)
            if qcfg.scheme == "w4a8":
                from tinychatengine_tpu.ops.linear import Int4A8Linear
                p = Int4A8Linear(packed=p.packed, scales=p.scales, bias=p.bias)
            return p
        w = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.02
        return DenseLinear(weight=w)

    def stack_layers():
        keys = jax.random.split(key, nl * 7 + 1)
        layers = []
        for i in range(nl):
            ks = keys[i * 7:(i + 1) * 7]
            layers.append(LlamaLayerParams(
                input_norm=jnp.ones((e,), jnp.bfloat16),
                wqkv=fuse_linears([lin(ks[0], e, hq * d),
                                   lin(ks[1], e, hkv * d),
                                   lin(ks[2], e, hkv * d)], tp_degree),
                wo=lin(ks[3], hq * d, e),
                post_norm=jnp.ones((e,), jnp.bfloat16),
                wgate_up=fuse_linears([lin(ks[4], e, f), lin(ks[5], e, f)],
                                      tp_degree),
                down=lin(ks[6], f, e),
            ))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    cos, sin = ref.make_rope_cache(d, max_pos, cfg.rope_theta)
    if fast:
        embed = jax.random.normal(jax.random.PRNGKey(seed + 2), (v, e),
                                  jnp.bfloat16) * 0.02
    else:
        rng = np.random.default_rng(seed)
        embed = jnp.asarray(rng.standard_normal((v, e)) * 0.02, jnp.bfloat16)
    return LlamaParams(
        embed=embed,
        layers=stack_layers(),
        final_norm=jnp.ones((e,), jnp.bfloat16),
        lm_head=lin(jax.random.PRNGKey(seed + 1), e, lmhead_padded(v)),
        rope_cos=cos, rope_sin=sin,
    )


LMHEAD_PAD = 2048  # pad vocab N to a 2048 multiple: an awkward N (128256 →
# block_n 768, 334 grid steps) costs ~3x on the VPU-bound lm_head GEMV;
# forward slices logits back to vocab_size


def lmhead_padded(v: int) -> int:
    return ((v + LMHEAD_PAD - 1) // LMHEAD_PAD) * LMHEAD_PAD
