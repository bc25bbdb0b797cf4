"""OPT decoder — FP and SmoothQuant W8A8 paths.

Replaces the reference's Fp32OPT*/Int8OPT*/Int4OPT* stacks
(llm/src/nn_modules/{Fp32,Int8,Int4}OPT*.cc). The W8A8 path follows the
Int8OPT dataflow exactly (Int8OPTAttention.cc:27-58, Int8OPTDecoderLayer.cc:24):

    LayerNormQ (fp32 LN → round → int8; ops/LayerNormQ.cc:12-52)
    → W8A8 q/k/v (y_s8 = clip(round(acc_i32*α + bias_s8*β)); ref
      kernels/ref/matmul_ref_int8.cc:11-35)
    → int8 KV cache (static scales folded into the BMM alphas)
    → BMM_S8T_S8N_F32T: logits_f32 = (q_s8 @ k_s8^T)*α_qk
    → softmax fp32 → ×127 requant → s8 probs
    → BMM_S8T_S8N_S8T: (p_s8 @ v_s8)*α_pv → s8
    → W8A8BFP32OFP32 out_proj (fp32 bias/out) + residual
    FFN: LayerNormQ → W8A8+ReLU fc1 → W8A8BFP32OFP32 fc2.

Architecture facts: learned positional embeddings with offset 2
(Int8OPTDecoder.cc:26-39), pre-LN, ReLU FFN, tied lm_head.

On TPU the s8×s8 matmuls use the int8 MXU path via
preferred_element_type=int32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.ops import ref
from tinychatengine_tpu.ops.attention import attention_xla, flash_decode, flash_prefill
from tinychatengine_tpu.ops.linear import (DenseLinear, W8A8Linear,
                                            apply_linear, row_parallel)

NEG_INF = -1e30
POS_OFFSET = 2  # OPT's learned-position quirk (Int8OPTDecoder.cc:26-39)


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
class OPTLayerParams:
    attn_ln_w: jax.Array    # LayerNorm(Q) weight [E]
    attn_ln_b: jax.Array
    q_proj: object
    k_proj: object
    v_proj: object
    out_proj: object
    final_ln_w: jax.Array   # pre-FFN LayerNorm(Q)
    final_ln_b: jax.Array
    fc1: object
    fc2: object
    qk_alpha: Optional[jax.Array] = None  # BMM_S8T_S8N_F32T alpha (int8 path)
    pv_alpha: Optional[jax.Array] = None  # BMM_S8T_S8N_S8T alpha


@_pytree
class OPTParams:
    embed_tokens: jax.Array     # [V, E]
    embed_positions: jax.Array  # [max_pos + 2, E]
    layers: OPTLayerParams      # stacked [L, ...]
    final_ln_w: jax.Array
    final_ln_b: jax.Array
    lm_head: object             # DenseLinear (tied to embed by the converter)


def _s8_requant_matmul(a_s8, b_s8, alpha, transpose_b=False):
    """s8 x s8 → i32 on the MXU, then fp32 α scaling (BMM_S8T_S8N_* core).

    b_s8 is a cache-layout tensor [B, H, T, D]."""
    eq = "bshd,bhtd->bhst" if transpose_b else "bhst,bhtd->bshd"
    acc = jnp.einsum(eq, a_s8.astype(jnp.int8), b_s8.astype(jnp.int8),
                     preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * alpha


def forward(params: OPTParams, cfg: ModelConfig, input_ids: jax.Array,
            cache: kvc.KVCache, start: jax.Array,
            full_logits: bool = False, true_len: Optional[jax.Array] = None,
            tp_axis: Optional[str] = None, input_embeds=None,
            ctx_cap: Optional[int] = None, return_hidden: bool = False):
    """Same contract as models.llama.forward. The int8/int4/fp path is
    selected by the parameter container types (static at trace time).

    Like models.llama, the layer scan iterates over ``layer_idx`` ONLY and
    streams weight tiles from the stacked HBM buffers via
    ``apply_linear(layer_idx=...)`` — consuming ``params.layers`` as scan xs
    would materialize a full per-layer weight copy each step (measured at
    35% of decode-step device time, models/llama.py:122-125). The fp/int4
    paths use the flash decode/prefill kernels (the reference's Int8OPT runs
    dense O(S_max) attention, Int8OPTAttention.cc:27-58 — the int8 path here
    keeps those requant semantics exactly, quantized probs and all)."""
    b, s = input_ids.shape
    start = jnp.asarray(start, jnp.int32)
    start_col = start[:, None] if start.ndim == 1 else start[None, None]
    positions = start_col + jnp.arange(s, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (b, s))
    if input_embeds is not None:
        # caller-supplied position-included embeddings (the PP stage
        # contract, parallel/pp.py; pre-r5 this argument was silently
        # ignored)
        x = input_embeds.astype(jnp.float32)
    else:
        x = (params.embed_tokens[input_ids].astype(jnp.float32)
             + params.embed_positions[positions + POS_OFFSET]
             .astype(jnp.float32))

    d = cfg.head_dim
    layers = params.layers  # stacked [L, ...]; indexed INSIDE the step
    int8_path = isinstance(layers.q_proj, W8A8Linear)

    def unstack(stacked, layer_idx):
        return jax.lax.dynamic_index_in_dim(stacked, layer_idx, 0,
                                            keepdims=False)

    def step(carry, layer_idx):
        x, cache = carry

        # ---- attention ----
        ln1w = unstack(layers.attn_ln_w, layer_idx)
        ln1b = unstack(layers.attn_ln_b, layer_idx)
        if int8_path:
            h = ref.layer_norm_q_ref(x, ln1w, ln1b)
        else:
            h = ref.layer_norm_ref(x, ln1w, ln1b)

        q = apply_linear(layers.q_proj, h, out_int8=int8_path,
                         layer_idx=layer_idx)
        k = apply_linear(layers.k_proj, h, out_int8=int8_path,
                         layer_idx=layer_idx)
        v = apply_linear(layers.v_proj, h, out_int8=int8_path,
                         layer_idx=layer_idx)
        hq = q.shape[-1] // d
        q = q.reshape(b, s, hq, d)
        k = k.reshape(b, s, hq, d)
        v = v.reshape(b, s, hq, d)

        cache2 = kvc.update_layer(cache, k, v, layer_idx, start)

        use_flash = (not int8_path and jax.default_backend() == "tpu"
                     and d % 128 == 0)
        use_int8_flash = (int8_path and s == 1
                          and jax.default_backend() == "tpu" and d % 128 == 0)
        if use_int8_flash:
            # length-bounded streaming decode keeping the exact
            # Int8OPTAttention dataflow (ops/attention.py int8_decode):
            # per-step KV traffic is O(context), not O(S_max) dense
            from tinychatengine_tpu.ops.attention import int8_decode
            attn = int8_decode(
                q[:, 0], cache2.k, cache2.v, layer_idx,
                jnp.broadcast_to(start + 1, (b,)),
                unstack(layers.qk_alpha, layer_idx),
                unstack(layers.pv_alpha, layer_idx))        # [B, H, D] f32
            attn_s8 = jnp.clip(jnp.round(attn), -128, 127).astype(jnp.int8)
            attn_out = row_parallel(layers.out_proj,
                                    attn_s8.reshape(b, 1, hq * d), tp_axis,
                                    layer_idx=layer_idx)
        elif int8_path:
            ck, cv = kvc.read_layer(cache2, layer_idx)  # [B, H, Smax, D]
            smax = ck.shape[2]
            qk_alpha = unstack(layers.qk_alpha, layer_idx)
            logits = _s8_requant_matmul(q, ck, qk_alpha, transpose_b=True)
            col = jnp.arange(smax)
            kv_valid = jnp.asarray(start + s).reshape(-1, 1, 1)
            allowed = (col[None, None, :] <= positions[:, :, None]) & (
                col[None, None, :] < kv_valid)
            logits = jnp.where(allowed[:, None, :, :], logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1)
            # ×127 requant of probs → s8 (Int8OPTAttention.cc dataflow)
            p_s8 = jnp.clip(jnp.round(probs * 127.0), -128, 127).astype(jnp.int8)
            pv_alpha = unstack(layers.pv_alpha, layer_idx)
            attn = _s8_requant_matmul(p_s8, cv, pv_alpha)  # [B,S,H,D] f32
            attn_s8 = jnp.clip(jnp.round(attn), -128, 127).astype(jnp.int8)
            attn_out = row_parallel(layers.out_proj,
                                    attn_s8.reshape(b, s, hq * d), tp_axis,
                                    layer_idx=layer_idx)
        elif use_flash:
            if s == 1:
                attn = flash_decode(
                    q[:, 0].astype(jnp.bfloat16), cache2.k, cache2.v,
                    layer_idx, jnp.broadcast_to(start + 1, (b,)),
                    cache2.k_scale, cache2.v_scale,
                    ctx_cap=ctx_cap).reshape(b, 1, hq * d)
            else:
                attn = flash_prefill(
                    q.astype(jnp.bfloat16), cache2.k, cache2.v, layer_idx,
                    start, start + s, cache2.k_scale, cache2.v_scale)
            attn_out = row_parallel(layers.out_proj,
                                    attn.astype(jnp.float32), tp_axis,
                                    layer_idx=layer_idx)
        else:
            ck, cv = kvc.read_layer(cache2, layer_idx)  # [B, H, Smax, D]
            smax = ck.shape[2]
            logits = jnp.einsum("bshd,bhtd->bhst", q.astype(jnp.float32),
                                ck.astype(jnp.float32)) / (d ** 0.5)
            col = jnp.arange(smax)
            kv_valid = jnp.asarray(start + s).reshape(-1, 1, 1)
            allowed = (col[None, None, :] <= positions[:, :, None]) & (
                col[None, None, :] < kv_valid)
            logits = jnp.where(allowed[:, None, :, :], logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1)
            attn = jnp.einsum("bhst,bhtd->bshd", probs, cv.astype(jnp.float32))
            attn_out = row_parallel(
                layers.out_proj, attn.reshape(b, s, hq * d).astype(jnp.float32),
                tp_axis, layer_idx=layer_idx)
        x = x + attn_out.astype(jnp.float32)

        # ---- FFN ----
        ln2w = unstack(layers.final_ln_w, layer_idx)
        ln2b = unstack(layers.final_ln_b, layer_idx)
        if int8_path:
            h2 = ref.layer_norm_q_ref(x, ln2w, ln2b)
            f = apply_linear(layers.fc1, h2, out_int8=True, relu=True,
                             layer_idx=layer_idx)
            f = row_parallel(layers.fc2, f, tp_axis, layer_idx=layer_idx)
        else:
            h2 = ref.layer_norm_ref(x, ln2w, ln2b)
            f = jnp.maximum(
                apply_linear(layers.fc1, h2, layer_idx=layer_idx)
                .astype(jnp.float32), 0.0)
            f = row_parallel(layers.fc2, f.astype(h2.dtype), tp_axis,
                             layer_idx=layer_idx)
        x = x + f.astype(jnp.float32)
        return (x, cache2), None

    (x, cache), _ = jax.lax.scan(
        step, (x, cache), jnp.arange(cfg.num_layers, dtype=jnp.int32))
    n_new = jnp.asarray(s, jnp.int32) if true_len is None else true_len
    cache = kvc.advance(cache, n_new)

    if return_hidden:  # pre-final-LN hidden states (same contract as
        return x, cache  # llama.forward — embeddings / pipeline stages)

    x = ref.layer_norm_ref(x, params.final_ln_w, params.final_ln_b)
    if not full_logits:
        x = jax.lax.dynamic_slice_in_dim(x, n_new - 1, 1, axis=1)
    logits = apply_linear(params.lm_head, x.astype(jnp.bfloat16)).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    logits = logits[..., :cfg.vocab_size]  # int4 lm_head N may be tile-padded
    return (logits if full_logits else logits[:, 0, :]), cache


def init_random_params(cfg: ModelConfig, quantized: bool = False,
                       seed: int = 0, qcfg=None) -> OPTParams:
    """Random weights (tests; real checkpoints via tools.convert_opt).

    quantized=True → W8A8 containers; qcfg with scheme w4a16/w4a8 → Int4
    containers (the reference's Int4OPT* stack, Int4OPTAttention.cc)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    scheme = getattr(qcfg, "scheme", None) if qcfg is not None else None

    def dense(k, n):
        return DenseLinear(
            weight=jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32),
            bias=jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32))

    def w8a8(k, n, alpha=0.002):
        return W8A8Linear(
            weight=jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8),
            alpha=jnp.asarray(alpha, jnp.float32),
            bias=jnp.asarray(rng.integers(-10, 10, (n,)), jnp.float32))

    def int4(k, n):
        from tinychatengine_tpu.ops.linear import (Int4A8Linear,
                                                    random_int4_linear)
        p = random_int4_linear(
            jax.random.PRNGKey(int(rng.integers(1 << 30))), k, n,
            qcfg.group_size)
        bias = jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)
        cls = Int4A8Linear if scheme == "w4a8" else type(p)
        return cls(packed=p.packed, scales=p.scales, bias=bias)

    if scheme in ("w4a16", "w4a8"):
        lin = int4
        dense = int4  # the Int4OPT stack quantizes every projection
    elif quantized:
        lin = lambda k, n: w8a8(k, n)
    else:
        lin = dense

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(OPTLayerParams(
            attn_ln_w=jnp.ones((e,), jnp.float32) * (20.0 if quantized else 1.0),
            attn_ln_b=jnp.zeros((e,), jnp.float32),
            q_proj=lin(e, e), k_proj=lin(e, e), v_proj=lin(e, e),
            out_proj=dense(e, e) if not quantized else w8a8(e, e, 0.004),
            final_ln_w=jnp.ones((e,), jnp.float32) * (20.0 if quantized else 1.0),
            final_ln_b=jnp.zeros((e,), jnp.float32),
            fc1=lin(e, f), fc2=dense(f, e) if not quantized else w8a8(f, e, 0.004),
            qk_alpha=jnp.asarray(1e-4, jnp.float32) if quantized else None,
            pv_alpha=jnp.asarray(1e-4, jnp.float32) if quantized else None,
        ))
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    embed = jnp.asarray(rng.standard_normal((v, e)) * 0.02, jnp.float32)
    if scheme in ("w4a16", "w4a8"):
        # the Int4OPT stack quantizes the (tied) head too, bias-less and
        # N-padded — mirror convert_hf_opt so checkpoint templates match
        from tinychatengine_tpu.models.llama import lmhead_padded
        from tinychatengine_tpu.ops.linear import (Int4A8Linear,
                                                    random_int4_linear)
        p = random_int4_linear(jax.random.PRNGKey(int(rng.integers(1 << 30))),
                               e, lmhead_padded(v), qcfg.group_size)
        cls = Int4A8Linear if scheme == "w4a8" else type(p)
        lm_head = cls(packed=p.packed, scales=p.scales, bias=None)
    else:
        lm_head = DenseLinear(weight=embed.T.astype(jnp.bfloat16))
    return OPTParams(
        embed_tokens=embed,
        embed_positions=jnp.asarray(
            rng.standard_normal((cfg.max_sqlen + POS_OFFSET, e)) * 0.02, jnp.float32),
        layers=layers,
        final_ln_w=jnp.ones((e,), jnp.float32),
        final_ln_b=jnp.zeros((e,), jnp.float32),
        lm_head=lm_head,
    )
