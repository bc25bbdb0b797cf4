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
from tinychatengine_tpu.ops.linear import (
    DenseLinear,
    Int4Linear,
    apply_linear,
    random_int4_linear,
)

NEG_INF = -1e30


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
    """One decoder layer; in the full model every leaf is stacked [L, ...]."""

    input_norm: jax.Array   # [E]  (RMSNorm weight)
    wq: object              # E -> Hq*D
    wk: object              # E -> Hkv*D
    wv: object              # E -> Hkv*D
    wo: object              # Hq*D -> E
    post_norm: jax.Array    # [E]
    gate: object            # E -> F   (SiLU gate, Int4llamaDecoderLayer.cc:33-46)
    up: object              # E -> F
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
            cache: kvc.KVCache, start: jax.Array,
            input_embeds: Optional[jax.Array] = None,
            full_logits: bool = False):
    """One forward pass (prefill S>1 or decode S=1).

    input_ids: [B, S] int32; start: scalar int32 = number of cached tokens.
    input_embeds: optional [B, S, E] — replaces the embedding lookup entirely
    (LLaVA image-embedding splice, Int4llamaDecoder.cc:81-92: the caller
    pre-splices text embeddings and CLIP image embeddings).
    Returns (logits [B, V] of the LAST position — or [B, S, V] if
    full_logits — and the updated cache).
    """
    b, s = input_ids.shape
    if input_embeds is not None:
        x = input_embeds.astype(jnp.bfloat16)
    else:
        x = params.embed[input_ids].astype(jnp.bfloat16)  # gather (ops/embedding.cc:11)

    positions = start + jnp.arange(s, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (b, s))

    # RoPE is applied to q and k inside the scan via closure on rope caches.
    cos, sin = params.rope_cos, params.rope_sin

    def step(carry, layer_and_idx):
        x, cache = carry
        layer, layer_idx = layer_and_idx
        hq, hkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        h = ref.rms_norm_ref(x, layer.input_norm, cfg.rms_norm_eps)
        q = apply_linear(layer.wq, h).reshape(b, s, hq, d)
        k = apply_linear(layer.wk, h).reshape(b, s, hkv, d)
        v = apply_linear(layer.wv, h).reshape(b, s, hkv, d)
        q, k = ref.rotary_embed_ref(q, k, cos, sin, positions)

        cache2 = kvc.update_layer(cache, k, v, layer_idx, start)
        ck, cv = kvc.read_layer(cache2, layer_idx)

        attn = _dense_attention(cfg, q, ck, cv, positions, start + s)
        attn = apply_linear(layer.wo, attn.astype(x.dtype))
        x = x + attn

        h2 = ref.rms_norm_ref(x, layer.post_norm, cfg.rms_norm_eps)
        gated = jax.nn.silu(apply_linear(layer.gate, h2).astype(jnp.float32))
        upd = apply_linear(layer.up, h2).astype(jnp.float32)
        mlp = apply_linear(layer.down, (gated * upd).astype(h2.dtype))
        x = x + mlp
        return (x, cache2), None

    n_layers = cfg.num_layers
    (x, cache), _ = jax.lax.scan(
        step, (x, cache),
        (params.layers, jnp.arange(n_layers, dtype=jnp.int32)))
    cache = kvc.advance(cache, jnp.asarray(s, jnp.int32))

    x = ref.rms_norm_ref(x, params.final_norm, cfg.rms_norm_eps)
    if not full_logits:
        x = x[:, -1:, :]
    logits = apply_linear(params.lm_head, x).astype(jnp.float32)
    return (logits if full_logits else logits[:, 0, :]), cache


def _dense_attention(cfg: ModelConfig, q, cache_k, cache_v, positions,
                     kv_valid_len):
    """GQA masked attention over the full cache (q [B, S, Hq, D])."""
    b, s, hq, d = q.shape
    hkv = cfg.num_kv_heads
    groups = hq // hkv
    smax = cache_k.shape[1]

    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(b, hkv, groups, s, d)
    kf = cache_k.astype(jnp.float32).transpose(0, 2, 1, 3)
    vf = cache_v.astype(jnp.float32).transpose(0, 2, 1, 3)

    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bhgsd,bhtd->bhgst", qf, kf) * scale

    col = jnp.arange(smax)
    allowed = (col[None, None, :] <= positions[:, :, None]) & (
        col[None, None, :] < kv_valid_len)                    # [B, S, Smax]
    logits = jnp.where(allowed[:, None, None, :, :], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgst,bhtd->bhgsd", probs, vf)
    return out.reshape(b, hq, s, d).transpose(0, 2, 1, 3).reshape(b, s, hq * d)


def init_random_params(cfg: ModelConfig, qcfg: QuantConfig, seed: int = 0,
                       max_pos: Optional[int] = None) -> LlamaParams:
    """Random weights in the right structure (bench + tests; real checkpoints
    via tools.convert)."""
    import numpy as np

    key = jax.random.PRNGKey(seed)
    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    hq, hkv, d, nl = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    max_pos = max_pos or cfg.max_sqlen

    def lin(key, k, n):
        if qcfg.scheme == "w4a16":
            return random_int4_linear(key, k, n, qcfg.group_size)
        w = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.02
        return DenseLinear(weight=w)

    def stack_layers():
        keys = jax.random.split(key, nl * 7 + 1)
        layers = []
        for i in range(nl):
            ks = keys[i * 7:(i + 1) * 7]
            layers.append(LlamaLayerParams(
                input_norm=jnp.ones((e,), jnp.bfloat16),
                wq=lin(ks[0], e, hq * d), wk=lin(ks[1], e, hkv * d),
                wv=lin(ks[2], e, hkv * d), wo=lin(ks[3], hq * d, e),
                post_norm=jnp.ones((e,), jnp.bfloat16),
                gate=lin(ks[4], e, f), up=lin(ks[5], e, f), down=lin(ks[6], f, e),
            ))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    cos, sin = ref.make_rope_cache(d, max_pos, cfg.rope_theta)
    rng = np.random.default_rng(seed)
    embed = jnp.asarray(rng.standard_normal((v, e)) * 0.02, jnp.bfloat16)
    return LlamaParams(
        embed=embed,
        layers=stack_layers(),
        final_norm=jnp.ones((e,), jnp.bfloat16),
        lm_head=lin(jax.random.PRNGKey(seed + 1), e, v),
        rope_cos=cos, rope_sin=sin,
    )
