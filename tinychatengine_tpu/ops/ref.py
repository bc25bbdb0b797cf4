"""Naive jnp reference ops — the correctness oracles for the Pallas kernels.

Plays the role of the reference's ``kernels/ref/`` backend and ``forward_ref``
paths (kernels/ref/matmul_ref_int4.cc, llm/src/ops/linear.cc:80-117): every
fast Pallas kernel must match these within tolerance. Pure jnp, runs on any
backend, intentionally simple.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinychatengine_tpu.quant.packing import PLANE

ZERO_POINT = 8


def unpack_int4(packed: jax.Array) -> jax.Array:
    """jnp unpack of QM_TPU packed weights [IC//2, OC] → int8 codes [IC, OC]
    in [0, 15]. Traceable mirror of quant.packing.unpack_qm_tpu (kept K-major).
    """
    icp, oc = packed.shape
    assert icp % PLANE == 0, (
        f"packed K/2={icp} must be a multiple of {PLANE}; under tensor "
        f"parallelism keep K per shard a multiple of {2 * PLANE}")
    p = packed.reshape(icp // PLANE, PLANE, oc)
    lo = (p & 0x0F).astype(jnp.int8)
    hi = ((p >> 4) & 0x0F).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(icp * 2, oc)


def dequantize_int4(packed: jax.Array, scales: jax.Array, group_size: int,
                    dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize QM_TPU weights → [IC, OC] (K-major) in ``dtype``.

    packed: [IC//2, OC]; scales: [IC//group_size, OC].
    Semantics of kernels/matmul_int4.cc naive loops: (q - 8) * d.
    """
    codes = unpack_int4(packed)  # [IC, OC]
    ic, oc = codes.shape
    w = (codes - ZERO_POINT).astype(jnp.float32)
    w = w.reshape(ic // group_size, group_size, oc) * scales[:, None, :].astype(jnp.float32)
    return w.reshape(ic, oc).astype(dtype)


def int4_matmul_ref(x: jax.Array, packed: jax.Array, scales: jax.Array,
                    group_size: int) -> jax.Array:
    """W4A16 linear oracle: y = x @ dequant(W).

    x: [..., IC] bf16/f32; packed: [IC//2, OC] uint8; scales: [IC//G, OC].
    Matches Linear_FP_int4::forward_ref (llm/src/ops/linear.cc:80-117) modulo
    the activation dtype (bf16 here vs fp32 there).
    """
    w = dequantize_int4(packed, scales, group_size, dtype=jnp.float32)
    w = w[:x.shape[-1]]  # drop pack-time K padding (dequant-0 rows)
    y = jnp.einsum("...k,kn->...n", x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def w8a8_linear_ref(x_q: jax.Array, w_q: jax.Array, alpha: float | jax.Array,
                    bias: jax.Array | None = None, out_int8: bool = True) -> jax.Array:
    """SmoothQuant W8A8 linear oracle.

    Semantics of kernels/ref/matmul_ref_int8.cc:161-193 / W8A8B8O8Linear:
    acc_i32 = x_q @ w_q^T (+ bias_int); y = clip(round(acc * alpha), -128, 127)
    if out_int8 else acc * alpha + bias_fp.
    """
    acc = jnp.einsum("...k,nk->...n", x_q.astype(jnp.int32), w_q.astype(jnp.int32),
                     preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * alpha
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if out_int8:
        return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    return y


def quantize_act_int8(x: jax.Array):
    """Dynamic per-tensor int8 activation quantization (runtime analog of
    quantize_fp_to_int8_block_size32, kernels/avx/matmul_avx_int8_int4.cc:259,
    but per-tensor — TPU int8 matmuls want a single scale per operand)."""
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale


def rms_norm_ref(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """LlamaRMSNorm (llm/src/ops/LlamaRMSNorm.cc:7-36): fp32 accumulation."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm_ref(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """LayerNorm with bias (llm/src/ops/LayerNorm.cc)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def layer_norm_q_ref(x: jax.Array, weight: jax.Array, bias: jax.Array,
                     eps: float = 1e-5) -> jax.Array:
    """LayerNormQ (llm/src/ops/LayerNormQ.cc:12-52): LN in fp32 then round to
    int8 (SmoothQuant static activation quantization; scale folded into LN
    weights by the exporter)."""
    y = layer_norm_ref(x.astype(jnp.float32), weight, bias, eps)
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def apply_rotary(q: jax.Array, k: jax.Array, cos_sel: jax.Array,
                 sin_sel: jax.Array):
    """Rotate-half RoPE with PRE-GATHERED cos/sin [B, S, D] (gather the
    position rows once per forward, not once per layer)."""
    c = cos_sel[:, :, None, :].astype(jnp.float32)         # [B, S, 1, D]
    s = sin_sel[:, :, None, :].astype(jnp.float32)

    def rot(x):
        xf = x.astype(jnp.float32)
        d = x.shape[-1]
        x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (xf * c + rotated * s).astype(x.dtype)

    return rot(q), rot(k)


def rotary_embed_ref(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array,
                     positions: jax.Array):
    """RotaryPosEmb (llm/src/ops/RotaryPosEmb.cc:7-69): rotate-half convention
    with precomputed cos/sin caches; supports GQA (separate q/k head counts).

    q: [B, S, Hq, D], k: [B, S, Hk, D]; cos/sin: [max_pos, D]; positions: [B, S].
    """
    return apply_rotary(q, k, cos[positions], sin[positions])


def make_rope_cache(head_dim: int, max_pos: int, theta: float = 10000.0):
    """cos/sin cache generator (llm/tools/rotary_emb_exporter.py)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                     # [max_pos, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)     # [max_pos, D]
    return jnp.cos(emb), jnp.sin(emb)


def softmax_ref(x: jax.Array, axis: int = -1) -> jax.Array:
    """Max-subtract softmax (llm/src/ops/softmax.cc:5-41), fp32 island."""
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    e = jnp.exp(xf - m)
    return (e / jnp.sum(e, axis=axis, keepdims=True)).astype(x.dtype)


def attention_ref(q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array | None,
                  scale: float) -> jax.Array:
    """Dense masked attention oracle (qk_bmm → +mask → softmax → pv_bmm,
    llm/src/nn_modules/non_cuda/Int4llamaAttention.cc:288-433).

    q: [B, Hq, Sq, D]; k/v: [B, Hk, Sk, D] (GQA: Hq % Hk == 0);
    mask: broadcastable to [B, 1, Sq, Sk], additive.
    """
    b, hq, sq, d = q.shape
    hk = k.shape[1]
    if hk != hq:  # GQA repeat (Int4llamaAttention.cc:166-184)
        k = jnp.repeat(k, hq // hk, axis=1)
        v = jnp.repeat(v, hq // hk, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def gelu_ref(x: jax.Array) -> jax.Array:
    """tanh-approx GELU (llm/src/ops/Gelu.cc)."""
    return jax.nn.gelu(x, approximate=True)


def quick_gelu_ref(x: jax.Array) -> jax.Array:
    """quick-GELU x*sigmoid(1.702x) (llm/src/ops/Gelu.cc, CLIP)."""
    return x * jax.nn.sigmoid(1.702 * x)


def silu_ref(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)
