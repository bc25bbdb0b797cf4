"""Linear-layer parameter containers + dispatch.

TPU-native analog of the reference op classes ``Linear_FP`` / ``Linear_FP_int4``
/ ``W8A8B8O8Linear`` (llm/src/ops/linear.cc, llm/include/ops/linear.h,
llm/src/ops/W8A8B8O8Linear.cc): instead of classes that own raw buffers and
marshal into ``matmul_params``, parameters are registered pytrees and
``apply`` dispatches on the container type (so the same model code runs FP,
W4A16 or W8A8, and ``jax.tree_util`` / GSPMD sharding see the leaves).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from tinychatengine_tpu.ops.int4_matmul import (
    int4_matmul,
    int4_matmul_a8,
    int4_matmul_a8_xla,
    int4_matmul_xla,
)


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_with_keys(
        cls,
        lambda obj: (
            [(jax.tree_util.GetAttrKey(f), getattr(obj, f)) for f in fields],
            None,
        ),
        lambda aux, children: cls(*children),
    )
    return cls


@_pytree_dataclass
class DenseLinear:
    """Unquantized linear, weight stored K-major [K, N] (Linear_FP,
    llm/src/ops/linear.cc:37-78)."""

    weight: jax.Array  # [K, N]
    bias: Optional[jax.Array] = None  # [N]


@_pytree_dataclass
class Int4Linear:
    """AWQ group-wise INT4 linear in QM_TPU layout (Linear_FP_int4,
    llm/include/ops/linear.h:27-144). group_size rides with the arrays'
    shapes: group_size = 2*packed.shape[0] // scales.shape[0]."""

    packed: jax.Array  # [K//2, N] uint8
    scales: jax.Array  # [K//group_size, N] f32
    bias: Optional[jax.Array] = None

    @property
    def group_size(self) -> int:
        return 2 * self.packed.shape[-2] // self.scales.shape[-2]


@_pytree_dataclass
class Int4A8Linear:
    """W4A8: same packed INT4 weights as Int4Linear, but activations are
    dynamically quantized to int8 per (row, group) at matmul time — the
    reference's default x86/ARM path (USE_INT8_INT4_PRODUCT,
    llm/src/ops/linear.cc:157-168 + kernels/avx/matmul_avx_int8_int4.cc)."""

    packed: jax.Array  # [K//2, N] uint8
    scales: jax.Array  # [K//group_size, N] f32
    bias: Optional[jax.Array] = None


@_pytree_dataclass
class W8A8Linear:
    """SmoothQuant static int8 linear (W8A8B8O8Linear family,
    llm/src/ops/W8A8B8O8Linear.cc): int8 weight [K, N], per-op requant alpha,
    optional int-folded bias (beta) and fp32 bias."""

    weight: jax.Array  # [K, N] int8
    alpha: jax.Array   # scalar f32 requant multiplier
    bias: Optional[jax.Array] = None  # [N] (int8-domain or fp32 per out_mode)


def apply_linear(p, x: jax.Array, *, out_int8: bool = False,
                 relu: bool = False, layer_idx=None) -> jax.Array:
    """y = x @ W (+ bias). Dispatches on the parameter container.

    ``layer_idx``: when the params are layer-stacked (leading [L] dim inside a
    lax.scan over layers), pass the traced layer index instead of pre-slicing
    — the Int4 Pallas kernel then reads tiles straight from the stacked HBM
    buffer (pre-slicing materializes a full per-layer weight copy each step).

    The Pallas fused kernel runs on TPU; other backends (CPU tests) fall back
    to the XLA dequant path, which is numerically equivalent at bf16.
    """
    def unstack(leaf):
        if leaf is None or layer_idx is None:
            return leaf
        return jax.lax.dynamic_index_in_dim(leaf, layer_idx, 0, keepdims=False)

    if isinstance(p, DenseLinear):
        w = unstack(p.weight)
        bias = unstack(p.bias)
        y = jnp.einsum("...k,kn->...n", x, w.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    if isinstance(p, Int4Linear):
        gs = 2 * p.packed.shape[-2] // p.scales.shape[-2]
        if jax.default_backend() == "tpu":
            if layer_idx is not None:
                y = int4_matmul(x, p.packed, p.scales, gs, layer_idx=layer_idx)
            else:
                y = int4_matmul(x, p.packed, p.scales, gs)
        else:
            y = int4_matmul_xla(x, unstack(p.packed), unstack(p.scales), gs)
        bias = unstack(p.bias)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    if isinstance(p, Int4A8Linear):
        gs = 2 * p.packed.shape[-2] // p.scales.shape[-2]
        # GEMM shapes (prefill) take the bf16-activation kernel: the
        # reference's own W4A8 dispatch abandons int8 activations for
        # large M too (m>100 -> dequant + fp GEMM, llm/src/ops/
        # linear.cc:218-227) — at many rows the compute is MXU-bound and
        # the per-(row,group) act-quant VPU work only slows it (measured:
        # 2048-token prefill 5.8k tok/s via the a8 kernel vs 9.3k bf16),
        # while W4A16 numerics at prefill are strictly more accurate.
        m = math.prod(x.shape[:-1])
        if m > 100:
            return apply_linear(
                Int4Linear(packed=p.packed, scales=p.scales, bias=p.bias),
                x, layer_idx=layer_idx)
        if jax.default_backend() == "tpu":
            y = int4_matmul_a8(x, p.packed, p.scales, gs, layer_idx=layer_idx)
        else:
            y = int4_matmul_a8_xla(x, unstack(p.packed), unstack(p.scales), gs)
        bias = unstack(p.bias)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    if isinstance(p, W8A8Linear):
        # x is int8 (statically quantized upstream, LayerNormQ-style).
        # y = clip(round(acc_i32*α + bias'), ...) where bias' = bias_s8*β is
        # pre-folded to fp32 by the converter (ref/matmul_ref_int8.cc:28-31).
        w = unstack(p.weight)
        bias = unstack(p.bias)
        alpha = unstack(p.alpha)
        acc = jnp.einsum("...k,kn->...n", x.astype(jnp.int8), w,
                         preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * alpha
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        if out_int8:
            return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        return y

    raise TypeError(f"unknown linear params {type(p)}")


def row_parallel(p, x: jax.Array, tp_axis, **kw) -> jax.Array:
    """Row-parallel linear: psum the bias-less matmul across the TP axis,
    then add the bias ONCE (a per-shard bias would be reduced tp_degree
    times — the Megatron bias rule). No-op reduction when tp_axis is None."""
    bias = getattr(p, "bias", None)
    if tp_axis is None or bias is None:
        y = apply_linear(p, x, **kw)
        return jax.lax.psum(y, tp_axis) if tp_axis is not None else y
    y = apply_linear(dataclasses.replace(p, bias=None), x, **kw)
    y = jax.lax.psum(y, tp_axis)
    layer_idx = kw.get("layer_idx")
    if layer_idx is not None:
        bias = jax.lax.dynamic_index_in_dim(bias, layer_idx, 0, keepdims=False)
    return y + bias.astype(y.dtype)


def fuse_linears(parts, tp_degree: int = 1):
    """Concatenate same-K linears along N into ONE weight — the offline QKV /
    gate-up merge (the reference does this for its CUDA path,
    llm/tools/llama_qkv_merger.py:15-58): one kernel dispatch streams all
    projections.

    ``tp_degree``: the column layout is built as [p0_shard0 | p1_shard0 | ...
    | p0_shard1 | ...] so that a column-parallel sharding over ``tp_degree``
    devices gives every shard its own contiguous [q_s | k_s | v_s] block —
    the local model code slices by LOCAL widths. tp_degree=1 is the plain
    concat. The fused layout is mesh-specific; checkpoints record it.
    """
    assert len({type(p) for p in parts}) == 1, "mixed linear kinds"
    p0 = parts[0]

    def cat(field):
        arrs = [getattr(p, field) for p in parts]
        if any(a is None for a in arrs):
            assert all(a is None for a in arrs), f"partial {field}"
            return None
        pieces = []
        for s in range(tp_degree):
            for a in arrs:
                w = a.shape[-1]
                assert w % tp_degree == 0, (field, a.shape, tp_degree)
                wl = w // tp_degree
                pieces.append(a[..., s * wl:(s + 1) * wl])
        return jnp.concatenate(pieces, axis=-1)

    if isinstance(p0, DenseLinear):
        return DenseLinear(weight=cat("weight"), bias=cat("bias"))
    cls = type(p0)  # Int4Linear or Int4A8Linear
    return cls(packed=cat("packed"), scales=cat("scales"), bias=cat("bias"))


def random_int4_linear_fast(key, k: int, n: int, group_size: int = 128,
                            std: float = 0.02,
                            scale_dtype: str = "f32") -> Int4Linear:
    """Random packed bytes + scales generated on device — for benchmarks where
    only shapes/layout matter (8B-scale init in milliseconds, no host quantize)."""
    from tinychatengine_tpu.quant.packing import padded_ic
    kp = padded_ic(k, group_size)  # kernels zero-pad x to the padded K
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (kp // 2, n), 0, 256, jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(k2, (kp // group_size, n), jnp.float32,
                                minval=0.5, maxval=1.5) * (std / 4.0)
    if scale_dtype == "bf16":
        scales = scales.astype(jnp.bfloat16)
    return Int4Linear(packed=packed, scales=scales)


def random_int4_linear(key, k: int, n: int, group_size: int = 128,
                       std: float = 0.02,
                       scale_dtype: str = "f32") -> Int4Linear:
    """Random-initialized quantized linear (bench/tests; real checkpoints come
    from tools.quantize)."""
    import numpy as np

    from tinychatengine_tpu.quant.numerics import quantize_groupwise_int4
    from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    w = (rng.standard_normal((n, k)) * std).astype(np.float32)
    q, scales = quantize_groupwise_int4(w, group_size)
    return Int4Linear(
        packed=jnp.asarray(pack_qm_tpu(q, group_size)),
        scales=jnp.asarray(pack_scales(scales, scale_dtype, group_size)),
    )
