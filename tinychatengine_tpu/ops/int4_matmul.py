"""Fused dequant-INT4 × bf16 matmul — THE hot kernel (W4A16).

TPU-native replacement for the reference's per-ISA fused dequant GEMM/GEMV zoo
(kernels/avx/matmul_avx_int8_int4.cc:325-357, kernels/neon/matmul_neon_int8_int4.cc:1296-1476,
kernels/cuda/gemv_cuda.cu:68-211, kernels/metal/kernel/op.metal). One Pallas
kernel covers prefill GEMM and decode GEMV.

Design:
- Weights stream from HBM in the packed QM_TPU int4 layout (4 bits/weight —
  decode GEMV is HBM-bandwidth-bound, so halving weight bytes vs int8 and 4x
  vs bf16 is the headline win).
- K-major storage [K//2, N]: the MXU consumes y = x @ W directly; N rides the
  128-lane axis so every block is tile-aligned; nibble planes are sublane
  runs (no lane shuffles to unpack).
- Unpack (VPU bitwise) + zero-point subtract + per-group scale happen
  in-register; dequantized bf16 tiles feed the MXU immediately and are never
  written back to HBM.
- fp32 accumulation across K blocks in VMEM scratch.

Numerics: (q - 8) * d with group-wise d (quantize_methods.py:212-232).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinychatengine_tpu.quant.packing import PLANE

ZERO_POINT = 8


def _unpack_block(packed_blk: jax.Array) -> jax.Array:
    """Unpack a [TKp, TN] uint8 QM_TPU block → int8 codes [2*TKp, TN].

    Lo/hi nibble planes are contiguous 128-row sublane runs; reassembly is a
    sublane-dim stack + reshape (the lane axis is untouched).
    """
    tkp, tn = packed_blk.shape
    # int32 lanes: Mosaic has no int8 vector shift (arith.shrui on i8).
    p = packed_blk.reshape(tkp // PLANE, PLANE, tn).astype(jnp.int32)
    lo = p & 0x0F
    hi = (p >> 4) & 0x0F
    return jnp.stack([lo, hi], axis=1).reshape(2 * tkp, tn)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group_size: int,
                        n_kblocks: int):
    """Grid (I, J, K): x [TM, TK] bf16; w [TK//2, TN] uint8; s [TK//G, TN];
    o [TM, TN]; acc VMEM f32 [TM, TN]."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = _unpack_block(w_ref[:])                      # [TK, TN] int32
    centered = (codes - ZERO_POINT).astype(jnp.float32)  # exact
    scales = jnp.repeat(s_ref[:], group_size, axis=0)    # [TK, TN] f32 (sublane bcast)
    w = (centered * scales).astype(jnp.bfloat16)         # single bf16 rounding

    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kb == n_kblocks - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_block(dim: int, preferred: int, align: int) -> int:
    """Largest block <= preferred that divides dim and is a multiple of align."""
    b = min(preferred, dim)
    b -= b % align
    while b > align and dim % b != 0:
        b -= align
    if b <= 0 or dim % b != 0:
        raise ValueError(f"dim {dim} not tileable with align {align}")
    return b


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def _int4_matmul_2d(x, packed, scales, *, group_size, block_m, block_n, block_k,
                    interpret=False, out_dtype=jnp.bfloat16):
    m, k = x.shape
    n = packed.shape[1]
    grid = (m // block_m, n // block_n, k // block_k)
    kernel = functools.partial(
        _int4_matmul_kernel, group_size=group_size, n_kblocks=grid[2])
    flops = 2 * m * n * k
    bytes_accessed = m * k * 2 + n * k // 2 + (n * k // group_size) * 4 + m * n * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb: (i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // 2, block_n), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // group_size, block_n), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(x, packed, scales)


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                group_size: int = 128, *, interpret: bool = False) -> jax.Array:
    """y[..., N] = x[..., K] @ dequant(packed, scales), fused in one kernel.

    x: [..., K] (bf16 recommended); packed: [K//2, N] uint8 QM_TPU (K-major);
    scales: [K//group_size, N] float.

    Replaces Linear_FP_int4::forward dispatch (llm/src/ops/linear.cc:171-236):
    there is no GEMV/GEMM split — small M is padded to the bf16 sublane tile
    and the same kernel runs (the padding rows are dead MXU lanes, which the
    HBM-bound decode step never notices).
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    kp, n = packed.shape
    assert kp == k // 2, (packed.shape, k)
    assert k % (2 * PLANE) == 0, f"K={k} must be a multiple of {2 * PLANE}"
    assert scales.shape == (k // group_size, n), scales.shape
    assert group_size % 8 == 0  # scales block sublane alignment

    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    # Sublane alignment: bf16 tiles want M%16==0; pad (cheap, dead rows).
    pad = (-m) % 16
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    block_m = _pick_block(m + pad, 256, 16)
    block_n = _pick_block(n, 512, 128)
    # block_k // group_size must be >= 8 sublanes when blocked, unless the
    # whole K fits one block.
    min_bk = max(2 * PLANE, 8 * group_size)
    if k <= 4096 or k % min_bk != 0:
        block_k = k  # single K block: scales block = full array, any sublane ok
    else:
        block_k = _pick_block(k, max(2048, min_bk), min_bk)

    y = _int4_matmul_2d(
        x2.astype(jnp.bfloat16), packed, scales.astype(jnp.float32),
        group_size=group_size, block_m=block_m, block_n=block_n,
        block_k=block_k, interpret=interpret)
    y = y[:m]
    return y.reshape(*orig_shape[:-1], n)


def int4_matmul_xla(x: jax.Array, packed: jax.Array, scales: jax.Array,
                    group_size: int = 128) -> jax.Array:
    """XLA-only fallback (dequantize to bf16 via jnp, then matmul). Correctness
    baseline and perf comparison point; materializes W in bf16 (4x the HBM
    traffic of the fused kernel at decode)."""
    from tinychatengine_tpu.ops.ref import dequantize_int4
    w = dequantize_int4(packed, scales, group_size, dtype=jnp.bfloat16)
    return jnp.einsum("...k,kn->...n", x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32).astype(x.dtype)
