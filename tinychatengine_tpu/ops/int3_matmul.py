"""INT3 (sub-4-bit) fused dequant matmul — the r5 bytes-lever EXPERIMENT.

PERF.md's r4 conclusion: the decode rate is physics-bound; only the BYTES
can move. W3 shrinks weight bytes to 75% of int4 (3/8 B per weight), at the
cost of a deeper unpack on the VPU — and the int4 kernel is VPU-bound on
nibble unpack (CLAUDE.md). This module exists to settle that trade with a
measurement (scripts/exp_w3.py); see PERF.md "W3" for the verdict.

Layout (QM_TPU3, two bitplanes — each unpacks exactly like the int4 nibble
scheme, sublane-run contiguous):

  * plane A (low 2 bits): ``packed_a [IC//4, OC] uint8`` — within a
    superblock of 4*PLANE input rows, byte row i bits [2j, 2j+1] hold
    w[s*4*PLANE + j*PLANE + i] & 3.
  * plane B (high bit): ``packed_b [IC//8, OC] uint8`` — within a
    superblock of 8*PLANE rows, byte row i bit j holds bit 2 of
    w[s*8*PLANE + j*PLANE + i].

Codes q = A + 4B in [0, 7]; numerics quant/numerics.py int3 family
(d = max/-4, zp 4). In-kernel the zero point and the B plane are factored
out of the per-element path:  x·((A + 4B − 4)d) = d·(x·A) + 4d·(x·B) −
4d·Σx — per weight only shift/mask + int→bf16 converts remain, the B-plane
contribution rides a second MXU dot instead of a per-element combine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PLANE = 128
SB_A = 4 * PLANE     # input rows per A-plane superblock
SB_B = 8 * PLANE     # input rows per B-plane superblock
ZERO_POINT3 = 4.0


def pack_qm_tpu3(q: np.ndarray):
    """uint3 codes ``q [OC, IC]`` (values 0..7) → (packed_a [IC//4, OC],
    packed_b [IC//8, OC]). IC must be a multiple of 8*PLANE (pad with the
    zero-point code 4 upstream if needed — dequantizes to exactly 0)."""
    oc, ic = q.shape
    assert ic % SB_B == 0, f"IC={ic} must be a multiple of {SB_B}"
    qt = q.astype(np.uint8).T                        # [IC, OC]
    a = qt & 3
    a = a.reshape(ic // SB_A, 4, PLANE, oc)
    packed_a = (a[:, 0] | (a[:, 1] << 2) | (a[:, 2] << 4)
                | (a[:, 3] << 6)).reshape(ic // 4, oc)
    b = (qt >> 2) & 1
    b = b.reshape(ic // SB_B, 8, PLANE, oc)
    packed_b = np.zeros((ic // SB_B, PLANE, oc), np.uint8)
    for j in range(8):
        packed_b |= b[:, j] << j
    return packed_a, packed_b.reshape(ic // 8, oc)


def unpack_qm_tpu3(packed_a: np.ndarray, packed_b: np.ndarray) -> np.ndarray:
    """Inverse of pack_qm_tpu3 → uint8 codes [OC, IC] in [0, 7]."""
    ica4, oc = packed_a.shape
    a = packed_a.reshape(-1, PLANE, oc)
    planes_a = np.stack([(a >> (2 * j)) & 3 for j in range(4)], axis=1)
    qa = planes_a.reshape(ica4 * 4, oc)
    b = packed_b.reshape(-1, PLANE, oc)
    planes_b = np.stack([(b >> j) & 1 for j in range(8)], axis=1)
    qb = planes_b.reshape(ica4 * 4, oc)
    return (qa | (qb << 2)).T.copy()


def int3_matmul_ref(x, packed_a, packed_b, scales, group_size: int):
    """jnp oracle: dequantize fully, one einsum (tests + CPU path)."""
    q = jnp.asarray(unpack_qm_tpu3(np.asarray(packed_a),
                                   np.asarray(packed_b)), jnp.int32)
    oc, ic = q.shape
    d = jnp.asarray(scales, jnp.float32).T           # [OC, IC//G]
    w = ((q.astype(jnp.float32).reshape(oc, ic // group_size, group_size)
          - ZERO_POINT3) * d[..., None]).reshape(oc, ic)
    return (x.astype(jnp.float32) @ w.T.astype(jnp.float32)
            ).astype(jnp.bfloat16)


def _int3_kernel(x_ref, a_ref, b_ref, s_ref, o_ref, acc_ref, *,
                 group_size: int, n_kblocks: int, block_k: int):
    """Grid (I, J, K): x [TM, TK] bf16; a [TK//4, TN]; b [TK//8, TN];
    s [K//G, TN] f32 (full-K extent); acc VMEM f32 [TM, TN]."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpp = PLANE // group_size
    n_sb8 = block_k // SB_B
    acc = acc_ref[:]
    for sb8 in range(n_sb8):
        pb = b_ref[sb8 * PLANE:(sb8 + 1) * PLANE, :].astype(jnp.int32)
        pa_cache = None
        for j in range(8):
            if j % 4 == 0:
                row = (2 * sb8 + j // 4) * PLANE
                pa_cache = a_ref[row:row + PLANE, :].astype(jnp.int32)
            fa = pa_cache if j % 4 == 0 else (pa_cache >> (2 * (j % 4)))
            a_codes = (fa & 3).astype(jnp.bfloat16)
            fb = pb if j == 0 else (pb >> j)
            b_codes = (fb & 1).astype(jnp.bfloat16)
            base = sb8 * SB_B + j * PLANE
            x_plane = x_ref[:, base:base + PLANE]
            g0 = kb * (block_k // group_size) + base // group_size
            for g in range(gpp):
                d_row = s_ref[pl.ds(g0 + g, 1), :]                # [1, TN]
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                a_g = a_codes[g * group_size:(g + 1) * group_size, :]
                b_g = b_codes[g * group_size:(g + 1) * group_size, :]
                dot_a = jnp.dot(x_g, a_g,
                                preferred_element_type=jnp.float32)
                dot_b = jnp.dot(x_g, b_g,
                                preferred_element_type=jnp.float32)
                xsum4 = jnp.sum(x_g.astype(jnp.float32), axis=1,
                                keepdims=True) * ZERO_POINT3
                acc += (dot_a + 4.0 * dot_b - xsum4) * d_row
    acc_ref[:] = acc

    @pl.when(kb == n_kblocks - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m",
                                             "block_n", "block_k",
                                             "interpret"))
def int3_matmul(x, packed_a, packed_b, scales, *, group_size: int = 128,
                block_m: int = 0, block_n: int = 2048, block_k: int = 2048,
                interpret: bool = False):
    """y = x @ dequant(W3)ᵀ-as-stored: x [M, K] bf16 → [M, N] bf16.
    Experiment-scoped: unstacked 2D weights, f32 scales, K % block_k == 0,
    block_k % 1024 == 0."""
    m, k = x.shape
    n = packed_a.shape[-1]
    if block_m == 0:
        block_m = 8 if m <= 8 else _pick(m, 512)
    block_n = _pick(n, block_n)
    block_k = _pick(k, block_k)
    assert block_k % SB_B == 0, (block_k,)
    grid = (m // block_m, n // block_n, k // block_k)
    kernel = functools.partial(_int3_kernel, group_size=group_size,
                               n_kblocks=grid[2], block_k=block_k)
    bytes_accessed = (m * k * 2 + n * k * 3 // 8
                      + (n * k // group_size) * 4 + m * n * 2)
    cost = pl.CostEstimate(flops=2 * 2 * m * n * k,
                           bytes_accessed=bytes_accessed, transcendentals=0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb: (i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // 4, block_n), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // 8, block_n), lambda i, j, kb: (kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // group_size, block_n), lambda i, j, kb: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, packed_a, packed_b, scales)


def _pick(dim: int, preferred: int) -> int:
    b = min(preferred, dim)
    while b > 1 and dim % b != 0:
        b //= 2
    return b
