"""Fused LLaMA MLP: down( silu(gate(x)) * up(x) ) in ONE Pallas kernel.

The reference runs gate/up/down as three kernel calls with intermediates in
memory (Int4llamaDecoderLayer.cc:86-109). Here the whole MLP is one Pallas
pipeline over two phases sharing one grid:

  phase A (steps 0..A-1): accumulate gu = x @ W_gate_up tile by tile into a
      VMEM scratch [M, 2F] (fp32) — the [gate | up] activation NEVER touches
      HBM;
  phase B (steps A..A+B-1): for each down-output tile, read the needed
      gate/up slices from the scratch, apply silu*mul in-register, and run
      the fused dequant-int4 contraction against W_down.

Single pipeline: one fill/drain instead of two, no HBM round trip for the
[M, 2F] intermediate, no XLA elementwise kernels between the matmuls. Both
weights stream from their layer-stacked buffers via scalar-prefetch index
maps (same zero-copy scheme as ops/int4_matmul.py). Phase-inactive operands
remap to a constant block index, so Mosaic's revolving buffers skip their
re-DMA.

Constraint: F and E tile to the fixed block size (2048) and the gu scratch
[M, 2F] fp32 must fit VMEM — true for every llama-family config in the
registry at decode/M<=16 (llama3: 2F = 28672 -> 1.8 MB).

STATUS: correct on-chip but measured ~7% SLOWER than the two-call composition
on v5e (143.7 vs 133.6 us/layer at llama3-8b decode shapes) — the single
grid serializes the two weight streams and the idle phase's VMEM buffers
shrink the active phase's pipelining headroom. Kept as an opt-in op (not
wired into models/llama.py); revisit with explicit double-buffered manual
DMA if the per-call overhead ever dominates again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinychatengine_tpu.ops.int4_matmul import ZERO_POINT, _pick_block
from tinychatengine_tpu.quant.packing import PLANE, SUPERBLOCK


def _dequant_dot(x_block, w_ref, s_ref, kb, acc, *, group_size, block_k):
    """One K-block of the fused dequant-int4 contraction (the inner loop of
    ops/int4_matmul.py:_int4_matmul_kernel, factored for reuse)."""
    gpp = PLANE // group_size
    n_sb = block_k // SUPERBLOCK
    for sb in range(n_sb):
        p = w_ref[sb * PLANE:(sb + 1) * PLANE, :].astype(jnp.int32)
        for plane in range(2):
            codes = ((p & 0x0F) if plane == 0 else ((p >> 4) & 0x0F)
                     ).astype(jnp.bfloat16)
            g0 = kb * (block_k // group_size) + (2 * sb + plane) * gpp
            x_plane = x_block[:, (2 * sb + plane) * PLANE:
                              (2 * sb + plane + 1) * PLANE]
            for g in range(gpp):
                d_row = s_ref[pl.ds(g0 + g, 1), :]
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                c_g = codes[g * group_size:(g + 1) * group_size, :]
                dot = jnp.dot(x_g, c_g, preferred_element_type=jnp.float32)
                xsum = jnp.sum(x_g.astype(jnp.float32), axis=1, keepdims=True)
                acc += dot * d_row - (ZERO_POINT * xsum) * d_row
    return acc


def _mlp_kernel(layer_ref, x_ref, wgu_ref, sgu_ref, wdn_ref, sdn_ref, o_ref,
                gu_ref, acc_ref, *, group_size: int, bn: int, e_dim: int,
                f_dim: int, n_kb_a: int, n_kb_b: int):
    """Grid (A + B,) where A = (2F/bn)*n_kb_a gu steps and
    B = (E/bn)*n_kb_b down steps. Scratch: gu [M, 2F] f32, acc [M, bn] f32."""
    t = pl.program_id(0)
    a_total = (2 * f_dim // bn) * n_kb_a
    in_a = t < a_total

    @pl.when(in_a)
    def _phase_a():
        kb = t % n_kb_a
        j = t // n_kb_a

        @pl.when(kb == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] = _dequant_dot(
            x_ref[:, pl.ds(kb * (e_dim // n_kb_a), e_dim // n_kb_a)],
            wgu_ref.at[0], sgu_ref.at[0], kb, acc_ref[:],
            group_size=group_size, block_k=e_dim // n_kb_a)

        @pl.when(kb == n_kb_a - 1)
        def _():
            gu_ref[:, pl.ds(j * bn, bn)] = acc_ref[:]

    @pl.when(jnp.logical_not(in_a))
    def _phase_b():
        t2 = t - a_total
        kb2 = t2 % n_kb_b
        # j2 = t2 // n_kb_b (implicit via the output BlockSpec)

        @pl.when(kb2 == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        bk = f_dim // n_kb_b
        gate = gu_ref[:, pl.ds(kb2 * bk, bk)]
        up = gu_ref[:, pl.ds(f_dim + kb2 * bk, bk)]
        act = (jax.nn.sigmoid(gate) * gate * up).astype(jnp.bfloat16)
        acc_ref[:] = _dequant_dot(
            act, wdn_ref.at[0], sdn_ref.at[0], kb2, acc_ref[:],
            group_size=group_size, block_k=bk)

        @pl.when(kb2 == n_kb_b - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "bn", "e_dim", "f_dim", "interpret"))
def _mlp_fused_impl(layer_idx, x, wgu, sgu, wdn, sdn, *, group_size, bn,
                    e_dim, f_dim, interpret):
    m = x.shape[0]
    bk_a = _pick_block(e_dim, 2048, SUPERBLOCK)
    bk_b = _pick_block(f_dim, 2048, SUPERBLOCK)
    n_kb_a = e_dim // bk_a
    n_kb_b = f_dim // bk_b
    a_total = (2 * f_dim // bn) * n_kb_a
    b_total = (e_dim // bn) * n_kb_b
    grid = (a_total + b_total,)

    def wgu_map(t, lref):
        kb = jnp.where(t < a_total, t % n_kb_a, n_kb_a - 1)
        j = jnp.where(t < a_total, t // n_kb_a, 2 * f_dim // bn - 1)
        return (lref[0], kb, j)

    def sgu_map(t, lref):
        j = jnp.where(t < a_total, t // n_kb_a, 2 * f_dim // bn - 1)
        return (lref[0], 0, j)

    def wdn_map(t, lref):
        t2 = jnp.maximum(t - a_total, 0)
        return (lref[0], t2 % n_kb_b, t2 // n_kb_b)

    def sdn_map(t, lref):
        t2 = jnp.maximum(t - a_total, 0)
        return (lref[0], 0, t2 // n_kb_b)

    def out_map(t, lref):
        return (0, jnp.maximum(t - a_total, 0) // n_kb_b)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, e_dim), lambda t, lref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk_a // 2, bn), wgu_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim // group_size, bn), sgu_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk_b // 2, bn), wdn_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_dim // group_size, bn), sdn_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), out_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, 2 * f_dim), jnp.float32),   # gu
            pltpu.VMEM((m, bn), jnp.float32),          # acc
        ],
    )
    kernel = functools.partial(
        _mlp_kernel, group_size=group_size, bn=bn, e_dim=e_dim, f_dim=f_dim,
        n_kb_a=n_kb_a, n_kb_b=n_kb_b)
    bytes_w = (e_dim * 2 * f_dim + f_dim * e_dim) // 2
    cost = pl.CostEstimate(flops=2 * m * 3 * e_dim * f_dim,
                           bytes_accessed=bytes_w, transcendentals=m * f_dim)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, e_dim), jnp.bfloat16),
        cost_estimate=cost, interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), x, wgu, sgu, wdn, sdn)


def mlp_fused(x: jax.Array, wgate_up, down, layer_idx, *, bn: int = 2048,
              interpret: bool = False) -> jax.Array:
    """x [..., E] bf16; wgate_up/down: layer-stacked Int4Linear params
    ([L, K//2, N] / [L, K//G, N]); layer_idx: traced scalar.
    Returns down(silu(gate)*up) [..., E].

    Falls back are the caller's concern (use only when
    mlp_fused_supported(...) is True).
    """
    orig = x.shape
    e_dim = orig[-1]
    f_dim = down.packed.shape[-2] * 2
    gs = 2 * wgate_up.packed.shape[-2] // wgate_up.scales.shape[-2]
    x2 = x.reshape(-1, e_dim)
    m = x2.shape[0]
    pad = (-m) % 16
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    y = _mlp_fused_impl(
        layer_idx, x2.astype(jnp.bfloat16), wgate_up.packed,
        wgate_up.scales.astype(jnp.float32), down.packed,
        down.scales.astype(jnp.float32), group_size=gs, bn=bn, e_dim=e_dim,
        f_dim=f_dim, interpret=interpret)
    return y[:m].reshape(orig)


def mlp_fused_supported(e_dim: int, f_dim: int, m: int, bn: int = 2048) -> bool:
    """Shape gate: tiles divide evenly and the gu scratch fits VMEM."""
    if (2 * f_dim) % bn or e_dim % bn:
        return False
    if e_dim % SUPERBLOCK or f_dim % SUPERBLOCK:
        return False
    m_pad = m + (-m) % 16
    gu_bytes = m_pad * 2 * f_dim * 4
    return m_pad <= 16 and gu_bytes <= 4 * (1 << 20)
