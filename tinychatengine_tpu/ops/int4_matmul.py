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
  128-lane axis so every block is tile-aligned; nibble planes are contiguous
  sublane runs (no lane shuffles to unpack).
- The kernel walks each K-block superblock by superblock (static unroll):
  per 128-row packed plane it unpacks one nibble plane, applies the
  per-group scale (one scale row per plane at group_size=128), and issues a
  [TM,128]x[128,TN] MXU dot — intermediates stay one plane large (~256 KB),
  so the Mosaic pipeline overlaps HBM streaming with compute instead of
  serializing on multi-MB unpack buffers.
- Scales ride as a full-[K//G] block per N-tile (a few hundred KB max) and
  are indexed per plane — this frees block_k from the sublane-alignment
  constraint on a blocked scales operand (any multiple of 256 works, which
  matters for K=11008-style dims whose only 1024-aligned divisor is K).
- fp32 accumulation across K blocks in VMEM scratch.

Numerics: (q - 8) * d with group-wise d (quantize_methods.py:212-232).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinychatengine_tpu.quant.packing import PLANE, SUPERBLOCK

ZERO_POINT = 8

# Decode fast path master switches (read by the model forwards at trace
# time): fold norms / RoPE / biases / residual adds into the matmul kernels
# via int4_matmul_fused — at decode each of those [1, E] ops is otherwise
# its own device kernel, ~186 us/step of launch overhead across 32 layers
# (scripts/bisect_decode.py). "force" enables the path off-TPU through
# interpret-mode kernels (CPU glue tests). Default OFF until the on-chip
# Mosaic validation + A/B lands (interpret-mode tests cannot prove chip
# lowering — CLAUDE.md); flip to "1" then.
FUSED_DECODE = os.environ.get("TCE_DECODE_FUSED", "0") != "0"
FUSED_FORCE = os.environ.get("TCE_DECODE_FUSED", "") == "force"

# Per-shape decode (M < 512) blocking overrides, (K, N) → (block_n, block_k).
# EMPTY after a 5-round end-to-end study (scripts/ab_bench_blocks.py):
# with 256-token decode runs and interleaved configs, every candidate
# (gate_up bn∈{512,1024}, lm_head bn∈{512,1024}, qkv/wo bk=4096) measured
# within ±1% of the (2048, 2048) default — earlier "wins" at 64-token runs
# were co-tenant noise. The table + TCE_DECODE_BLOCKS env hook stay for
# future shapes/toolchains.
DECODE_BLOCKS: dict = {}

# Per-shape decode restructure overrides, (K, N) → (block_n, block_k) run
# through the K-OUTER kernel (_kouter_kernel): grid (i, kb, j) with j
# innermost, a [n_j, TM, TN] full-N fp32 accumulator scratch and the whole
# layer's scales resident in VMEM — weight DMA walks row bands j-inner
# (sequential HBM) and scales are fetched once per layer instead of once per
# N-tile re-DMA. Opt-in per shape (env TCE_DECODE_KOUTER="K,N:bn,bk;...").
DECODE_KOUTER: dict = {}


def _parse_env_blocks(env="TCE_DECODE_BLOCKS", table=None):
    """Tuning hook: TCE_DECODE_BLOCKS="K,N:bn,bk;K,N:bn,bk" overrides the
    decode blocking table per process (scripts/ab_bench_blocks.py A/Bs
    bench.py runs this way without code edits). TCE_DECODE_KOUTER uses the
    same syntax to route shapes through the K-outer restructured kernel."""
    table = DECODE_BLOCKS if table is None else table
    spec = os.environ.get(env, "")
    for item in spec.split(";"):
        if not item.strip():
            continue
        try:
            shape, blocks = item.split(":")
            k, n = (int(s) for s in shape.split(","))
            bn, bk = (int(s) for s in blocks.split(","))
        except ValueError as e:
            raise ValueError(
                f"{env} entry {item!r} malformed (want "
                f"'K,N:block_n,block_k;...'): {e}") from None
        if n % bn or k % bk or bk % SUPERBLOCK or bn % 128:
            raise ValueError(
                f"{env} {item!r}: block_n must divide N and be a "
                f"multiple of 128; block_k must divide K and be a multiple "
                f"of {SUPERBLOCK}")
        table[(k, n)] = (bn, bk)


_parse_env_blocks()
_parse_env_blocks("TCE_DECODE_KOUTER", DECODE_KOUTER)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                        group_size: int, n_kblocks: int, block_k: int,
                        s_kblocked: bool = False):
    """Grid (I, J, K): x [TM, TK] bf16; w [TK//2, TN] uint8 (blocked on K);
    s [K//G, TN] (FULL K extent) — or, with ``s_kblocked``, a K-blocked
    [TK//G, TN] slice (possibly bf16) indexed STATICALLY in-kernel, the
    layout used for half-precision scales (sublane-packed dtypes want static
    row slices; the dynamic pl.ds path stays f32-only);
    o [TM, TN]; acc VMEM f32 [TM, TN]."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dequantization is factored OUT of the per-element path: with codes
    # q in [0,15] and per-group scale d,  x·((q-8)d) = d·(x·q) - 8d·sum(x).
    # Per weight element only mask/shift + int→bf16 convert remain on the
    # VPU (codes 0..15 are exact in bf16); the scale and zero-point act on
    # the [TM, TN] group dot instead of the [128, TN] weight tile, cutting
    # VPU work ~2.5x (the kernel is VPU-bound, not DMA-bound, at decode).
    gpp = PLANE // group_size  # groups per nibble plane (>=1; G<=128)
    n_sb = block_k // SUPERBLOCK
    acc = acc_ref[:]
    for sb in range(n_sb):  # static unroll over superblocks in this K block
        p = w_ref[sb * PLANE:(sb + 1) * PLANE, :].astype(jnp.int32)  # [128, TN]
        for plane in range(2):
            # plane 1 needs no mask: p is a uint8 value in int32 lanes, so
            # p >> 4 is already in [0, 15] — one fewer VPU op per byte
            codes = ((p & 0x0F) if plane == 0 else (p >> 4)
                     ).astype(jnp.bfloat16)
            g0 = ((2 * sb + plane) * gpp if s_kblocked
                  else kb * (block_k // group_size) + (2 * sb + plane) * gpp)
            x_plane = x_ref[:, (2 * sb + plane) * PLANE:
                            (2 * sb + plane + 1) * PLANE]
            for g in range(gpp):
                if s_kblocked:  # static row slice; cast covers bf16 scales
                    d_row = s_ref[g0 + g:g0 + g + 1, :].astype(jnp.float32)
                else:
                    d_row = s_ref[pl.ds(g0 + g, 1), :]            # [1, TN] f32
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                c_g = codes[g * group_size:(g + 1) * group_size, :]
                dot = jnp.dot(x_g, c_g, preferred_element_type=jnp.float32)
                # zero-point folded once into the [M,1] row sums, then a
                # single (sub, mul, add) on the [M, TN] tile
                xsum8 = jnp.sum(x_g.astype(jnp.float32), axis=1,
                                keepdims=True) * ZERO_POINT
                acc += (dot - xsum8) * d_row
    acc_ref[:] = acc

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


def _stacked_kernel(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    """Stacked-weights wrapper: the layer offset is consumed entirely by the
    BlockSpec index maps (flattened-2D addressing); the scalar-prefetch ref
    just needs dropping from the kernel signature."""
    _int4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, **kw)


def _stacked_kernel_s3d(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    """Variant with 3D-blocked scales ([1, K/G, TN]): used when K/G is not a
    multiple of the f32 sublane count (8) — Mosaic only allows such a row
    count when the block spans the full array dim, which the flattened
    [L*K/G, N] view cannot (small models, e.g. K=256 G=128 → 2 rows)."""
    _int4_matmul_kernel(x_ref, w_ref, s_ref.at[0], o_ref, acc_ref, **kw)




@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def _int4_matmul_2d(x, packed, scales, layer_idx=None, *, group_size, block_m,
                    block_n, block_k, interpret=False, out_dtype=jnp.bfloat16):
    """packed [K//2, N] — or stacked [L, K//2, N] with ``layer_idx`` selecting
    the layer INSIDE the kernel's BlockSpec (scalar prefetch): the scan over
    layers then streams weight tiles straight from the stacked HBM buffer
    instead of materializing a per-layer dynamic-slice copy (which showed up
    as 35% of decode-step device time)."""
    m, k = x.shape
    stacked = packed.ndim == 3
    n = packed.shape[-1]
    grid = (m // block_m, n // block_n, k // block_k)
    # Half-precision scales ride a K-blocked spec with static in-kernel row
    # indexing (sublane-packed dtypes + dynamic pl.ds don't mix); the wrapper
    # guarantees the sublane legality (spk % 16) before choosing bf16.
    spk = block_k // group_size
    s_half = jnp.dtype(scales.dtype).itemsize == 2
    s_kblocked = s_half and spk % 16 == 0
    assert not (s_half and not s_kblocked), (scales.dtype, block_k, group_size)
    kernel = functools.partial(
        _int4_matmul_kernel, group_size=group_size, n_kblocks=grid[2],
        block_k=block_k, s_kblocked=s_kblocked)
    flops = 2 * m * n * k
    s_bytes = jnp.dtype(scales.dtype).itemsize
    bytes_accessed = (m * k * 2 + n * k // 2
                      + (n * k // group_size) * s_bytes + m * n * 2)
    cost = pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=0)
    x_spec = pl.BlockSpec((block_m, block_k), lambda i, j, kb, *_: (i, kb),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_m, block_n), lambda i, j, kb, *_: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((m, n), out_dtype)
    scratch = [pltpu.VMEM((block_m, block_n), jnp.float32)]

    # i/j grid dims are independent output tiles; only kb (accumulation)
    # carries state — telling Mosaic lets it pipeline across tiles (+18%).
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    if not stacked:
        if s_kblocked:
            flat_s_spec = pl.BlockSpec((spk, block_n),
                                       lambda i, j, kb: (kb, j),
                                       memory_space=pltpu.VMEM)
        else:
            # full K extent of scales for this N tile (few hundred KB max)
            flat_s_spec = pl.BlockSpec((k // group_size, block_n),
                                       lambda i, j, kb: (0, j),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((block_k // 2, block_n), lambda i, j, kb: (kb, j),
                             memory_space=pltpu.VMEM),
                flat_s_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=compiler_params,
            interpret=interpret,
        )(x, packed, scales)

    # Stacked weights are addressed as a FLATTENED 2D view [L*K/2, N] with
    # the layer offset folded into the row-block index (both reshapes
    # collapse leading dims only: layout bitcasts, not copies). Measured
    # end-to-end equal to the legacy [1, bk/2, bn] 3D BlockSpec (r2 A/B,
    # 256-token runs: 150.0 vs 149.9 tok/s) — kept for its simpler 2D specs.
    n_layers, kp = packed.shape[0], packed.shape[1]
    kpb = kp // (block_k // 2)          # k-blocks per layer
    sg = k // group_size                # scale rows per layer (full-K block)
    if s_kblocked:                      # K-blocked flat-2D rows (bf16-capable)
        nkb = grid[2]
        s_spec = pl.BlockSpec((spk, block_n),
                              lambda i, j, kb, lref: (lref[0] * nkb + kb, j),
                              memory_space=pltpu.VMEM)
        s_arg = scales.reshape(n_layers * sg, n)
        body = _stacked_kernel
    elif sg % 8 == 0:                   # f32 sublane-aligned: flat 2D scales
        s_spec = pl.BlockSpec((sg, block_n),
                              lambda i, j, kb, lref: (lref[0], j),
                              memory_space=pltpu.VMEM)
        s_arg = scales.reshape(n_layers * sg, n)
        body = _stacked_kernel
    else:  # Mosaic needs block==array dims for odd row counts → 3D blocks
        s_spec = pl.BlockSpec((1, sg, block_n),
                              lambda i, j, kb, lref: (lref[0], 0, j),
                              memory_space=pltpu.VMEM)
        s_arg = scales
        body = _stacked_kernel_s3d
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((block_k // 2, block_n),
                         lambda i, j, kb, lref: (lref[0] * kpb + kb, j),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    wrapped = functools.partial(
        body, group_size=group_size, n_kblocks=grid[2], block_k=block_k,
        s_kblocked=s_kblocked)
    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        compiler_params=compiler_params,
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      x, packed.reshape(n_layers * kp, n), s_arg)


def _kouter_kernel(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                   group_size: int, n_kblocks: int, block_k: int):
    """K-OUTER restructure of _int4_matmul_kernel: grid (i, kb, j) with j
    innermost. Weight blocks stream j-inner across a K row band (sequential
    HBM addresses within the band), x stays resident across the whole band,
    and the full layer's scales sit in VMEM once (s_ref block is the
    [K/G, N] layer slab — no per-N-tile scale re-DMA). Accumulation lives in
    a [n_j, TM, TN] fp32 scratch indexed by j."""
    kb = pl.program_id(1)
    j = pl.program_id(2)
    gpp = PLANE // group_size
    n_sb = block_k // SUPERBLOCK
    bn = o_ref.shape[1]
    col0 = pl.multiple_of(j * bn, 128)

    @pl.when(kb == 0)
    def _init():
        acc_ref[j] = jnp.zeros_like(acc_ref[j])

    acc = acc_ref[j]
    for sb in range(n_sb):
        p = w_ref[sb * PLANE:(sb + 1) * PLANE, :].astype(jnp.int32)
        for plane in range(2):
            codes = ((p & 0x0F) if plane == 0 else (p >> 4)
                     ).astype(jnp.bfloat16)
            g0 = kb * (block_k // group_size) + (2 * sb + plane) * gpp
            x_plane = x_ref[:, (2 * sb + plane) * PLANE:
                            (2 * sb + plane + 1) * PLANE]
            for g in range(gpp):
                d_row = s_ref[pl.ds(g0 + g, 1), pl.ds(col0, bn)]  # [1, TN]
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                c_g = codes[g * group_size:(g + 1) * group_size, :]
                dot = jnp.dot(x_g, c_g, preferred_element_type=jnp.float32)
                xsum8 = jnp.sum(x_g.astype(jnp.float32), axis=1,
                                keepdims=True) * ZERO_POINT
                acc += (dot - xsum8) * d_row
    acc_ref[j] = acc

    @pl.when(kb == n_kblocks - 1)
    def _store():
        o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "block_k",
                     "interpret", "out_dtype"),
)
def _int4_matmul_kouter(x, packed, scales, layer_idx, *, group_size, block_m,
                        block_n, block_k, interpret=False,
                        out_dtype=jnp.bfloat16):
    """K-outer variant driver (stacked weights only; opt-in via
    DECODE_KOUTER). See _kouter_kernel."""
    m, k = x.shape
    assert packed.ndim == 3, "K-outer variant requires stacked weights"
    n_layers, kp, n = packed.shape
    sg = k // group_size
    assert sg % 8 == 0, (k, group_size)
    kpb = kp // (block_k // 2)
    grid = (m // block_m, k // block_k, n // block_n)
    kernel = functools.partial(_kouter_kernel, group_size=group_size,
                               n_kblocks=grid[1], block_k=block_k)
    flops = 2 * m * n * k
    bytes_accessed = m * k * 2 + n * k // 2 + (n * sg) * 4 + m * n * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k),
                         lambda i, kb, j, lref: (i, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k // 2, block_n),
                         lambda i, kb, j, lref: (lref[0] * kpb + kb, j),
                         memory_space=pltpu.VMEM),
            # whole layer's scales resident (constant index across the grid)
            pl.BlockSpec((sg, n), lambda i, kb, j, lref: (lref[0], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, kb, j, lref: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n // block_n, block_m, block_n),
                                   jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      x.astype(jnp.bfloat16), packed.reshape(n_layers * kp, n),
      scales.astype(jnp.float32).reshape(n_layers * sg, n))


def int4_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                group_size: int = 128, *, layer_idx=None,
                interpret: bool = False,
                block_m: int | None = None, block_n: int | None = None,
                block_k: int | None = None) -> jax.Array:
    """y[..., N] = x[..., K] @ dequant(packed, scales), fused in one kernel.

    x: [..., K] (bf16 recommended); packed: [K//2, N] uint8 QM_TPU (K-major);
    scales: [K//group_size, N] float. Alternatively packed/scales may carry a
    leading stacked-layer dim ([L, K//2, N] / [L, K//G, N]) with ``layer_idx``
    (traced scalar) selecting the layer inside the kernel — the zero-copy path
    for lax.scan over layer-stacked weights.

    Replaces Linear_FP_int4::forward dispatch (llm/src/ops/linear.cc:171-236):
    there is no GEMV/GEMM split — small M is padded to the bf16 sublane tile
    and the same kernel runs (the padding rows are dead MXU lanes, which the
    HBM-bound decode step never notices).
    """
    orig_shape = x.shape
    k = orig_shape[-1]
    stacked = packed.ndim == 3
    assert stacked == (layer_idx is not None), "layer_idx iff stacked weights"
    kp, n = packed.shape[-2:]
    # weights may carry a K padded at pack time (packing.padded_ic: scale
    # rows stay 8-sublane-aligned for shapes like llama-2's 11008); the pad
    # rows dequantize to 0, so zero-padding x makes the result exact
    kw = 2 * kp
    assert kw >= k and (kw - k) % group_size == 0, (packed.shape, k)
    assert kw % SUPERBLOCK == 0, f"K={kw} must be a multiple of {SUPERBLOCK}"
    assert scales.shape[-2:] == (kw // group_size, n), scales.shape
    assert group_size <= PLANE and PLANE % group_size == 0, group_size

    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    # Sublane alignment: bf16 tiles want M%16==0; pad (cheap, dead rows).
    pad = (-m) % 16
    if pad or kw > k:
        x2 = jnp.pad(x2, ((0, pad), (0, kw - k)))
    k = kw
    # Fat blocks: the kernel is VPU-bound on nibble unpack, and per-grid-step
    # fixed costs (pipeline bubbles, semaphores) showed up as ~2x wall time at
    # the old (512, 1024) blocking. (2048, 2048) = 2 MB weight tiles measured
    # fastest on v5e for the decode GEMV shapes. At prefill (M >= 512) a
    # taller M block halves the redundant per-M-block weight unpack; the N
    # block shrinks to keep the fp32 accumulator within VMEM.
    if block_m is None and m + pad >= 512:
        block_m = _pick_block(m + pad, 512, 16)
        block_n = block_n or _pick_block(n, 1024, 128)
    elif (block_n is None and block_k is None and stacked
          and m + pad < 512 and (k, n) in DECODE_KOUTER):
        bn, bk = DECODE_KOUTER[(k, n)]
        return _int4_matmul_kouter(
            x2.astype(jnp.bfloat16), packed, scales, layer_idx,
            group_size=group_size, block_m=_pick_block(m + pad, 256, 16),
            block_n=bn, block_k=bk, interpret=interpret
        )[:m].reshape(*orig_shape[:-1], n)
    elif block_n is None and block_k is None and (k, n) in DECODE_BLOCKS:
        block_n, block_k = DECODE_BLOCKS[(k, n)]
    block_m = block_m or _pick_block(m + pad, 256, 16)
    block_n = block_n or _pick_block(n, 2048, 128)
    block_k = block_k or _pick_block(k, 2048, SUPERBLOCK)

    if jnp.dtype(scales.dtype).itemsize == 2 \
            and (block_k // group_size) % 16 != 0:
        # half scales need 16-row K-blocked specs; tiny-K shapes that can't
        # tile that way upcast (a per-call cast, but only on small models)
        scales = scales.astype(jnp.float32)
    elif scales.dtype not in (jnp.float32, jnp.bfloat16):
        scales = scales.astype(jnp.float32)
    y = _int4_matmul_2d(
        x2.astype(jnp.bfloat16), packed, scales, layer_idx,
        group_size=group_size, block_m=block_m, block_n=block_n,
        block_k=block_k, interpret=interpret)
    y = y[:m]
    return y.reshape(*orig_shape[:-1], n)


# ---------------------------------------------------------------------------
# Decode-fused variant: RMS-norm prologue and/or residual-add epilogue run
# INSIDE the matmul kernel. At decode the non-matmul ops between Pallas calls
# (2 norms + 2 residual adds per layer, each its own tiny XLA kernel on a
# [1, E] row) cost ~186 us/step of pure launch/fusion overhead
# (scripts/bisect_decode.py) — folding them into the kernels the data already
# flows through removes those kernels entirely. The reference fights the same
# battle by hand-fusing norm into its GEMV epilogues on CUDA
# (kernels/cuda/gemv_cuda.cu:68-211).
#
# Constraint: the norm needs the WHOLE [M, K] activation row resident, so
# this variant runs with block_k == K (single K step, x DMA'd once). Decode
# weight blocks stay (2048, 2048)-shaped via block_n, so the streaming
# pattern matches the tuned default. Norm weights ride as a [L, 1, K]
# operand blocked (1, 1, K) — sublane dim 1 is legal because the block
# spans the full array dim (same rule as the small-model scales case).
# ---------------------------------------------------------------------------


def _fused_kernel(layer_ref, x_ref, w_ref, s_ref, *rest, group_size: int,
                  block_k: int, has_norm: bool, has_norm_b: bool,
                  has_bias: bool, has_res: bool,
                  has_rope: bool, qk_cols: int, head_dim: int,
                  norm_eps: float):
    """Single-K-step variant of _int4_matmul_kernel with optional in-kernel
    norm (prologue: RMSNorm, or LayerNorm when a norm bias rides along) and
    rotate-half RoPE / linear-bias / residual add (epilogues).
    Grid (I, J, 1). Operand order: [norm_w][norm_b][cos, sin][bias][residual]."""
    i = 0
    nw_ref = nb_ref = cos_ref = sin_ref = bias_ref = res_ref = None
    if has_norm:
        nw_ref = rest[i]; i += 1
    if has_norm_b:
        nb_ref = rest[i]; i += 1
    if has_rope:
        cos_ref, sin_ref = rest[i], rest[i + 1]; i += 2
    if has_bias:
        bias_ref = rest[i]; i += 1
    if has_res:
        res_ref = rest[i]; i += 1
    o_ref, acc_ref = rest[i], rest[i + 1]

    if has_norm and has_norm_b:
        # identical op order to ops.ref.layer_norm_ref (OPT/GPTBigCode):
        # f32 mean, variance, rsqrt, weight multiply, bias add, bf16 round
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + norm_eps)
              * nw_ref[0].astype(jnp.float32)
              + nb_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    elif has_norm:
        # identical op order to ops.ref.rms_norm_ref: f32 mean-square, rsqrt,
        # scale, weight multiply, round to bf16 — then the standard dot path
        xf = x_ref[:].astype(jnp.float32)
        rs = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                           + norm_eps)
        xn = (xf * rs * nw_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        xn = x_ref[:]

    gpp = PLANE // group_size
    n_sb = block_k // SUPERBLOCK
    acc = jnp.zeros_like(acc_ref)
    for sb in range(n_sb):
        p = w_ref[sb * PLANE:(sb + 1) * PLANE, :].astype(jnp.int32)
        for plane in range(2):
            codes = ((p & 0x0F) if plane == 0 else (p >> 4)
                     ).astype(jnp.bfloat16)
            g0 = (2 * sb + plane) * gpp
            x_plane = xn[:, (2 * sb + plane) * PLANE:
                         (2 * sb + plane + 1) * PLANE]
            for g in range(gpp):
                # static row slice (single K step) — bf16 scales legal here
                d_row = s_ref[g0 + g:g0 + g + 1, :].astype(jnp.float32)
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                c_g = codes[g * group_size:(g + 1) * group_size, :]
                dot = jnp.dot(x_g, c_g, preferred_element_type=jnp.float32)
                xsum8 = jnp.sum(x_g.astype(jnp.float32), axis=1,
                                keepdims=True) * ZERO_POINT
                acc += (dot - xsum8) * d_row


    y = acc.astype(o_ref.dtype)
    if has_rope:
        # rotate-half RoPE on the leading qk_cols output columns (q|k of the
        # fused qkv projection; v columns pass through). Matches
        # ref.apply_rotary's op order exactly: the projection output is
        # rounded to bf16 FIRST, then rotated in f32 with the same
        # pre-gathered f32 cos/sin rows, then rounded once.
        yf = y.astype(jnp.float32)
        bn = yf.shape[1]
        reps = bn // head_dim
        half = head_dim // 2
        cosb = jnp.tile(cos_ref[:].astype(jnp.float32), (1, reps))
        sinb = jnp.tile(sin_ref[:].astype(jnp.float32), (1, reps))
        # partner element at +-half within each head: two static lane rolls,
        # selected by position-in-head (wrapped lanes are never selected)
        r_left = jnp.concatenate([yf[:, half:], yf[:, :half]], axis=1)
        r_right = jnp.concatenate([yf[:, -half:], yf[:, :-half]], axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, yf.shape, 1)
        rotated = jnp.where(lane % head_dim < half, -r_left, r_right)
        roped = yf * cosb + rotated * sinb
        col0 = pl.program_id(1) * bn
        y = jnp.where(lane + col0 < qk_cols, roped, yf).astype(o_ref.dtype)
    if has_bias:
        # parity with apply_linear: bias is pre-cast to the output dtype by
        # the wrapper; the add computes in f32 and rounds once (XLA bf16-add
        # semantics)
        y = (y.astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
             ).astype(o_ref.dtype)
    if has_res:
        # matches the unfused path exactly: the kernel output is rounded to
        # bf16 FIRST, then added to the residual (XLA computes the add in
        # f32 and rounds once)
        y = (y.astype(jnp.float32) + res_ref[:].astype(jnp.float32)
             ).astype(o_ref.dtype)
    o_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "block_m", "block_n", "norm_eps",
                     "qk_cols", "head_dim", "interpret", "out_dtype"))
def _int4_matmul_fused_impl(x, packed, scales, layer_idx, norm_w, norm_b,
                            rope_cos, rope_sin, bias, residual, *,
                            group_size, block_m,
                            block_n, norm_eps, qk_cols=0, head_dim=128,
                            interpret=False,
                            out_dtype=jnp.bfloat16):
    m, k = x.shape
    n_layers, kp, n = packed.shape
    sg = k // group_size
    assert sg % 8 == 0, (k, group_size)
    if jnp.dtype(scales.dtype).itemsize == 2 and sg % 16 != 0:
        scales = scales.astype(jnp.float32)  # sublane legality fallback
    elif scales.dtype not in (jnp.float32, jnp.bfloat16):
        scales = scales.astype(jnp.float32)
    grid = (m // block_m, n // block_n, 1)
    has_norm = norm_w is not None
    has_norm_b = norm_b is not None
    has_rope = rope_cos is not None
    has_bias = bias is not None
    has_res = residual is not None
    assert has_norm or not has_norm_b
    assert not (has_rope and block_n % head_dim), (block_n, head_dim)
    kernel = functools.partial(
        _fused_kernel, group_size=group_size, block_k=k, has_norm=has_norm,
        has_norm_b=has_norm_b, has_bias=has_bias,
        has_res=has_res, has_rope=has_rope, qk_cols=qk_cols,
        head_dim=head_dim, norm_eps=norm_eps)

    x_spec = pl.BlockSpec((block_m, k), lambda i, j, kb, lref: (i, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((k // 2, block_n), lambda i, j, kb, lref: (lref[0], j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((sg, block_n), lambda i, j, kb, lref: (lref[0], j),
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(jnp.bfloat16), packed.reshape(n_layers * kp, n),
            scales.reshape(n_layers * sg, n)]
    nw_spec = pl.BlockSpec((1, 1, k), lambda i, j, kb, lref: (lref[0], 0, 0),
                           memory_space=pltpu.VMEM)
    if has_norm:
        in_specs.append(nw_spec)
        args.append(norm_w.reshape(n_layers, 1, k))
    if has_norm_b:
        in_specs.append(nw_spec)
        args.append(norm_b.reshape(n_layers, 1, k))
    if has_rope:
        rspec = pl.BlockSpec((block_m, head_dim),
                             lambda i, j, kb, lref: (i, 0),
                             memory_space=pltpu.VMEM)
        in_specs += [rspec, rspec]
        args += [rope_cos.astype(jnp.float32), rope_sin.astype(jnp.float32)]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_n), lambda i, j, kb, lref: (lref[0], 0, j),
            memory_space=pltpu.VMEM))
        # pre-cast to the output dtype = apply_linear's bias.astype(y.dtype)
        args.append(bias.reshape(n_layers, 1, n).astype(out_dtype))
    if has_res:
        in_specs.append(pl.BlockSpec(
            (block_m, block_n), lambda i, j, kb, lref: (i, j),
            memory_space=pltpu.VMEM))
        args.append(residual)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, j, kb, lref: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    flops = 2 * m * n * k
    bytes_accessed = m * k * 2 + n * k // 2 + n * sg * 4 + m * n * 2
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)


def int4_matmul_fused(x: jax.Array, packed: jax.Array, scales: jax.Array,
                      group_size: int = 128, *, layer_idx=None,
                      norm_w: jax.Array | None = None,
                      norm_b: jax.Array | None = None,
                      norm_eps: float = 1e-5,
                      rope_cos: jax.Array | None = None,
                      rope_sin: jax.Array | None = None,
                      rope_qk_cols: int = 0, head_dim: int = 128,
                      bias: jax.Array | None = None,
                      residual: jax.Array | None = None,
                      block_n: int | None = None,
                      interpret: bool = False) -> jax.Array:
    """Decode matmul with optional fused norm prologue and RoPE / bias /
    residual-add epilogues:
        y = rope(norm(x) @ dequant(W))  (+ bias) (+ residual).

    x: [..., K]; packed/scales stacked [L, K//2, N] / [L, K//G, N] with
    ``layer_idx``, or unstacked [K//2, N] / [K//G, N] (wrapped as L=1).
    norm_w: [L, K] (or [K] unstacked) norm weight — RMSNorm (llama), or
    LayerNorm when ``norm_b`` rides along (OPT/GPTBigCode,
    ops.ref.layer_norm_ref op order). bias: [L, N] / [N] linear bias
    (apply_linear parity: cast to out dtype, one rounded add). residual:
    same shape as the output. rope_cos/rope_sin: [M, head_dim] pre-gathered
    rows for each activation row; rotate-half RoPE is applied to the leading
    ``rope_qk_cols`` output columns (the q|k block of a fused qkv
    projection). Intended for small-M decode shapes; prefill keeps the
    blocked streaming kernel (launch overhead amortizes at M >= 512)."""
    orig_shape = x.shape
    k = orig_shape[-1]
    if packed.ndim == 2:
        assert layer_idx is None
        packed = packed[None]
        scales = scales[None]
        layer_idx = 0
        if norm_w is not None and norm_w.ndim == 1:
            norm_w = norm_w[None]
        if norm_b is not None and norm_b.ndim == 1:
            norm_b = norm_b[None]
        if bias is not None and bias.ndim == 1:
            bias = bias[None]
    assert layer_idx is not None
    kp, n = packed.shape[-2:]
    assert kp == k // 2, (
        "fused decode kernels need unpadded K (the in-kernel norm runs over "
        "the whole x block; pack-time-padded shapes — packing.padded_ic — "
        "must use the unfused path)", packed.shape, k)
    assert k % SUPERBLOCK == 0
    assert norm_w is None or norm_w.shape[-1] == k

    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    pad = (-m) % 16
    res2 = None
    if residual is not None:
        res2 = residual.reshape(-1, n)
        assert res2.shape[0] == m
    cos2 = sin2 = None
    if rope_cos is not None:
        cos2 = rope_cos.reshape(-1, head_dim)
        sin2 = rope_sin.reshape(-1, head_dim)
        assert cos2.shape[0] == m and rope_qk_cols % head_dim == 0
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
        if cos2 is not None:
            cos2 = jnp.pad(cos2, ((0, pad), (0, 0)))
            sin2 = jnp.pad(sin2, ((0, pad), (0, 0)))
    block_m = _pick_block(m + pad, 256, 16)
    if block_n is None:
        # single-K-step kernel: the whole [K//2, block_n] weight block lives
        # in VMEM double-buffered, so cap it at ~4 MiB (VMEM is ~16 MB/core;
        # K=14336 down-proj would need 14 MiB at block_n=2048)
        cap = max(128, (4 << 20) // kp // 128 * 128)
        block_n = _pick_block(n, min(2048, cap), 128)
    if rope_cos is not None and block_n % head_dim:
        block_n = _pick_block(n, block_n - block_n % head_dim, head_dim)

    y = _int4_matmul_fused_impl(
        x2.astype(jnp.bfloat16), packed, scales, layer_idx, norm_w, norm_b,
        cos2, sin2, bias, res2,
        group_size=group_size, block_m=block_m, block_n=block_n,
        norm_eps=float(norm_eps), qk_cols=int(rope_qk_cols),
        head_dim=int(head_dim), interpret=interpret)
    return y[:m].reshape(*orig_shape[:-1], n)


# ---------------------------------------------------------------------------
# GLU-fused variant: x = silu(gate) * up computed in-kernel from the fused
# [M, 2F] gate_up output — the down projection then never materializes the
# activation in HBM and the XLA silu/mul fusion disappears
# (Int4llamaDecoderLayer.cc:86-106 SiLuMul + down as one kernel).
# STATUS: opt-in. Measured ~4% slower end-to-end on v5e than the two-step
# composition (the act recomputes per N-tile and the pipeline carries two x
# streams); kept for M-large shapes / future Mosaic versions.
# ---------------------------------------------------------------------------

def _glu_kernel(layer_ref, g_ref, u_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    gate = g_ref[:].astype(jnp.float32)
    act = (jax.nn.sigmoid(gate) * gate * u_ref[:].astype(jnp.float32)
           ).astype(jnp.bfloat16)
    # the inner kernel only slices x_ref — a concrete in-register array works
    _int4_matmul_kernel(act, w_ref.at[0], s_ref.at[0], o_ref, acc_ref, **kw)


def int4_matmul_glu(gu: jax.Array, packed: jax.Array, scales: jax.Array,
                    group_size: int = 128, *, layer_idx,
                    interpret: bool = False) -> jax.Array:
    """y = silu(gu[..., :F]) * gu[..., F:] @ dequant(W_down).

    gu: [..., 2F] (the fused gate_up output); packed/scales layer-stacked
    [L, F//2, N] with ``layer_idx``. Returns [..., N]."""
    orig = gu.shape
    f = orig[-1] // 2
    n = packed.shape[-1]
    x2 = gu.reshape(-1, 2 * f)
    m = x2.shape[0]
    pad = (-m) % 16
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    block_m = _pick_block(m + pad, 256, 16) if m + pad < 512 else \
        _pick_block(m + pad, 512, 16)
    block_n = _pick_block(n, 2048, 128)
    block_k = _pick_block(f, 2048, SUPERBLOCK)
    grid = (x2.shape[0] // block_m, n // block_n, f // block_k)
    kblocks_per_half = f // block_k
    kernel = functools.partial(_glu_kernel, group_size=group_size,
                               n_kblocks=grid[2], block_k=block_k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb, lref: (i, kb),
                         memory_space=pltpu.VMEM),                     # gate
            pl.BlockSpec((block_m, block_k),
                         lambda i, j, kb, lref: (i, kb + kblocks_per_half),
                         memory_space=pltpu.VMEM),                     # up
            pl.BlockSpec((1, block_k // 2, block_n),
                         lambda i, j, kb, lref: (lref[0], kb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f // group_size, block_n),
                         lambda i, j, kb, lref: (lref[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n),
                               lambda i, j, kb, lref: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    y = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      x2.astype(jnp.bfloat16), x2.astype(jnp.bfloat16), packed,
      scales.astype(jnp.float32))
    return y[:m].reshape(*orig[:-1], n)


# ---------------------------------------------------------------------------
# W4A8: runtime INT8 activation quantization fused into the int4 matmul
# ---------------------------------------------------------------------------

def _int4_a8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                    group_size: int, n_kblocks: int, block_k: int,
                    s_kblocked: bool = False):
    """W4A8 variant (the reference's x86/ARM headline path,
    kernels/avx/matmul_avx_int8_int4.cc:325-357): activations are quantized
    per (row, group) to int8 IN-KERNEL (absmax/127, the
    quantize_fp_to_int8_block_size32 semantics at group granularity), the
    dot runs s8 x s8 → i32 on the MXU, and the product of activation and
    weight scales requantizes the i32 group dot:
        acc += (dot_i32 - 8 * rowsum(q_a)) * a_scale * d.
    The [M, G] quantize work is negligible next to the [128, TN] weight
    unpack; accumulation stays fp32."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gpp = PLANE // group_size
    n_sb = block_k // SUPERBLOCK
    acc = acc_ref[:]
    for sb in range(n_sb):
        p = w_ref[sb * PLANE:(sb + 1) * PLANE, :].astype(jnp.int32)
        for plane in range(2):
            codes = ((p & 0x0F) if plane == 0 else (p >> 4)
                     ).astype(jnp.int8)
            g0 = ((2 * sb + plane) * gpp if s_kblocked
                  else kb * (block_k // group_size) + (2 * sb + plane) * gpp)
            x_plane = x_ref[:, (2 * sb + plane) * PLANE:
                            (2 * sb + plane + 1) * PLANE].astype(jnp.float32)
            for g in range(gpp):
                if s_kblocked:
                    d_row = s_ref[g0 + g:g0 + g + 1, :].astype(jnp.float32)
                else:
                    d_row = s_ref[pl.ds(g0 + g, 1), :]            # [1, TN]
                x_g = x_plane[:, g * group_size:(g + 1) * group_size]
                absmax = jnp.max(jnp.abs(x_g), axis=1, keepdims=True)
                a_scale = jnp.maximum(absmax, 1e-8) / 127.0       # [M, 1]
                q_a = jnp.clip(jnp.round(x_g / a_scale), -127, 127
                               ).astype(jnp.int8)
                c_g = codes[g * group_size:(g + 1) * group_size, :]
                dot = jax.lax.dot_general(
                    q_a, c_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)             # [M, TN]
                qsum = jnp.sum(q_a.astype(jnp.int32), axis=1, keepdims=True)
                acc += ((dot - ZERO_POINT * qsum).astype(jnp.float32)
                        * a_scale) * d_row
    acc_ref[:] = acc

    @pl.when(kb == n_kblocks - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _a8_stacked_kernel(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    # layer offset folded into the flattened-2D BlockSpec index maps
    _int4_a8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, **kw)


def _a8_stacked_kernel_s3d(layer_ref, x_ref, w_ref, s_ref, o_ref, acc_ref,
                           **kw):
    # 3D-blocked scales for K/G not a multiple of 8 (see _stacked_kernel_s3d)
    _int4_a8_kernel(x_ref, w_ref, s_ref.at[0], o_ref, acc_ref, **kw)


def int4_matmul_a8(x: jax.Array, packed: jax.Array, scales: jax.Array,
                   group_size: int = 128, *, layer_idx=None,
                   interpret: bool = False) -> jax.Array:
    """W4A8 fused matmul: same packed weights/API as int4_matmul, activations
    dynamically quantized to int8 per (row, group) inside the kernel."""
    orig_shape = x.shape
    k = orig_shape[-1]
    stacked = packed.ndim == 3
    assert stacked == (layer_idx is not None)
    kp, n = packed.shape[-2:]
    kw = 2 * kp  # pack-time padded K (see int4_matmul); pad groups dot to 0
    assert kw >= k and (kw - k) % group_size == 0 and kw % SUPERBLOCK == 0
    assert scales.shape[-2:] == (kw // group_size, n), scales.shape
    assert group_size <= PLANE and PLANE % group_size == 0

    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    pad = (-m) % 16
    if pad or kw > k:
        x2 = jnp.pad(x2, ((0, pad), (0, kw - k)))
    k = kw
    block_m = _pick_block(m + pad, 256, 16)
    if (k, n) in DECODE_BLOCKS and m + pad < 512:  # same tuning hook as
        block_n, block_k = DECODE_BLOCKS[(k, n)]   # int4_matmul (w4a16)
        block_n = _pick_block(n, block_n, 128)
        block_k = _pick_block(k, block_k, SUPERBLOCK)
    else:
        block_n = _pick_block(n, 2048, 128)
        block_k = _pick_block(k, 2048, SUPERBLOCK)
    if block_m >= 256:
        # large-M (prefill) tiles: the in-kernel act-quant temporaries
        # (dot i32, requant f32 — all [block_m, block_n]) live on the
        # Mosaic stack; (256, 2048) tiles exceeded the 16M scoped-vmem
        # limit on chip (AOT OOM, r4). Shrink the tile so the unrolled
        # group-loop temporaries fit; weight re-reads stay <= m/512.
        block_m = _pick_block(m + pad, 512, 16)
        block_n = _pick_block(n, 512, 128)
        block_k = _pick_block(k, 512, SUPERBLOCK)

    grid = (x2.shape[0] // block_m, n // block_n, k // block_k)
    spk = block_k // group_size
    if jnp.dtype(scales.dtype).itemsize == 2 and spk % 16 != 0:
        scales = scales.astype(jnp.float32)  # tiny-K fallback (see int4_matmul)
    elif scales.dtype not in (jnp.float32, jnp.bfloat16):
        scales = scales.astype(jnp.float32)
    s_kblocked = jnp.dtype(scales.dtype).itemsize == 2
    cost = pl.CostEstimate(flops=2 * m * n * k,
                           bytes_accessed=m * k + n * k // 2, transcendentals=0)
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))
    x_spec = pl.BlockSpec((block_m, block_k), lambda i, j, kb, *_: (i, kb),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_m, block_n), lambda i, j, kb, *_: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((x2.shape[0], n), jnp.bfloat16)
    scratch = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    kw = dict(group_size=group_size, n_kblocks=grid[2], block_k=block_k,
              s_kblocked=s_kblocked)

    if not stacked:
        if s_kblocked:
            flat_s_spec = pl.BlockSpec((spk, block_n),
                                       lambda i, j, kb: (kb, j),
                                       memory_space=pltpu.VMEM)
        else:
            flat_s_spec = pl.BlockSpec((k // group_size, block_n),
                                       lambda i, j, kb: (0, j),
                                       memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            functools.partial(_int4_a8_kernel, **kw),
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((block_k // 2, block_n), lambda i, j, kb: (kb, j),
                             memory_space=pltpu.VMEM),
                flat_s_spec,
            ],
            out_specs=out_spec, out_shape=out_shape, scratch_shapes=scratch,
            cost_estimate=cost, compiler_params=compiler_params,
            interpret=interpret,
        )(x2.astype(jnp.bfloat16), packed, scales)
    else:
        # flattened-2D stacked addressing (see _int4_matmul_2d)
        n_layers, kp = packed.shape[0], packed.shape[1]
        kpb = kp // (block_k // 2)
        sg = k // group_size
        if s_kblocked:
            nkb = grid[2]
            s_spec = pl.BlockSpec((spk, block_n),
                                  lambda i, j, kb, lref: (lref[0] * nkb + kb, j),
                                  memory_space=pltpu.VMEM)
            s_arg = scales.reshape(n_layers * sg, n)
            body = _a8_stacked_kernel
        elif sg % 8 == 0:
            s_spec = pl.BlockSpec((sg, block_n),
                                  lambda i, j, kb, lref: (lref[0], j),
                                  memory_space=pltpu.VMEM)
            s_arg = scales.astype(jnp.float32).reshape(n_layers * sg, n)
            body = _a8_stacked_kernel
        else:
            s_spec = pl.BlockSpec((1, sg, block_n),
                                  lambda i, j, kb, lref: (lref[0], 0, j),
                                  memory_space=pltpu.VMEM)
            s_arg = scales.astype(jnp.float32)
            body = _a8_stacked_kernel_s3d
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((block_k // 2, block_n),
                             lambda i, j, kb, lref: (lref[0] * kpb + kb, j),
                             memory_space=pltpu.VMEM),
                s_spec,
            ],
            out_specs=out_spec, scratch_shapes=scratch)
        y = pl.pallas_call(
            functools.partial(body, **kw),
            grid_spec=grid_spec, out_shape=out_shape, cost_estimate=cost,
            compiler_params=compiler_params, interpret=interpret,
        )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
          x2.astype(jnp.bfloat16), packed.reshape(n_layers * kp, n), s_arg)
    y = y[:m]
    return y.reshape(*orig_shape[:-1], n)


def int4_matmul_a8_xla(x: jax.Array, packed: jax.Array, scales: jax.Array,
                       group_size: int = 128) -> jax.Array:
    """XLA reference for the W4A8 path (same quantization semantics)."""
    from tinychatengine_tpu.ops.ref import dequantize_int4
    k = x.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    g = x2.reshape(x2.shape[0], k // group_size, group_size)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    a_scale = jnp.maximum(absmax, 1e-8) / 127.0
    q_a = jnp.clip(jnp.round(g / a_scale), -127, 127)
    xq = (q_a * a_scale).reshape(x2.shape)  # fake-quantized activations
    w = dequantize_int4(packed, scales, group_size, dtype=jnp.float32)[:k]
    y = jnp.einsum("mk,kn->mn", xq, w, preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16).reshape(*x.shape[:-1], -1)


def int4_matmul_xla(x: jax.Array, packed: jax.Array, scales: jax.Array,
                    group_size: int = 128) -> jax.Array:
    """XLA-only fallback (dequantize to bf16 via jnp, then matmul). Correctness
    baseline and perf comparison point; materializes W in bf16 (4x the HBM
    traffic of the fused kernel at decode)."""
    from tinychatengine_tpu.ops.ref import dequantize_int4
    w = dequantize_int4(packed, scales, group_size, dtype=jnp.bfloat16)
    w = w[:x.shape[-1]]  # drop pack-time K padding (dequant-0 rows)
    return jnp.einsum("...k,kn->...n", x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32).astype(x.dtype)
