"""QM_TPU: the single TPU-native packed INT4 weight layout.

The reference maintains four device-specific offline packing layouts —
QM_x86 (q4_3), QM_ARM (q4_4), QM_METAL (q4_2), QM_CUDA (q4_5/q4_6)
(llm/tools/quantize_methods.py, llm/tools/model_quantizer.py:26-31) — each
chosen so the target ISA can unpack nibbles with cheap vector ops. QM_TPU
collapses them into one layout chosen for the TPU memory system:

  * Weights are stored **K-major** (input-channel major): ``packed
    [IC//2, OC] uint8`` — the orientation the MXU consumes directly
    (``y = x @ W``), with the output-channel axis on the 128-wide lane
    dimension (the same reasoning as the CUDA GEMM layout q4_5's
    ``[IC, OC//8]``, re-derived for TPU tiling).
  * Nibble pairing runs along IC in superblocks of 2*PLANE rows: within
    superblock ``s``, byte row ``i`` (0 <= i < PLANE) holds

        low  nibble = w[s*2*PLANE + i,         :]   (plane 0)
        high nibble = w[s*2*PLANE + PLANE + i, :]   (plane 1)

    Unpacking a block therefore yields two plane tiles that are contiguous
    *sublane* runs of the unpacked tile — a sublane-dim stack + reshape with
    no lane shuffle (the analog of QM_x86's two-block interleave trick,
    quantize_methods.py:188-201, solved once for TPU).
  * Per-group scales are stored ``[IC//group_size, OC]`` so a K-blocked
    Pallas kernel slices them with lane-aligned blocks and broadcasts along
    sublanes with a cheap repeat.

With group_size=128, each nibble plane (128 IC rows) aligns exactly with one
quant group.
"""

from __future__ import annotations

import numpy as np

PLANE = 128  # sublane rows per nibble plane
SUPERBLOCK = 2 * PLANE
ZERO_POINT_CODE = 8  # dequantizes to exactly 0: (8 - 8) * d


def padded_ic(ic: int, group_size: int) -> int:
    """IC rounded up so the Mosaic scale specs are always legal: a scale row
    count (IC/G) above one f32 sublane tile (8) must be a multiple of 8 —
    shapes like llama-2's 11008 (86 groups) otherwise fail to lower on real
    silicon ("Slice shape along dimension 1 must be aligned to tiling (8),
    but is 86" — bench_vlm r4), a failure CPU interpret mode cannot see.
    Row counts <= 8 lower fine as full-dim 3D blocks (the small-model case,
    chip-validated) and stay unpadded. Padded K rows carry the zero-point
    code (dequant == 0 exactly) and span whole groups, so both the W4A16
    and W4A8 kernels contribute exactly 0 for them with zero-padded x."""
    import math
    sg = ic // group_size
    if sg <= 8 or sg % 8 == 0:
        return ic
    unit = math.lcm(8 * group_size, SUPERBLOCK)
    return -(-ic // unit) * unit


def pack_qm_tpu(q: np.ndarray, group_size: int | None = None) -> np.ndarray:
    """Pack uint4 codes ``q [OC, IC]`` (values 0..15, OC-major as produced by
    the quantizer) → QM_TPU ``packed [IC_pad//2, OC]`` uint8.

    ``group_size``: when given, IC is padded to ``padded_ic`` with the
    zero-point code (rows dequantize to exactly 0)."""
    oc, ic = q.shape
    if group_size is not None and padded_ic(ic, group_size) != ic:
        pad = padded_ic(ic, group_size) - ic
        q = np.concatenate(
            [q, np.full((oc, pad), ZERO_POINT_CODE, q.dtype)], axis=1)
        ic += pad
    assert ic % SUPERBLOCK == 0, f"IC={ic} must be a multiple of {SUPERBLOCK}"
    qt = q.astype(np.uint8).T  # [IC, OC]
    qt = qt.reshape(ic // SUPERBLOCK, 2, PLANE, oc)
    lo, hi = qt[:, 0], qt[:, 1]  # each [nsb, PLANE, OC]
    return (lo | (hi << 4)).reshape(ic // 2, oc)


def unpack_qm_tpu(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_qm_tpu → uint8 codes [OC, IC] in [0, 15]."""
    icp, oc = packed.shape
    p = packed.reshape(icp // PLANE, PLANE, oc)
    lo = p & 0x0F
    hi = (p >> 4) & 0x0F
    qt = np.stack([lo, hi], axis=1).reshape(icp * 2, oc)  # [IC, OC]
    return qt.T.copy()


def pack_scales(scales: np.ndarray, dtype: str = "f32",
                group_size: int | None = None) -> np.ndarray:
    """Quantizer scales ``[OC, IC//G]`` → kernel layout ``[IC//G, OC]``.

    ``dtype``: storage precision. "bf16" mirrors the reference's
    half-precision scale storage (quantize_methods.py QM_* emit fp16) in the
    TPU-native half format and halves scale HBM traffic; "f32" (default)
    keeps full precision (used where exact f32-scale parity is asserted).
    QuantConfig.scale_dtype selects the conversion-time storage.

    ``group_size``: when given, group rows pad to padded_ic//G with 0.0
    (must match the pack_qm_tpu padding; padded groups contribute exactly
    0 in-kernel)."""
    if group_size is not None:
        oc, sg = scales.shape
        sgp = padded_ic(sg * group_size, group_size) // group_size
        if sgp != sg:
            scales = np.concatenate(
                [scales, np.zeros((oc, sgp - sg), scales.dtype)], axis=1)
    out = np.ascontiguousarray(scales.T)
    if dtype == "bf16":
        import ml_dtypes
        return out.astype(ml_dtypes.bfloat16)
    assert dtype == "f32", dtype
    return out


def pad_to_superblock(w: np.ndarray) -> np.ndarray:
    """Zero-pad the IC axis (last) of ``w [OC, IC]`` up to a SUPERBLOCK
    multiple (tools use this for models whose dims aren't 256-aligned)."""
    oc, ic = w.shape
    rem = (-ic) % SUPERBLOCK
    if rem == 0:
        return w
    return np.concatenate([w, np.zeros((oc, rem), dtype=w.dtype)], axis=1)
