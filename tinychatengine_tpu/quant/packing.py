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


def pack_qm_tpu(q: np.ndarray) -> np.ndarray:
    """Pack uint4 codes ``q [OC, IC]`` (values 0..15, OC-major as produced by
    the quantizer) → QM_TPU ``packed [IC//2, OC]`` uint8."""
    oc, ic = q.shape
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


def pack_scales(scales: np.ndarray, dtype: str = "f32") -> np.ndarray:
    """Quantizer scales ``[OC, IC//G]`` → kernel layout ``[IC//G, OC]``.

    ``dtype``: storage precision. "bf16" mirrors the reference's
    half-precision scale storage (quantize_methods.py QM_* emit fp16) in the
    TPU-native half format and halves scale HBM traffic; "f32" (default)
    keeps full precision (used where exact f32-scale parity is asserted).
    QuantConfig.scale_dtype selects the conversion-time storage."""
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
