"""QM_TPU: the single TPU-native packed INT4 weight layout.

The reference maintains four device-specific offline packing layouts —
QM_x86 (q4_3), QM_ARM (q4_4), QM_METAL (q4_2), QM_CUDA (q4_5/q4_6)
(llm/tools/quantize_methods.py, llm/tools/model_quantizer.py:26-31) — each
chosen so the target ISA can unpack nibbles with cheap vector ops. QM_TPU
collapses them into one layout chosen for the TPU VPU (8×128 lanes):

    Weights ``w [OC, IC]`` (uint4 codes) are packed two-per-byte into
    ``packed [OC, IC // 2]`` uint8. The IC axis is split into superblocks of
    2*PLANE (PLANE = 128 = one lane register row). Within superblock ``s``,
    byte ``i`` (0 <= i < PLANE) holds:

        low  nibble = w[:, s*2*PLANE + i]           (plane 0)
        high nibble = w[:, s*2*PLANE + PLANE + i]   (plane 1)

    i.e. packed[:, s*PLANE + i] = lo | (hi << 4).

Unpacking a 128-lane byte tile therefore yields two 128-lane int tiles that
are *contiguous* halves of the 256-wide unpacked tile — a sublane-dimension
stack + reshape, with no lane interleave (the analog of QM_x86's
two-block-interleave trick, quantize_methods.py:188-201, solved once for TPU).

With group_size=128 each nibble plane aligns exactly with one quant group, so
scale application is a per-plane broadcast.
"""

from __future__ import annotations

import numpy as np

PLANE = 128  # lanes per nibble plane (TPU lane width)
SUPERBLOCK = 2 * PLANE


def pack_qm_tpu(q: np.ndarray) -> np.ndarray:
    """Pack uint4 codes ``q [OC, IC]`` (values 0..15) → uint8 [OC, IC//2]."""
    oc, ic = q.shape
    assert ic % SUPERBLOCK == 0, f"IC={ic} must be a multiple of {SUPERBLOCK}"
    q = q.astype(np.uint8).reshape(oc, ic // SUPERBLOCK, 2, PLANE)
    lo, hi = q[:, :, 0, :], q[:, :, 1, :]
    return (lo | (hi << 4)).reshape(oc, ic // 2)


def unpack_qm_tpu(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_qm_tpu → uint8 [OC, IC] codes in [0, 15]."""
    oc, icp = packed.shape
    p = packed.reshape(oc, icp // PLANE, PLANE)
    lo = p & 0x0F
    hi = (p >> 4) & 0x0F
    return np.stack([lo, hi], axis=2).reshape(oc, icp * 2)


def pad_to_superblock(w: np.ndarray) -> np.ndarray:
    """Zero-pad the IC axis up to a SUPERBLOCK multiple (tools use this for
    models whose dims aren't 256-aligned)."""
    oc, ic = w.shape
    rem = (-ic) % SUPERBLOCK
    if rem == 0:
        return w
    return np.concatenate([w, np.zeros((oc, rem), dtype=w.dtype)], axis=1)
