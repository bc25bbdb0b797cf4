"""Group-wise INT4 quantization numerics — exact reference parity.

Reproduces the quantization math shared by every QM_* packer in the reference
(llm/tools/quantize_methods.py:212-232 and :188-242 / :299-442):

    per group of ``group_size`` consecutive input-channel weights:
        max  = element with the largest |value| (signed!)
        d    = max / -8                      (scale)
        q    = clip(x / d + 8.5, 0, 15)      (uint4, implicit zero point 8)
    dequant:
        x'   = (q - 8) * d

Packing *layout* is TPU-specific (see packing.py) — the numerics here are the
part that must match bit-for-bit so perplexity deltas are attributable to the
AWQ scheme rather than our implementation.
"""

from __future__ import annotations

import numpy as np

ZERO_POINT = 8.0  # implicit zp for all no-offset paths (quantize_methods.py:226)


def quantize_groupwise_int4(w: np.ndarray, group_size: int = 128):
    """Quantize ``w [OC, IC]`` (float) to uint4 codes + per-group scales.

    Returns:
      q:      uint8 [OC, IC]   values in [0, 15] (unpacked codes)
      scales: float32 [OC, IC // group_size]
    """
    w = np.asarray(w, dtype=np.float32)
    oc, ic = w.shape
    assert ic % group_size == 0, (ic, group_size)
    g = w.reshape(oc, ic // group_size, group_size)

    # signed value with max |.| per group (quantize_methods.py:214-217)
    idx = np.argmax(np.abs(g), axis=-1)
    max_vals = np.take_along_axis(g, idx[..., None], axis=-1)[..., 0]
    d = max_vals / -8.0
    inv_d = np.where(d == 0.0, 0.0, np.divide(1.0, d, where=d != 0.0))

    q = np.clip(g * inv_d[..., None] + 8.5, 0.0, 15.0).astype(np.uint8)
    return q.reshape(oc, ic), d.astype(np.float32)


def dequantize_groupwise_int4(q: np.ndarray, scales: np.ndarray, group_size: int = 128):
    """Inverse of quantize_groupwise_int4 (reference dequant semantics:
    kernels/matmul_int4.cc naive loops — ``(q - 8) * d``)."""
    oc, ic = q.shape
    g = q.reshape(oc, ic // group_size, group_size).astype(np.float32)
    return ((g - ZERO_POINT) * scales[..., None]).reshape(oc, ic).astype(np.float32)


def quantize_tensor_int8(x: np.ndarray):
    """Per-tensor symmetric int8 quantization (SmoothQuant static-scale
    export, llm/tools/opt_smooth_exporter.py): q = clip(round(x/s), -128, 127),
    s = absmax / 127."""
    x = np.asarray(x, dtype=np.float32)
    s = float(np.max(np.abs(x))) / 127.0
    if s == 0.0:
        s = 1.0
    q = np.clip(np.round(x / s), -128, 127).astype(np.int8)
    return q, np.float32(s)


# ---- sub-4-bit: group-wise INT3 (r5 bytes-lever experiment) -----------------
# Same absmax family as the reference's int4 (d = max/-2^(b-1), +0.5 offset
# round, implicit midpoint zero): bits=3 → d = max/-4, q = clip(x/d + 4.5,
# 0, 7), dequant (q - 4) * d. Weight bytes drop to 3/8 per weight (75% of
# int4); see ops/int3_matmul.py for the bitplane layout and PERF.md for the
# measured keep/kill decision.

ZERO_POINT3 = 4.0


def quantize_groupwise_int3(w: np.ndarray, group_size: int = 128):
    """w [OC, IC] float → uint8 codes in [0, 7] + per-group f32 scales."""
    w = np.asarray(w, dtype=np.float32)
    oc, ic = w.shape
    assert ic % group_size == 0, (ic, group_size)
    g = w.reshape(oc, ic // group_size, group_size)
    idx = np.argmax(np.abs(g), axis=-1)
    max_vals = np.take_along_axis(g, idx[..., None], axis=-1)[..., 0]
    d = max_vals / -4.0
    inv_d = np.where(d == 0.0, 0.0, np.divide(1.0, d, where=d != 0.0))
    q = np.clip(g * inv_d[..., None] + 4.5, 0.0, 7.0).astype(np.uint8)
    return q.reshape(oc, ic), d.astype(np.float32)


def dequantize_groupwise_int3(q: np.ndarray, scales: np.ndarray,
                              group_size: int = 128):
    oc, ic = q.shape
    g = q.reshape(oc, ic // group_size, group_size).astype(np.float32)
    return ((g - ZERO_POINT3) * scales[..., None]).reshape(oc, ic) \
        .astype(np.float32)
