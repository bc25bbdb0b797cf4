"""Quantization numerics + QM_TPU packing tests.

Mirror of the reference's quantizer invariants (llm/tools/quantize_methods.py
q4_3/q4_4/q4_6 share numerics, differ only in layout; here one layout)."""

import numpy as np
import pytest

from tinychatengine_tpu.quant.numerics import (
    dequantize_groupwise_int4,
    quantize_groupwise_int4,
    quantize_tensor_int8,
)
from tinychatengine_tpu.quant.packing import (
    pack_qm_tpu,
    pack_scales,
    pad_to_superblock,
    unpack_qm_tpu,
)


@pytest.mark.parametrize("group_size", [32, 128])
def test_int4_roundtrip_error_bound(group_size):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 512)).astype(np.float32)
    q, scales = quantize_groupwise_int4(w, group_size)
    assert q.dtype == np.uint8 and q.max() <= 15
    assert scales.shape == (64, 512 // group_size)
    deq = dequantize_groupwise_int4(q, scales, group_size)
    # max error per element is bounded by the group scale (one quant step)
    step = np.abs(np.repeat(scales, group_size, axis=1))
    assert np.all(np.abs(deq - w) <= step + 1e-6)


def test_int4_reference_numerics_exact():
    """Hand-check against the formula d=max/-8, q=clip(x/d+8.5,0,15)
    (quantize_methods.py:212-232)."""
    w = np.array([[8.0, -4.0, 2.0, -1.0] * 8], dtype=np.float32)  # group of 32
    q, scales = quantize_groupwise_int4(w, 32)
    d = 8.0 / -8.0  # max-|.|-element is +8.0 → d = -1.0
    assert scales[0, 0] == d
    expected = np.clip(w / d + 8.5, 0, 15).astype(np.uint8)
    np.testing.assert_array_equal(q, expected)


def test_int4_negative_absmax():
    """Signed absmax: a group dominated by a negative value gives positive d."""
    w = np.zeros((1, 32), dtype=np.float32)
    w[0, 3] = -16.0
    q, scales = quantize_groupwise_int4(w, 32)
    assert scales[0, 0] == 2.0  # -16 / -8
    assert q[0, 3] == 0  # -16/2 + 8.5 = 0.5 → clip floor→ uint8 cast truncates to 0


def test_zero_group():
    w = np.zeros((2, 64), dtype=np.float32)
    q, scales = quantize_groupwise_int4(w, 32)
    deq = dequantize_groupwise_int4(q, scales, 32)
    np.testing.assert_array_equal(deq, w)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 16, size=(16, 1024), dtype=np.uint8)
    packed = pack_qm_tpu(q)
    assert packed.shape == (512, 16)  # K-major [IC//2, OC]
    np.testing.assert_array_equal(unpack_qm_tpu(packed), q)


def test_pack_layout_planes():
    """Byte row s*128+i of column n = w[n, s*256+i] | (w[n, s*256+128+i] << 4)."""
    q = (np.arange(2 * 512, dtype=np.uint16).reshape(2, 512) % 16).astype(np.uint8)
    packed = pack_qm_tpu(q)
    for n in range(2):
        for s in range(2):
            for i in range(0, 128, 17):
                assert packed[s * 128 + i, n] == (
                    q[n, s * 256 + i] | (q[n, s * 256 + 128 + i] << 4))


def test_pack_scales_layout():
    s = np.arange(12, dtype=np.float32).reshape(3, 4)  # [OC=3, IC//G=4]
    st = pack_scales(s)
    assert st.shape == (4, 3)
    np.testing.assert_array_equal(st, s.T)


def test_pad_to_superblock():
    w = np.ones((4, 300), dtype=np.float32)
    p = pad_to_superblock(w)
    assert p.shape == (4, 512)
    np.testing.assert_array_equal(p[:, :300], w)
    assert np.all(p[:, 300:] == 0)


def test_int8_per_tensor():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 32)).astype(np.float32) * 3
    q, s = quantize_tensor_int8(x)
    assert q.dtype == np.int8
    np.testing.assert_allclose(q.astype(np.float32) * s, x, atol=s * 0.5 + 1e-6)
