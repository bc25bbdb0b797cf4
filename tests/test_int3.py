"""INT3 bytes-lever experiment (r5): packing round-trip + kernel vs oracle.

The kernel itself is an opt-in experiment (ops/int3_matmul.py, PERF.md W3
section); these tests pin its correctness on the CPU interpreter so the
on-chip A/B (scripts/exp_w3.py) measures speed, not bugs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.ops.int3_matmul import (int3_matmul, int3_matmul_ref,
                                                pack_qm_tpu3, unpack_qm_tpu3)
from tinychatengine_tpu.quant.numerics import (dequantize_groupwise_int3,
                                               quantize_groupwise_int3)


def test_int3_quantize_roundtrip():
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((64, 2048)) * 0.1).astype(np.float32)
    q, d = quantize_groupwise_int3(w, 128)
    assert q.min() >= 0 and q.max() <= 7
    wdq = dequantize_groupwise_int3(q, d, 128)
    # absmax int3: |err| <= |d|/2 for in-range values, <= |d| at the
    # asymmetric clip edge (code 7, the same edge int4 has at 15)
    step = np.abs(d).repeat(128, axis=1)
    assert (np.abs(wdq - w) <= step + 1e-7).all()
    assert (np.abs(wdq - w) <= step / 2 + 1e-7).mean() > 0.95
    # the signed absmax element itself is exact (code 0)
    gmax = np.take_along_axis(
        w.reshape(64, -1, 128),
        np.argmax(np.abs(w.reshape(64, -1, 128)), -1)[..., None], -1)[..., 0]
    gmax_dq = np.take_along_axis(
        wdq.reshape(64, -1, 128),
        np.argmax(np.abs(w.reshape(64, -1, 128)), -1)[..., None], -1)[..., 0]
    np.testing.assert_allclose(gmax_dq, gmax, rtol=1e-6)


def test_int3_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 8, (256, 2048)).astype(np.uint8)
    pa, pb = pack_qm_tpu3(q)
    assert pa.shape == (512, 256) and pb.shape == (256, 256)
    np.testing.assert_array_equal(unpack_qm_tpu3(pa, pb), q)


def test_int3_kernel_matches_oracle():
    rng = np.random.default_rng(2)
    m, k, n, g = 8, 2048, 512, 128
    w = (rng.standard_normal((n, k)) * 0.08).astype(np.float32)
    q, d = quantize_groupwise_int3(w, g)
    pa, pb = pack_qm_tpu3(q)
    scales = jnp.asarray(np.ascontiguousarray(d.T))        # [K//G, N]
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.bfloat16)
    want = int3_matmul_ref(x, pa, pb, scales, g)
    got = int3_matmul(x, jnp.asarray(pa), jnp.asarray(pb), scales,
                      group_size=g, block_k=1024, block_n=256,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.05)
