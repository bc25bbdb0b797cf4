"""Pallas fused dequant-int4 matmul vs the jnp oracle (interpret mode on CPU).

Plays the role of test_ops.cc's int4 linear cases (tests/non_cuda/test_ops.cc)
with the naive ref kernel as oracle (kernels/matmul_int4.cc pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.ops.int4_matmul import int4_matmul, int4_matmul_xla
from tinychatengine_tpu.ops.ref import int4_matmul_ref
from tinychatengine_tpu.quant.numerics import quantize_groupwise_int4
from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales


def _mk(m, n, k, group_size, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32)
    q, scales = quantize_groupwise_int4(w, group_size)
    return (jnp.asarray(x, jnp.bfloat16), jnp.asarray(pack_qm_tpu(q)),
            jnp.asarray(pack_scales(scales)))


@pytest.mark.parametrize("m,n,k,g", [
    (1, 256, 512, 128),     # decode GEMV shape
    (16, 256, 512, 128),    # small batch decode
    (128, 512, 1024, 128),  # prefill GEMM
    (7, 256, 512, 128),     # unaligned M (padding path)
    (16, 256, 512, 32),     # reference CPU group size
    (16, 384, 768, 128),    # non-power-of-two N/K multiples
])
def test_pallas_matches_ref(m, n, k, g):
    x, packed, scales = _mk(m, n, k, g)
    oracle = int4_matmul_ref(x, packed, scales, g)          # f32 weights oracle
    xla = int4_matmul_xla(x, packed, scales, g)             # bf16 weights, XLA
    got = int4_matmul(x, packed, scales, g, interpret=True)
    assert got.shape == oracle.shape and got.dtype == oracle.dtype
    # vs the XLA dequant path (rounding differs: the kernel factors the
    # zero-point/scale out of the dot, XLA rounds W to bf16 elementwise)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(xla, np.float32),
        rtol=2e-2, atol=0.05)
    # loose vs the f32 oracle (bf16 weight-rounding tail scales with sqrt(K))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(oracle, np.float32),
        rtol=2e-2, atol=0.1)


def test_batched_leading_dims():
    x, packed, scales = _mk(6, 256, 512, 128)
    x3 = x.reshape(2, 3, 512)
    got = int4_matmul(x3, packed, scales, 128, interpret=True)
    assert got.shape == (2, 3, 256)
    flat = int4_matmul(x, packed, scales, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(got.reshape(6, 256), np.float32),
                               np.asarray(flat, np.float32), rtol=1e-6)


def test_xla_fallback_matches_ref():
    x, packed, scales = _mk(8, 256, 512, 128)
    expected = int4_matmul_ref(x, packed, scales, 128)
    got = int4_matmul_xla(x, packed, scales, 128)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("bn,bk", [(512, 1024), (256, 256), (128, 512)])
def test_kouter_variant_matches_standard_kernel(bn, bk):
    """The K-outer restructure (j-innermost grid, [n_j, M, TN] accumulator
    scratch, resident scales) computes the same dequant factoring as the
    production stacked kernel. Bit-identity only holds when the block
    shapes coincide with the default — interpret-mode CPU dots reassociate
    their contraction with operand shape, so a split blocking moves a ULP
    on cancellation-heavy outputs (measured: 1 element in 8192 at ~2e-6
    absolute). NOTE: interpret mode does not validate Mosaic lowering; the
    on-chip check lives in scripts/exp_kouter.py."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import (_int4_matmul_kouter,
                                                    int4_matmul)

    G, L, K, N = 128, 2, 1024, 512
    key = jax.random.PRNGKey(1)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 255, jnp.int32
                                ).astype(jnp.uint8)
    scales = jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.01
    x = jax.random.normal(key, (16, K), jnp.bfloat16)
    for li in range(L):
        want = np.asarray(int4_matmul(x, packed[li], scales[li], G,
                                      interpret=True), np.float32)
        got = np.asarray(_int4_matmul_kouter(x, packed, scales, jnp.int32(li),
                                             group_size=G, block_m=16,
                                             block_n=bn, block_k=bk,
                                             interpret=True), np.float32)
        if (bn, bk) == (512, 1024):  # same block shapes → same op order
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_glu_fused_down_matches_composition():
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_glu, int4_matmul_xla
    from tinychatengine_tpu.ops.linear import Int4Linear, random_int4_linear

    F, N, L = 512, 256, 2
    lins = [random_int4_linear(k, F, N) for k in jax.random.split(jax.random.PRNGKey(0), L)]
    dn = Int4Linear(packed=jnp.stack([l.packed for l in lins]),
                    scales=jnp.stack([l.scales for l in lins]))
    rng = np.random.default_rng(0)
    gu = jnp.asarray(rng.standard_normal((4, 2 * F)), jnp.bfloat16)

    for li in range(L):
        y = int4_matmul_glu(gu, dn.packed, dn.scales, 128,
                            layer_idx=jnp.int32(li), interpret=True)
        g = gu[..., :F].astype(jnp.float32)
        act = (jax.nn.silu(g) * gu[..., F:].astype(jnp.float32)).astype(jnp.bfloat16)
        want = int4_matmul_xla(act, dn.packed[li], dn.scales[li], 128)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.06, atol=0.06)
