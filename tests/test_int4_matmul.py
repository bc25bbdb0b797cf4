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


# ---- decode-fused variant (norm prologue / residual epilogue) ---------------

def test_fused_norm_matches_composition():
    """int4_matmul_fused(norm_w=...) == rms_norm_ref -> int4_matmul (stacked,
    interpret mode). Norm math runs f32 in-kernel with the exact rms_norm_ref
    op order; tolerance covers reduce-order ULPs only."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused
    from tinychatengine_tpu.ops.ref import rms_norm_ref

    L, K, N, G = 3, 1024, 512, 128
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.01
    nw = jax.random.normal(key, (L, K), jnp.bfloat16)
    x = jax.random.normal(key, (4, K), jnp.bfloat16)
    for li in range(L):
        want = np.asarray(int4_matmul(
            rms_norm_ref(x, nw[li], 1e-5), packed[li], scales[li], G,
            interpret=True), np.float32)
        got = np.asarray(int4_matmul_fused(
            x, packed, scales, G, layer_idx=jnp.int32(li), norm_w=nw,
            norm_eps=1e-5, interpret=True), np.float32)
        scale = np.abs(want).max() + 1e-6
        np.testing.assert_allclose(got, want, atol=2e-2 * scale)


def test_fused_residual_matches_composition():
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused

    L, K, N, G = 2, 1024, 512, 128
    key = jax.random.PRNGKey(1)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.01
    x = jax.random.normal(key, (4, K), jnp.bfloat16)
    res = jax.random.normal(key, (4, N), jnp.bfloat16)
    for li in range(L):
        want = (int4_matmul(x, packed[li], scales[li], G, interpret=True)
                + res)
        got = int4_matmul_fused(x, packed, scales, G,
                                layer_idx=jnp.int32(li), residual=res,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_fused_norm_unstacked_lmhead_shape():
    """Non-stacked weights (lm_head): [K//2, N] + final_norm [K]."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused
    from tinychatengine_tpu.ops.ref import rms_norm_ref

    K, N, G = 1024, 768, 128
    key = jax.random.PRNGKey(2)
    packed = jax.random.randint(key, (K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(key, (K // G, N), jnp.float32) * 0.01
    nw = jax.random.normal(key, (K,), jnp.bfloat16)
    x = jax.random.normal(key, (1, K), jnp.bfloat16)  # decode M=1 (pad path)
    want = np.asarray(int4_matmul(rms_norm_ref(x, nw, 1e-6), packed, scales,
                                  G, interpret=True), np.float32)
    got = np.asarray(int4_matmul_fused(x, packed, scales, G, norm_w=nw,
                                       norm_eps=1e-6, interpret=True),
                     np.float32)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got, want, atol=2e-2 * scale)


def test_fused_forward_decode_matches_unfused():
    """llama.forward decode step with the fused path forced on (interpret via
    monkeypatched backend check is not available on CPU, so this drives the
    kernels directly at the layer shapes the decode path uses)."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused
    from tinychatengine_tpu.ops.ref import rms_norm_ref

    L, E, F, G = 2, 1024, 2048, 128
    key = jax.random.PRNGKey(3)
    kq, kg, kd, kn1, kn2, kx = jax.random.split(key, 6)
    wq = jax.random.randint(kq, (L, E // 2, E), 0, 256, jnp.int32).astype(jnp.uint8)
    sq = jax.random.uniform(kq, (L, E // G, E), jnp.float32) * 0.01
    wd = jax.random.randint(kd, (L, F // 2, E), 0, 256, jnp.int32).astype(jnp.uint8)
    sd = jax.random.uniform(kd, (L, F // G, E), jnp.float32) * 0.01
    nw = jax.random.normal(kn1, (L, E), jnp.bfloat16)
    x = jax.random.normal(kx, (1, 1, E), jnp.bfloat16)
    act = jax.random.normal(kn2, (1, 1, F), jnp.bfloat16)

    # norm -> matmul -> (later) residual chain, both ways, 3D activations
    h = int4_matmul_fused(x, wq, sq, G, layer_idx=jnp.int32(1), norm_w=nw,
                          norm_eps=1e-5, interpret=True)
    h_ref = int4_matmul(rms_norm_ref(x, nw[1], 1e-5), wq[1], sq[1], G,
                        interpret=True)
    y = int4_matmul_fused(act, wd, sd, G, layer_idx=jnp.int32(0), residual=h,
                          interpret=True)
    y_ref = int4_matmul(act, wd[0], sd[0], G, interpret=True) + h_ref
    scale = float(np.abs(np.asarray(y_ref, np.float32)).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=2e-2 * scale)


def test_fused_rope_matches_composition():
    """int4_matmul_fused(rope_...) == int4_matmul -> bf16 round -> rotate-half
    on the leading qk columns (v columns untouched). Op order matches
    ref.apply_rotary bit-for-bit, so equality is exact."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused

    L, K, D, G = 2, 1024, 128, 128
    HQ, HKV = 4, 2                      # 4 q heads, 2 k heads, 2 v heads
    N = (HQ + 2 * HKV) * D              # 1024
    qk_cols = (HQ + HKV) * D
    key = jax.random.PRNGKey(7)
    kw, ks, kx, kc = jax.random.split(key, 4)
    packed = jax.random.randint(kw, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(ks, (L, K // G, N), jnp.float32) * 0.01
    x = jax.random.normal(kx, (3, K), jnp.bfloat16)
    ang = jax.random.uniform(kc, (3, D), jnp.float32) * 6.28
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    for li in range(L):
        base = np.asarray(int4_matmul(x, packed[li], scales[li], G,
                                      interpret=True), np.float32)
        bf = base.astype(jnp.bfloat16).astype(np.float32)  # bf16 round first
        half = D // 2
        want = bf.copy()
        for h in range(qk_cols // D):
            blk = bf[:, h * D:(h + 1) * D]
            rot = np.concatenate([-blk[:, half:], blk[:, :half]], axis=1)
            want[:, h * D:(h + 1) * D] = (
                blk * np.asarray(cos) + rot * np.asarray(sin))
        want = want.astype(jnp.bfloat16).astype(np.float32)
        got = np.asarray(int4_matmul_fused(
            x, packed, scales, G, layer_idx=jnp.int32(li),
            rope_cos=cos, rope_sin=sin, rope_qk_cols=qk_cols, head_dim=D,
            interpret=True), np.float32)
        # f32 mul-add association may differ (FMA contraction) → 1 bf16 ULP
        np.testing.assert_allclose(got, want,
                                   atol=float(np.abs(want).max()) * 2**-8)


# ---- bf16 stored scales (K-blocked static-index kernel path) ----------------

@pytest.mark.parametrize("stacked", [False, True])
def test_bf16_scales_matches_f32_oracle(stacked):
    """With K large enough that block_k//G % 16 == 0, bf16 scales ride the
    K-blocked static-slice spec; result must equal the f32 kernel fed the
    SAME (bf16-rounded) scale values. Covers stacked + unstacked addressing.
    (Interpret mode — the on-chip Mosaic legality is validated separately by
    scripts/check_fused_correctness.py.)"""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul

    L, K, N, G = 2, 4096, 256, 128  # block_k=2048 -> spk=16
    key = jax.random.PRNGKey(11)
    kp_, ks_, kx_ = jax.random.split(key, 3)
    packed = jax.random.randint(kp_, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    s32 = jax.random.uniform(ks_, (L, K // G, N), jnp.float32) * 0.01 + 1e-3
    s16 = s32.astype(jnp.bfloat16)
    x = jax.random.normal(kx_, (4, K), jnp.bfloat16)
    for li in range(L):
        if stacked:
            want = int4_matmul(x, packed, s16.astype(jnp.float32), G,
                               layer_idx=jnp.int32(li), interpret=True)
            got = int4_matmul(x, packed, s16, G, layer_idx=jnp.int32(li),
                              interpret=True)
        else:
            want = int4_matmul(x, packed[li], s16[li].astype(jnp.float32), G,
                               interpret=True)
            got = int4_matmul(x, packed[li], s16[li], G, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_bf16_scales_tiny_k_upcast_fallback():
    """K too small for 16-row K-blocked specs (spk % 16 != 0): the wrapper
    must upcast and still produce the bf16-stored-scale result."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul

    K, N, G = 1024, 256, 128  # block_k=1024 -> spk=8: fallback
    key = jax.random.PRNGKey(12)
    packed = jax.random.randint(key, (K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    s32 = jax.random.uniform(key, (K // G, N), jnp.float32) * 0.01 + 1e-3
    s16 = s32.astype(jnp.bfloat16)
    x = jax.random.normal(key, (2, K), jnp.bfloat16)
    want = int4_matmul(x, packed, s16.astype(jnp.float32), G, interpret=True)
    got = int4_matmul(x, packed, s16, G, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-3, atol=2e-4)


def test_bf16_scales_a8_matches_f32(monkeypatch):
    """Same bf16-stored-scale equality for the W4A8 kernel (stacked)."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_a8

    L, K, N, G = 2, 4096, 256, 128
    key = jax.random.PRNGKey(13)
    packed = jax.random.randint(key, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    s32 = jax.random.uniform(key, (L, K // G, N), jnp.float32) * 0.01 + 1e-3
    s16 = s32.astype(jnp.bfloat16)
    x = jax.random.normal(key, (2, K), jnp.bfloat16)
    for li in range(L):
        want = int4_matmul_a8(x, packed, s16.astype(jnp.float32), G,
                              layer_idx=jnp.int32(li), interpret=True)
        got = int4_matmul_a8(x, packed, s16, G, layer_idx=jnp.int32(li),
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_fused_layernorm_bias_matches_composition():
    """int4_matmul_fused(norm_w+norm_b, bias=...) == layer_norm_ref ->
    int4_matmul -> +bias (apply_linear op order), stacked, interpret mode."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused
    from tinychatengine_tpu.ops.ref import layer_norm_ref

    L, K, N, G = 2, 1024, 512, 128
    key = jax.random.PRNGKey(21)
    kw_, ks_, kx_, kn_, kb_, kc_ = jax.random.split(key, 6)
    packed = jax.random.randint(kw_, (L, K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(ks_, (L, K // G, N), jnp.float32) * 0.01
    nw = jax.random.normal(kn_, (L, K), jnp.float32) * 0.3 + 1.0
    nb = jax.random.normal(kb_, (L, K), jnp.float32) * 0.2
    bias = jax.random.normal(kc_, (L, N), jnp.float32) * 0.5
    x = jax.random.normal(kx_, (3, K), jnp.bfloat16) * 2.0
    for li in range(L):
        h = layer_norm_ref(x, nw[li], nb[li], 1e-5)
        base = int4_matmul(h, packed[li], scales[li], G, interpret=True)
        want = np.asarray(base + bias[li].astype(base.dtype), np.float32)
        got = np.asarray(int4_matmul_fused(
            x, packed, scales, G, layer_idx=jnp.int32(li), norm_w=nw,
            norm_b=nb, norm_eps=1e-5, bias=bias, interpret=True), np.float32)
        scale = np.abs(want).max() + 1e-6
        np.testing.assert_allclose(got, want, atol=2e-2 * scale)


def test_fused_bias_residual_order_exact():
    """bias then residual epilogues round exactly like the unfused chain
    (matmul -> bf16 -> +bias(bf16, one round) -> +residual(one round))."""
    import jax

    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_fused

    K, N, G = 1024, 256, 128
    key = jax.random.PRNGKey(22)
    packed = jax.random.randint(key, (K // 2, N), 0, 256,
                                jnp.int32).astype(jnp.uint8)
    scales = jax.random.uniform(key, (K // G, N), jnp.float32) * 0.01
    bias = jax.random.normal(key, (N,), jnp.float32)
    res = jax.random.normal(key, (2, N), jnp.bfloat16)
    x = jax.random.normal(key, (2, K), jnp.bfloat16)
    base = int4_matmul(x, packed, scales, G, interpret=True)  # bf16
    w1 = (base.astype(jnp.float32)
          + bias.astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16)
    want = (w1.astype(jnp.float32) + res.astype(jnp.float32)
            ).astype(jnp.bfloat16)
    got = int4_matmul_fused(x, packed, scales, G, bias=bias, residual=res,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


# ---- pack-time K padding (llama-2-family scale-row legality) ------------------
# K/G in (8, inf) not a multiple of 8 (e.g. llama-2's 11008 -> 86 groups)
# fails to lower on real silicon ("slice must be aligned to tiling (8)",
# bench_vlm r4). pack_qm_tpu/pack_scales pad such K at pack time with
# zero-point codes (dequant == 0 exactly); the kernel zero-pads x to match.

def test_padded_ic_values():
    from tinychatengine_tpu.quant.packing import padded_ic
    assert padded_ic(11008, 128) == 11264     # llama-2 7B hidden (86 -> 88)
    assert padded_ic(13824, 128) == 14336     # llama-2 13B hidden (108 -> 112)
    assert padded_ic(14336, 128) == 14336     # llama-3 8B: already aligned
    assert padded_ic(4096, 128) == 4096       # sg 32: aligned
    assert padded_ic(256, 128) == 256         # sg 2 <= 8: small-model case
    assert padded_ic(1280, 128) == 2048       # sg 10 -> 16


@pytest.mark.parametrize("stacked", [False, True])
@pytest.mark.parametrize("scheme", ["a16", "a8"])
def test_padded_k_exact_vs_unpadded(stacked, scheme):
    """Padded pack == unpadded pack bit-for-bit (the pad groups contribute
    exactly 0), through the Pallas kernels and the XLA oracles."""
    from tinychatengine_tpu.ops.int4_matmul import (int4_matmul_a8,
                                                    int4_matmul_a8_xla)
    m, n, k, g = 16, 256, 1280, 128          # sg 10 -> pads to 2048 (sg 16)
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    q, scales = quantize_groupwise_int4(w, g)
    plain = (jnp.asarray(pack_qm_tpu(q)), jnp.asarray(pack_scales(scales)))
    padded = (jnp.asarray(pack_qm_tpu(q, g)),
              jnp.asarray(pack_scales(scales, "f32", g)))
    assert padded[0].shape == (1024, n) and padded[1].shape == (16, n)

    kern = int4_matmul_a8 if scheme == "a8" else int4_matmul
    xla = int4_matmul_a8_xla if scheme == "a8" else int4_matmul_xla
    if stacked:
        pp = (padded[0][None], padded[1][None])
        up = (plain[0][None], plain[1][None])
        got = kern(x, *pp, g, layer_idx=jnp.int32(0), interpret=True)
        want = kern(x, *up, g, layer_idx=jnp.int32(0), interpret=True)
    else:
        got = kern(x, *padded, g, interpret=True)
        want = kern(x, *plain, g, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))
    # the XLA oracle slices the dequant-0 pad rows off
    np.testing.assert_array_equal(
        np.asarray(xla(x, *padded, g), np.float32),
        np.asarray(xla(x, *plain, g), np.float32))
