"""Reference-op sanity tests (analog of tests/non_cuda/test_ops.cc cases,
oracled against handwritten numpy / HF-equivalent math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.ops import ref
from tinychatengine_tpu.quant.numerics import quantize_groupwise_int4, dequantize_groupwise_int4
from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales


def test_unpack_int4_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(8, 512), dtype=np.uint8)
    packed = jnp.asarray(pack_qm_tpu(q))
    # jnp unpack stays K-major [IC, OC]
    np.testing.assert_array_equal(np.asarray(ref.unpack_int4(packed)), q.T)


@pytest.mark.parametrize("group_size", [32, 128])
def test_int4_matmul_ref_vs_dequant_matmul(group_size):
    rng = np.random.default_rng(1)
    oc, ic, m = 64, 512, 4
    w = rng.standard_normal((oc, ic)).astype(np.float32) * 0.1
    x = rng.standard_normal((m, ic)).astype(np.float32)
    q, scales = quantize_groupwise_int4(w, group_size)
    # the oracle must dequantize with the scales AS STORED (bf16-rounded)
    # so the comparison isolates the matmul math
    stored = pack_scales(scales, "bf16")
    deq = dequantize_groupwise_int4(q, np.asarray(stored, np.float32).T,
                                    group_size)
    expected = x @ deq.T
    got = ref.int4_matmul_ref(jnp.asarray(x), jnp.asarray(pack_qm_tpu(q)),
                              jnp.asarray(stored), group_size)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_rms_norm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    eps = 1e-6
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + eps) * w
    got = ref.rms_norm_ref(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-5)


def test_layer_norm_q_range():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 64)).astype(np.float32) * 50
    w = np.ones(64, np.float32) * 100
    b = np.zeros(64, np.float32)
    y = ref.layer_norm_q_ref(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    assert y.dtype == jnp.int8
    assert int(jnp.max(y)) == 127 or int(jnp.min(y)) == -128  # saturates


def test_w8a8_linear_ref():
    rng = np.random.default_rng(4)
    xq = rng.integers(-128, 128, size=(3, 32), dtype=np.int8)
    wq = rng.integers(-128, 128, size=(16, 32), dtype=np.int8)
    alpha = 0.002
    acc = xq.astype(np.int32) @ wq.astype(np.int32).T
    expected = np.clip(np.round(acc * alpha), -128, 127).astype(np.int8)
    got = ref.w8a8_linear_ref(jnp.asarray(xq), jnp.asarray(wq), alpha)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_rope_matches_hf_convention():
    """Rotate-half RoPE == HF LlamaRotaryEmbedding semantics
    (reference loads HF-exported cos/sin caches, RotaryPosEmb.cc:7-69)."""
    rng = np.random.default_rng(5)
    b, s, h, hk, d = 1, 7, 4, 2, 32
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hk, d)).astype(np.float32)
    cos, sin = ref.make_rope_cache(d, 64, theta=10000.0)
    pos = jnp.arange(s)[None, :]
    qr, kr = ref.rotary_embed_ref(jnp.asarray(q), jnp.asarray(k), cos, sin, pos)

    # numpy oracle
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = np.outer(np.arange(s), inv)
    c = np.cos(np.concatenate([ang, ang], -1))[None, :, None, :]
    sn = np.sin(np.concatenate([ang, ang], -1))[None, :, None, :]
    rot = np.concatenate([-q[..., d // 2:], q[..., : d // 2]], -1)
    expected_q = q * c + rot * sn
    np.testing.assert_allclose(np.asarray(qr), expected_q, rtol=1e-5, atol=1e-5)
    assert kr.shape == k.shape


def test_rope_past_8192():
    """Long-context rope (VERDICT r3 #7): the cache generator and the
    rotate-half application must be exact at 16k/32k positions — the
    reference exports 32768-position caches it never runs
    (llm/tools/model_quantizer.py:313-319); we do. f32 angle precision:
    pos*inv_freq reaches ~3e4, where cos/sin stay well-conditioned, but an
    accidental bf16 cache would lose the low bits — this guards dtype too."""
    rng = np.random.default_rng(9)
    d, max_pos = 128, 32768
    cos, sin = ref.make_rope_cache(d, max_pos, theta=500000.0)
    assert cos.shape == (max_pos, d) and cos.dtype == jnp.float32

    positions = np.array([8192, 16384, 20011, 32767])
    b, s, h = 1, len(positions), 2
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, 1, d)).astype(np.float32)
    qr, kr = ref.rotary_embed_ref(jnp.asarray(q), jnp.asarray(k), cos, sin,
                                  jnp.asarray(positions[None, :]))

    # f64 oracle with an angle-aware tolerance: 1 ulp of f32 inv_freq
    # amplifies to |pos|*ulp ~ 2e-3 radians at 32k (both HF and the
    # exporter compute angles in f32 — the convention, not a bug), so each
    # element's budget is ~|pos * inv_freq_i| * eps_f32 * |x|.
    inv = 1.0 / (500000.0 ** (np.arange(0, d, 2) / d))
    ang = np.outer(positions.astype(np.float64), inv)
    angle_mag = np.concatenate([ang, ang], -1)[None, :, None, :]
    c = np.cos(angle_mag)
    sn = np.sin(angle_mag)
    rotq = np.concatenate([-q[..., d // 2:], q[..., : d // 2]], -1)
    rotk = np.concatenate([-k[..., d // 2:], k[..., : d // 2]], -1)
    for got, x, rot in ((qr, q, rotq), (kr, k, rotk)):
        want = x * c + rot * sn
        budget = 1e-4 + 4 * np.finfo(np.float32).eps * angle_mag * (
            np.abs(x) + np.abs(rot))
        bad = np.abs(np.asarray(got) - want) > budget
        assert not bad.any(), (
            f"{bad.sum()} elements exceed the angle-aware budget; "
            f"worst diff {np.abs(np.asarray(got) - want).max():.2e}")


@pytest.mark.slow
def test_decode_past_8192_consistent_with_prefill():
    """A tiny model decoding at positions > 8192 must continue a prefilled
    chain exactly as a longer prefill would (rope gather + cache addressing
    at long offsets — CPU, 16.5k-position cache)."""
    import jax

    from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama

    cfg = ModelConfig(
        name="tiny-long", family="llama", num_heads=2, num_kv_heads=1,
        num_layers=2, max_sqlen=16640, embed_dim=128, hidden_dim=128,
        vocab_size=64, rms_norm_eps=1e-5)
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0,
                                      max_pos=16640)
    rng = np.random.default_rng(11)
    n = 16384 + 37
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, n)), jnp.int32)
    fwd = jax.jit(llama.forward, static_argnames=("cfg",))

    def cache():
        return kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen,
                              cfg.num_kv_heads, cfg.head_dim)

    la, _ = fwd(params, cfg, ids, cache(), jnp.int32(0))
    lb, c = fwd(params, cfg, ids[:, :n - 3], cache(), jnp.int32(0))
    for t in range(n - 3, n):
        lb, c = fwd(params, cfg, ids[:, t:t + 1], c, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)


def test_attention_ref_gqa_and_mask():
    rng = np.random.default_rng(6)
    b, hq, hk, sq, sk, d = 1, 4, 2, 3, 5, 16
    q = rng.standard_normal((b, hq, sq, d)).astype(np.float32)
    k = rng.standard_normal((b, hk, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, hk, sk, d)).astype(np.float32)
    # causal mask over the last sq positions of sk
    mask = np.zeros((1, 1, sq, sk), np.float32)
    for i in range(sq):
        mask[0, 0, i, sk - sq + i + 1:] = -1e30
    scale = 1.0 / np.sqrt(d)
    out = ref.attention_ref(*map(jnp.asarray, (q, k, v)), jnp.asarray(mask), scale)

    kk = np.repeat(k, 2, axis=1)
    vv = np.repeat(v, 2, axis=1)
    logits = np.einsum("bhqd,bhkd->bhqk", q, kk) * scale + mask
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, vv)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_softmax_fp32_island():
    x = jnp.asarray(np.array([[1e4, 0.0, -1e4]], np.float32), dtype=jnp.bfloat16)
    y = ref.softmax_ref(x)
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_config_registry():
    from tinychatengine_tpu import get_model_config
    cfg = get_model_config("llama3_8b")
    assert cfg.num_kv_heads == 8 and cfg.vocab_size == 128256 and cfg.head_dim == 128
    assert cfg.rope_theta == 500000.0
    cfg2 = get_model_config("starcoder_15.5b")
    assert cfg2.num_kv_heads == 1  # MQA
