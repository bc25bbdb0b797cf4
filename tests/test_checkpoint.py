"""Checkpoint round-trip + reference-format conversion tests."""

import numpy as np
import pytest

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.tools.checkpoint import load_checkpoint, save_checkpoint
from tinychatengine_tpu.tools.convert import convert_reference_llama, quantize_linear

TINY = ModelConfig(
    name="tiny", family="llama", num_heads=4, num_kv_heads=2, num_layers=2,
    max_sqlen=32, embed_dim=256, hidden_dim=512, vocab_size=384,
    rms_norm_eps=1e-5)


def test_save_load_roundtrip(tmp_path):
    import jax
    qcfg = QuantConfig(scheme="w4a16")
    params = llama.init_random_params(TINY, qcfg, seed=0)
    save_checkpoint(str(tmp_path / "ckpt"), params, TINY, qcfg,
                    extra_meta={"family": "llama", "model": "tiny"})
    # meta.json records model name "tiny" which isn't in the registry → pass cfg
    loaded, q2 = load_checkpoint(str(tmp_path / "ckpt"), cfg=TINY)
    assert q2.scheme == "w4a16"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loaded_model_same_logits(tmp_path):
    import jax.numpy as jnp

    from tinychatengine_tpu.generation import kv_cache as kvc
    qcfg = QuantConfig(scheme="w4a16")
    params = llama.init_random_params(TINY, qcfg, seed=1)
    save_checkpoint(str(tmp_path / "c2"), params, TINY, qcfg,
                    extra_meta={"family": "llama"})
    loaded, _ = load_checkpoint(str(tmp_path / "c2"), cfg=TINY)

    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = kvc.init_cache(TINY.num_layers, 1, TINY.max_sqlen,
                           TINY.num_kv_heads, TINY.head_dim)
    la, _ = llama.forward(params, TINY, ids, cache, jnp.int32(0))
    cache2 = kvc.init_cache(TINY.num_layers, 1, TINY.max_sqlen,
                            TINY.num_kv_heads, TINY.head_dim)
    lb, _ = llama.forward(loaded, TINY, ids, cache2, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _write_reference_export(root, cfg, rng):
    """Emit a llama_exporter.py-layout FP32 .bin tree with random weights."""
    import os
    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    kvdim = cfg.num_kv_heads * cfg.head_dim

    def w(rel, shape):
        os.makedirs((root / rel).parent, exist_ok=True)
        a = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        a.tofile(root / rel)
        return a

    tensors = {}
    tensors["lm_head"] = w("lm_head.bin", (v, e))
    tensors["embed"] = w("decoder/embed_tokens/weight.bin", (v, e))
    tensors["norm"] = w("decoder/norm/weight.bin", (e,))
    for i in range(cfg.num_layers):
        d = f"decoder/layer{i}"
        w(f"{d}/input_layernorm/weight.bin", (e,))
        w(f"{d}/post_attention_layernorm/weight.bin", (e,))
        w(f"{d}/self_attn/q_proj/weight.bin", (e, e))
        w(f"{d}/self_attn/k_proj/weight.bin", (kvdim, e))
        w(f"{d}/self_attn/v_proj/weight.bin", (kvdim, e))
        w(f"{d}/self_attn/o_proj/weight.bin", (e, e))
        w(f"{d}/mlp/gate_proj/weight.bin", (f, e))
        w(f"{d}/mlp/up_proj/weight.bin", (f, e))
        w(f"{d}/mlp/down_proj/weight.bin", (e, f))
    return tensors


def test_convert_reference_export(tmp_path):
    rng = np.random.default_rng(0)
    tensors = _write_reference_export(tmp_path, TINY, rng)
    qcfg = QuantConfig(scheme="w4a16", group_size=32)
    params = convert_reference_llama(str(tmp_path), TINY, qcfg)
    assert params.embed.shape == (TINY.vocab_size, TINY.embed_dim)
    np.testing.assert_allclose(np.asarray(params.embed, np.float32),
                               tensors["embed"], rtol=1e-2, atol=1e-3)
    # quantized lm_head dequantizes back to ~the original
    from tinychatengine_tpu.ops.ref import dequantize_int4
    deq = np.asarray(dequantize_int4(params.lm_head.packed,
                                     params.lm_head.scales, 32,
                                     dtype=np.float32().dtype))
    # deq is K-major [IC, OC_padded] (lm_head N padded to a tile-friendly
    # width, models/llama.py LMHEAD_PAD); real columns dequantize back to
    # ~the original, pad columns are zero
    v = TINY.vocab_size
    np.testing.assert_allclose(deq[:, :v], tensors["lm_head"].T, atol=0.08)
    assert np.abs(deq[:, :v] - tensors["lm_head"].T).mean() < 0.01
    assert np.abs(deq[:, v:]).max() == 0.0


def test_quantize_linear_fp_mode():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((16, 256)).astype(np.float32)
    p = quantize_linear(w, QuantConfig(scheme="fp"))
    assert p.weight.shape == (256, 16)  # stored K-major
