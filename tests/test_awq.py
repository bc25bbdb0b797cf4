"""AWQ scale search: fold-exactness, search sanity, end-to-end wiring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.quant import awq
from tinychatengine_tpu.quant.numerics import (
    dequantize_groupwise_int4,
    quantize_groupwise_int4,
)

TINY = ModelConfig(
    name="tiny", family="llama", num_heads=4, num_kv_heads=2, num_layers=2,
    max_sqlen=64, embed_dim=256, hidden_dim=512, vocab_size=300,
    rms_norm_eps=1e-5, rope_theta=10000.0,
)


def _fwd(params, cfg, ids):
    cache = kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen,
                           cfg.num_kv_heads, cfg.head_dim)
    logits, _ = llama.forward(params, cfg, ids, cache, jnp.int32(0),
                              full_logits=True)
    return np.asarray(logits, np.float32)


def test_awq_fold_is_function_preserving():
    """The scaled fp tree computes the same function as the original (up to
    the bf16 re-rounding of folded weights)."""
    cfg = TINY
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=0)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, cfg.vocab_size, (2, 48))
    scaled, info = awq.awq_scale_llama(params, cfg, calib, group_size=128,
                                       n_grid=8)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    a = _fwd(params, cfg, ids)
    b = _fwd(scaled, cfg, ids)
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 3e-2, np.abs(a - b).max() / denom
    # greedy chain should be identical in fp (folding is exact modulo bf16)
    assert (np.argmax(a[0, -1]) == np.argmax(b[0, -1]))
    assert all(isinstance(v, list) and len(v) == cfg.num_layers
               for k, v in info["alpha"].items() if k != "lm_head")


def test_awq_search_beats_rtn_on_salient_channel():
    """A weight whose error is dominated by a high-magnitude input channel:
    AWQ's scaled quantization must cut the calibration MSE vs plain RTN."""
    rng = np.random.default_rng(1)
    K, N, G = 256, 128, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    x = rng.standard_normal((512, K)).astype(np.float32)
    x[:, 7] *= 50.0            # one salient activation channel
    w[7, :] *= 0.02            # ...whose weights are small (AWQ's motif)
    y = x @ w

    def mse(wq):
        return float(np.mean((x @ wq - y) ** 2))

    q, sc = quantize_groupwise_int4(w.T, G)
    rtn = dequantize_groupwise_int4(q, sc, G).T
    s, alpha, losses = awq.search_scale(x, w, G)
    qs, scs = quantize_groupwise_int4((w * s[:, None]).T, G)
    awq_w = dequantize_groupwise_int4(qs, scs, G).T / s[:, None]
    assert mse(awq_w) < mse(rtn) * 0.9, (mse(awq_w), mse(rtn), alpha)
    assert alpha > 0.0
    # alpha=0 is in the grid: the search can never lose to RTN on-calib
    assert min(losses) <= losses[0] + 1e-12


def test_awq_then_quantize_generates():
    """awq_scale_llama -> requantize_llama(w4a16) -> greedy decode runs and
    stays close to the fp argmax chain (tiny random model smoke)."""
    from tinychatengine_tpu.tools.convert import requantize_llama

    cfg = TINY
    params = llama.init_random_params(cfg, QuantConfig(scheme="fp"), seed=2)
    rng = np.random.default_rng(2)
    calib = rng.integers(0, cfg.vocab_size, (2, 32))
    scaled, _ = awq.awq_scale_llama(params, cfg, calib, group_size=128,
                                    n_grid=6)
    qparams = requantize_llama(scaled, QuantConfig(scheme="w4a16"))
    ids = jnp.asarray([[5, 9, 11, 42]], jnp.int32)
    lg = _fwd(qparams, cfg, ids)
    assert np.isfinite(lg).all()


@pytest.mark.slow
def test_awq_convert_cli(tmp_path):
    """End-to-end: HF llama -> --awq-calib conversion -> loadable quantized
    checkpoint that generates."""
    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    from tinychatengine_tpu.core.config import MODEL_REGISTRY
    from tinychatengine_tpu.tools import convert as cv
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint

    torch.manual_seed(3)
    hf = LlamaForCausalLM(LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        attention_bias=False, tie_word_embeddings=False)).eval()
    src = tmp_path / "hf"
    src.mkdir()
    sd = {k: v.clone().contiguous() for k, v in hf.state_dict().items()}
    save_file(sd, str(src / "model.safetensors"))
    calib = tmp_path / "calib.npy"
    np.save(calib, np.random.default_rng(0).integers(0, 256, 2048))

    cfg = ModelConfig(
        name="awq_cli_tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=64, embed_dim=256, hidden_dim=512,
        vocab_size=256, rms_norm_eps=1e-5)
    MODEL_REGISTRY["awq_cli_tiny"] = cfg
    out = tmp_path / "out"
    cv.main(["--model", "awq_cli_tiny", "--src", str(src), "--out", str(out),
             "--scheme", "w4a16", "--awq-calib", str(calib),
             "--awq-windows", "4"])
    params, qcfg = load_checkpoint(str(out), cfg)
    assert qcfg.scheme == "w4a16"
    lg = _fwd(params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.isfinite(lg).all()
