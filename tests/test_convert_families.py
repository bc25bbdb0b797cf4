"""OPT + GPTBigCode conversion → checkpoint → Engine round trips.

Closes the reference-user migration path for the non-LLaMA families:
SmoothQuant INT8 OPT imports the reference's opt_smooth_exporter.py tree;
StarCoder converts from HF; both round-trip the checkpoint format and
generate through the family-dispatched Engine.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.tools.checkpoint import load_checkpoint, save_checkpoint
from tinychatengine_tpu.tools.convert import (
    convert_hf_gptbigcode,
    convert_reference_opt,
)

OPT_TINY = ModelConfig(
    name="opt_tiny", family="opt", num_heads=4, num_kv_heads=4, num_layers=2,
    max_sqlen=64, embed_dim=512, hidden_dim=1024, vocab_size=256)

BIGCODE_TINY = ModelConfig(
    name="bigcode_tiny", family="gptbigcode", num_heads=4, num_kv_heads=1,
    num_layers=2, max_sqlen=64, embed_dim=512, hidden_dim=1024, vocab_size=256)


def _write_reference_opt_int8(root, cfg, rng):
    """Emit the opt_smooth_exporter.py INT8 tree with random tensors."""
    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size

    def put(rel, arr):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(np.ascontiguousarray(arr).tobytes())

    def w8_s8(prefix, k, n):
        put(f"{prefix}/weight.bin", rng.integers(-80, 80, (n, k), np.int8).astype(np.int8))
        put(f"{prefix}/bias_int8.bin", rng.integers(-10, 10, (n,)).astype(np.int8))
        put(f"{prefix}/alpha.bin", np.asarray([0.002], np.float32))
        put(f"{prefix}/beta.bin", np.asarray([0.01], np.float32))

    def w8_f32(prefix, k, n):
        put(f"{prefix}/weight.bin", rng.integers(-80, 80, (n, k), np.int8).astype(np.int8))
        put(f"{prefix}/bias.bin", (rng.standard_normal(n) * 0.01).astype(np.float32))
        put(f"{prefix}/alpha.bin", np.asarray([0.004], np.float32))

    def ln(prefix, n=e):
        put(f"{prefix}/weight.bin", np.full((n,), 8.0, np.float32))
        put(f"{prefix}/bias.bin", np.zeros((n,), np.float32))

    put("lm_head.bin", (rng.standard_normal((v, e)) * 0.02).astype(np.float32))
    put("decoder/embed_tokens/weight.bin",
        (rng.standard_normal((v, e)) * 0.02).astype(np.float32))
    put("decoder/embed_positions/weight.bin",
        (rng.standard_normal((cfg.max_sqlen + 2, e)) * 0.02).astype(np.float32))
    ln("decoder/final_layer_norm")
    for i in range(cfg.num_layers):
        d = f"decoder/layer{i}"
        a = f"{d}/self_attn"
        for p in ("q_proj", "k_proj", "v_proj"):
            w8_s8(f"{a}/{p}", e, e)
        w8_f32(f"{a}/out_proj", e, e)
        put(f"{a}/qk_bmm/alpha.bin", np.asarray([1e-4], np.float32))
        put(f"{a}/pv_bmm/alpha.bin", np.asarray([1e-4], np.float32))
        ln(f"{d}/self_attn_layer_norm")
        ln(f"{d}/final_layer_norm")
        w8_s8(f"{d}/fc1", e, f)
        w8_f32(f"{d}/fc2", f, e)


def test_opt_int8_reference_import_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "export"
    src.mkdir()
    _write_reference_opt_int8(src, OPT_TINY, rng)

    params = convert_reference_opt(str(src), OPT_TINY, int8=True)
    assert params.layers.q_proj.weight.dtype == jnp.int8

    qcfg = QuantConfig(scheme="w8a8")
    ck = tmp_path / "ckpt"
    save_checkpoint(str(ck), params, OPT_TINY, qcfg,
                    extra_meta={"family": "opt"})
    loaded, q2 = load_checkpoint(str(ck), OPT_TINY)
    assert q2.scheme == "w8a8"

    g = GenerationConfig(temp=0.0, n_predict=5, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng_a = Engine(params, OPT_TINY, qcfg)
    eng_b = Engine(loaded, OPT_TINY, q2)
    assert eng_a.kv_dtype == jnp.int8  # family-aware cache
    ta = eng_a.generate(np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    tb = eng_b.generate(np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    assert ta == tb and len(ta) == 5


def _write_hf_bigcode(root, cfg, rng):
    try:
        from safetensors.numpy import save_file
    except ImportError:
        pytest.skip("safetensors unavailable")
    e, f, v, d = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size, cfg.head_dim
    t = {}

    def lin(name, k, n):
        t[name + ".weight"] = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        t[name + ".bias"] = (rng.standard_normal(n) * 0.01).astype(np.float32)

    t["transformer.wte.weight"] = (rng.standard_normal((v, e)) * 0.02).astype(np.float32)
    t["transformer.wpe.weight"] = (rng.standard_normal((cfg.max_sqlen, e)) * 0.02).astype(np.float32)
    t["transformer.ln_f.weight"] = np.ones((e,), np.float32)
    t["transformer.ln_f.bias"] = np.zeros((e,), np.float32)
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = np.ones((e,), np.float32)
        t[p + "ln_1.bias"] = np.zeros((e,), np.float32)
        t[p + "ln_2.weight"] = np.ones((e,), np.float32)
        t[p + "ln_2.bias"] = np.zeros((e,), np.float32)
        lin(p + "attn.c_attn", e, e + 2 * d)
        lin(p + "attn.c_proj", e, e)
        lin(p + "mlp.c_fc", e, f)
        lin(p + "mlp.c_proj", f, e)
    save_file(t, str(root / "model.safetensors"))


@pytest.mark.parametrize("scheme", ["fp", "w4a16"])
def test_gptbigcode_hf_convert_roundtrip(tmp_path, scheme):
    rng = np.random.default_rng(1)
    src = tmp_path / "hf"
    src.mkdir()
    _write_hf_bigcode(src, BIGCODE_TINY, rng)

    qcfg = QuantConfig(scheme=scheme, group_size=128)
    params = convert_hf_gptbigcode(str(src), BIGCODE_TINY, qcfg)
    ck = tmp_path / "ckpt"
    save_checkpoint(str(ck), params, BIGCODE_TINY, qcfg,
                    extra_meta={"family": "gptbigcode"})
    loaded, q2 = load_checkpoint(str(ck), BIGCODE_TINY)

    g = GenerationConfig(temp=0.0, n_predict=5, repeat_penalty=1.0,
                         repeat_last_n=1)
    ta = Engine(params, BIGCODE_TINY, qcfg).generate(
        np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    tb = Engine(loaded, BIGCODE_TINY, q2).generate(
        np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    assert ta == tb and len(ta) == 5
