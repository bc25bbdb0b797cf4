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
    return t


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


def _write_reference_bigcode(root, cfg, t):
    """Emit the starcoder_exporter.py FP32 tree from the SAME tensors as the
    HF dict ``t`` — including its MQA→MHA tiling of c_attn
    (starcoder_exporter.py:76-110) — so the importer's un-tiling is checked
    against the HF-converted model exactly."""
    e, h, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim

    def put(rel, arr):
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(np.ascontiguousarray(arr).astype(np.float32).tobytes())

    put("lm_head.bin", t["transformer.wte.weight"])
    put("decoder/wte/weight.bin", t["transformer.wte.weight"])
    put("decoder/wpe/weight.bin", t["transformer.wpe.weight"])
    put("decoder/ln_f/weight.bin", t["transformer.ln_f.weight"])
    put("decoder/ln_f/bias.bin", t["transformer.ln_f.bias"])
    for i in range(cfg.num_layers):
        p, o = f"transformer.h.{i}.", f"decoder/layer{i}"
        w, b = t[p + "attn.c_attn.weight"], t[p + "attn.c_attn.bias"]
        q, k, v = np.split(w, (h * d, (h + 1) * d), axis=0)
        put(f"{o}/attn/c_attn/weight.bin",
            np.concatenate([q, np.tile(k, (h, 1)), np.tile(v, (h, 1))]))
        qb, kb, vb = np.split(b, (h * d, (h + 1) * d), axis=0)
        put(f"{o}/attn/c_attn/bias.bin",
            np.concatenate([qb, np.tile(kb, h), np.tile(vb, h)]))
        for hf, ref in (("attn.c_proj", "attn/c_proj"), ("mlp.c_fc", "c_fc"),
                        ("mlp.c_proj", "c_proj")):
            put(f"{o}/{ref}/weight.bin", t[p + hf + ".weight"])
            put(f"{o}/{ref}/bias.bin", t[p + hf + ".bias"])
        for ln in ("ln_1", "ln_2"):
            put(f"{o}/{ln}/weight.bin", t[p + ln + ".weight"])
            put(f"{o}/{ln}/bias.bin", t[p + ln + ".bias"])


def test_gptbigcode_reference_import_matches_hf(tmp_path):
    """Reference .bin import (MQA un-tiling) == HF import, token for token."""
    from tinychatengine_tpu.tools.convert import convert_reference_gptbigcode

    rng = np.random.default_rng(2)
    hf_src = tmp_path / "hf"
    hf_src.mkdir()
    t = _write_hf_bigcode(hf_src, BIGCODE_TINY, rng)
    ref_src = tmp_path / "ref"
    _write_reference_bigcode(ref_src, BIGCODE_TINY, t)

    qcfg = QuantConfig(scheme="w4a16", group_size=128)
    p_hf = convert_hf_gptbigcode(str(hf_src), BIGCODE_TINY, qcfg)
    p_ref = convert_reference_gptbigcode(str(ref_src), BIGCODE_TINY, qcfg)
    np.testing.assert_array_equal(np.asarray(p_ref.layers.c_attn.packed),
                                  np.asarray(p_hf.layers.c_attn.packed))

    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    ta = Engine(p_hf, BIGCODE_TINY, qcfg).generate(
        np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    tb = Engine(p_ref, BIGCODE_TINY, qcfg).generate(
        np.asarray([[3, 7, 11]], np.int32), g).tokens[0]
    # lm_head differs (ref export ties wte; HF converter also ties) — equal
    assert ta == tb and len(ta) == 6


CLIP_TINY = ModelConfig(
    name="clip_tiny", family="clip", num_heads=4, num_kv_heads=4, num_layers=2,
    max_sqlen=0, embed_dim=64, hidden_dim=128, vocab_size=0,
    image_size=56, patch_size=14, projection_dim=32, mmproj_dim=96)


def _write_hf_clip(root, cfg, rng):
    try:
        from safetensors.numpy import save_file
    except ImportError:
        pytest.skip("safetensors unavailable")
    e, f, p = cfg.embed_dim, cfg.hidden_dim, cfg.patch_size
    n_pos = 1 + (cfg.image_size // p) ** 2
    t = {}

    def lin(name, k, n):
        t[name + ".weight"] = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        t[name + ".bias"] = (rng.standard_normal(n) * 0.01).astype(np.float32)

    pre = "vision_model."
    t[pre + "embeddings.class_embedding"] = (
        rng.standard_normal(e) * 0.05).astype(np.float32)
    t[pre + "embeddings.patch_embedding.weight"] = (
        rng.standard_normal((e, 3, p, p)) * 0.05).astype(np.float32)
    t[pre + "embeddings.position_embedding.weight"] = (
        rng.standard_normal((n_pos, e)) * 0.05).astype(np.float32)
    t[pre + "pre_layrnorm.weight"] = np.ones((e,), np.float32)
    t[pre + "pre_layrnorm.bias"] = np.zeros((e,), np.float32)
    for i in range(cfg.num_layers):
        q = pre + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            t[q + ln + ".weight"] = np.ones((e,), np.float32)
            t[q + ln + ".bias"] = np.zeros((e,), np.float32)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(q + "self_attn." + name, e, e)
        lin(q + "mlp.fc1", e, f)
        lin(q + "mlp.fc2", f, e)
    lin("model.mm_projector.0", e, cfg.mmproj_dim)
    lin("model.mm_projector.2", cfg.mmproj_dim, cfg.mmproj_dim)
    save_file(t, str(root / "model.safetensors"))
    return t


def _write_reference_clip(root, cfg, t):
    """Emit the clip_exporter.py FP32 tree (patch kernel NHWC-transposed,
    clip_exporter.py:36-39) + llava_exporter.py mm_projector dirs from the
    SAME tensors as the HF dict ``t``."""
    pre = "vision_model."

    def put(rel, arr):
        path = root / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(np.ascontiguousarray(arr).astype(np.float32).tobytes())

    put("embeddings/class_embedding/weight.bin",
        t[pre + "embeddings.class_embedding"])
    put("embeddings/patch_embedding/weight.bin",
        t[pre + "embeddings.patch_embedding.weight"].transpose(0, 2, 3, 1))
    put("embeddings/position_embedding/weight.bin",
        t[pre + "embeddings.position_embedding.weight"])
    put("pre_layernorm/weight.bin", t[pre + "pre_layrnorm.weight"])
    put("pre_layernorm/bias.bin", t[pre + "pre_layrnorm.bias"])
    for i in range(cfg.num_layers):
        q, o = pre + f"encoder.layers.{i}.", f"encoder/layer{i}"
        for hf, ref in (("self_attn.q_proj", "self_attn/q_proj"),
                        ("self_attn.k_proj", "self_attn/k_proj"),
                        ("self_attn.v_proj", "self_attn/v_proj"),
                        ("self_attn.out_proj", "self_attn/out_proj"),
                        ("layer_norm1", "layer_norm1"),
                        ("layer_norm2", "layer_norm2"),
                        ("mlp.fc1", "mlp_fc1"), ("mlp.fc2", "mlp_fc2")):
            put(f"{o}/{ref}/weight.bin", t[q + hf + ".weight"])
            put(f"{o}/{ref}/bias.bin", t[q + hf + ".bias"])
    for idx in (0, 2):
        put(f"mm_projector_{idx}/weight.bin",
            t[f"model.mm_projector.{idx}.weight"])
        put(f"mm_projector_{idx}/bias.bin", t[f"model.mm_projector.{idx}.bias"])


def test_clip_reference_import_matches_hf(tmp_path):
    """Reference .bin CLIP import == HF import on an image encode."""
    from tinychatengine_tpu.models import clip
    from tinychatengine_tpu.tools.convert import (convert_hf_clip,
                                                  convert_reference_clip)

    rng = np.random.default_rng(3)
    hf_src = tmp_path / "hf"
    hf_src.mkdir()
    t = _write_hf_clip(hf_src, CLIP_TINY, rng)
    ref_src = tmp_path / "ref"
    _write_reference_clip(ref_src, CLIP_TINY, t)

    p_hf = convert_hf_clip(str(hf_src), CLIP_TINY, mm_proj_src=str(hf_src),
                           prefix="vision_model.")
    p_ref = convert_reference_clip(str(ref_src), CLIP_TINY)

    pixels = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    a = np.asarray(clip.encode_image(p_hf, CLIP_TINY, pixels), np.float32)
    b = np.asarray(clip.encode_image(p_ref, CLIP_TINY, pixels), np.float32)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
