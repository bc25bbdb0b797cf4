"""VLM (LLaVA/VILA) pipeline: preprocessing, CLIP encode, embed splice,
generation — mirrors LLaVAGenerate.cc end-to-end on tiny random models."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation import vlm
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import clip, llama
from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer


def _tiny_llama():
    cfg = ModelConfig(
        name="llava_tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=256, embed_dim=128, hidden_dim=256,
        vocab_size=384, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    return cfg, qcfg, llama.init_random_params(cfg, qcfg, seed=0)


def _tiny_clip(mmproj_dim):
    cfg = ModelConfig(
        name="clip_tiny", family="clip", num_heads=4, num_kv_heads=4,
        num_layers=2, max_sqlen=0, embed_dim=64, hidden_dim=128,
        vocab_size=0, image_size=28, patch_size=14, mmproj_dim=mmproj_dim)
    return cfg, clip.init_random_params(cfg)


def test_preprocess_shapes_and_range():
    img = np.random.default_rng(0).integers(0, 256, (60, 90, 3), np.uint8)
    x = clip.preprocess_image(jnp.asarray(img), 28)
    assert x.shape == (28, 28, 3)
    # normalized: roughly centered
    assert abs(float(x.mean())) < 3.0


def test_encode_image_patch_count():
    ccfg, cparams = _tiny_clip(mmproj_dim=128)
    img = np.random.default_rng(1).integers(0, 256, (50, 40, 3), np.uint8)
    emb = vlm.encode_image(cparams, ccfg, img)
    n_patches = (ccfg.image_size // ccfg.patch_size) ** 2
    assert emb.shape == (n_patches, 128)
    assert np.isfinite(np.asarray(emb, np.float32)).all()


def test_splice_layout():
    cfg, qcfg, params = _tiny_llama()
    tok = ByteTokenizer()
    img_emb = jnp.ones((4, cfg.embed_dim), jnp.bfloat16) * 0.5
    ids, embeds = vlm.build_multimodal_inputs(
        tok, params.embed, f"AB{vlm.IMAGE_MARKER}CD", img_emb, bos=False)
    pre = tok.encode("AB", bos=False)
    post = tok.encode("CD", bos=False)
    assert ids.shape[1] == len(pre) + 4 + len(post)
    emb_np = np.asarray(embeds[0], np.float32)
    table = np.asarray(params.embed, np.float32)
    np.testing.assert_allclose(emb_np[:len(pre)], table[pre], atol=1e-2)
    np.testing.assert_allclose(emb_np[len(pre):len(pre) + 4], 0.5, atol=1e-2)
    np.testing.assert_allclose(emb_np[len(pre) + 4:], table[post], atol=1e-2)


def test_generate_with_image_runs_and_conditions_on_image():
    cfg, qcfg, params = _tiny_llama()
    ccfg, cparams = _tiny_clip(mmproj_dim=cfg.embed_dim)
    tok = ByteTokenizer()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    rng = np.random.default_rng(2)
    img_a = rng.integers(0, 256, (30, 30, 3), np.uint8)
    img_b = rng.integers(0, 256, (30, 30, 3), np.uint8)

    eng = Engine(params, cfg, qcfg)
    ra = vlm.generate_with_image(eng, cparams, ccfg, tok,
                                 f"{vlm.IMAGE_MARKER}describe", img_a, g)
    eng2 = Engine(params, cfg, qcfg)
    rb = vlm.generate_with_image(eng2, cparams, ccfg, tok,
                                 f"{vlm.IMAGE_MARKER}describe", img_b, g)
    assert len(ra.tokens[0]) == 8 and len(rb.tokens[0]) == 8
    # different images → (almost surely) different greedy continuations
    assert ra.tokens[0] != rb.tokens[0]


def test_clip_checkpoint_roundtrip(tmp_path):
    from tinychatengine_tpu.tools.checkpoint import load_clip, save_clip
    ccfg, cparams = _tiny_clip(mmproj_dim=96)
    save_clip(str(tmp_path), cparams, ccfg)
    loaded, cfg2 = load_clip(str(tmp_path))
    assert cfg2.image_size == ccfg.image_size
    img = np.random.default_rng(3).integers(0, 256, (30, 30, 3), np.uint8)
    a = np.asarray(vlm.encode_image(cparams, ccfg, img), np.float32)
    b = np.asarray(vlm.encode_image(loaded, cfg2, img), np.float32)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_clip_bf16_tracks_f32():
    import jax.numpy as _jnp
    ccfg, cparams = _tiny_clip(mmproj_dim=96)
    img = np.random.default_rng(5).integers(0, 256, (40, 40, 3), np.uint8)
    pixels = clip.preprocess_image(jnp.asarray(img), ccfg.image_size)[None]
    a = np.asarray(clip.encode_image(cparams, ccfg, pixels,
                                     dtype=_jnp.float32), np.float32)
    b = np.asarray(clip.encode_image(cparams, ccfg, pixels,
                                     dtype=_jnp.bfloat16), np.float32)
    denom = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / denom < 0.05
