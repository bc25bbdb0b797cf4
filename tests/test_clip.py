"""CLIP vision tower tests (reference: Fp32CLIPVisionTransformer)."""

import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.models import clip

TINY = ModelConfig(
    name="tiny_clip", family="clip", num_heads=4, num_kv_heads=4, num_layers=2,
    max_sqlen=0, embed_dim=64, hidden_dim=128, vocab_size=0,
    image_size=56, patch_size=14, projection_dim=32, mmproj_dim=96,
)


def test_preprocess_pad_and_resize():
    img = jnp.asarray(np.random.default_rng(0).integers(0, 255, (100, 60, 3)),
                      jnp.uint8)
    out = clip.preprocess_image(img, image_size=56)
    assert out.shape == (56, 56, 3)
    assert np.isfinite(np.asarray(out)).all()
    # normalized: roughly zero-centered for mid-gray input
    gray = clip.preprocess_image(jnp.full((56, 56, 3), 120, jnp.uint8), 56)
    assert abs(float(jnp.mean(gray))) < 1.5


def test_encode_image_shapes():
    params = clip.init_random_params(TINY, seed=0)
    pixels = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 56, 56, 3)), jnp.float32)
    embeds = clip.encode_image(params, TINY, pixels)
    n_patches = (56 // 14) ** 2
    assert embeds.shape == (2, n_patches, TINY.mmproj_dim)
    assert np.isfinite(np.asarray(embeds, np.float32)).all()


def test_patchify_equals_conv():
    """The patchify+matmul must equal a strided conv with the same kernel."""
    import jax
    params = clip.init_random_params(TINY, seed=2)
    pixels = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 56, 56, 3)), jnp.float32)
    p, e = TINY.patch_size, TINY.embed_dim
    kernel = params.patch_embed.reshape(p, p, 3, e)  # HWIO
    conv = jax.lax.conv_general_dilated(
        pixels, kernel, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv_flat = conv.reshape(1, -1, e)

    x = pixels.reshape(1, 4, p, 4, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(1, 16, p * p * 3)
    patchify = jnp.einsum("bnk,ke->bne", x, params.patch_embed)
    np.testing.assert_allclose(np.asarray(patchify), np.asarray(conv_flat),
                               rtol=1e-4, atol=1e-4)
