"""CLIP ViT-L/14-336 vision tower + LLaVA mm_projector.

Replaces the reference's Fp32CLIP* stack (llm/src/nn_modules/Fp32CLIP*.cc):
Conv2D patch embedding (14x14 stride 14 — expressed TPU-style as a patchify
reshape + matmul instead of ops/Conv2D.cc's NHWC loops), class token +
learned positional embeddings, pre-LN transformer (quick-GELU), 23 of 24
layers (model.h:81), then the LLaVA mm_projector linear→GELU→linear to the
decoder's embed dim (Fp32CLIPVisionTransformer.cc:101-155). Emits 576
image-patch embeddings consumed by the LLaMA decoder prefill
(Int4llamaDecoder.cc:81-92).

Also provides the image preprocessing pipeline (pad-to-square, bilinear
resize to 336, CLIP normalize — LLaVAGenerate.cc:504-600) in jax.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.ops import ref
from tinychatengine_tpu.ops.linear import DenseLinear, apply_linear

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _pytree(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_with_keys(
        cls,
        lambda obj: ([(jax.tree_util.GetAttrKey(f), getattr(obj, f)) for f in fields], None),
        lambda aux, ch: cls(*ch),
    )
    return cls


@_pytree
class CLIPLayerParams:
    ln1_w: jax.Array
    ln1_b: jax.Array
    q_proj: object
    k_proj: object
    v_proj: object
    out_proj: object
    ln2_w: jax.Array
    ln2_b: jax.Array
    fc1: object
    fc2: object


@_pytree
class CLIPParams:
    patch_embed: jax.Array   # [patch*patch*3, E] (conv kernel as matmul)
    class_embed: jax.Array   # [E]
    pos_embed: jax.Array     # [1 + n_patches, E]
    pre_ln_w: jax.Array
    pre_ln_b: jax.Array
    layers: CLIPLayerParams  # stacked [L, ...]
    mm_proj_0: object        # E -> mmproj_dim
    mm_proj_2: object        # mmproj_dim -> mmproj_dim


def preprocess_image(img: jax.Array, image_size: int = 336) -> jax.Array:
    """uint8 [H, W, 3] → normalized f32 [336, 336, 3].

    Reference semantics (clip_image_preprocess, LLaVAGenerate.cc:504-600):
    pad to square with zeros, bilinear resize, scale to [0,1], CLIP
    mean/std normalize.
    """
    h, w, _ = img.shape
    side = max(h, w)
    padded = jnp.zeros((side, side, 3), img.dtype)
    padded = jax.lax.dynamic_update_slice(
        padded, img, ((side - h) // 2, (side - w) // 2, 0))
    resized = jax.image.resize(padded.astype(jnp.float32),
                               (image_size, image_size, 3), method="bilinear")
    x = resized / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def encode_image(params: CLIPParams, cfg: ModelConfig, pixels: jax.Array,
                 dtype=jnp.bfloat16):
    """pixels [B, 336, 336, 3] f32 (preprocessed) → image embeds
    [B, n_patches, mmproj_dim] for the decoder splice.

    Pipeline of Fp32CLIPVisionTransformer::forward (+ mm_projector):
    patchify-matmul → +class token → +pos embed → pre-LN → 23 encoder
    layers → drop class token → mm_proj_0 → GELU → mm_proj_2.

    dtype: matmul compute type. The reference tower is FP32-only; bf16 (the
    default here) halves VLM TTFT on the MXU with negligible embedding drift
    (LN/softmax/GELU accumulate in fp32 either way). Pass jnp.float32 for
    bit-faithful reference behavior.
    """
    x = encode_hidden(params, cfg, pixels, dtype=dtype)
    patches = x[:, 1:, :]                              # drop class token
    y = apply_linear(params.mm_proj_0, patches.astype(jnp.float32))
    y = ref.gelu_ref(y)
    y = apply_linear(params.mm_proj_2, y)
    return y.astype(jnp.bfloat16)                      # [B, 576, mmproj_dim]


def encode_hidden(params: CLIPParams, cfg: ModelConfig, pixels: jax.Array,
                  dtype=jnp.float32):
    """Vision-transformer hidden states [B, 1 + n_patches, E] (before the
    class-token drop and mm_projector) — the HF CLIPVisionModel
    hidden_states[-1] equivalent, used for golden parity (f32 default)."""
    b = pixels.shape[0]
    p, e = cfg.patch_size, cfg.embed_dim
    n_side = cfg.image_size // p

    # Conv2D stride=kernel=14 == patchify + matmul (MXU-friendly)
    x = pixels.reshape(b, n_side, p, n_side, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n_side * n_side, p * p * 3)
    x = jnp.einsum("bnk,ke->bne", x.astype(dtype),
                   params.patch_embed.astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)

    cls = jnp.broadcast_to(params.class_embed.astype(dtype), (b, 1, e))
    x = jnp.concatenate([cls, x], axis=1)              # [B, 577, E]
    x = x + params.pos_embed.astype(dtype)[None]
    x = ref.layer_norm_ref(x, params.pre_ln_w, params.pre_ln_b).astype(dtype)

    d = cfg.head_dim
    scale = 1.0 / (d ** 0.5)

    def step(x, layer):
        h = ref.layer_norm_ref(x, layer.ln1_w, layer.ln1_b).astype(dtype)
        n = h.shape[1]
        q = apply_linear(layer.q_proj, h).reshape(b, n, -1, d)
        k = apply_linear(layer.k_proj, h).reshape(b, n, -1, d)
        v = apply_linear(layer.v_proj, h).reshape(b, n, -1, d)
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)        # bidirectional, no mask
        attn = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        x = x + apply_linear(layer.out_proj,
                             attn.reshape(b, n, -1).astype(x.dtype)).astype(x.dtype)
        h2 = ref.layer_norm_ref(x, layer.ln2_w, layer.ln2_b).astype(dtype)
        f = ref.quick_gelu_ref(apply_linear(layer.fc1, h2).astype(jnp.float32))
        x = x + apply_linear(layer.fc2, f.astype(h2.dtype)).astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(step, x, params.layers)
    return x


def init_random_params(cfg: ModelConfig, seed: int = 0) -> CLIPParams:
    import numpy as np
    rng = np.random.default_rng(seed)
    e, p = cfg.embed_dim, cfg.patch_size
    n_pos = 1 + (cfg.image_size // p) ** 2

    def dense(k, n):
        return DenseLinear(
            weight=jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.float32),
            bias=jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32))

    layers = []
    for _ in range(cfg.num_layers):
        layers.append(CLIPLayerParams(
            ln1_w=jnp.ones((e,), jnp.float32), ln1_b=jnp.zeros((e,), jnp.float32),
            q_proj=dense(e, e), k_proj=dense(e, e), v_proj=dense(e, e),
            out_proj=dense(e, e),
            ln2_w=jnp.ones((e,), jnp.float32), ln2_b=jnp.zeros((e,), jnp.float32),
            fc1=dense(e, cfg.hidden_dim), fc2=dense(cfg.hidden_dim, e)))
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    return CLIPParams(
        patch_embed=jnp.asarray(rng.standard_normal((p * p * 3, e)) * 0.02,
                                jnp.float32),
        class_embed=jnp.asarray(rng.standard_normal(e) * 0.02, jnp.float32),
        pos_embed=jnp.asarray(rng.standard_normal((n_pos, e)) * 0.02, jnp.float32),
        pre_ln_w=jnp.ones((e,), jnp.float32),
        pre_ln_b=jnp.zeros((e,), jnp.float32),
        layers=layers,
        mm_proj_0=dense(e, cfg.mmproj_dim),
        mm_proj_2=dense(cfg.mmproj_dim, cfg.mmproj_dim),
    )
