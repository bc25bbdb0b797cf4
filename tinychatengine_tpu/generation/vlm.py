"""VLM (LLaVA / VILA) pipeline: image → CLIP embeds → decoder splice.

TPU-native equivalent of the reference's LLaVAGenerate path
(llm/src/nn_modules/non_cuda/LLaVAGenerate.cc):

- image decode: PIL (the stb_image analog, LLaVAGenerate.cc:444-452);
- preprocessing: pad-to-square + bilinear 336² + CLIP normalize
  (clip_image_preprocess, LLaVAGenerate.cc:504-600 — models/clip.py);
- encode_image_with_clip → 576 patch embeddings through the mm_projector
  (LLaVAGenerate.cc:482-501, models/clip.py encode_image);
- the decoder consumes text embeddings with the image block spliced in
  at the <image> marker (Int4llamaDecoder.cc:81-92 memcpy splice —
  here the caller builds the [B, S, E] input_embeds and the engine's
  prefill runs it through models/llama.forward(input_embeds=...)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig
from tinychatengine_tpu.generation.engine import Engine, GenerationResult
from tinychatengine_tpu.models import clip

IMAGE_MARKER = "<image>"


def load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 [H, W, 3] (stb_image analog)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.uint8)


def encode_image(clip_params, clip_cfg: ModelConfig, image: np.ndarray):
    """uint8 [H, W, 3] → [n_patches, mmproj_dim] bf16 embeddings."""
    pixels = clip.preprocess_image(jnp.asarray(image), clip_cfg.image_size)
    return clip.encode_image(clip_params, clip_cfg, pixels[None])[0]


def build_multimodal_inputs(tok, embed_table, prompt: str,
                            image_embeds, bos: bool = True):
    """Split ``prompt`` at the <image> marker and splice the image embeddings
    between the text segments.

    Returns (input_ids [1, S], input_embeds [1, S, E]): ids carry real token
    ids for the text and 0 for image slots (ids feed only the sampler's
    repetition window and shapes; the decoder consumes the embeds).
    """
    if IMAGE_MARKER in prompt:
        pre_text, post_text = prompt.split(IMAGE_MARKER, 1)
    else:  # reference default: image before the prompt (chat.cc:651-659)
        pre_text, post_text = "", prompt
    pre = tok.encode(pre_text, bos=bos) if (pre_text or bos) else []
    post = tok.encode(post_text, bos=False)
    n_img = image_embeds.shape[0]

    e_pre = np.asarray(embed_table)[np.asarray(pre, np.int32)] if pre else \
        np.zeros((0, embed_table.shape[1]), np.float32)
    e_post = np.asarray(embed_table)[np.asarray(post, np.int32)] if post else \
        np.zeros((0, embed_table.shape[1]), np.float32)
    embeds = np.concatenate(
        [e_pre.astype(np.float32),
         np.asarray(image_embeds, np.float32),
         e_post.astype(np.float32)], axis=0)
    ids = np.concatenate(
        [np.asarray(pre, np.int32),
         np.zeros((n_img,), np.int32),
         np.asarray(post, np.int32)])
    return ids[None, :], jnp.asarray(embeds, jnp.bfloat16)[None]


def build_multimodal_inputs_multi(tok, embed_table, prompt: str,
                                  image_embeds_list, bos: bool = True):
    """N-image variant of build_multimodal_inputs for the serving path:
    ``prompt`` contains one <image> marker per entry of
    ``image_embeds_list`` (in order); the text between markers is tokenized
    and embedded, image spans are spliced verbatim.

    Returns (ids [S] int32 np, embeds [S, E] float32 np). Text rows are
    fetched with ONE device gather of the needed rows (never the whole
    [V, E] table — it is ~1 GB for 8B-class models and the tunnel fetches
    at ~15 MB/s).
    """
    segs = prompt.split(IMAGE_MARKER)
    if len(segs) != len(image_embeds_list) + 1:
        raise ValueError(
            f"prompt has {len(segs) - 1} image markers but "
            f"{len(image_embeds_list)} images were provided")
    ids_parts, spans = [], []   # spans: (offset, n_img) per image
    off = 0
    for si, seg in enumerate(segs):
        toks = tok.encode(seg, bos=(bos and si == 0)) \
            if (seg or (bos and si == 0)) else []
        ids_parts.append(np.asarray(toks, np.int32))
        off += len(toks)
        if si < len(image_embeds_list):
            n_img = image_embeds_list[si].shape[0]
            ids_parts.append(np.zeros((n_img,), np.int32))
            spans.append((off, n_img))
            off += n_img
    ids = np.concatenate(ids_parts) if ids_parts else \
        np.zeros((0,), np.int32)
    emb = np.asarray(
        jnp.take(jnp.asarray(embed_table), jnp.asarray(ids), axis=0),
        np.float32)
    for (o, n_img), img in zip(spans, image_embeds_list):
        emb[o:o + n_img] = np.asarray(img, np.float32)
    return ids, emb


def generate_with_image(engine: Engine, clip_params, clip_cfg: ModelConfig,
                        tok, prompt: str, image: np.ndarray,
                        gcfg: GenerationConfig, stop_token_ids=(),
                        on_token=None, cache=None,
                        image_embeds=None) -> GenerationResult:
    """One LLaVA-style turn: encode the image (unless pre-encoded embeds are
    passed — the reference also encodes only on the first call,
    LLaVAGenerate.cc:126), splice, generate."""
    if image_embeds is None:
        image_embeds = encode_image(clip_params, clip_cfg, image)
    ids, embeds = build_multimodal_inputs(
        tok, engine.params.embed, prompt, image_embeds)
    return engine.generate(ids, gcfg, stop_token_ids=stop_token_ids,
                           on_token=on_token, cache=cache,
                           input_embeds=embeds)
