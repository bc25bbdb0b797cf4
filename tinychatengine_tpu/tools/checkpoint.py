"""Checkpoint save/load — the converted-model on-disk format.

Replaces the reference's directory-of-.bin-files format (weights loaded
per-module by constructors, llm/include/ops/linear.h:29-63) with a single
sharded-npz checkpoint: ``meta.json`` (model + quant config) plus
``shard_*.npz`` files holding the flattened parameter pytree keyed by tree
path. Device-specific offline packing (the QM_* step,
llm/tools/model_quantizer.py) happens at conversion time into the one QM_TPU
layout; loading is a straight mmap → device_put (sharded via
parallel.sharding when a mesh is given).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig, get_model_config

_SHARD_BYTES = 1 << 30  # ~1 GB per npz shard


def _flatten(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        key = "/".join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def _path_str(p) -> str:
    if hasattr(p, "name"):
        return str(p.name)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "key"):
        return str(p.key)
    return str(p)


def save_checkpoint(path: str, params, cfg: ModelConfig, qcfg: QuantConfig,
                    extra_meta: dict | None = None):
    os.makedirs(path, exist_ok=True)
    flat, _ = _flatten(params)
    shards: list[dict] = [{}]
    size = 0
    for k in sorted(flat):
        v = flat[k]
        if size > _SHARD_BYTES:
            shards.append({})
            size = 0
        shards[-1][k] = v
        size += v.nbytes
    index = {}
    dtypes = {}
    for i, shard in enumerate(shards):
        fname = f"shard_{i:04d}.npz"
        enc = {}
        for k, v in shard.items():
            # npz can't store ml_dtypes (bfloat16 etc., kind 'V') — view as uints
            if v.dtype.kind == "V":
                dtypes[k] = v.dtype.name
                v = v.view(np.uint16 if v.dtype.itemsize == 2 else np.uint8)
            enc[k.replace("/", "|")] = v
        np.savez(Path(path) / fname, **enc)
        for k in shard:
            index[k] = fname
    meta = {
        "dtypes": dtypes,
        "format": "tinychatengine_tpu.v1",
        "model": cfg.name,
        "quant": {"scheme": qcfg.scheme, "group_size": qcfg.group_size,
                  "kv_cache_dtype": qcfg.kv_cache_dtype},
        "index": index,
        **(extra_meta or {}),
    }
    (Path(path) / "meta.json").write_text(json.dumps(meta, indent=1))


def load_checkpoint(path: str, cfg: ModelConfig | None = None,
                    precision: str | None = None):
    """Returns (params, qcfg). cfg/precision override what meta.json says."""
    meta = json.loads((Path(path) / "meta.json").read_text())
    assert meta.get("format", "").startswith("tinychatengine_tpu"), meta
    cfg = cfg or get_model_config(meta["model"])
    q = meta["quant"]
    qcfg = QuantConfig(scheme=q["scheme"], group_size=q["group_size"],
                       kv_cache_dtype=q.get("kv_cache_dtype", "bf16"))

    import ml_dtypes

    arrays: dict[str, np.ndarray] = {}
    dtypes = meta.get("dtypes", {})
    for fname in sorted(set(meta["index"].values())):
        with np.load(Path(path) / fname) as z:
            for k in z.files:
                key = k.replace("|", "/")
                v = z[k]
                if key in dtypes:
                    v = v.view(np.dtype(getattr(ml_dtypes, dtypes[key])))
                arrays[key] = v

    template = _build_template(cfg, qcfg, meta)
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat_t:
        key = "/".join(_path_str(x) for x in p)
        if key not in arrays:
            raise KeyError(f"checkpoint missing tensor {key}")
        leaves.append(jax.numpy.asarray(arrays[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves), qcfg


def _build_template(cfg: ModelConfig, qcfg: QuantConfig, meta: dict):
    """Abstract params structure for unflattening (leaf values ignored)."""
    family = meta.get("family") or cfg.family
    if family == "llama":
        from tinychatengine_tpu.models import llama
        tiny = _tiny_like(cfg)
        return llama.init_random_params(tiny, qcfg, seed=0, max_pos=8, fast=True)
    if family == "opt":
        from tinychatengine_tpu.models import opt
        tiny = _tiny_like(cfg)
        # qcfg selects the container types: w8a8 → W8A8Linear, w4a16/w4a8 →
        # Int4(A8)Linear (without it an int4 OPT checkpoint would unflatten
        # against a dense template and fail on tree-structure mismatch)
        return opt.init_random_params(tiny, quantized=(qcfg.scheme == "w8a8"),
                                      qcfg=qcfg)
    if family == "gptbigcode":
        from tinychatengine_tpu.models import gptbigcode
        tiny = _tiny_like(cfg)
        return gptbigcode.init_random_params(tiny, qcfg=qcfg)
    if family == "clip":
        import dataclasses

        from tinychatengine_tpu.models import clip
        tiny = dataclasses.replace(
            cfg, embed_dim=64, hidden_dim=128, num_heads=4, num_kv_heads=4,
            image_size=28, patch_size=14, mmproj_dim=64)
        return clip.init_random_params(tiny)
    raise NotImplementedError(family)


def save_clip(path: str, clip_params, clip_cfg: ModelConfig):
    """Persist the VLM vision tower next to the decoder checkpoint
    (the reference ships CLIP as its own exported dir, llm/tools/clip_exporter.py)."""
    import dataclasses
    save_checkpoint(str(Path(path) / "clip"), clip_params, clip_cfg,
                    QuantConfig(scheme="fp"),
                    extra_meta={"family": "clip",
                                "clip_cfg": dataclasses.asdict(clip_cfg)})


def load_clip(path: str):
    """Returns (clip_params, clip_cfg) from <checkpoint>/clip."""
    sub = Path(path) / "clip"
    meta = json.loads((sub / "meta.json").read_text())
    cfg = ModelConfig(**meta["clip_cfg"])
    params, _ = load_checkpoint(str(sub), cfg)
    return params, cfg


def _tiny_like(cfg: ModelConfig) -> ModelConfig:
    """Same tree structure, minimal tensor sizes (template only)."""
    import dataclasses
    return dataclasses.replace(
        cfg, num_layers=cfg.num_layers, embed_dim=512, hidden_dim=512,
        vocab_size=256, num_heads=4, num_kv_heads=max(1, cfg.num_kv_heads
                                                      * 4 // cfg.num_heads),
        max_sqlen=8)


def load_tokenizer(path: str, cfg: ModelConfig):
    """Best-effort tokenizer discovery in a checkpoint/tokenizer directory."""
    from tinychatengine_tpu.tokenizers import (ByteLevelBPE, Llama3BPE,
                                               SentencePieceBPE)
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer

    p = Path(path)
    candidates = [p] if p.is_file() else list(p.glob("tokenizer.*")) + \
        list(p.glob("*vocab*"))
    for c in candidates:
        try:
            if "llama3" in cfg.name or cfg.vocab_size > 100000:
                return Llama3BPE.load(str(c))
            if cfg.family == "llama":
                return SentencePieceBPE.load(str(c))
            return ByteLevelBPE.load(str(c if c.is_dir() else c.parent))
        except Exception:
            continue
    return ByteTokenizer()
