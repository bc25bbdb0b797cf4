"""TinyChatEngine-TPU: a TPU-native quantized LLM/VLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mit-han-lab/TinyChatEngine (reference: /root/reference):

- AWQ-style group-wise INT4 weight-only quantization (W4A16 on TPU,
  reference semantics: llm/tools/quantize_methods.py:212-232) with a single
  TPU-native packed layout (QM_TPU) replacing the per-ISA layouts
  (QM_x86/QM_ARM/QM_CUDA/QM_METAL).
- SmoothQuant static W8A8 (reference: llm/src/ops/W8A8B8O8Linear.cc) on the
  int8 MXU path.
- Model families: LLaMA 1/2/3 / CodeLlama / Mistral (GQA), OPT, GPTBigCode
  (StarCoder, MQA), CLIP ViT-L (LLaVA/VILA vision tower).
- Fused Pallas kernels for the hot path: dequant-int4 matmul, flash
  attention over the KV cache, RMSNorm.
- Multi-device execution via jax.sharding.Mesh + GSPMD (tensor parallel
  weights/KV + data parallel batch), replacing the reference's pthread pool
  (kernels/pthread_pool.cc) and absent multi-device layer.
"""

__version__ = "0.1.0"

from tinychatengine_tpu.core.config import (  # noqa: F401
    GenerationConfig,
    ModelConfig,
    QuantConfig,
    get_model_config,
    MODEL_REGISTRY,
)
from tinychatengine_tpu.core.flags import warn_unknown_flags  # noqa: F401

warn_unknown_flags()
