#!/bin/sh
# Reference-style launcher (llm/scripts/*.sh): chat with LLaMA-3-8B INT4.
# Prepare the checkpoint once with:
#   python -m tinychatengine_tpu.tools.zoo --model LLaMA_3_8B_Instruct \
#       --quant w4a16 --out ckpts/llama3_8b
exec python -m tinychatengine_tpu.chat --model llama3_8b --precision INT4 \
    --checkpoint "${CKPT:-ckpts/llama3_8b}" "$@"
