#!/bin/sh
# VLM chat with an image (the reference's llm/scripts/vila.sh runs
# `./chat VILA_7B INT4 5 <img>`); image is spliced into the first turn.
IMG="${1:?usage: vila.sh <image> [extra chat args]}"; shift
exec python -m tinychatengine_tpu.chat --model vila_7b --precision INT4 \
    --checkpoint "${CKPT:-ckpts/vila_7b}" --image "$IMG" "$@"
