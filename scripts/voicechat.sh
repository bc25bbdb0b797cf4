#!/bin/sh
# Voice chat (reference: voicechat_setup.sh + ./chat -v): needs whisper.cpp
# `stream` and piper/espeak on PATH (or TCE_STT_CMD/TCE_TTS_CMD).
exec python -m tinychatengine_tpu.chat --model llama3_8b --precision INT4 \
    --checkpoint "${CKPT:-ckpts/llama3_8b}" -v "$@"
