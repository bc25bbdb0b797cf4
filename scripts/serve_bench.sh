#!/bin/sh
# Headline single-chip benchmark + TP/DP scaling sweep.
python bench.py
exec python -m tinychatengine_tpu.tools.scaling --model llama3_8b "$@"
