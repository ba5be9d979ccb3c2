#!/usr/bin/env bash
# Alpaca instruction-following mode (examples/alpaca.sh analog):
# --instruct wraps each interactive input in the Alpaca prompt template.
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-./models/ggml-alpaca-7b-q4.bin}"

python -m llamavk_tpu.cli.generate -m "$MODEL" --instruct \
    -f prompts/alpaca.txt -c 2048 -n 512 --temp 0.1 \
    --repeat-penalty 1.1 "$@"
