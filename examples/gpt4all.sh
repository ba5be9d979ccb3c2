#!/usr/bin/env bash
# Instruct-mode session against a gpt4all-lora checkpoint (convert it first
# with `python -m llamavk_tpu.convert.gpt4all`); analog of the reference's
# examples/gpt4all.sh.
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-./models/gpt4all-7B/gpt4all-lora-quantized.bin}"

python -m llamavk_tpu.cli.generate -m "$MODEL" --color --instruct \
    -f prompts/alpaca.txt \
    -c 2048 -b 8 -n 128 \
    --repeat-last-n 64 --repeat-penalty 1.3 \
    --temp 0.1 --top-k 40 --top-p 0.95 "$@"
