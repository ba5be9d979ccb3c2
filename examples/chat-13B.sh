#!/usr/bin/env bash
# Chat with the 13B model, longer context (examples/chat-13B.sh analog).
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-./models/13B/ggml-model-q4_0.bin}"

python -m llamavk_tpu.cli.generate -m "$MODEL" -c 2048 -n 1024 \
    --repeat-penalty 1.17647 --repeat-last-n 256 \
    --temp 0.7 --top-k 40 --top-p 0.5 --n-keep 48 \
    -i -r "User:" \
    -f prompts/chat-with-bob.txt "$@"
