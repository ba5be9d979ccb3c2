#!/usr/bin/env bash
# Interactive chat with a 7B model (the reference's examples/chat.sh analog).
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-./models/7B/ggml-model-q4_0.bin}"
USER_NAME="${USER_NAME:-User}"
AI_NAME="${AI_NAME:-Bob}"

python -m llamavk_tpu.cli.generate -m "$MODEL" -c 512 -n 256 \
    --repeat-penalty 1.0 --temp 0.7 --top-k 40 --top-p 0.5 \
    -i -r "${USER_NAME}:" \
    -f prompts/chat-with-bob.txt "$@"
