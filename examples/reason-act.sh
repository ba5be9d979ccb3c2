#!/usr/bin/env bash
# ReAct-style tool-use prompting (examples/reason-act.sh analog).
set -e
cd "$(dirname "$0")/.."

MODEL="${MODEL:-./models/7B/ggml-model-q4_0.bin}"

python -m llamavk_tpu.cli.generate -m "$MODEL" -c 512 -n 256 \
    -i -r "Question:" --temp 0.2 \
    -f prompts/reason-act.txt "$@"
