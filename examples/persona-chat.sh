#!/usr/bin/env bash
# Long-form persona chat: infinite-generation interactive session with an
# in-prompt character card (analog of the reference's examples/Miku.sh).
# Pairs naturally with --ctx-ring: the conversation can run past n_ctx
# without a swap re-evaluation.
set -e
cd "$(dirname "$0")/.."

AI_NAME="${AI_NAME:-Vesper}"
USER_NAME="${USER_NAME:-Anon}"
MODEL="${MODEL:-./models/7B/ggml-model-q4_0.bin}"
N_PREDICTS="${N_PREDICTS:-4096}"

read -r -d '' PROMPT <<EOF || true
Transcript of an ongoing text conversation between ${USER_NAME} and ${AI_NAME},
a thoughtful AI companion running locally on ${USER_NAME}'s machine.
${AI_NAME} answers in complete sentences, admits uncertainty instead of
guessing, asks follow-up questions when the request is ambiguous, and keeps
track of details ${USER_NAME} has mentioned earlier in the conversation.
${AI_NAME} communicates through text only.

${USER_NAME}: Hello, ${AI_NAME}.
${AI_NAME}: Hi ${USER_NAME}! What would you like to talk about today?
${USER_NAME}:
EOF

python -m llamavk_tpu.cli.generate -m "$MODEL" --color -i \
    -c 2048 -b 1024 -n "$N_PREDICTS" --n-keep -1 --ctx-swap ring \
    --repeat-last-n 256 --repeat-penalty 1.17647 \
    --temp 0.7 --top-k 40 --top-p 0.5 \
    -r "${USER_NAME}:" \
    -p "$PROMPT" "$@"
