#!/usr/bin/env bash
# Tool dispatcher for the full image (reference .devops/tools.sh parity):
#   --convert        convert-pth-to-ggml
#   --quantize       model quantizer
#   --run            generate
#   --perplexity     wikitext eval
#   --all-in-one     convert then quantize a model dir
set -e
cmd="$1"; shift || true
case "$cmd" in
  --convert)     exec python -m llamavk_tpu.convert.pth "$@" ;;
  --quantize)    exec python -m llamavk_tpu.cli.quantize "$@" ;;
  --run)         exec python -m llamavk_tpu.cli.generate "$@" ;;
  --perplexity)  exec python -m llamavk_tpu.cli.perplexity "$@" ;;
  --all-in-one)
    dir="${1:?usage: --all-in-one <model-dir>}"
    python -m llamavk_tpu.convert.pth "$dir" --ftype 1 -o "$dir/ggml-model-f16.bin"
    python -m llamavk_tpu.cli.quantize "$dir/ggml-model-f16.bin" "$dir/ggml-model-q4_0.bin" 2
    ;;
  *) echo "usage: tools.sh --convert|--quantize|--run|--perplexity|--all-in-one ..." >&2; exit 2 ;;
esac
