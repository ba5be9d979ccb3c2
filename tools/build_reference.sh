#!/bin/sh
# Build the C reference's main/perplexity/quantize binaries for differential
# parity testing (tests/test_reference_parity.py).
#
# Sources are copied from the read-only reference checkout into .refbuild/
# (gitignored). The build is forced SCALAR (UNAME_M=generic disables the
# Makefile's -march=native branch, reference Makefile:80-84): the SIMD
# quantizers differ from the scalar "reference" versions in rounding mode
# (AVX2 rounds half-to-even and computes id=7/max instead of 1/(max/7)) and
# the scalar path is what ggml itself calls *_reference — it is the numeric
# ground truth our emulation targets.
set -e
REF=${1:-/root/reference}
OUT=${2:-$(dirname "$0")/../.refbuild}
mkdir -p "$OUT"
cp -f "$REF"/Makefile "$REF"/ggml.c "$REF"/ggml.h "$REF"/llama.cpp \
      "$REF"/llama.h "$REF"/llama_internal.h "$REF"/llama_util.h "$OUT"/
rm -rf "$OUT/examples"
cp -r "$REF"/examples "$OUT"/examples
chmod -R u+w "$OUT"
cd "$OUT"
make UNAME_M=generic main perplexity quantize >/dev/null
echo "reference binaries: $OUT/{main,perplexity,quantize}"
