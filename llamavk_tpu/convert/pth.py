"""Meta LLaMA .pth checkpoint → single GGJT v1 file.

Replaces convert-pth-to-ggml.py: reads params.json + tokenizer.model +
consolidated.XX.pth part files, merges the tensor-parallel shards (rows for
wq/wk/wv/w1/w3/output, columns for tok_embeddings/wo/w2 — the split table of
convert-pth-to-ggml.py:160-189 / llama_internal.h:37-41), and writes one
aligned, mmap-able GGJT file (the reference writes strided rows per part
instead; merging up front is simpler and produces the same bytes).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from ..formats.ggml_io import CheckpointWriter, Hparams
from ..formats.q4 import GGML_FTYPE_F16, GGML_FTYPE_F32
from .spm_reader import read_spm_vocab

# numpy concat axis per tensor name pattern (None = duplicated across parts)
def _merge_axis(name: str) -> int | None:
    if name == "tok_embeddings.weight":
        return 1
    if ".attention.wo.weight" in name or ".feed_forward.w2.weight" in name:
        return 1
    return 0


def convert_pth(
    model_dir: str,
    out_path: str | None = None,
    ftype: int = GGML_FTYPE_F16,
    vocab_only: bool = False,
) -> str:
    import torch

    with open(os.path.join(model_dir, "params.json")) as f:
        pj = json.load(f)
    tok_path = os.path.join(model_dir, "tokenizer.model")
    if not os.path.exists(tok_path):
        tok_path = os.path.join(os.path.dirname(model_dir.rstrip("/")), "tokenizer.model")
    vocab = read_spm_vocab(tok_path)

    parts = sorted(
        f for f in os.listdir(model_dir)
        if f.startswith("consolidated.") and f.endswith(".pth")
    )
    if not parts and not vocab_only:
        raise FileNotFoundError(f"no consolidated.*.pth in {model_dir}")

    hp = Hparams(
        n_vocab=len(vocab),
        n_embd=pj["dim"],
        n_mult=pj["multiple_of"],
        n_head=pj["n_heads"],
        n_layer=pj["n_layers"],
        n_rot=pj["dim"] // pj["n_heads"],
        ftype=ftype if not vocab_only else 0,
    )
    if out_path is None:
        suffix = "f16" if ftype == GGML_FTYPE_F16 else "f32"
        out_path = os.path.join(model_dir, f"ggml-model-{suffix}.bin")

    with CheckpointWriter(out_path, hp, vocab) as w:
        if vocab_only:
            return out_path
        states = [torch.load(os.path.join(model_dir, p), map_location="cpu",
                             weights_only=True) for p in parts]
        names = [n for n in states[0] if not n.endswith("freqs")]
        for name in names:
            arrs = [np.asarray(st[name].to(torch.float32).numpy()).squeeze() for st in states]
            if arrs[0].ndim == 1 or len(arrs) == 1:
                data = arrs[0]
            else:
                data = np.concatenate(arrs, axis=_merge_axis(name))
            # 1-D tensors stay f32 (convert-pth-to-ggml.py:152-156)
            t = GGML_FTYPE_F32 if (ftype == GGML_FTYPE_F32 or data.ndim == 1) else GGML_FTYPE_F16
            dt = np.float16 if t == GGML_FTYPE_F16 else np.float32
            w.write_array(name, data.astype(dt), t)
            print(f"  {name}: {data.shape} -> {'f16' if t else 'f32'}", file=sys.stderr)
    return out_path


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--ftype", type=int, default=1, help="0=f32, 1=f16")
    ap.add_argument("--vocab-only", action="store_true")
    ap.add_argument("-o", "--out")
    args = ap.parse_args(argv)
    out = convert_pth(args.model_dir, args.out, args.ftype, args.vocab_only)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
