"""Format migration tools.

migrate_to_ggjt: any readable GGML/GGMF/GGJT (incl. multi-part) → single
aligned GGJT v1 — covers both convert-unversioned-ggml-to-ggml.py (magic
'ggml' v0: no scores, unaligned) and migrate-ggml-2023-03-30-pr613.py
(ggmf → ggjt). Scores missing in v0 files are written as 0.

ggml_to_pth: the reverse converter (convert-ggml-to-pth.py): dequantizes a
ggml checkpoint back into a PyTorch state dict / .pth file.
"""

from __future__ import annotations

import sys

import numpy as np

from ..formats.ggml_io import CheckpointReader, CheckpointWriter, Hparams


def migrate_to_ggjt(path_in: str, path_out: str) -> str:
    r = CheckpointReader(path_in)
    hp = r.hparams
    with CheckpointWriter(path_out, hp, r.vocab) as w:
        for name, t in r.tensors.items():
            w.write_tensor(name, t.ne, t.ftype, bytes(r.raw_tensor(name)))
    return path_out


def ggml_to_pth(path_in: str, path_out: str) -> str:
    import torch

    r = CheckpointReader(path_in)
    state = {}
    for name in r.tensors:
        state[name] = torch.from_numpy(np.ascontiguousarray(r.load_f32(name)))
    torch.save(state, path_out)
    return path_out


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--to-pth", action="store_true")
    args = ap.parse_args(argv)
    fn = ggml_to_pth if args.to_pth else migrate_to_ggjt
    print(fn(args.input, args.output))
    return 0


if __name__ == "__main__":
    sys.exit(main())
