"""GPT4All → scored-vocab GGML converter (convert-gpt4all-to-ggml.py parity).

GPT4All shipped models in the unversioned 'ggml' v0 container whose vocab has
no token scores, which breaks the score-driven greedy tokenizer. The
reference script rewrites the file in place-of with scores pulled from the
original SentencePiece tokenizer.model; this converter does the same but
emits an aligned GGJT v1 (mmap-able, the current format) instead.

usage: python -m llamavk_tpu.convert.gpt4all gpt4all.bin tokenizer.model out.bin
"""

from __future__ import annotations

import sys

from ..formats.ggml_io import CheckpointReader, CheckpointWriter, TokenEntry
from .spm_reader import read_spm_vocab


def convert_gpt4all(path_in: str, tokenizer_model: str, path_out: str) -> str:
    r = CheckpointReader(path_in, n_parts=1)
    spm = read_spm_vocab(tokenizer_model)
    n = r.hparams.n_vocab
    if len(spm) < n:
        raise ValueError(
            f"tokenizer.model has {len(spm)} pieces but model expects {n}"
        )
    # keep the model file's token bytes (gpt4all substituted some pieces),
    # take scores from the sentencepiece model by id
    vocab = [
        TokenEntry(text=r.vocab[i].text, score=spm[i].score) for i in range(n)
    ]
    with CheckpointWriter(path_out, r.hparams, vocab) as w:
        for name, t in r.tensors.items():
            w.write_tensor(name, t.ne, t.ftype, bytes(r.raw_tensor(name)))
    return path_out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    print(convert_gpt4all(*argv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
