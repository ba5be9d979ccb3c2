"""Embedding extraction CLI — parity with examples/embedding
(`examples/embedding/embedding.cpp`): evaluate the prompt once and print the
final-norm activation vector of the last token (llama_get_embeddings)."""

from __future__ import annotations

import argparse
import sys

from ..models import load_model
from ..runtime import Engine, EngineConfig


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    args = ap.parse_args(argv)

    cfg, params, tok = load_model(args.model)
    engine = Engine(cfg, params, EngineConfig(n_ctx=args.ctx_size))
    ids = tok.encode(" " + args.prompt, bos=True)
    engine.eval(ids)
    emb = engine.get_embeddings()
    print(" ".join(f"{v:.6f}" for v in emb))
    print(engine.timings.report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
