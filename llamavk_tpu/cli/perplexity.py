"""Perplexity harness — parity with examples/perplexity
(`examples/perplexity/perplexity.cpp:22-79`).

Tokenizes the input text (BOS prepended), splits into n_ctx-token chunks,
evaluates each chunk with logits_all, and accumulates NLL over the second
half of each window (positions n_ctx/2 .. n_ctx-1 predicting the next
token), printing running perplexity per chunk. Published reference values
(README.md:300-307, e.g. 7B q4_0 → 6.5949 on wikitext-2 at n_ctx 512) are
the cross-implementation quality contract.
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np
import jax.numpy as jnp

from ..models import init_kv_cache, llama_forward, load_model


def perplexity(
    cfg, params, tokenizer, text: str | bytes, n_ctx: int = 512, max_chunks: int | None = None
) -> float:
    tokens = tokenizer.encode(text, bos=True)
    n_chunks = len(tokens) // n_ctx
    if max_chunks is not None:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks == 0:
        raise ValueError(f"text too short: {len(tokens)} tokens < n_ctx {n_ctx}")
    nll, count = 0.0, 0
    for i in range(n_chunks):
        chunk = np.asarray(tokens[i * n_ctx : (i + 1) * n_ctx], np.int32)
        t0 = time.time()
        cache = init_kv_cache(cfg, 1, n_ctx)
        logits, _, _ = llama_forward(
            params, jnp.asarray(chunk)[None], cache, jnp.int32(0), cfg, logits_all=True
        )
        logits = np.asarray(logits, np.float32)[0]  # [T, V]
        # NLL over the second half of the window
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        for j in range(n_ctx // 2, n_ctx - 1):
            nll += -logp[j, chunk[j + 1]]
            count += 1
        ppl = math.exp(nll / count)
        print(
            f"chunk {i + 1}/{n_chunks}: ppl {ppl:.4f}  ({time.time() - t0:.2f}s)",
            file=sys.stderr,
            flush=True,
        )
    return math.exp(nll / count)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="raw text file (e.g. wikitext-2 test)")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=None)
    args = ap.parse_args(argv)
    cfg, params, tok = load_model(args.model)
    with open(args.file, "rb") as f:
        text = f.read()
    ppl = perplexity(cfg, params, tok, text, args.ctx_size, args.max_chunks)
    print(f"final perplexity: {ppl:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
