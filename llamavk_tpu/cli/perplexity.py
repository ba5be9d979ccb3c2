"""Perplexity harness — parity with examples/perplexity
(`examples/perplexity/perplexity.cpp:22-79`).

Tokenizes the input text (BOS prepended), splits into n_ctx-token chunks,
evaluates each chunk with logits_all, and accumulates NLL over the second
half of each window (positions n_ctx/2 .. n_ctx-1 predicting the next
token), printing running perplexity per chunk. Published reference values
(README.md:300-307, e.g. 7B q4_0 → 6.5949 on wikitext-2 at n_ctx 512) are
the cross-implementation quality contract; tests/test_reference_parity.py
checks our per-chunk numbers against the compiled reference binary.

The NLL reduction runs ON DEVICE: the jitted chunk function computes
log-softmax and gathers the target-token logprobs, so only [T] floats cross
the host boundary per chunk instead of the full [T, V] logits (512×32000×4 B
≈ 65 MB/chunk over a 1–8 MB/s tunnel would dominate the run ~10:1).
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..models import init_kv_cache, llama_forward, load_model


def make_chunk_nll(cfg, n_ctx: int, dtype=jnp.bfloat16, attn_impl: str = "auto",
                   kv_dtype=None, ggml_rounding: str | None = None,
                   paged: bool = False, page_size: int = 32):
    """Jitted per-chunk NLL: tokens [1, T] → nll [T-1] f32 on device.

    nll[j] is the negative logprob of tokens[j+1] given positions 0..j —
    the quantity perplexity.cpp:66-75 computes per position, reduced on
    device so only T-1 scalars are transferred.

    paged=True evaluates the chunk through a block-table page pool (an
    identity table over freshly-mapped pages) — the production paged
    serving path's numerics under the same quality harness.
    """
    kv = kv_dtype if kv_dtype is not None else (
        jnp.float32 if dtype == jnp.float32 else jnp.bfloat16
    )

    @jax.jit
    def chunk_nll(params, tokens):
        if paged:
            from ..models import init_paged_kv_cache

            if n_ctx % page_size:
                # a truncated table would under-cover the chunk tail and the
                # kernel would index past the [1, nb] identity table
                raise ValueError(
                    f"paged perplexity: n_ctx ({n_ctx}) must be a multiple "
                    f"of page_size ({page_size})"
                )
            nb = n_ctx // page_size
            # pages 1..nb (page 0 is the reserved trash page by convention)
            cache = init_paged_kv_cache(cfg, nb + 1, page_size,
                                        dtype=jnp.dtype(kv))
            table = jnp.arange(1, nb + 1, dtype=jnp.int32)[None]
            extra = dict(page_table=table)
        else:
            cache = init_kv_cache(cfg, 1, n_ctx, dtype=jnp.dtype(kv))
            extra = {}
        logits, _, _ = llama_forward(
            params, tokens, cache, jnp.int32(0), cfg,
            logits_all=True, dtype=dtype, attn_impl=attn_impl,
            ggml_rounding=ggml_rounding, **extra,
        )
        lg = logits[0].astype(jnp.float32)  # [T, V]
        logp = jax.nn.log_softmax(lg, axis=-1)
        tgt = tokens[0, 1:]
        return -jnp.take_along_axis(logp[:-1], tgt[:, None], axis=1)[:, 0]

    return chunk_nll


def perplexity_chunks(
    cfg, params, tokenizer, text: str | bytes, n_ctx: int = 512,
    max_chunks: int | None = None, dtype=jnp.bfloat16, attn_impl: str = "auto",
    kv_dtype=None, verbose: bool = True, ggml_rounding: str | None = None,
    paged: bool = False, page_size: int = 32,
) -> list[float]:
    """Returns the running perplexity after each chunk (the reference's
    `[i]x.xxxx,` sequence)."""
    tokens = tokenizer.encode(text, bos=True)
    n_chunks = len(tokens) // n_ctx
    if max_chunks is not None:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks == 0:
        raise ValueError(f"text too short: {len(tokens)} tokens < n_ctx {n_ctx}")
    chunk_nll = make_chunk_nll(cfg, n_ctx, dtype=dtype, attn_impl=attn_impl,
                               kv_dtype=kv_dtype, ggml_rounding=ggml_rounding,
                               paged=paged, page_size=page_size)
    nll, count, out = 0.0, 0, []
    for i in range(n_chunks):
        chunk = np.asarray(tokens[i * n_ctx : (i + 1) * n_ctx], np.int32)
        t0 = time.time()
        nll_vec = np.asarray(chunk_nll(params, jnp.asarray(chunk)[None]))
        # NLL over the second half of the window (perplexity.cpp:66-75)
        nll += float(nll_vec[n_ctx // 2 : n_ctx - 1].sum())
        count += (n_ctx - 1) - n_ctx // 2
        ppl = math.exp(nll / count)
        out.append(ppl)
        if verbose:
            print(
                f"chunk {i + 1}/{n_chunks}: ppl {ppl:.4f}  ({time.time() - t0:.2f}s)",
                file=sys.stderr,
                flush=True,
            )
    return out


def perplexity(
    cfg, params, tokenizer, text: str | bytes, n_ctx: int = 512,
    max_chunks: int | None = None, **kw,
) -> float:
    return perplexity_chunks(cfg, params, tokenizer, text, n_ctx, max_chunks, **kw)[-1]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="raw text file (e.g. wikitext-2 test)")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=None)
    ap.add_argument(
        "--f32", action="store_true",
        help="fp32 activations + fp32 KV (numerics-oracle mode for parity "
        "runs against the C reference)",
    )
    args = ap.parse_args(argv)
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg, params, tok = load_model(
        args.model,
        **({"scale_dtype": jnp.float32, "dense_dtype": jnp.float32} if args.f32 else {}),
    )
    with open(args.file, "rb") as f:
        text = f.read()
    ppl = perplexity(cfg, params, tok, text, args.ctx_size, args.max_chunks,
                     dtype=dtype, attn_impl="einsum" if args.f32 else "auto")
    print(f"final perplexity: {ppl:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
