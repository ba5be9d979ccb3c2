"""Layer-by-layer activation dump — the numeric-parity bring-up tool.

The reference's Vulkan engine has a debug mode where `submitPass(debug=true)`
copies a chosen layer's stage buffer to the host and hex-dumps 4096 fp16
values (vulkan/llama-vk.cpp:2271-2340). This is the TPU analog: run a prompt
through the model with per-layer activation capture and print, for every
layer, summary stats (and optionally raw values) of each stage tensor —
enough to diff two implementations layer by layer and find where they
diverge.

usage: python -m llamavk_tpu.cli.debug_acts -m model.bin -p "prompt" \
          [--layer N] [--stage attn_norm|attn_out|ffn_norm|layer_out] \
          [--dump N_VALUES] [--attn-impl flash|einsum]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from ..models import init_kv_cache, llama_forward
from ..models.loader import load_model

STAGES = ("attn_norm", "attn_out", "ffn_norm", "layer_out")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("--layer", type=int, default=-1, help="-1 = all layers")
    ap.add_argument("--stage", choices=STAGES, default=None, help="default: all")
    ap.add_argument("--dump", type=int, default=0, help="print first N raw values")
    ap.add_argument("--attn-impl", choices=("flash", "einsum"), default="flash")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    args = ap.parse_args(argv)

    cfg, params, tok = load_model(args.model)
    tokens = tok.encode(" " + args.prompt, bos=True)
    print(f"{len(tokens)} prompt tokens; model {cfg.type_name}", file=sys.stderr)

    cache = init_kv_cache(cfg, 1, args.ctx_size)
    logits, cache, emb, acts = llama_forward(
        params,
        jnp.asarray(tokens, jnp.int32)[None],
        cache,
        jnp.int32(0),
        cfg,
        attn_impl=args.attn_impl,
        collect_acts=True,
    )

    layers = range(cfg.n_layer) if args.layer < 0 else [args.layer]
    stages = STAGES if args.stage is None else [args.stage]
    for l in layers:
        for st in stages:
            a = np.asarray(acts[st])[l, 0, -1].astype(np.float32)  # last token
            print(
                f"layer {l:3d} {st:10s} mean={a.mean():+.6e} std={a.std():.6e}"
                f" min={a.min():+.6e} max={a.max():+.6e} l2={np.linalg.norm(a):.6e}"
            )
            if args.dump:
                vals = " ".join(f"{v:+.4e}" for v in a[: args.dump])
                print(f"          values[:{args.dump}]: {vals}")
    lg = np.asarray(logits)[0, -1]
    print(f"logits     mean={lg.mean():+.6e} std={lg.std():.6e} argmax={lg.argmax()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
