"""Serving CLI — start the HTTP front-end over the continuous-batching
engine (runtime/server.py). The production counterpart of the reference's
single-stream interactive `main` (`examples/main/main.cpp:244-457`): many
concurrent requests share one model replica through continuous batching,
with optional int8 KV, block-table paged KV, shared-prefix pooling, and
prompt-lookup speculation — all engine features surface as flags here.

    python -m llamavk_tpu.cli.serve -m model.bin --port 8000 --max-batch 32
    curl -d '{"prompt": "Hello", "max_tokens": 32}' localhost:8000/v1/completions
"""

from __future__ import annotations

import argparse

from ..models import load_model
from ..runtime.batching import BatchConfig
from ..runtime.server import LlamaServer


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("-c", "--ctx-size", type=int, default=512,
                    help="per-slot context length")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="concurrent decode slots")
    ap.add_argument("--block", type=int, default=8,
                    help="decode steps per device round-trip")
    ap.add_argument("--admit-chunk", type=int, default=4)
    ap.add_argument("--kv-dtype", choices=["bfloat16", "int8"],
                    default="bfloat16")
    ap.add_argument("--paged", action="store_true",
                    help="block-table paged KV (pool memory = pages in use)")
    ap.add_argument("--page-size", type=int, default=128)  # measured sweet spot (r5 A/B: 128 > 64 > 256 on throughput)
    ap.add_argument("--n-pages", type=int, default=0,
                    help="pool pages (0 = flat-equivalent footprint); size "
                    "it smaller to oversubscribe slots")
    ap.add_argument("--shared-prefix", action="store_true",
                    help="registered prefixes live in one read-only pool "
                    "(bf16, non-paged)")
    ap.add_argument("--prefix-pool", type=int, default=4)
    ap.add_argument("--prefix-ctx", type=int, default=256)
    ap.add_argument("--lookup-gamma", type=int, default=0,
                    help=">0: prompt-lookup speculative decoding")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree: serve one TP replica over "
                    "the first tp devices (Megatron split; weights loaded "
                    "with matching chunk packing)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel degree: shard the request slots over "
                    "dp groups of tp devices each (one lockstep decode "
                    "program serves every group — replica scaling without "
                    "per-replica dispatch overhead); max_batch %% dp == 0")
    ap.add_argument("--replicas", type=int, default=1,
                    help="independent model replicas: partitions the devices "
                    "into this many groups of --tp devices each, one engine "
                    "thread per group behind the same HTTP door "
                    "(least-loaded admission; prefixes register everywhere)")
    ap.add_argument("--no-int4-weights", action="store_true",
                    help="keep int8 byte-packed weight planes (TPU default "
                    "converts to int4-plane storage at load)")
    ap.add_argument("--model-name", default=None)
    return ap


def main(argv=None):
    ap = build_argparser()
    args = ap.parse_args(argv)
    # validate flag combinations upfront (the engine asserts the same
    # invariants, but an argparse error names the flag instead of a
    # traceback from BatchedEngine.__init__)
    if args.dp > 1 and args.max_batch % args.dp:
        ap.error(f"--max-batch {args.max_batch} must be divisible by "
                 f"--dp {args.dp} (slots shard over the dp axis)")
    if args.dp > 1 and args.paged:
        ap.error("--paged serves tp-only meshes (the page pool is one "
                 "shared allocator; use --tp without --dp)")
    if args.shared_prefix and args.paged:
        ap.error("--shared-prefix and --paged are exclusive "
                 "(the block table IS the sharing mechanism)")
    if args.shared_prefix and args.dp > 1:
        ap.error("--shared-prefix composes with --tp, not --dp "
                 "(one pool; dp shards the request slots)")
    if args.replicas > 1 and args.dp > 1:
        ap.error("--replicas already IS replica scaling; combine it with "
                 "--tp (per-replica sharding), not --dp")
    import jax as _jax_backend

    use_i4 = (not args.no_int4_weights
              and _jax_backend.default_backend() == "tpu")
    cfg, params, tok = load_model(args.model, tp=args.tp,
                                  int4_planes=use_i4)
    mesh = None
    replicas = max(1, args.replicas)
    devices = None
    if replicas > 1:
        import jax

        need = replicas * args.tp
        devices = jax.devices()[:need]
        if len(devices) < need:
            ap.error(f"--replicas {replicas} x --tp {args.tp} needs {need} "
                     f"devices, have {len(jax.devices())}")
    elif args.tp > 1 or args.dp > 1:
        from ..parallel import make_mesh
        import jax

        mesh = make_mesh(tp=args.tp, dp=args.dp,
                         devices=jax.devices()[: args.tp * args.dp])
    bcfg = BatchConfig(
        max_batch=args.max_batch,
        n_ctx=args.ctx_size,
        block=args.block,
        admit_chunk=args.admit_chunk,
        kv_dtype=args.kv_dtype,
        paged=args.paged,
        page_size=args.page_size,
        n_pages=args.n_pages,
        shared_prefix=args.shared_prefix,
        prefix_pool=args.prefix_pool,
        prefix_ctx=args.prefix_ctx,
        lookup_gamma=args.lookup_gamma,
    )
    server = LlamaServer(cfg, params, tok, bcfg, model_name=args.model_name,
                         mesh=mesh, replicas=replicas, devices=devices)
    server.serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
