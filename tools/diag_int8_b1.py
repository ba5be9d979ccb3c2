"""Diagnose the int8-KV B=1 end-to-end regression (VERDICT weak #2).

bench.py measured ~9.8 ms/tok with kv_dtype=int8 at B=1 vs ~7.8 bf16, yet the
same forward timed differentially IN-program reads 7.2-7.5 ms — the gap is
program-level. This tool compiles the EXACT bench.py decode program (scan of
`measure` steps, donated cache) for both KV dtypes and diffs the optimized
HLO for the usual program-level suspects:

  * `copy` / `copy-start` instructions over cache-sized buffers (donation
    failing -> a full [L,B,S,H,D] copy per call or, far worse, per scan step)
  * `dynamic-update-slice` fusions that rematerialize the carry
  * peak buffer allocation (layout padding of the int8 scale planes)

Run on-chip:  PYTHONPATH=.:/root/.axon_site python tools/diag_int8_b1.py
Also times each variant end-to-end (3x64 steps) so the regression is
reproduced in the same process that dumped its HLO.
"""

import re
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from llamavk_tpu.models import (
    LLAMA_CONFIGS,
    ModelConfig,
    init_kv_cache,
    llama_forward,
    synthetic_params,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_ITEM = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "f16": 2, "pred": 1}


def big_insts(hlo: str, min_mb: float = 2.0):
    """(opcode, shape, MB) for every instruction whose OUTPUT tensor is
    >= min_mb, keyed by opcode — copy, copy-start (async), fusion bodies'
    outputs, dynamic-update-slice, transpose, bitcast-convert, all of it.
    (The round-2 version only matched bare `copy(`/`transpose(` lines and
    could false-negative on async copy-start or copies buried in fusions —
    ADVICE.md r2 #1.) Tuple-shaped outputs count each big element."""
    out = []
    for line in hlo.splitlines():
        m = re.search(r"= ((?:\([^)]*\)|\S+?)) ([\w-]+)\(", line)
        if not m:
            continue
        shape, op = m.groups()
        if op in ("parameter", "constant", "while", "conditional",
                  "custom-call", "get-tuple-element", "tuple"):
            continue  # structural / kernel ops: not data movement XLA added
        for dm in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
            dt, dims = dm.groups()
            if dt not in _ITEM:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            mb = n * _ITEM[dt] / 1e6
            if mb >= min_mb:
                out.append((op, f"{dt}[{dims}]", mb))
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="7B")
    ap.add_argument("n_layer", nargs="?", type=int, default=0,
                    help="layer-count differential: per-layer vs per-step")
    ap.add_argument("--impl", default="auto", choices=("auto", "flash",
                    "einsum"), help="ablate the attention kernel itself")
    ap.add_argument("--no-donate", action="store_true",
                    help="ablate cache donation")
    ap.add_argument("--dtypes", default="bfloat16,int8")
    args_ns = ap.parse_args()
    model = args_ns.model
    batch, n_ctx, steps = 1, 512, 64
    over = {}
    if args_ns.n_layer:
        over["n_layer"] = args_ns.n_layer
    cfg = ModelConfig(**{**LLAMA_CONFIGS[model], **over})
    log(f"building synthetic {model} params ...")
    params = synthetic_params(cfg, seed=0)
    jax.block_until_ready(params)

    results = {}
    for kv in args_ns.dtypes.split(","):
        cache = init_kv_cache(cfg, batch, n_ctx, dtype=jnp.dtype(kv))

        donate = () if args_ns.no_donate else (2,)

        @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=donate)
        def decode(params, tok0, cache, n_past0, n_steps):
            def body(state, i):
                tok, cache = state
                logits, cache, _ = llama_forward(
                    params, tok.reshape(batch, 1), cache, n_past0 + i, cfg,
                    attn_impl=args_ns.impl,
                )
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (tok, cache), toks = jax.lax.scan(
                body, (tok0, cache), jnp.arange(n_steps, dtype=jnp.int32)
            )
            return toks, cache

        tok0 = jnp.ones((batch,), jnp.int32)
        log(f"[{kv}] lowering + compiling ...")
        t0 = time.perf_counter()
        lowered = decode.lower(params, tok0, cache, jnp.int32(0), n_steps=steps)
        compiled = lowered.compile()
        log(f"[{kv}] compiled in {time.perf_counter() - t0:.1f}s")
        hlo = compiled.as_text()
        copies = big_insts(hlo)
        log(f"[{kv}] large-output instructions in optimized HLO "
            f"({len(copies)} >= 2 MB):")
        for op, shape, mb in sorted(copies, key=lambda t: -t[2])[:24]:
            log(f"    {op:22s} {shape:48s} {mb:8.1f} MB")
        by_op = {}
        for op, _, mb in copies:
            c, s = by_op.get(op, (0, 0.0))
            by_op[op] = (c + 1, s + mb)
        for op, (c, s) in sorted(by_op.items(), key=lambda t: -t[1][1]):
            log(f"    TOTAL {op:18s} x{c:<4d} {s:10.1f} MB")
        n_dus = hlo.count(" dynamic-update-slice(")
        log(f"[{kv}] bare dynamic-update-slice count: {n_dus}")
        try:
            mem = compiled.memory_analysis()
            log(
                f"[{kv}] temp {mem.temp_size_in_bytes/1e6:.0f} MB, "
                f"args {mem.argument_size_in_bytes/1e6:.0f} MB, "
                f"out {mem.output_size_in_bytes/1e6:.0f} MB, "
                f"alias {mem.alias_size_in_bytes/1e6:.0f} MB"
            )
        except Exception as e:  # axon may not expose it
            log(f"[{kv}] memory_analysis unavailable: {e}")

        # reproduce the regression in the same process
        toks, cache = decode(params, tok0, cache, jnp.int32(0), steps)
        np.asarray(toks)  # sync
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            # advance n_past each rep so reps sweep n_past steps..4*steps (the
            # bench.py regime) instead of rewriting 64..128 (ADVICE.md r2 #3)
            toks, cache = decode(
                params, toks[-1], cache, jnp.int32(steps * (r + 1)), steps
            )
            np.asarray(toks)
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        results[kv] = ms
        log(f"[{kv}] measured {ms:.2f} ms/step")

    parts = [f"{k} {v:.2f} ms/step" for k, v in results.items()]
    if len(results) == 2:
        vals = list(results.values())
        parts.append(f"(delta {vals[1] - vals[0]:+.2f})")
    log("SUMMARY:", ", ".join(parts))


if __name__ == "__main__":
    main()
