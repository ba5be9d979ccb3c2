"""Prefill decomposition probe: where do the ~84 ms per 512-token 7B chunks
go, and how far is prefill from its MXU roofline?

Prefill compute per 7B chunk of T tokens: 2 * 6.74e9 * T FLOPs ~= 6.9 TFLOP
at T=512 -> ~35 ms at the v5e's ~197 bf16 TFLOP/s peak, yet bench.py
measures ~84 ms/chunk. Candidate sinks: the q4 unpack's VPU work
serializing with the MXU inside each matmul kernel (then bf16 mul_dtype /
i4 unpack variants — which LOSE at decode — should WIN here), the flash
prefill attention, and per-chunk glue. This tool times, on-chip with
amortized in-program loops:

  1. each 7B layer matmul at M=512 under {f32, bf16, i4} x {bn512, bn2048}
     reporting achieved TFLOP/s (MXU %) alongside GB/s,
  2. the fused flash write+attend at T=512,
  3. the full llama_forward chunk, and the sum-of-parts residual.

usage: PYTHONPATH=.:/root/.axon_site python tools/bench_prefill.py [--t 512]
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.models import (
    LLAMA_CONFIGS, ModelConfig, init_kv_cache, llama_forward, synthetic_params,
)
from llamavk_tpu.ops.flash_attn import flash_attention_update
from llamavk_tpu.ops.q4_matmul import q4_matmul
from llamavk_tpu.ops.qweight import QWeight

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_qw(key, k, n):
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (k // 2, n), -128, 128, dtype=jnp.int8)
    scales = jax.random.uniform(
        k2, (k // 32, n), jnp.float32, 0.005, 0.02
    ).astype(jnp.bfloat16)
    return QWeight(packed=packed, scales=scales, bias=None, layout="ilv",
                   chunks=1)


def time_fn(fn, *args, lo=10, hi=50):
    """Differential on-device loop timing (tunnel dispatch cancels)."""

    @partial(jax.jit, static_argnames=("inner",))
    def loop(x0, *a, inner):
        def body(c, _):
            x = x0.at[(0,) * x0.ndim].add(c * 1e-6)
            y = fn(x, *a)
            return y.astype(jnp.float32).ravel()[0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return s

    def run(inner):
        np.asarray(loop(*args, inner=inner))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args, inner=inner))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7B", choices=list(LLAMA_CONFIGS))
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--only-forward", action="store_true",
                    help="skip parts 1-2: just the full-chunk number (for "
                    "env-knob A/Bs, e.g. LLAMAVK_HG_PF)")
    args = ap.parse_args()
    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    T = args.t
    key = jax.random.key(0)
    e, f, L = cfg.n_embd, cfg.n_ff, cfg.n_layer
    # --- 1. matmul variants at M=T -----------------------------------------
    shapes = [
        ("wqkv", e, 3 * e),
        ("wo", e, e),
        ("w13", e, 2 * f),
        ("w2", f, e),
    ]
    variants = [
        ("f32/bn512", dict(mul_dtype=jnp.float32, block_n=512)),
        ("bf16/bn512", dict(mul_dtype=jnp.bfloat16, block_n=512)),
        ("f32/bn2048", dict(mul_dtype=jnp.float32, block_n=2048)),
        ("bf16/bn2048", dict(mul_dtype=jnp.bfloat16, block_n=2048)),
        ("i4/bn512", dict(mul_dtype=jnp.float32, block_n=512, dot_mode="i4")),
        ("bf16/bb128", dict(mul_dtype=jnp.bfloat16, block_n=512, block_b=128)),
    ]
    if args.only_forward:
        shapes, variants = [], []
    totals = {name: 0.0 for name, _ in variants}
    for sname, k, n in shapes:
        qw = make_qw(jax.random.fold_in(key, k * n), k, n)
        x = jax.random.normal(key, (T, k), jnp.bfloat16)
        nbytes = k * n // 2 + (k // 32) * n * 2 + 2 * T * k + 4 * T * n
        flops = 2 * T * k * n
        row = [f"{sname:5s} [{k:5d}x{n:5d}]"]
        for vname, kw in variants:
            try:
                dt = time_fn(lambda x_, q_: q4_matmul(x_, q_, **kw), x, qw)
            except Exception as e:  # e.g. Mosaic i4 mask bug at K=11008
                row.append(f"{vname}: FAIL({type(e).__name__})")
                totals[vname] = float("inf")
                continue
            row.append(
                f"{vname}: {dt*1e3:6.2f}ms {flops/dt/1e12:5.1f}TF/s"
                f"({flops/dt/1e12/PEAK_TFLOPS*100:3.0f}%)"
            )
            totals[vname] += dt
        # int4-plane storage (the r4 production path): converted qw
        from llamavk_tpu.ops.qweight import qweight_to_i4

        qw4 = qweight_to_i4(qw, pad_n=1024)
        for vname, kw in [("i4st/bn512", dict(block_n=512)),
                          ("i4st/bn1024", dict(block_n=1024))]:
            try:
                dt = time_fn(lambda x_, q_: q4_matmul(x_, q_, **kw), x, qw4)
            except Exception as e:
                row.append(f"{vname}: FAIL({type(e).__name__})")
                totals.setdefault(vname, 0.0)
                totals[vname] = float("inf")
                continue
            row.append(
                f"{vname}: {dt*1e3:6.2f}ms {flops/dt/1e12:5.1f}TF/s"
                f"({flops/dt/1e12/PEAK_TFLOPS*100:3.0f}%)"
            )
            totals[vname] = totals.get(vname, 0.0) + dt
        log("  ".join(row))
    log("")
    best_name, best_t = None, float("inf")
    for vname, t in totals.items():
        log(f"layer 4-matmul sum x{L} [{vname}]: {t*L*1e3:6.2f} ms "
            f"({2*T*6.48e9/(t*L)/1e12:5.1f} TF/s eff)")
        if t < best_t:
            best_name, best_t = vname, t

    # --- 2. flash prefill write+attend at T --------------------------------
    # MEASUREMENT ARTIFACT WARNING (discovered r4, tools/
    # bench_prefill_ownrows.py): this section passes the FULL 32-layer
    # cache as a loop-invariant, NON-donated argument while the kernel
    # aliases it input->output — XLA inserts a copy of the whole ~256 MB
    # cache per call, so the numbers below are cache-copy-dominated
    # (~0.9 ms/layer). The REAL in-program cost (cache in the scan carry,
    # donated) is ~0.08-0.1 ms/layer (~3 ms/chunk): prefill attention is
    # NOT the chunk bottleneck; the matmul chain is (~46 ms at T=512,
    # tools/diag_step_decomp.py --t 512). The r3 "hg=4 DMA-latency fix"
    # conclusion drawn from this section measured the artifact, not the
    # kernel.
    # The default prefill tiling is hg=1 (one head per program) x bt=256:
    # 64 sequential programs per layer, each paying its DMA round-trip
    # latencies — measured ~0.98 ms/layer (~15 us/program) against a ~0.05 ms
    # FLOP/bandwidth roofline. Sweep heads-per-program / block sizes.
    h, d = cfg.n_head, cfg.head_dim
    cache = init_kv_cache(cfg, 1, max(512, T))
    q = jax.random.normal(key, (1, T, h, d), jnp.bfloat16)

    dt_attn = None
    attn_sweep = [] if args.only_forward else [
        (None, 256, 256), (4, 256, 256), (8, 256, 256),
        (2, 512, 256), (4, 512, 256), (8, 512, 512),
        (4, 256, 512), (16, 256, 256),
        # r4: more heads per program with SMALLER kv blocks (hg>=8 at
        # bk=256 exhausts VMEM; fewer programs = fewer DMA-latency stalls)
        (8, 256, 128), (16, 256, 128), (8, 512, 128), (16, 512, 128),
        (32, 256, 64), (16, 256, 64), (8, 256, 64),
    ]
    for hg, bt, bk in attn_sweep:
        def attn(q_, kn, vn, ck, cv, hg=hg, bt=bt, bk=bk):
            out, _, _ = flash_attention_update(
                q_, kn, vn, ck, cv, jnp.int32(0), jnp.int32(0),
                block_t=bt, block_k=bk, heads_per_program=hg,
            )
            return out

        try:
            dt = time_fn(attn, q, q, q, cache.k, cache.v)
        except Exception as e:
            log(f"flash T={T} hg={hg} bt={bt} bk={bk}: FAIL({type(e).__name__})")
            continue
        if dt_attn is None:
            dt_attn = dt  # default config = the production number
        dt_attn = min(dt_attn, dt)
        log(f"flash write+attend T={T} hg={hg or 1} bt={bt} bk={bk}: "
            f"{dt*1e3:.3f} ms/layer -> x{L} = {dt*L*1e3:.2f} ms")

    # --- 3. full forward chunk ----------------------------------------------
    params = synthetic_params(cfg, seed=0)
    jax.block_until_ready(params)
    cache2 = init_kv_cache(cfg, 1, max(512, T))
    toks = jnp.ones((1, T), jnp.int32)

    @partial(jax.jit, static_argnames=("inner", "logits_all"))
    def chunk_loop(params_, toks_, cache_, inner, logits_all=False):
        # params as an ARGUMENT, never a closure capture: captured weight
        # constants serialize through the axon AOT tunnel (CLAUDE.md)
        def body(c, _):
            lg, c2, _ = llama_forward(params_, toks_, c, jnp.int32(0), cfg,
                                      logits_all=logits_all)
            return c2, lg[0, -1, 0]
        c2, lgs = jax.lax.scan(body, cache_, None, length=inner)
        return lgs.sum()

    def run_chunks(inner, logits_all=False):
        np.asarray(chunk_loop(params, toks, cache2, inner, logits_all))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chunk_loop(params, toks, cache2, inner, logits_all))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_fwd = (run_chunks(12) - run_chunks(4)) / 8
    log(f"full forward chunk T={T}: {dt_fwd*1e3:.2f} ms "
        f"({T/dt_fwd:.0f} tok/s)")
    # the perplexity/bench.py workload keeps every position's logits: the
    # [T, K] x [K, 32000] output matmul runs at full T instead of T=1
    dt_la = (run_chunks(12, True) - run_chunks(4, True)) / 8
    log(f"full forward chunk T={T} logits_all: {dt_la*1e3:.2f} ms "
        f"(logits_all term {1e3*(dt_la - dt_fwd):+.2f} ms)")
    if best_name is not None and dt_attn is not None:
        matmul_ms = best_t * L * 1e3
        attn_ms = dt_attn * L * 1e3
        log(f"sum of parts: matmuls[{best_name}] {matmul_ms:.2f} + attn "
            f"{attn_ms:.2f} + residual "
            f"{dt_fwd*1e3 - matmul_ms - attn_ms:.2f} ms "
            f"(norms/rope/embed/logits/glue; in-program overlap can make "
            f"this negative)")
    log(f"MXU roofline: {2*T*6.74e9/1e12:.2f} TFLOP/chunk -> "
        f"{2*T*6.74e9/PEAK_TFLOPS/1e9:.1f} ms at peak; achieved "
        f"{2*T*6.74e9/dt_fwd/1e12:.1f} TF/s = "
        f"{2*T*6.74e9/dt_fwd/1e12/PEAK_TFLOPS*100:.0f}%")


if __name__ == "__main__":
    main()
