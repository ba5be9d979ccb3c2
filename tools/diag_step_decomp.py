"""Decode-step decomposition: where does the gap between the matmul kernel
sum and the full step go — at B=1 AND at serving batch sizes (VERDICT r4 #1:
B=32-64 ran at 45% of SoL with no decomposition artifact).

Builds 7B-shaped synthetic params and times, with the same in-program scan +
differential timing as bench.py:

  mm          — 32 layers x (wqkv, wo, w13, w2) stacked q4 matmuls + logits,
                nothing else (scan over layers, residual adds only)
  mm+norm     — + the three rms_norm/dynamic-index sites per layer
  mm+norm+rope — + rope application on q/k (cos/sin from a fixed position)
  attn-only   — 32 x the fused flash_attention_update kernel alone (cache in
                the scan carry, donated; q/k/v synthesized from the carry)
  attn-read   — 32 x the read-only flash_attention kernel (same cache):
                attn-only minus attn-read = the RMW cache-write cost
  sample      — greedy argmax over [B, V] f32 logits alone
  full        — the real llama_forward decode step at n_past ~ --npast
  full+sample — + greedy argmax (what bench.py times per step)

Run:  PYTHONPATH=.:/root/.axon_site python tools/diag_step_decomp.py \
          [--batch 32] [--kv int8] [--ctx 512] [--npast 256] [--t 1]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.models import (
    LLAMA_CONFIGS, ModelConfig, init_kv_cache, llama_forward,
    synthetic_params,
)
from llamavk_tpu.ops.flash_attn import flash_attention, flash_attention_update
from llamavk_tpu.ops.norms import rms_norm
from llamavk_tpu.ops.q4_matmul import q4_matmul
from llamavk_tpu.ops.rope import apply_rope, rope_cos_sin
from llamavk_tpu.utils.jitopts import decode_jit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, inner=64, donate=()):
    """args[0] is the scan carry; args[1:] ride as jit ARGUMENTS (never
    closure captures — 7B params serialize through the axon AOT tunnel as
    multi-GB constants otherwise, CLAUDE.md rule)."""

    @partial(decode_jit, static_argnames=("n",))
    def loop(args, n):
        def body(c, _):
            out = fn(c, *args[1:])
            return out, None

        out, _ = jax.lax.scan(body, args[0], None, length=n)
        # fetch ONE f32 scalar (bf16 scalar fetches hit an axon
        # Unimplemented; big fetches pay the 1-8 MB/s tunnel)
        return jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32).sum()

    def t(n):
        np.asarray(loop(args, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(3 * inner) - t(inner)) / (2 * inner)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1,
                    help="tokens per step (1 = decode, 512 = prefill chunk)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--model", default="7B", choices=list(LLAMA_CONFIGS))
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--npast", type=int, default=256,
                    help="decode position for the attention/full legs")
    ap.add_argument("--kv", default="int8", choices=["int8", "bfloat16"])
    ap.add_argument("--hg", type=int, default=0,
                    help="override heads_per_program on the attn legs")
    ap.add_argument("--no-int4", action="store_true")
    ap.add_argument("--only", default="all", choices=["all", "mm", "attn", "full"],
                    help="run a subset of the legs")
    ap.add_argument("--attn-sweep", action="store_true",
                    help="sweep attn-read over hg x npast (per-program "
                    "overhead hypothesis: time ~ #programs x #blocks)")
    args = ap.parse_args()
    T, B = args.t, args.batch
    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    log(f"building params (B={B}, T={T}, kv={args.kv}, ctx={args.ctx}) ...")
    params = synthetic_params(cfg, seed=0, int4=not args.no_int4)
    jax.block_until_ready(params)
    L, e, d = cfg.n_layer, cfg.n_embd, cfg.head_dim
    h = cfg.n_head
    layer_ids = jnp.arange(L, dtype=jnp.int32)
    cos, sin = rope_cos_sin(
        jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (1, T)), cfg.n_rot,
        cfg.rope_theta,
    )

    def mm_step(x, params, with_norm, with_rope):
        lp = params.layers
        def layer(x, l):
            if with_norm:
                an = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, False)
                xa = rms_norm(x, an, cfg.norm_eps)
            else:
                xa = x
            qkv = q4_matmul(xa, lp.wqkv, layer_idx=l)
            if with_rope:
                q = qkv[..., :e].reshape(B, T, h, d)
                k = qkv[..., e : 2 * e].reshape(B, T, h, d)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                attn_in = q.reshape(B, T, e) + k.reshape(B, T, e)
            else:
                attn_in = qkv[..., :e]
            x = x + q4_matmul(attn_in, lp.wo, layer_idx=l)
            if with_norm:
                fn = jax.lax.dynamic_index_in_dim(lp.ffn_norm, l, 0, False)
                xf = rms_norm(x, fn, cfg.norm_eps)
            else:
                xf = x
            gu = q4_matmul(xf, lp.w13, layer_idx=l)
            f2 = gu.shape[-1] // 2
            act = (jax.nn.silu(gu[..., :f2].astype(jnp.float32))
                   * gu[..., f2:].astype(jnp.float32)).astype(jnp.bfloat16)
            x = x + q4_matmul(act, lp.w2, layer_idx=l)
            return x, None

        x, _ = jax.lax.scan(layer, x, layer_ids)
        xn = rms_norm(x, params.norm, cfg.norm_eps) if with_norm else x
        out_w = jax.tree.map(lambda a: a[None], params.output)
        logits = q4_matmul(xn, out_w, out_dtype=jnp.float32,
                           layer_idx=jnp.int32(0))
        # feed a bf16 carry back (keeps the scan well-formed)
        return (x + logits[..., :e].astype(jnp.bfloat16) * 0).astype(
            jnp.bfloat16
        )

    x0 = jnp.ones((B, T, e), jnp.bfloat16)
    inner = 64 if T == 1 else 8
    if args.only in ("all", "mm"):
        for name, fn in [
            ("mm+silu", lambda x, p: mm_step(x, p, False, False)),
            ("mm+silu+norm", lambda x, p: mm_step(x, p, True, False)),
            ("mm+silu+norm+rope", lambda x, p: mm_step(x, p, True, True)),
        ]:
            dt = time_fn(fn, x0, params, inner=inner)
            log(f"{name:20s} {dt*1e3:6.2f} ms/step (B={B}, T={T})")

    kv_dtype = jnp.dtype(args.kv)
    quant = kv_dtype == jnp.int8
    hg = args.hg or None
    npast = jnp.full((B,), args.npast, jnp.int32)

    if T == 1:
        # --- attention kernel alone (cache in the donated carry, CLAUDE.md
        # aliased-operand rule: a loop-invariant cache operand would make XLA
        # copy the whole cache per call and time the copy)
        def attn_step(state, params):
            x, ck, cv, cks, cvs = state  # x: [B, 1, e]
            qkv = x.reshape(B, 1, h, d)
            out_sum = jnp.zeros((B, 1, h, d), jnp.float32)

            def layer(carry, l):
                ck, cv, cks, cvs, acc = carry
                if quant:
                    o, ck, cv, cks, cvs = flash_attention_update(
                        qkv, qkv, qkv, ck, cv, npast, l,
                        k_scale=cks, v_scale=cvs, heads_per_program=hg,
                    )
                else:
                    o, ck, cv = flash_attention_update(
                        qkv, qkv, qkv, ck, cv, npast, l,
                        heads_per_program=hg,
                    )
                return (ck, cv, cks, cvs, acc + o), None

            (ck, cv, cks, cvs, acc), _ = jax.lax.scan(
                layer, (ck, cv, cks, cvs, out_sum), layer_ids
            )
            # REAL data dependency on the attention outputs (an exact *0
            # lets XLA DCE the whole leg — measured -0.01 ms, r5)
            x2 = x + (acc.reshape(B, 1, e) * 1e-30).astype(jnp.bfloat16)
            return (x2.astype(jnp.bfloat16), ck, cv, cks, cvs)

        def make_attn_read(hg_, npast_):
            npv = jnp.full((B,), npast_, jnp.int32)

            def attn_read_step(state, params):
                x, ck, cv, cks, cvs = state
                qkv = x.reshape(B, 1, h, d)
                out_sum = jnp.zeros((B, 1, h, d), jnp.float32)

                def layer(acc, l):
                    o = flash_attention(
                        qkv, ck, cv, npv, layer_idx=l,
                        k_scale=cks, v_scale=cvs, heads_per_program=hg_,
                    )
                    return acc + o, None

                acc, _ = jax.lax.scan(layer, out_sum, layer_ids)
                x2 = x + (acc.reshape(B, 1, e) * 1e-30).astype(jnp.bfloat16)
                return (x2.astype(jnp.bfloat16), ck, cv, cks, cvs)

            return attn_read_step

        def run_leg(fn, label, extra=""):
            # ONE cache live at a time (B=32 int8 caches are ~4.8 GB; legs
            # that leak their predecessors OOM the chip)
            cache = init_kv_cache(cfg, B, args.ctx, dtype=kv_dtype)
            st0 = (jnp.ones((B, 1, e), jnp.bfloat16), cache.k, cache.v,
                   cache.k_scale, cache.v_scale)
            del cache
            dt = time_fn(fn, st0, params, inner=inner)
            del st0
            log(f"{label:20s} {dt*1e3:6.2f} ms/step {extra}")

        if args.attn_sweep:
            # per-program-overhead hypothesis: cost should track
            # (#programs = B * h/hg) x (#blocks = ceil((npast+1)/256))
            for hg_ in (32, 16, 8):
                for npast_ in (64, 192, 448):
                    run_leg(make_attn_read(hg_, npast_),
                            f"attn-read hg={hg_:2d}", f"npast={npast_}")
            return

        if args.only in ("all", "attn"):
            run_leg(attn_step, "attn-only(fused)",
                    f"(32L, npast={args.npast}, hg={hg})")
            run_leg(make_attn_read(hg, args.npast), "attn-read(no-write)")
        if args.only not in ("all", "full"):
            return

        # --- sampler alone
        def sample_step(state, params):
            lg, i = state
            nxt = jnp.argmax(lg[:, -1] + i.astype(jnp.float32), axis=-1)
            return (lg + nxt[:, None, None].astype(jnp.float32) * 0, i + 1)

        lg0 = jnp.zeros((B, 1, cfg.n_vocab), jnp.float32)
        dt = time_fn(sample_step, (lg0, jnp.int32(0)), params, inner=inner)
        log(f"{'sample(argmax)':20s} {dt*1e3:6.2f} ms/step")

        # --- full forward, with and without sampling
        def full_nosample(state, params):
            tok, cache, i = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(B, 1), cache, npast + i, cfg
            )
            # real data dependency (a *0 term gets the whole forward DCE'd)
            nxt = tok + (logits[:, -1, 0] * 1e-30).astype(jnp.int32)
            return (nxt, cache, i + 1)

        def full(state, params):
            tok, cache, i = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(B, 1), cache, npast + i, cfg
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache, i + 1)

        cache = init_kv_cache(cfg, B, args.ctx, dtype=kv_dtype)
        st = (jnp.ones((B,), jnp.int32), cache, jnp.int32(0))
        del cache
        dt = time_fn(full_nosample, st, params, inner=inner)
        del st
        log(f"{'full(no-sample)':20s} {dt*1e3:6.2f} ms/step "
            f"(npast {args.npast}+0..{2*inner})")
        cache = init_kv_cache(cfg, B, args.ctx, dtype=kv_dtype)
        st = (jnp.ones((B,), jnp.int32), cache, jnp.int32(0))
        del cache
        dt = time_fn(full, st, params, inner=inner)
        del st
        log(f"{'full+sample':20s} {dt*1e3:6.2f} ms/step")
    else:
        cache = init_kv_cache(cfg, B, args.ctx, dtype=kv_dtype)

        def fullpf(cache, params):
            logits, cache, _ = llama_forward(
                params, jnp.ones((B, T), jnp.int32), cache, jnp.int32(0),
                cfg, logits_all=True,
            )
            return cache

        dt = time_fn(fullpf, cache, params, inner=8)
        log(f"{'full prefill':20s} {dt*1e3:6.2f} ms/chunk (T={T}, "
            "logits_all)")


if __name__ == "__main__":
    main()
