"""Serving decode-step decomposition (r5): pure-decode bench measures
18.1 ms/step at B=64 int8 (argmax, flat cache, bk=256) but the serving
engine's paged blocks run 27 ms/step. Attribute the gap:

  sampler      — sample_tokens_batched alone on [B, V] logits (top-k 64,
                 top-p, repeat penalty — what every serving step pays)
  argmax       — plain argmax on the same logits (what bench.py pays)
  flat+argmax  — full forward, flat int8 cache, greedy
  flat+sampler — full forward, flat int8 cache, production sampler
  paged+argmax — full forward through a page pool (page_size -> bk)
  paged+sampler— the serving configuration

Run: PYTHONPATH=.:/root/.axon_site python tools/diag_serving_step.py \
        [--batch 64] [--ctx 512] [--page-size 64]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.models import (
    LLAMA_CONFIGS, ModelConfig, init_kv_cache, init_paged_kv_cache,
    llama_forward, synthetic_params,
)
from llamavk_tpu.runtime.sampling import sample_tokens_batched
from llamavk_tpu.utils.jitopts import decode_jit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, carry0, *rest, inner=64):
    # the carry (holding the multi-GB KV cache) is DONATED so the loop's
    # input and output cache buffers alias — a non-donated carry doubles
    # the cache footprint and OOMs B=64 flat int8 (2 x 9.7 GB)
    @partial(decode_jit, static_argnames=("n",), donate_argnums=(0,))
    def loop(carry, rest, n):
        def body(c, _):
            return fn(c, *rest), None

        out, _ = jax.lax.scan(body, carry, None, length=n)
        return out, jax.tree.leaves(out)[0].ravel()[:1].astype(jnp.float32).sum()

    def t(n):
        nonlocal carry0
        carry0, s = loop(carry0, rest, n)
        np.asarray(s)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            carry0, s = loop(carry0, rest, n)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(3 * inner) - t(inner)) / (2 * inner)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--model", default="7B", choices=list(LLAMA_CONFIGS))
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--npast", type=int, default=192)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--top-k", type=int, default=64)
    ap.add_argument("--prefix", type=int, default=0,
                    help="add shared-prefix legs: every row attends a "
                    "bf16 pool entry of this length (multiple of 256) "
                    "through the pre-pass, plus --npast local int8 slot "
                    "rows. Attribution for the prefix-vs-flat serving "
                    "gap (VERDICT r4 weak #8): compare 'prefix+argmax' "
                    "against 'flat+argmax' (same LOCAL rows; the delta "
                    "is the whole pre-pass) and against "
                    "'flat+argmax@+prefix' (same LOGICAL context "
                    "materialized per-row in int8 slots; the delta is "
                    "pool-sharing's runtime premium: bf16 pool reads + "
                    "grid-kernel fallback — prefix mode keeps one "
                    "program per (row, head-group), llama.py:566-574)")
    ap.add_argument("--skip-paged", action="store_true",
                    help="skip the paged legs. r5b: standalone paged legs "
                    "die with a TPU INTERNAL error (ps 64 AND 128) that "
                    "WEDGES the client — every later dispatch in the "
                    "process fails too — while the serving engine runs "
                    "the same kernel config for seconds; un-root-caused "
                    "(ROADMAP #8)")
    args = ap.parse_args()
    B = args.batch
    cfg = ModelConfig(**LLAMA_CONFIGS[args.model])
    V = cfg.n_vocab
    e = cfg.n_embd
    log(f"building params (B={B}) ...")
    params = synthetic_params(cfg, seed=0, int4=True)
    jax.block_until_ready(params)
    npast = jnp.full((B,), args.npast, jnp.int32)
    w = 64
    lastw = jnp.full((B, w), 3, jnp.int32)
    top_p = jnp.full((B,), 0.95, jnp.float32)
    temp = jnp.full((B,), 0.8, jnp.float32)
    pen = jnp.full((B,), 1.1, jnp.float32)
    def fresh_kd():  # per-leg (time_fn donates the whole carry)
        return jax.random.key_data(jax.vmap(jax.random.key)(jnp.arange(B)))

    # --- samplers alone
    def samp(state, params):
        lg, kd, i = state
        keys = jax.random.wrap_key_data(kd)
        subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        keys2 = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        nxt = sample_tokens_batched(
            lg + i.astype(jnp.float32), lastw, subs, args.top_k,
            top_p, temp, pen,
        )
        return (lg + nxt[:, None].astype(jnp.float32) * 1e-30,
                jax.random.key_data(keys2), i + 1)

    def amax(state, params):
        lg, kd, i = state
        nxt = jnp.argmax(lg + i.astype(jnp.float32), axis=-1)
        return (lg + nxt[:, None].astype(jnp.float32) * 1e-30, kd, i + 1)

    # fresh carry per leg — time_fn DONATES it
    dt = time_fn(amax, (jnp.zeros((B, V), jnp.float32), fresh_kd(), jnp.int32(0)),
                 params, inner=64)
    log(f"{'argmax':16s} {dt*1e3:6.2f} ms/step")
    dt = time_fn(samp, (jnp.zeros((B, V), jnp.float32), fresh_kd(), jnp.int32(0)),
                 params, inner=64)
    log(f"{'sampler':16s} {dt*1e3:6.2f} ms/step (top_k={args.top_k})")

    # --- full steps
    def full(state, params, table, sample):
        tok, cache, kd, i = state
        kw = {} if table is None else dict(page_table=table)
        logits, cache, _ = llama_forward(
            params, tok.reshape(B, 1), cache, npast + i, cfg, **kw
        )
        if sample:
            keys = jax.random.wrap_key_data(kd)
            subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
            keys2 = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
            nxt = sample_tokens_batched(
                logits[:, -1], lastw, subs, args.top_k, top_p, temp, pen
            )
            kd = jax.random.key_data(keys2)
        else:
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt, cache, kd, i + 1)

    for paged in (False,) if args.skip_paged else (False, True):
        for sample in (False, True):
            if paged:
                ps = args.page_size
                bpslot = args.ctx // ps
                cache = init_paged_kv_cache(
                    cfg, B * bpslot + 1, ps, dtype=jnp.int8
                )
                table = jnp.arange(1, B * bpslot + 1, dtype=jnp.int32)
                table = table.reshape(B, bpslot)
            else:
                cache = init_kv_cache(cfg, B, args.ctx, dtype=jnp.int8)
                table = None
            st = (jnp.ones((B,), jnp.int32), cache, fresh_kd(), jnp.int32(0))
            del cache
            fn = partial(full, table=table, sample=sample)
            name = f"{'paged' if paged else 'flat'}+{'sampler' if sample else 'argmax'}"
            try:
                dt = time_fn(lambda s, p: fn(s, p), st, params, inner=64)
            except Exception as e:
                # r5b: the paged legs die with a TPU INTERNAL error in THIS
                # standalone harness (both ps 64 and 128) while the serving
                # engine runs the same kernel config for seconds at a time —
                # un-root-caused; keep the remaining legs alive (ROADMAP #8)
                log(f"{name:16s} FAIL({type(e).__name__}: {str(e)[:80]})")
                del st
                continue
            del st
            log(f"{name:16s} {dt*1e3:6.2f} ms/step"
                + (f" (ps={args.page_size})" if paged else ""))

    if args.prefix:
        Sp = args.prefix
        assert Sp % 256 == 0, "prefix pool length must be a 256 multiple"
        pool_shape = (cfg.n_layer, 1, cfg.n_head, Sp, cfg.head_dim)
        pk = jnp.zeros(pool_shape, jnp.bfloat16)
        pv = jnp.zeros(pool_shape, jnp.bfloat16)
        pid = jnp.zeros((B,), jnp.int32)
        plen = jnp.full((B,), Sp, jnp.int32)

        def full_pfx(state, params, prefix):
            tok, cache, i = state
            kw = (
                dict(prefix_kv=(pk, pv), prefix_id=pid, prefix_len=plen)
                if prefix else {}
            )
            logits, cache, _ = llama_forward(
                params, tok.reshape(B, 1), cache, npast + Sp + i, cfg, **kw
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache, i + 1)

        # leg A: the shared-prefix serving config (pool pre-pass + local
        # int8 slot rows at logical n_past = Sp + npast)
        cache = init_kv_cache(cfg, B, args.ctx, dtype=jnp.int8)
        st = (jnp.ones((B,), jnp.int32), cache, jnp.int32(0))
        del cache
        dt = time_fn(lambda s, p: full_pfx(s, p, True), st, params, inner=64)
        del st
        log(f"{'prefix+argmax':16s} {dt*1e3:6.2f} ms/step (Sp={Sp}, "
            f"local npast={args.npast})")
        # leg B: the flat-engine alternative — the SAME logical context
        # with the prefix rows materialized per-row in int8 slots
        ctx2 = args.ctx
        while ctx2 < Sp + args.npast + 192:
            ctx2 *= 2
        cache = init_kv_cache(cfg, B, ctx2, dtype=jnp.int8)
        st = (jnp.ones((B,), jnp.int32), cache, jnp.int32(0))
        del cache
        dt = time_fn(lambda s, p: full_pfx(s, p, False), st, params, inner=64)
        del st
        log(f"{'flat+argmax@+pfx':16s} {dt*1e3:6.2f} ms/step "
            f"(npast={Sp + args.npast}, per-row int8 rows, flat kernel)")


if __name__ == "__main__":
    main()
