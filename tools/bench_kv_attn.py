"""A/B the fused decode attention step (flash_attention_update) over bf16 vs
int8 KV caches on the real chip — isolates the KV-dtype overhead seen in the
end-to-end decode bench. Differential timing (two inner-loop lengths) cancels
the axon dispatch cost; each iteration sweeps all L layers like a real
forward.

usage: PYTHONPATH=.:/root/.axon_site python tools/bench_kv_attn.py [--n-ctx 512]
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.models.llama import ModelConfig, init_kv_cache
from llamavk_tpu.ops.flash_attn import flash_attention_update


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n-past", type=int, default=384)
    ap.add_argument("--hg", type=int, default=0, help="heads/program override")
    args = ap.parse_args()

    cfg = ModelConfig(
        n_vocab=32000, n_embd=4096, n_layer=32, n_head=32, n_rot=128, n_ff=11008
    )
    b, L, H, D = args.batch, cfg.n_layer, cfg.n_head, cfg.head_dim
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, 1, H, D), jnp.bfloat16)
    kn = jax.random.normal(key, (b, 1, H, D), jnp.bfloat16)
    vn = jax.random.normal(key, (b, 1, H, D), jnp.bfloat16)
    hg = args.hg if args.hg > 0 else None

    def sweep(cache, npast, qq):
        """One forward-equivalent: all L layers through the fused kernel."""
        def body(carry, l):
            ck, cv, cks, cvs = carry
            if cks is None:
                o, ck, cv = flash_attention_update(
                    qq, kn, vn, ck, cv, npast, l, heads_per_program=hg
                )
                return (ck, cv, None, None), o[0, 0, 0, 0]
            o, ck, cv, cks, cvs = flash_attention_update(
                qq, kn, vn, ck, cv, npast, l, k_scale=cks, v_scale=cvs,
                heads_per_program=hg,
            )
            return (ck, cv, cks, cvs), o[0, 0, 0, 0]

        (ck, cv, cks, cvs), os = jax.lax.scan(
            body, (cache.k, cache.v, cache.k_scale, cache.v_scale),
            jnp.arange(L, dtype=jnp.int32),
        )
        return os.sum()

    @partial(jax.jit, static_argnames=("inner", "dt"))
    def loop(npast, inner, dt):
        cache = init_kv_cache(cfg, b, args.n_ctx, dtype=dt)

        def body(s, i):
            # carry-dependent query defeats loop-invariant hoisting
            return s + sweep(cache, npast, q + s.astype(jnp.bfloat16) * 1e-6), None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return s

    for dt in (jnp.bfloat16, jnp.int8):
        times = {}
        for inner in (8, 40):
            np.asarray(loop(jnp.int32(args.n_past), inner, dt))  # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(loop(jnp.int32(args.n_past), inner, dt))
                best = min(best, time.perf_counter() - t0)
            times[inner] = best
        per = (times[40] - times[8]) / 32
        log(
            f"{jnp.dtype(dt).name}: {per * 1e3:.3f} ms per {L}-layer attention"
            f" sweep ({per / L * 1e6:.1f} us/layer), n_ctx={args.n_ctx},"
            f" n_past={args.n_past}, batch={b}, hg={hg}"
        )


if __name__ == "__main__":
    main()
