"""Round-4 decode-step decomposition: where does the gap between the matmul
kernel sum (~5.6-5.8 ms at B=1 with int4 planes) and the full step
(6.69-6.84 ms) go?

Builds 7B-shaped synthetic params and times, with the same in-program scan +
differential timing as bench.py:

  mm        — 32 layers x (wqkv, wo, w13, w2) stacked q4 matmuls + logits,
              nothing else (scan over layers, residual adds only)
  mm+norm   — + the three rms_norm/dynamic-index sites per layer
  mm+norm+rope — + rope application on q/k (cos/sin from a fixed position)
  full      — the real llama_forward decode step (attention, KV update,
              everything) at n_past ~ 256, int8 KV
  full+sample — + greedy argmax (what bench.py times per step)

Run:  PYTHONPATH=.:/root/.axon_site python tools/diag_step_decomp.py
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
from llamavk_tpu.ops.norms import rms_norm
from llamavk_tpu.ops.q4_matmul import q4_matmul
from llamavk_tpu.ops.rope import apply_rope, rope_cos_sin
from llamavk_tpu.utils.jitopts import decode_jit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, inner=64):
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
    args = ap.parse_args()
    T = args.t
    cfg = ModelConfig(**LLAMA_CONFIGS["7B"])
    log("building params ...")
    params = synthetic_params(cfg, seed=0, int4=True)
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
                q = qkv[..., :e].reshape(1, T, h, d)
                k = qkv[..., e : 2 * e].reshape(1, T, h, d)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                attn_in = q.reshape(1, T, e) + k.reshape(1, T, e)
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

    x0 = jnp.ones((1, T, e), jnp.bfloat16)
    inner = 64 if T == 1 else 8
    for name, fn in [
        ("mm+silu", lambda x, p: mm_step(x, p, False, False)),
        ("mm+silu+norm", lambda x, p: mm_step(x, p, True, False)),
        ("mm+silu+norm+rope", lambda x, p: mm_step(x, p, True, True)),
    ]:
        dt = time_fn(fn, x0, params, inner=inner)
        log(f"{name:20s} {dt*1e3:6.2f} ms/step (T={T})")

    # full forward (int8 KV), with and without sampling
    cache = init_kv_cache(cfg, 1, 512, dtype=jnp.int8)

    if T == 1:
        def full(state, params):
            tok, cache, i = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(1, 1), cache, jnp.int32(200) + i, cfg
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache, i + 1)

        dt = time_fn(full, (jnp.ones((1,), jnp.int32), cache, jnp.int32(0)),
                     params, inner=64)
        log(f"{'full+sample':20s} {dt*1e3:6.2f} ms/step (n_past ~200-392)")
    else:
        def fullpf(cache, params):
            logits, cache, _ = llama_forward(
                params, jnp.ones((1, T), jnp.int32), cache, jnp.int32(0),
                cfg, logits_all=True,
            )
            return cache

        dt = time_fn(fullpf, cache, params, inner=8)
        log(f"{'full prefill':20s} {dt*1e3:6.2f} ms/chunk (T={T}, "
            "logits_all)")


if __name__ == "__main__":
    main()
