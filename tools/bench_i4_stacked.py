"""Round-4 probe: int4-STORED weight planes in the PRODUCTION stacked-kernel
structure (PrefetchScalarGridSpec over [L, ...] weights, grid over N tiles,
B=1 decode shapes).

History: the round-2 probe measured an int4-typed [K, N] weight plane at
676 GB/s vs ~601 for the production shift-unpack (tools/bench_unpack2.py,
flat single-layer structure), but the in-kernel pltpu.bitcast form collapsed
to ~240 GB/s once integrated (ROADMAP r3 "measured dead ends"). This probe
answers the question that decides round-4's decode work: does int4 *storage*
(no bitcast — the HBM array itself is jnp.int4, Mosaic's native 32-sublane
tile) survive the production structure?

Variants per shape (all B=1, L=4 stacked, layer cycled per step):
  prod      — production `_kernel_q4` shift-unpack body, int8 packed
              [L, K/2, N] (exactly ops/q4_matmul._chunk_matmul_stacked)
  i4st      — int4 plane [L, K, N] in ilv row order; per-m-step G-row
              slices c-grouped to the 32-row int4 sublane tile; f32 scale
              mul (numerics identical to prod at mul_dtype=f32)
  i4st_bf16 — same with bf16 scale mul (cheapest; |q|<=8 exact in bf16)

Run:  PYTHONPATH=.:/root/.axon_site python tools/bench_i4_stacked.py
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --- production kernel body (ops/q4_matmul._kernel_q4, ilv, stacked) -------
def kernel_prod(idx_ref, x_ref, p_ref, s_ref, o_ref):
    del idx_ref
    x = x_ref[:]
    half = p_ref.shape[1]
    g = s_ref.shape[1]
    s = s_ref[0].astype(jnp.float32)
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for m in range(half // g):
        p = p_ref[0, m * g : (m + 1) * g, :].astype(jnp.int32)
        w_lo = (((p << 28) >> 28).astype(jnp.float32) * s).astype(jnp.bfloat16)
        w_hi = ((p >> 4).astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w_lo,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, half + m * g : half + (m + 1) * g], w_hi,
                       preferred_element_type=jnp.float32)
    o_ref[0] = acc


# --- int4-stored stacked kernel --------------------------------------------
def slice_group(g: int, m_steps: int) -> int:
    """Smallest power-of-two multiple c of G-row slices such that g*c is
    32-row aligned (Mosaic's int4 sublane tile)."""
    c = 1
    while (g * c) % 32:
        c *= 2
    return min(c, m_steps)


def kernel_i4st(idx_ref, x_ref, w4_ref, s_ref, o_ref, *, mul_dtype):
    del idx_ref
    x = x_ref[:]
    k = w4_ref.shape[1]
    g = s_ref.shape[1]
    s = s_ref[0].astype(mul_dtype)
    m_steps = k // g
    c = slice_group(g, m_steps)
    sc = jnp.concatenate([s] * c, axis=0) if c > 1 else s
    acc = jnp.zeros(o_ref.shape[1:], jnp.float32)
    for m in range(m_steps // c):
        w4 = w4_ref[0, m * g * c : (m + 1) * g * c, :]
        w = (w4.astype(mul_dtype) * sc).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g * c : (m + 1) * g * c], w,
                       preferred_element_type=jnp.float32)
    o_ref[0] = acc


def pick_bn(n: int, want: int = 512) -> int:
    bn = want
    while bn > 128 and n % bn:
        bn -= 128
    return bn


def make_prod(L, k, n, b, bn):
    half, g = k // 2, k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    packed = jnp.ones((L, half, n), jnp.int8)
    scales = jnp.full((L, g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        kernel_prod,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n // bn),
            in_specs=[
                pl.BlockSpec((b, k), lambda i, j, idx: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, half, bn), lambda i, j, idx: (idx[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, bn), lambda i, j, idx: (idx[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b, bn), lambda i, j, idx: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, b, n), jnp.float32),
    )
    return call, (x, packed, scales), half * n + 4 * g * n


def make_i4st(L, k, n, b, bn, mul_dtype):
    g = k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    # KNOWN PLUGIN BUG (jax 0.9.0 + axon, measured 2026-08-20): an int4
    # jax.Array cannot be PASSED into a jit — _array_shard_arg recurses
    # infinitely at dispatch. Workaround: ship nibble VALUES as int8 and
    # convert to int4 inside the jit (loop-invariant, hoisted out of the
    # timing scan; differential timing cancels the one-time conversion).
    w8 = jnp.ones((L, k, n), jnp.int8)
    scales = jnp.full((L, g, n), 0.01, jnp.float32)
    inner = pl.pallas_call(
        partial(kernel_i4st, mul_dtype=mul_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n // bn),
            in_specs=[
                pl.BlockSpec((b, k), lambda i, j, idx: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, bn), lambda i, j, idx: (idx[0], 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g, bn), lambda i, j, idx: (idx[0], 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b, bn), lambda i, j, idx: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, b, n), jnp.float32),
    )

    def call(idx, x, w8, scales):
        return inner(idx, x, w8.astype(jnp.int4), scales)

    return call, (x, w8, scales), k * n // 2 + 4 * g * n


def check_numerics(mul_dtype, L=2, k=256, n=256, b=1):
    """i4st vs prod on the same random weights: int4 row m*G+g holds the
    nibble that prod's shift-unpack extracts for x position row m*G+g of the
    ilv activation order (lo nibbles = rows [0, K/2), hi = [K/2, K))."""
    rng = np.random.default_rng(0)
    bn = pick_bn(n)
    pk = rng.integers(-120, 120, (L, k // 2, n), dtype=np.int8)
    sc = (rng.standard_normal((L, k // QK, n)) * 0.1).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    lo = ((pk.astype(np.int32) << 28) >> 28).astype(np.int8)
    hi = (pk.astype(np.int32) >> 4).astype(np.int8)
    w4_np = np.concatenate([lo, hi], axis=1)  # [L, K, N]
    prod_call, _, _ = make_prod(L, k, n, b, bn)
    i4_call, _, _ = make_i4st(L, k, n, b, bn, mul_dtype)
    i4_jit = jax.jit(i4_call)
    ok = True
    for l in range(L):
        idx = jnp.asarray([l], jnp.int32)
        ref = np.asarray(prod_call(idx, x, jnp.asarray(pk), jnp.asarray(sc)))
        got = np.asarray(
            i4_jit(idx, x, jnp.asarray(w4_np), jnp.asarray(sc))
        )
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        ok = ok and err < 2e-2
    return ok


def time_call(fn, L, x, *rest):
    """On-device scan loop cycling the layer index, differential timing."""

    @partial(jax.jit, static_argnames=("inner",))
    def loop(x, rest, inner):
        def body(c, i):
            xx = (x.reshape(-1).at[0].add(c.astype(x.dtype))).reshape(x.shape)
            y = fn((i % L).reshape(1).astype(jnp.int32), xx, *rest)
            return (y.ravel()[0] * 0).astype(x.dtype), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), x.dtype), jnp.arange(inner, dtype=jnp.int32)
        )
        return out

    def t(inner):
        np.asarray(loop(x, rest, inner))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(x, rest, inner))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(300) - t(60)) / 240


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--bn", type=int, default=512)
    args = ap.parse_args()
    b, L = args.batch, args.layers
    shapes = [  # the 7B decode matmuls
        (4096, 12288, "wqkv"),
        (4096, 22016, "w13"),
        (11008, 4096, "w2"),
        (4096, 4096, "wo"),
        (4096, 32000, "logits"),
    ]
    variants = [
        ("prod", lambda k, n, bn: make_prod(L, k, n, b, bn)),
        ("i4st", lambda k, n, bn: make_i4st(L, k, n, b, bn, jnp.float32)),
        ("i4st_bf16",
         lambda k, n, bn: make_i4st(L, k, n, b, bn, jnp.bfloat16)),
    ]
    for mul, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        try:
            ok = check_numerics(mul)
            log(f"numerics i4st/{nm}: {'OK' if ok else 'MISMATCH'}")
        except Exception as e:
            log(f"numerics i4st/{nm}: FAIL:{type(e).__name__}:{str(e)[:90]}")
    tot = {nm: 0.0 for nm, _ in variants}
    for k, n, label in shapes:
        bn = pick_bn(n, args.bn)
        row = [f"B={b} {label:6s} K={k:5d} N={n:5d} bn={bn:4d}"]
        for name, mk in variants:
            try:
                call, ex, nbytes = mk(k, n, bn)
                dt = time_call(call, L, *ex)
                tot[name] += dt
                row.append(f"{name} {dt*1e6:7.1f}us {nbytes/dt/1e9:4.0f}GB/s")
            except Exception as e:
                tot[name] = float("nan")
                row.append(f"{name} FAIL:{type(e).__name__}:{str(e)[:60]}")
        log("  ".join(row))
    log("layer-equivalent sums (wqkv+w13+w2+wo; logits separate):")
    for name in tot:
        log(f"  {name:10s} {tot[name]*1e6:8.1f}us total over the 5 shapes")


if __name__ == "__main__":
    main()
