"""Round-2 unpack-variant probe: can anything beat the ~5 VPU ops/weight that
cap the q4 kernel at ~550 GB/s (67% of v5e HBM)?

The production kernel (`ops/q4_matmul.py::_kernel_q4`) widens packed bytes to
int32, extracts nibbles with 32-bit shifts, converts to f32, multiplies the
per-block scale, and packs to bf16 for the MXU — ~5 VPU ops per weight.
Candidates that attack the widen/shift cost directly:

  cur        — production kernel body (baseline)
  i8shift    — nibble extraction with NATIVE int8 shifts (packed 4-per-lane if
               Mosaic vectorizes them) before one int8->f32 widening convert
  i8shift16  — int8 shifts -> bf16 convert -> bf16 scale mul (cheapest mul)
  int4       — weights stored as a jnp.int4 plane [K, BN] (same HBM bytes as
               the packed-byte layout); Mosaic's native int4->bf16 widening
               convert replaces ALL shift/mask work
  int4f32    — int4 -> f32 convert -> f32 mul -> bf16 (rounding-safest)
  i8dot2d    — plain 2-D int8 x int8 -> int32 MXU dot compile check (the
               batched-over-groups form is unsupported, bench_int8_mxu.py)

`--compile-only` AOT-lowers+compiles each variant without touching the chip
(safe while benchmarks run); the full mode times the on-device scan loop with
differential (300-60) subtraction as in tools/bench_int8_mxu.py.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


QK = 32


# --- baseline: production kernel body (ilv layout, [K/2, N] packed bytes) ---
def kernel_cur(x_ref, p_ref, s_ref, o_ref):
    x = x_ref[:]
    half = p_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(jnp.float32)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for m in range(half // g):
        p = p_ref[m * g : (m + 1) * g, :].astype(jnp.int32)
        w_lo = (((p << 28) >> 28).astype(jnp.float32) * s).astype(jnp.bfloat16)
        w_hi = ((p >> 4).astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w_lo,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, half + m * g : half + (m + 1) * g], w_hi,
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


# --- int8-native shifts --------------------------------------------------
def kernel_i8shift(x_ref, p_ref, s_ref, o_ref, *, mul_dtype):
    x = x_ref[:]
    half = p_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(mul_dtype)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for m in range(half // g):
        p = p_ref[m * g : (m + 1) * g, :]
        lo8 = jnp.left_shift(p, 4) >> 4      # int8 lanes, sign-extends nibble
        hi8 = p >> 4
        w_lo = (lo8.astype(mul_dtype) * s).astype(jnp.bfloat16)
        w_hi = (hi8.astype(mul_dtype) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w_lo,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x[:, half + m * g : half + (m + 1) * g], w_hi,
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


# --- int4-typed weight plane ---------------------------------------------
def kernel_int4(x_ref, w4_ref, s_ref, o_ref, *, mul_dtype):
    """w4_ref [K, BN] jnp.int4 in ilv row order (row r = m*G + g), so each
    G-row slice scales by the whole s plane, same trick as production."""
    x = x_ref[:]
    k = w4_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(mul_dtype)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for m in range(k // g):
        w4 = w4_ref[m * g : (m + 1) * g, :]
        w = (w4.astype(mul_dtype) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w,
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


# --- pltpu.bitcast int8 -> int4 plane (free reinterpret + native convert) --
def kernel_bitcast4(x_ref, p_ref, s_ref, o_ref, *, mul_dtype):
    """Packed bytes reinterpreted as an int4 plane: [half, BN] int8 ->
    [K, BN] int4 (sublane packing order is hardware-defined; the repack
    layout absorbs whatever permutation it is, so for TIMING any order is
    fine). Per-weight VPU work: int4->mul_dtype convert, scale mul, bf16
    pack — no shifts, no masks."""
    x = x_ref[:]
    half = p_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(mul_dtype)
    w4 = pltpu.bitcast(p_ref[:], jnp.int4)  # [2*half, BN]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for m in range(2 * half // g):
        w = (w4[m * g : (m + 1) * g, :].astype(mul_dtype) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w,
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


def make_bitcast4(k, n, b, bn, mul_dtype):
    half, g = k // 2, k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    packed = jnp.ones((half, n), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        partial(kernel_bitcast4, mul_dtype=mul_dtype),
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return call, (x, packed, scales), half * n + 4 * g * n


def perm_probe():
    """Empirically determine pltpu.bitcast's int8->int4 sublane packing:
    feed bytes whose value encodes their row, read back which int4 rows the
    lo/hi nibbles land in. Prints perm[r4] = (byte_row, 'lo'|'hi')."""
    S, L = 16, 128

    def kern(p_ref, o_ref):
        o_ref[:] = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.float32)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2 * S, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    # byte r -> lo nibble = r % 8, hi nibble = (r // 8 + 1) % 8 (both
    # non-negative, distinguishable)
    rows = np.arange(S, dtype=np.int32)
    byte = ((rows // 8 + 1) % 8 * 16 + rows % 8).astype(np.int8)
    p = np.broadcast_to(byte[:, None], (S, L)).copy()
    out = np.asarray(call(jnp.asarray(p)))[:, 0]
    for r4 in range(2 * S):
        v = int(out[r4])
        cands = [
            (int(r), which)
            for r in rows
            for which, val in (("lo", r % 8), ("hi", (r // 8 + 1) % 8))
            if val == v
        ]
        log(f"int4 row {r4:2d} = value {v} candidates {cands}")


# --- 2-D int8 MXU dot (support probe) ------------------------------------
def kernel_i8dot2d(xq_ref, w8_ref, o_ref):
    d = jnp.dot(xq_ref[:], w8_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = d.astype(jnp.float32)


def make_cur(k, n, b, bn):
    half, g = k // 2, k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    packed = jnp.ones((half, n), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        kernel_cur,
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return call, (x, packed, scales), half * n + 4 * g * n


def make_i8shift(k, n, b, bn, mul_dtype):
    half, g = k // 2, k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    packed = jnp.ones((half, n), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        partial(kernel_i8shift, mul_dtype=mul_dtype),
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return call, (x, packed, scales), half * n + 4 * g * n


def make_int4(k, n, b, bn, mul_dtype):
    g = k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    w4 = jnp.ones((k, n), jnp.int4)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        partial(kernel_int4, mul_dtype=mul_dtype),
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return call, (x, w4, scales), k * n // 2 + 4 * g * n


def make_i8dot2d(k, n, b, bn):
    xq = jnp.ones((max(b, 8), k), jnp.int8)
    w8 = jnp.ones((k, n), jnp.int8)
    call = pl.pallas_call(
        kernel_i8dot2d,
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((max(b, 8), n), jnp.float32),
        in_specs=[
            pl.BlockSpec((max(b, 8), k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((max(b, 8), bn), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
    )
    return call, (xq, w8), k * n  # int8 weights: 8 bits/weight


def time_call(fn, x, *rest):
    @partial(jax.jit, static_argnames=("inner",))
    def loop(x, rest, inner):
        def body(c, _):
            xx = (x.reshape(-1).at[0].add(c.astype(x.dtype))).reshape(x.shape)
            y = fn(xx, *rest)
            return (y.ravel()[0] * 0).astype(x.dtype), None

        out, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=inner)
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


def compile_only(fn, *args):
    jax.jit(fn).lower(*args).compile()


def check_numerics(name, mul_dtype=jnp.float32):
    """Tiny-shape spot check: compare the variant against kernel_cur on the
    same random data (so a Mosaic miscompile or layout mixup can't masquerade
    as a speedup)."""
    k, n, b, bn = 256, 256, 8, 256
    rng = np.random.default_rng(0)
    pk = rng.integers(-120, 120, (k // 2, n), dtype=np.int8)
    sc = (rng.standard_normal((k // QK, n)) * 0.1).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    cur_call, _, _ = make_cur(k, n, b, bn)
    ref = np.asarray(cur_call(x, jnp.asarray(pk), jnp.asarray(sc)))
    if name.startswith("i8shift"):
        call, _, _ = make_i8shift(k, n, b, bn, mul_dtype)
        got = np.asarray(call(x, jnp.asarray(pk), jnp.asarray(sc)))
    elif name.startswith("int4"):
        # production row r of packed holds nibble pair for k = m*G+g (lo) and
        # half + m*G+g (hi): int4 plane rows 0..half-1 = lo, half.. = hi
        lo = ((pk.astype(np.int32) << 28) >> 28).astype(np.int8)
        hi = (pk.astype(np.int32) >> 4).astype(np.int8)
        w4 = np.concatenate([lo, hi], axis=0)  # [K, N] ilv row order
        call, _, _ = make_int4(k, n, b, bn, mul_dtype)
        got = np.asarray(call(x, jnp.asarray(w4).astype(jnp.int4),
                              jnp.asarray(sc)))
    else:
        return True
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    return err < 2e-2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--perm-probe", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    shapes = [(4096, 11008), (11008, 4096), (4096, 12288)]
    b = args.batch
    variants = [
        ("cur", lambda k, n: make_cur(k, n, b, 512)),
        ("i8shift", lambda k, n: make_i8shift(k, n, b, 512, jnp.float32)),
        ("i8shift16", lambda k, n: make_i8shift(k, n, b, 512, jnp.bfloat16)),
        ("int4", lambda k, n: make_int4(k, n, b, 512, jnp.bfloat16)),
        ("int4f32", lambda k, n: make_int4(k, n, b, 512, jnp.float32)),
        ("bitcast4", lambda k, n: make_bitcast4(k, n, b, 512, jnp.bfloat16)),
        ("bitcast4f32", lambda k, n: make_bitcast4(k, n, b, 512, jnp.float32)),
        ("i8dot2d", lambda k, n: make_i8dot2d(k, n, b, 512)),
    ]
    if args.perm_probe:
        perm_probe()
        return
    if args.compile_only:
        k, n = shapes[0]
        for name, mk in variants:
            try:
                call, ex, _ = mk(k, n)
                compile_only(call, *ex)
                log(f"{name:10s} COMPILE OK")
            except Exception as e:
                log(f"{name:10s} FAIL:{type(e).__name__}:{str(e)[:110]}")
        return
    muls = {"i8shift": jnp.float32, "i8shift16": jnp.bfloat16,
            "int4": jnp.bfloat16, "int4f32": jnp.float32}
    bad = set()
    for name, mul in muls.items():
        try:
            if not check_numerics(name, mul):
                log(f"{name:10s} NUMERICS MISMATCH — skipping timing")
                bad.add(name)
        except Exception as e:
            log(f"{name:10s} numerics FAIL:{type(e).__name__}:{str(e)[:90]}")
            bad.add(name)
    variants = [(nm, mk) for nm, mk in variants if nm not in bad]
    for k, n in shapes:
        row = [f"B={b} K={k:5d} N={n:5d}"]
        for name, mk in variants:
            try:
                call, ex, nbytes = mk(k, n)
                dt = time_call(call, *ex)
                row.append(f"{name} {dt*1e6:7.1f}us {nbytes/dt/1e9:4.0f}GB/s")
            except Exception as e:
                row.append(f"{name} FAIL:{type(e).__name__}:{str(e)[:60]}")
        log("  ".join(row))


if __name__ == "__main__":
    main()
