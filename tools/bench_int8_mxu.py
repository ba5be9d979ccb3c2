"""Go/no-go probe: int8-MXU per-block quantized matmul vs the VPU bf16 kernel.

The production q4 kernel runs ~550 GB/s effective, VPU-bound on ~5 unpack
ops/weight (shift/convert/scale-mul/bf16-pack). The TPU analog of the
reference's integer hot loop (`ggml.c:1817` + INIT-phase activation
quantization, which uses FOUR-bit activations — int8 here is strictly more
precise) moves the scale handling off the per-weight path:

    y[b,n] = sum_g s[g,n] * sx[b,g] * D[b,g,n]
    D[g,b,n] = sum_m xq[g,b,m] * q[g,m,n]     (int8 x int8 -> int32, MXU)

so the per-weight work is ONLY nibble extraction (int8 in, int8 out), and
the per-block structure is a batched dot_general over g. Candidates:

  current      — production kernel body (baseline)
  i8_batched   — int8 extraction + batched int8 MXU dots + f32 fold
  bf16_batched — same structure, bf16 dots (covers int8-dot-unsupported)
  noextract    — biased-pack trick: byte used directly as one operand,
                 only the hi nibble extracted (1 shift/byte); needs the
                 lo-plane stored +8-biased and a group-sum correction

Weights are synthetic on-device (tunnel upload is 1-8 MB/s); timing is the
on-device scan loop with differential (300-60 iteration) subtraction.
"""

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
M = QK // 2  # byte rows per block in gm-order storage


# --- baseline: production kernel body (mg-order ILV layout) ----------------
def kernel_current(x_ref, p_ref, s_ref, o_ref):
    x = x_ref[:]
    half = p_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(jnp.float32)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    m_steps = half // g
    for m in range(m_steps):
        p = p_ref[m * g : (m + 1) * g, :].astype(jnp.int32)
        w_lo = (((p << 28) >> 28).astype(jnp.float32) * s).astype(jnp.bfloat16)
        w_hi = ((p >> 4).astype(jnp.float32) * s).astype(jnp.bfloat16)
        acc += jnp.dot(x[:, m * g : (m + 1) * g], w_lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(
            x[:, half + m * g : half + (m + 1) * g], w_hi,
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc


# --- int8 batched per-block dots (gm-order storage) ------------------------
def kernel_i8_batched(xq_ref, p_ref, s_ref, sx_ref, o_ref, *, dot_dtype):
    """xq_ref [G, B, 2M] int8 (lo acts then hi acts per block), p_ref
    [G*M, BN] int8 gm-order, s_ref [G, BN] f32, sx_ref [G, B] f32."""
    g, b, mm = xq_ref.shape
    bn = o_ref.shape[-1]
    p = p_ref[:].reshape(g, M, bn)
    lo = ((p << 4) >> 4) if dot_dtype == jnp.int8 else (
        ((p.astype(jnp.int32) << 28) >> 28).astype(dot_dtype)
    )
    hi = (p >> 4) if dot_dtype == jnp.int8 else (
        (p.astype(jnp.int32) >> 4).astype(dot_dtype)
    )
    w = jnp.concatenate([lo, hi], axis=1)  # [G, 2M, BN]
    xq = xq_ref[:].astype(dot_dtype)
    acc_t = jnp.int32 if dot_dtype == jnp.int8 else jnp.float32
    d = jax.lax.dot_general(
        xq, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=acc_t
    )  # [G, B, BN]
    s = s_ref[:]
    sx = sx_ref[:]
    o_ref[:] = (
        d.astype(jnp.float32) * s[:, None, :] * sx[:, :, None]
    ).sum(axis=0)


def run_current(k, n, b=8, bn=512):
    half, g = k // 2, k // QK
    x = jnp.ones((b, k), jnp.bfloat16)
    packed = jnp.ones((half, n), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    call = pl.pallas_call(
        kernel_current,
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((b, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return time_call(call, x, packed, scales), half * n + 4 * g * n


def run_batched(k, n, b=8, bn=512, dot_dtype=jnp.int8):
    half, g = k // 2, k // QK
    xq = jnp.ones((g, b, QK), jnp.int8)
    packed = jnp.ones((half, n), jnp.int8)
    scales = jnp.full((g, n), 0.01, jnp.float32)
    sx = jnp.full((g, b), 0.02, jnp.float32)
    call = pl.pallas_call(
        partial(kernel_i8_batched, dot_dtype=dot_dtype),
        grid=(1, n // bn),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((g, b, QK), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, b), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    )
    return (
        time_call(call, xq, packed, scales, sx),
        half * n + 4 * g * n,
    )


def time_call(fn, x, *rest):
    # rest rides as jit ARGUMENTS, never closure captures: captured arrays
    # become program constants that serialize through the axon tunnel at
    # 1-8 MB/s per compile (CLAUDE.md).
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


def main():
    shapes = [(4096, 11008), (11008, 4096), (4096, 12288)]
    b = 8  # MXU minimum tile rows; B=1 decode pads to 8 either way
    for k, n in shapes:
        row = [f"B={b} K={k:5d} N={n:5d}"]
        for name, runner in [
            ("current", lambda: run_current(k, n, b=b)),
            ("i8", lambda: run_batched(k, n, b=b, dot_dtype=jnp.int8)),
            ("bf16", lambda: run_batched(k, n, b=b, dot_dtype=jnp.bfloat16)),
        ]:
            try:
                dt, nbytes = runner()
                row.append(f"{name} {dt*1e6:7.1f}us {nbytes/dt/1e9:4.0f}GB/s")
            except Exception as e:
                row.append(f"{name} FAIL:{type(e).__name__}:{str(e)[:80]}")
        log("  ".join(row))


if __name__ == "__main__":
    main()
