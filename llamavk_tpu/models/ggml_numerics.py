"""ggml scalar-numerics emulation — the differential-parity oracle.

The C reference's scalar engine (what `tools/build_reference.sh` builds;
SIMD paths diverge from it in rounding mode and ggml itself names the scalar
versions `*_reference`) does NOT compute in pure fp32:

- matmul activations are rounded through the weight's storage format in the
  INIT phase: f16 weights round src1 to f16 (`ggml.c` mul_mat_f16_f32),
  q4_0 weights quantize src1 rows to q4_0 on the fly
  (`ggml.c:6510-6684` INIT + `ggml_vec_dot_q4_0` scalar tail, which is a
  per-element fp32 dequant-multiply — identical to an fp32 matmul of the
  dequantized operands up to accumulation order);
- SiLU and softmax-exp go through f16 lookup tables (`GGML_SILU_FP16`,
  `ggml.c:102-103`; `table_silu_f16`/`table_exp_f16`, `ggml.c:2915-2932`,
  softmax `ggml.c:7062-7135`): in(f16-rounded) → out(f16-rounded);
- rms_norm uses eps=1e-6 and scale = 1.0f/sqrtf(mean + eps)
  (`ggml.c:6024-6081`).

Running `llama_forward(dtype=f32, attn_impl="einsum", ggml_rounding=...)`
over DEQUANTIZED dense f32 weights (loader `dequantize=True`) with these
shims reproduces the reference binary's logits to accumulation-order noise,
which the f16/q4 roundings re-absorb at every layer — greedy token streams
match the compiled `./main --temp 0 --memory_f32` exactly on tiny models
(tests/test_reference_parity.py).

Everything here is jit-compatible jnp; fp64 is deliberately not used (the
reference accumulates some sums in double, but the divergence is below the
f16/4-bit rounding granularity that dominates every layer boundary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QK = 32  # ggml q4 block size


def f16_round_trip(x: jax.Array) -> jax.Array:
    """fp32 → IEEE f16 (round-nearest-even) → fp32, elementwise."""
    return x.astype(jnp.float16).astype(jnp.float32)


def _round_away(v: jax.Array) -> jax.Array:
    """C roundf: round half AWAY from zero (jnp.round is half-to-even)."""
    return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)


def q4_0_round_trip(x: jax.Array) -> jax.Array:
    """Quantize the trailing axis per 32-block to q4_0 and dequantize.

    Exactly `quantize_row_q4_0_reference` (`ggml.c:509-543`) followed by the
    scalar dot's per-element `d * q` fp32 product (`ggml_vec_dot_q4_0`):
    d = absmax/7 (fp32 divide), id = d ? 1/d : 0, q = roundf(v*id) ∈ [-7,7].
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // QK, QK)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    d = amax / jnp.float32(7.0)
    inv = jnp.where(d > 0, jnp.float32(1.0) / jnp.where(d > 0, d, 1.0), 0.0)
    q = _round_away(xf * inv)
    return (d * q).reshape(shape)


ACT_ROUNDINGS = {
    None: None,
    "f32": None,  # f32 weights: mul_mat_f32 rounds nothing
    "f16": f16_round_trip,
    "q4_0": q4_0_round_trip,
}


def act_rounding(mode: str | None):
    """Activation rounding applied by ggml's mul_mat INIT phase for a given
    weight storage format. Raises on formats we don't emulate (q4_1)."""
    if mode not in ACT_ROUNDINGS:
        raise ValueError(f"no ggml activation-rounding emulation for {mode!r}")
    return ACT_ROUNDINGS[mode]


def silu_ggml(x: jax.Array) -> jax.Array:
    """`ggml_vec_silu_f32` with GGML_SILU_FP16 (`ggml.c:2496-2503`):
    y = f16(silu_f32(f16(x))), silu_f32 = x / (1 + expf(-x))."""
    xr = f16_round_trip(x.astype(jnp.float32))
    return f16_round_trip(xr / (1.0 + jnp.exp(-xr)))


def softmax_ggml(scores: jax.Array, axis: int = -1) -> jax.Array:
    """`ggml_compute_forward_soft_max_f32` (`ggml.c:7062-7135`):
    -inf → 0; otherwise p = f16(exp(f16(x - max))); then p *= 1/sum(p)."""
    m = jnp.max(scores, axis=axis, keepdims=True)
    # guard fully-masked rows (all -inf): exp argument would be -inf - -inf
    delta = jnp.where(jnp.isneginf(scores), -jnp.inf, scores - m)
    e = jnp.where(
        jnp.isneginf(scores), 0.0, f16_round_trip(jnp.exp(f16_round_trip(delta)))
    )
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e * (1.0 / jnp.where(s > 0, s, 1.0))


def rms_norm_ggml(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """`ggml_compute_forward_rms_norm_f32` (`ggml.c:6024-6081`): mean of
    squares, scale = 1.0f/sqrtf(mean + eps) (NOT rsqrt), then the separate
    ggml_mul by the norm weight (llama.cpp:983-987) — all fp32."""
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    scale = jnp.float32(1.0) / jnp.sqrt(mean_sq + jnp.float32(eps))
    return (xf * scale) * weight.astype(jnp.float32)
