"""Rotary position embedding, adjacent-pair convention.

Matches `ggml_compute_forward_rope_f32` mode 0 (`ggml.c:7156-7227`):
for pair index i0 (stepping by 2 over the head dim), theta_i = 10000^(-i0/d),
and (x0, x1) at positions (i0, i0+1) rotate by angle p * theta_i where p is
the absolute token position. The reference applies RoPE to K before caching
(`llama.cpp:1005`); we do the same so cached K needs no re-rotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(positions: jax.Array, head_dim: int, theta_base: float = 10000.0):
    """cos/sin tables for given positions. positions: [...] int32 → [..., d/2]."""
    i0 = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    inv_freq = theta_base ** (-i0 / head_dim)  # [d/2]
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_pairwise(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Reference formulation (deinterleave pairs, rotate, re-interleave) —
    kept for the ggml-emulation oracle path: the C reference's greedy
    streams are bit-sensitive to XLA's FMA-contraction choices, and this
    graph shape is the one the differential-parity harness locked in
    (tests/test_reference_parity.py::test_greedy_stream_exact — the
    lane-friendly form below flipped a q4_0 near-tie, r5). Production
    paths use apply_rope; oracles (ggml_rounding) use this."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[..., None, :]  # broadcast over heads (axis -2 of x)
    s = sin[..., None, :]
    y0 = x0 * c - x1 * s
    y1 = x0 * s + x1 * c
    y = jnp.stack([y0, y1], axis=-1).reshape(x.shape)
    return y.astype(orig_dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., T, H, D] (or [..., H, D] with matching cos/sin ranks).

    cos/sin: [..., T, D/2] broadcast over the head axis.

    Lane-friendly formulation: instead of deinterleaving even/odd lanes
    (x[..., 0::2] / 1::2 are strided cross-lane gathers, and the output
    stack is another interleave — measured 2.9 ms per 512-token prefill
    chunk, 0.8 ms per B=32 decode step across the 32-layer scan, r4/r5
    decompositions), compute

        y = x * CS + swap_pairs(x) * SN
        CS = [c0, c0, c1, c1, ...],  SN = [-s0, s0, -s1, s1, ...]

    which is ONE pair-swap shuffle per application; the expanded CS/SN
    tables depend only on cos/sin, so XLA hoists them out of the layer
    scan. The arithmetic is identical to the pairwise form under strict
    IEEE evaluation (same multiplies, one commuted addition), but XLA's
    FMA-contraction choices differ between the two graph shapes — the
    ggml-emulation oracle therefore keeps apply_rope_pairwise (see
    above), while every production path (which defines its own stream
    contract) uses this form.
    """
    orig_dtype = x.dtype
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    cs = jnp.repeat(cos, 2, axis=-1)[..., None, :]  # [..., T, 1, D]
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), d // 2)
    sn = (jnp.repeat(sin, 2, axis=-1) * sign)[..., None, :]
    sw = xf.reshape(*x.shape[:-1], d // 2, 2)[..., ::-1].reshape(x.shape)
    y = xf * cs + sw * sn
    return y.astype(orig_dtype)
