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


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., T, H, D] (or [..., H, D] with matching cos/sin ranks).

    cos/sin: [..., T, D/2] broadcast over the head axis.
    """
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
