"""Rotary position embedding, adjacent-pair convention.

Matches `ggml_compute_forward_rope_f32` mode 0 (`ggml.c:7156-7227`):
for pair index i0 (stepping by 2 over the head dim), theta_i = 10000^(-i0/d),
and (x0, x1) at positions (i0, i0+1) rotate by angle p * theta_i where p is
the absolute token position. The reference applies RoPE to K before caching
(`llama.cpp:1005`); we do the same so cached K needs no re-rotation.

MEASURED NEGATIVE RESULT (v5e, r5 2026-08-21): a "lane-friendly"
reformulation y = x*CS + swap_pairs(x)*SN (one pair-swap shuffle instead of
two strided deinterleaves + an interleaving stack; CS/SN tables hoisted out
of the layer scan) measured WORSE on real Mosaic — T=512 prefill rope cost
rose 2.9 -> 7.8 ms/chunk (diag_step_decomp --t 512 --only mm:
mm+norm+rope 53.5 vs 48.5 with this form) and B=1 decode slipped 6.48 ->
6.82 ms/step. XLA lowers the strided slices into the surrounding fusions
cheaply, while the minor-dim-2 reshape+flip forces a real relayout. It
ALSO flipped a q4_0 greedy near-tie against the compiled C reference
(FMA-contraction differs between the graph shapes even though strict-IEEE
arithmetic is identical). The pairwise form below is therefore THE
implementation, for production and oracle alike; `apply_rope_pairwise` is
an alias kept for the oracle path's explicit dependence on this exact
graph shape (tests/test_reference_parity.py locked it in).
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


# the ggml-emulation oracle names this graph shape explicitly (bit parity
# with the compiled C reference is FMA-contraction-sensitive); it IS the
# production implementation too — see the module docstring.
apply_rope_pairwise = apply_rope
