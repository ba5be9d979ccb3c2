"""Per-row int8 KV-cache quantization.

The reference stores its cache in f16 (`f16_kv`, llama.h:56; kv_cache init
llama.cpp:671-700). Here the cache can additionally be stored int8 with one
f32 scale per cached row (per layer, batch, position, head) — halving KV
memory and attention read bandwidth vs bf16, doubling the context that fits
a chip.

Scheme: symmetric absmax over the head_dim axis,
  scale = max|x| / 127,   q = round(x / scale) in [-127, 127].

Layouts (chosen for Mosaic DMA alignment, see ops/flash_attn.py):
  data   int8 [L, B, H, S, D]  — same layout as the bf16 cache
  scales f32  [L, B, S, H]     — S on the sublane axis so cache-position
                                 slices are 8-aligned; H on the lane axis is
                                 read whole (no 128-lane slicing constraint)

The kernel never slices the H lane axis: per-program head scales are
extracted with a one-hot matmul (see flash_attn._attend), which keeps every
DMA aligned for any head count / heads-per-program split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [..., D] -> (q int8 [..., D], scale f32 [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    """(q int8 [..., D], scale f32 [...]) -> f32 [..., D]."""
    return q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)
