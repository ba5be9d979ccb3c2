"""RMSNorm (jnp; XLA fuses this into neighbors — the analog of the reference's
fused RMSNorm shaders K1/K2, `vulkan/llama-vk.hlsl:201-341`).

Math matches `ggml_compute_forward_rms_norm_f32` (`ggml.c:6024-6081`,
eps = 1e-6) followed by the elementwise weight multiply the reference builds
as a separate ggml_mul node (`llama.cpp:983-987`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RMS_NORM_EPS = 1e-6


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = RMS_NORM_EPS) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(mean_sq + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)
