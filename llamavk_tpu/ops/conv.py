"""1-D convolutions — library-surface parity with ggml's conv_1d_1s /
conv_1d_2s (`ggml.h:622-630`, impl ggml.c:~7360-7860; whisper-era ops that
the LLaMA path never emits but the tensor library exposes).

Semantics (matching ggml): kernel `w` has ggml ne = [nk, n_in, n_out] —
NumPy shape [n_out, n_in, nk]; signal `x` has ne = [n, n_in] — NumPy
[n_in, n]. 'Half' (same) padding; stride 1 (`_1s`) or 2 (`_2s`). Output
NumPy shape [n_out? ...] — ggml returns ne [n/stride, n_out] → NumPy
[n_out, n/stride].

Implemented with `lax.conv_general_dilated`, which XLA maps onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_1d(w: jax.Array, x: jax.Array, stride: int) -> jax.Array:
    """w: [n_out, n_in, nk] f32/bf16; x: [n_in, n] → [n_out, ceil(n/stride)]."""
    nk = w.shape[-1]
    # lax wants NCW / OIW
    out = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),  # [1, n_in, n]
        w.astype(jnp.float32),  # [n_out, n_in, nk]
        window_strides=(stride,),
        padding=[(nk // 2, nk // 2)],
        dimension_numbers=("NCW", "OIW", "NCW"),
    )
    return out[0]


def conv_1d_1s(w: jax.Array, x: jax.Array) -> jax.Array:
    """Stride-1 'same' 1-D convolution (ggml_conv_1d_1s, ggml.h:622-625)."""
    return _conv_1d(w, x, 1)


def conv_1d_2s(w: jax.Array, x: jax.Array) -> jax.Array:
    """Stride-2 'same' 1-D convolution (ggml_conv_1d_2s, ggml.h:627-630)."""
    return _conv_1d(w, x, 2)
