"""QWeight — the on-device packed 4-bit weight (pytree).

Device twin of formats.repack.PackedQ4: nibbles packed two-per-int8 with the
split-half scheme, scales (and optional Q4_1 bias) as separate [G, N] planes.
Registered as a JAX pytree so model params containing QWeights jit/shard
transparently. `layout` / `chunks` are static aux data; K/N/G are derived
from array shapes so the same code works on shard_map-local views.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.q4 import QK
from ..formats.repack import LAYOUT_ILV, PackedQ4, ilv_perm


@jax.tree_util.register_dataclass
@dataclass
class QWeight:
    packed: jax.Array  # int8 [K//2, N]
    scales: jax.Array  # bf16 (or f32) [G, N]
    bias: jax.Array | None  # [G, N] or None
    layout: str = field(metadata=dict(static=True), default=LAYOUT_ILV)
    chunks: int = field(metadata=dict(static=True), default=1)

    @property
    def k(self) -> int:
        return 2 * self.packed.shape[0]

    @property
    def n(self) -> int:
        return self.packed.shape[1]

    @property
    def g(self) -> int:
        return self.scales.shape[0]


def qweight_from_packed(
    p: PackedQ4, scale_dtype=jnp.bfloat16, device_put: bool = True
) -> QWeight:
    conv = jnp.asarray if device_put else (lambda a, dtype=None: np.asarray(a, dtype))
    return QWeight(
        packed=conv(p.packed),
        scales=conv(p.scales, dtype=scale_dtype),
        bias=None if p.bias is None else conv(p.bias, dtype=scale_dtype),
        layout=p.layout,
        chunks=p.chunks,
    )


def dequantize_qweight(qw: QWeight, dtype=jnp.float32) -> jax.Array:
    """jnp dequantize to a dense [K, N] matrix in original k order (reference
    path for parity tests and the CPU fallback)."""
    k, g = qw.k, qw.g
    kc = k // qw.chunks
    gc = g // qw.chunks
    outs = []
    for c in range(qw.chunks):
        p = qw.packed[c * kc // 2 : (c + 1) * kc // 2].astype(jnp.int32)
        lo = (p << 28) >> 28
        hi = p >> 4
        qs = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # chunk storage order
        rows = np.arange(kc)
        if qw.layout == LAYOUT_ILV:
            scale_rows = c * gc + rows % gc
        else:
            scale_rows = c * gc + rows // QK
        w = qs * qw.scales.astype(jnp.float32)[scale_rows]
        if qw.bias is not None:
            w = w + qw.bias.astype(jnp.float32)[scale_rows]
        if qw.layout == LAYOUT_ILV:
            w = w[jnp.asarray(np.argsort(ilv_perm(kc)))]
        outs.append(w)
    return jnp.concatenate(outs, axis=0).astype(dtype)
