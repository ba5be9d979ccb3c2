"""QWeight — the on-device packed 4-bit weight (pytree).

Device twin of formats.repack.PackedQ4: nibbles packed two-per-int8 with the
split-half scheme, scales (and optional Q4_1 bias) as separate [G, N] planes.
Registered as a JAX pytree so model params containing QWeights jit/shard
transparently. `layout`, `k`, `n` are static aux data.
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
    k: int = field(metadata=dict(static=True), default=0)
    n: int = field(metadata=dict(static=True), default=0)
    layout: str = field(metadata=dict(static=True), default=LAYOUT_ILV)

    @property
    def g(self) -> int:
        return self.k // QK


def qweight_from_packed(
    p: PackedQ4, scale_dtype=jnp.bfloat16, device_put: bool = True
) -> QWeight:
    conv = jnp.asarray if device_put else (lambda a, dtype=None: np.asarray(a, dtype))
    return QWeight(
        packed=conv(p.packed),
        scales=conv(p.scales, dtype=scale_dtype),
        bias=None if p.bias is None else conv(p.bias, dtype=scale_dtype),
        k=p.k,
        n=p.n,
        layout=p.layout,
    )


def dequantize_qweight(qw: QWeight, dtype=jnp.float32) -> jax.Array:
    """jnp dequantize to a dense [K, N] matrix in original k order (reference
    path for parity tests and the CPU fallback)."""
    p = qw.packed.astype(jnp.int32)
    lo = (p << 28) >> 28
    hi = p >> 4
    qs = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)  # storage order
    rows = jnp.arange(qw.k)
    if qw.layout == LAYOUT_ILV:
        scale_rows = rows % qw.g
    else:
        scale_rows = rows // QK
    w = qs * qw.scales.astype(jnp.float32)[scale_rows]
    if qw.bias is not None:
        w = w + qw.bias.astype(jnp.float32)[scale_rows]
    if qw.layout == LAYOUT_ILV:
        # storage row r holds original (r % g)*QK + r//g; invert
        w = w[jnp.asarray(np.argsort(ilv_perm(qw.k)))]
    return w.astype(dtype)
