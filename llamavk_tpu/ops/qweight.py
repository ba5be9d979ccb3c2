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
from ..formats.repack import LAYOUT_I4, LAYOUT_ILV, PackedQ4, ilv_perm


@jax.tree_util.register_dataclass
@dataclass
class QWeight:
    packed: jax.Array  # int8 [K//2, N]
    scales: jax.Array  # bf16 (or f32) [G, N]
    bias: jax.Array | None  # [G, N] or None
    layout: str = field(metadata=dict(static=True), default=LAYOUT_ILV)
    chunks: int = field(metadata=dict(static=True), default=1)
    # LAYOUT_I4 with pre-padded N columns (qweight_to_i4 pad_n): the REAL
    # output width; 0 = storage width is the real width. Static so the
    # matmul can slice the zero-pad columns off. Only set on single-replica
    # (unsharded) planes — a padded global N would break tp column shards.
    n_orig: int = field(metadata=dict(static=True), default=0)

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


def i4_group_pad(gc: int) -> int:
    """Padded per-chunk group count of the int4 storage plane: Mosaic int4
    sublane slices must be 128-row aligned (measured on v5e 2026-08-20 —
    g=128/256/384 compile, 160/352 hit the create_mask int4 bug), so the
    kernel's per-m-step G-row slices need G % 128 == 0. Zero rows pad the
    difference (zero weights x zero scales contribute nothing)."""
    return -(-gc // 128) * 128


def qweight_to_i4(qw: QWeight, pad_n: int = 0) -> QWeight:
    """Convert an ilv QWeight to int4-plane storage (LAYOUT_I4).

    The int8 split-half byte plane [.., K/2, N] becomes a jnp.int4 plane
    [.., K_stor, N]: within each chunk, storage row m*Gp + g holds the
    signed nibble for original position g*QK + m (lo nibbles land at
    m < QK/2, hi at m >= QK/2 — the same ilv row ordering the shift kernel
    walks), with the per-chunk group count padded Gc -> Gp = i4_group_pad.
    Scales pad to [.., chunks*Gp, N] with zero rows. Same HBM bytes per
    real weight (int4 packs two per byte); the kernel replaces the
    widen+shift+mask unpack with one native int4->f32 convert — measured
    533 -> 854 GB/s on the B=1 wqkv matmul (tools/bench_i4_stacked.py).

    Works on flat [K/2, N] and stacked [L, K/2, N] planes. Requires the
    int4 dispatch shim (utils/int4_dispatch) under the axon plugin.

    pad_n > 0 additionally zero-pads N up to a multiple of pad_n so the
    kernel's N tile can be the int4 sweet spot (bn1024) even when it does
    not divide the true N (the 7B w13's 22016 and the 32000-wide logits
    are the cases that matter — they otherwise fall back to bn512/bn640).
    The padded columns compute zeros the matmul slices off (QWeight.n_orig
    records the real width). Requires chunks == 1 and must NOT be used on
    weights that will be tp-column-sharded (the pad would land entirely in
    the last shard)."""
    from ..utils.int4_dispatch import ensure_int4_dispatch

    assert qw.layout == LAYOUT_ILV, qw.layout
    ensure_int4_dispatch()
    chunks = qw.chunks
    half_t = qw.packed.shape[-2]  # chunks * kc/2
    n = qw.packed.shape[-1]
    kc = 2 * half_t // chunks
    gc = kc // QK
    gp = i4_group_pad(gc)
    lead = qw.packed.shape[:-2]
    np_ = n
    if pad_n and n % pad_n:
        assert chunks == 1, "pad_n requires unchunked (non-tp-row) weights"
        np_ = -(-n // pad_n) * pad_n

    @jax.jit
    def conv(packed, scales):
        p = packed.reshape(*lead, chunks, QK // 2, gc, n).astype(jnp.int32)
        lo = (p << 28) >> 28
        hi = p >> 4
        w = jnp.concatenate([lo, hi], axis=-3).astype(jnp.int8)
        # [..., chunks, QK, gc, n] -> pad gc (and n) -> rows m*Gp + g
        pad = [(0, 0)] * (w.ndim - 2) + [(0, gp - gc), (0, np_ - n)]
        w = jnp.pad(w, pad)
        w4 = w.reshape(*lead, chunks * QK * gp, np_).astype(jnp.int4)
        s = scales.reshape(*lead, chunks, gc, n)
        s = jnp.pad(
            s, [(0, 0)] * (s.ndim - 2) + [(0, gp - gc), (0, np_ - n)]
        )
        return w4, s.reshape(*lead, chunks * gp, np_)

    w4, s = conv(qw.packed, qw.scales)
    return QWeight(packed=w4, scales=s, bias=qw.bias, layout=LAYOUT_I4,
                   chunks=chunks, n_orig=n if np_ != n else 0)


def dequantize_qweight(qw: QWeight, dtype=jnp.float32) -> jax.Array:
    """jnp dequantize to a dense [K, N] matrix in original k order (reference
    path for parity tests and the CPU fallback)."""
    assert qw.layout != LAYOUT_I4, (
        "dequantize_qweight: int4-plane storage is a device-only matmul "
        "form; dequantize the source ilv QWeight instead"
    )
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
