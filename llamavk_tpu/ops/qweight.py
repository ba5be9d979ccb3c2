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


def i4_slice_group(gc: int) -> int:
    """Slice-grouping factor c for the int4 kernel: Mosaic int4 sublane
    slices must be 128-row-aligned in LENGTH (measured on v5e 2026-08-20 —
    lengths 128/256/384/640 compile, 160/352 hit the create_mask int4 bug),
    so the kernel walks c m-stripes per slice, slice length gc*c. Returns 0
    when no c <= 4 works (the scale concat temp stays small only for small
    c) — the caller pads gc instead."""
    for c in (1, 2, 4):
        if (gc * c) % 128 == 0:
            return c
    return 0


def i4_group_pad(gc: int) -> int:
    """Per-chunk group count of the int4 storage plane: unchanged when a
    slice grouping exists (i4_slice_group), else padded with zero rows
    (zero weights x zero scales contribute nothing) to the smallest count
    a slice grouping EXISTS for — gp % 32 == 0 guarantees c=4 alignment
    (gp*4 % 128 == 0), so the pad never exceeds 31 groups. Padding to a
    full 128 multiple (the r4 rule) cost 7B's w2 +11.6% plane reads
    (344 -> 384) where 344 -> 352 at c=4 costs +2.3%, and 13B's w2 +18.5%
    (432 -> 512) vs 432 -> 448 at c=4 (+3.7%) — decode is weight-read
    bound, so those reads are E2E time. 7B: gc 128 direct (c=1), w2
    344 -> 352 (c=4). 13B: gc 160 grouped at c=4 (no pad), w2 432 -> 448
    (c=4)."""
    if i4_slice_group(gc):
        return gc
    gp = -(-gc // 32) * 32
    assert i4_slice_group(gp), (gc, gp)
    return gp


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
        # FLAT [K/2, N] -> ([K_stor, Np] int4, [G_stor, Np]); stacked
        # weights convert layer by layer below (one whole-plane unpack of a
        # 13B w13 transiently costs ~3x its size — per-layer keeps the
        # peak at final + source)
        p = packed.reshape(chunks, QK // 2, gc, n).astype(jnp.int32)
        lo = (p << 28) >> 28
        hi = p >> 4
        w = jnp.concatenate([lo, hi], axis=-3).astype(jnp.int8)
        pad = [(0, 0), (0, 0), (0, gp - gc), (0, np_ - n)]
        w = jnp.pad(w, pad)
        w4 = w.reshape(chunks * QK * gp, np_).astype(jnp.int4)
        s = scales.reshape(chunks, gc, n)
        s = jnp.pad(s, [(0, 0), (0, gp - gc), (0, np_ - n)])
        return w4, s.reshape(chunks * gp, np_)

    if lead:
        assert len(lead) == 1, lead
        parts = [conv(qw.packed[l], qw.scales[l]) for l in range(lead[0])]
        w4 = jnp.stack([p_ for p_, _ in parts])
        s = jnp.stack([s_ for _, s_ in parts])
    else:
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
