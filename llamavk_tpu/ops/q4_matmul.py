"""Fused 4-bit dequantize + matmul — the TPU replacement for the reference's
`ggml_vec_dot_q4_0` CPU hot loop (`ggml.c:1817`) and the Vulkan fused
dequant-matvec shaders (`vulkan/llama-vk.hlsl:701-824` thinMatMul, K4/K5).

Weights stay nibble-packed in HBM; each grid step streams a [K/2, BN] packed
tile into VMEM, unpacks with two arithmetic shifts, applies per-block scales
(a cheap tile-broadcast thanks to the interleaved storage layout — see
formats/repack.py), and feeds the MXU in bf16. The Q4_1 affine term is folded
in as one extra small XLA matmul against per-group activation sums. Weights
packed with `chunks` > 1 (tensor-parallel row shards) run one kernel per
chunk with the partial products summed.

computes  y[b, n] = sum_k x[b, k] * W[k, n]   with W given by a QWeight.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.q4 import QK
from ..formats.repack import LAYOUT_I4, LAYOUT_ILV
from .pallas_backend import interpret_mode
from .qweight import QWeight, dequantize_qweight, i4_group_pad


def to_ilv(x: jax.Array, k: int, chunks: int = 1) -> jax.Array:
    """Reorder the contraction axis into interleaved storage order (per chunk).

    x'[..., m*G + g] = x[..., g*QK + m] within each contiguous K/chunks slice —
    a minor-axis [G, QK] → [QK, G] transpose, which XLA lowers natively."""
    kc = k // chunks
    g = kc // QK
    lead = x.shape[:-1]
    x = x.reshape(*lead, chunks, g, QK).swapaxes(-1, -2)
    return x.reshape(*lead, k)


def to_i4lv(x: jax.Array, k: int, chunks: int = 1) -> jax.Array:
    """Activation order for the int4-bitcast unpack (dot_mode="i4").

    `pltpu.bitcast(int8 -> int4)` expands byte row r into int4 rows 2r (lo
    nibble) and 2r+1 (hi nibble) — measured on v5e by
    tools/bench_unpack2.py --perm-probe. The ilv byte plane stores weight
    (m, g) in the lo nibble and (m + QK/2, g) in the hi nibble of byte row
    m*G + g, so the bitcast int4 plane's row m*2G + 2g + b corresponds to
    original x position g*QK + (m + b*QK/2):

        x'[..., m*2G + 2g + b] = x[..., g*QK + b*QK/2 + m]
    """
    kc = k // chunks
    g = kc // QK
    m = QK // 2
    lead = x.shape[:-1]
    x = x.reshape(*lead, chunks, g, 2, m)
    x = jnp.moveaxis(x, -1, -3)  # (chunks, m, g, 2)
    return x.reshape(*lead, k)


def to_i4st(x: jax.Array, k: int, chunks: int, gp: int) -> jax.Array:
    """Activation order for int4-plane storage (LAYOUT_I4): ilv order with
    the per-chunk group axis zero-padded to gp (matching the plane's padded
    rows, which hold zero weights).

        x'[..., c, m*gp + g] = x[..., c, g*QK + m]  for g < Kc/QK, else 0
    """
    kc = k // chunks
    gc = kc // QK
    lead = x.shape[:-1]
    x = x.reshape(*lead, chunks, gc, QK)
    if gp != gc:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, gp - gc), (0, 0)])
    x = x.swapaxes(-1, -2)  # [..., chunks, QK, gp]
    return x.reshape(*lead, chunks * QK * gp)


def _group_sums(x: jax.Array, k: int) -> jax.Array:
    """Per-quantization-block sums of x (original k order) → [..., G]."""
    g = k // QK
    return x.reshape(*x.shape[:-1], g, QK).sum(axis=-1)


def q4_matmul_ref(x: jax.Array, qw: QWeight, out_dtype=jnp.float32) -> jax.Array:
    """jnp reference implementation (dequantize then dense matmul)."""
    w = dequantize_qweight(qw, dtype=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32).astype(
        out_dtype
    )


def _kernel_q4(
    x_ref, p_ref, s_ref, o_ref, *, layout: str, mul_dtype=jnp.float32,
    unpack: str = "shift",
):
    """Fused dequant+matmul over one packed chunk.

    ilv layout: storage row r uses scales[r % G], so each G-row slice of the
    packed block lines up 1:1 with the whole scales plane — the loop below
    processes one slice of storage rows per step (both nibbles of those
    bytes), needing no scale broadcast at all and bounding VMEM temporaries
    to O(G x BN) regardless of K (the w2 matmul has K = n_ff = 11008).

    mul_dtype: precision of the nibble·scale product. The kernel is VPU-bound
    on unpack arithmetic (the MXU is mostly idle at decode batch sizes), so
    bf16 halves the per-weight convert/multiply cost; nibbles in [-8, 7] are
    exact in bf16 and the rounding of q·s is within Q4's own quantization
    noise.
    """
    # dot dtype: bf16 casts the dequantized weight for the MXU (1 extra VPU
    # op/weight); f32 feeds the f32 product straight in (matmuls here are far
    # from MXU-bound at decode batch sizes)
    dot_dtype = jnp.float32 if _ENV_DOT == "f32" else jnp.bfloat16
    x = x_ref[:].astype(dot_dtype)
    half = p_ref.shape[0]
    g = s_ref.shape[0]
    s = s_ref[:].astype(mul_dtype)  # [G, BN]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    if layout == LAYOUT_I4:
        # int4-PLANE storage (qweight_to_i4): p_ref is jnp.int4
        # [K_stor, BN], row m*Gp + g scaled by s[g] — one native int4 ->
        # mul_dtype widening convert replaces the whole widen/shift/mask
        # unpack (~5 -> ~2 VPU ops/weight; v5e B=1 wqkv 533 -> 854 GB/s,
        # tools/bench_i4_stacked.py). Mosaic int4 slice LENGTHS must be
        # multiples of 128: either Gp already is (i4_group_pad padded it),
        # or the loop walks c m-stripes per slice with the scale plane
        # concatenated c times (i4_slice_group — e.g. 13B's Gp=160 at c=4).
        from .qweight import i4_slice_group

        m_steps = p_ref.shape[0] // g  # == QK
        c = i4_slice_group(g)
        assert c, (g, "i4 plane group count not slice-compatible")
        sc = jnp.concatenate([s] * c, axis=0) if c > 1 else s
        for m in range(m_steps // c):
            w = (
                p_ref[m * g * c : (m + 1) * g * c, :].astype(mul_dtype) * sc
            ).astype(dot_dtype)
            acc += jnp.dot(
                x[:, m * g * c : (m + 1) * g * c], w,
                preferred_element_type=jnp.float32,
            )
    elif layout == LAYOUT_ILV and unpack == "i4":
        # int4-bitcast unpack (x in to_i4lv order): byte row r reinterprets
        # as int4 rows 2r (lo) / 2r+1 (hi) — one native int4->mul_dtype
        # widening convert replaces the widen+2-shift sequence (~5 -> ~3 VPU
        # ops/weight; v5e: 676 vs 601 GB/s effective,
        # tools/bench_unpack2.py). The byte plane is UNCHANGED — only the
        # in-kernel view and the activation order differ. Numerics are
        # identical to the shift path at mul_dtype=f32 (int4 -> f32 exact).
        # The bitcast covers the WHOLE ref once (a reinterpret, not a
        # per-step vector repack) and slices group c consecutive byte-rows
        # so every int4 slice offset/length is 32-row aligned (Mosaic's
        # int4 sublane tile).
        w4 = pltpu.bitcast(p_ref[:], jnp.int4)  # [2*half, BN]
        m_steps = half // g  # = QK // 2
        c = 1
        while (2 * g * c) % 32:
            c *= 2
        c = min(c, m_steps)
        s2 = jnp.repeat(s, 2, axis=0)  # int4 row 2g+b scales by s[g]
        if c > 1:
            s2 = jnp.concatenate([s2] * c, axis=0)
        for m in range(m_steps // c):
            w = (
                w4[m * 2 * g * c : (m + 1) * 2 * g * c, :].astype(mul_dtype)
                * s2
            ).astype(dot_dtype)
            acc += jnp.dot(
                x[:, 2 * m * g * c : 2 * (m + 1) * g * c], w,
                preferred_element_type=jnp.float32,
            )
    elif layout == LAYOUT_ILV:
        m_steps = half // g  # = QK // 2
        for m in range(m_steps):
            p = p_ref[m * g : (m + 1) * g, :].astype(jnp.int32)
            w_lo = (((p << 28) >> 28).astype(mul_dtype) * s).astype(dot_dtype)
            w_hi = ((p >> 4).astype(mul_dtype) * s).astype(dot_dtype)
            acc += jnp.dot(
                x[:, m * g : (m + 1) * g], w_lo, preferred_element_type=jnp.float32
            )
            acc += jnp.dot(
                x[:, half + m * g : half + (m + 1) * g],
                w_hi,
                preferred_element_type=jnp.float32,
            )
    else:
        p = p_ref[:].astype(jnp.int32)
        hi = (p >> 4).astype(mul_dtype)
        lo = ((p << 28) >> 28).astype(mul_dtype)
        s_lo = jnp.repeat(s[: g // 2], QK, axis=0)
        s_hi = jnp.repeat(s[g // 2 :], QK, axis=0)
        w_lo = (lo * s_lo).astype(dot_dtype)
        w_hi = (hi * s_hi).astype(dot_dtype)
        acc = jnp.dot(x[:, :half], w_lo, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(x[:, half:], w_hi, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def quantize_act_blocks(xf: jax.Array):
    """Per-32-block symmetric int8 activation quantization (the TPU analog of
    the reference's INIT-phase activation quantization feeding
    ggml_vec_dot_q4_0, ggml.c:1817 + ggml.c:6510-6684 — which uses int8
    activations against int4 weights exactly like this).

    xf [B, K] -> xq [QK, G, B] int8, sx [G, B] f32 with
    x[b, g*QK + m] ~= xq[m, g, b] * sx[g, b]. The [QK, G, B] layout lines the
    contraction axis up with the kernel's [2M, G, BN] nibble planes so the
    batched int8 dot needs no in-kernel transpose."""
    b, k = xf.shape
    g = k // QK
    xb = xf.astype(jnp.float32).reshape(b, g, QK)
    amax = jnp.max(jnp.abs(xb), axis=-1)  # [B, G]
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xb / sx[..., None]), -127, 127).astype(jnp.int8)
    return xq.transpose(2, 1, 0), sx.T


def _kernel_q4_i8(xq_ref, sx_ref, p_ref, s_ref, o_ref):
    """int8-MXU fused dequant+matmul (ilv layout, Q4_0 only).

    Per-weight VPU work is ONLY nibble extraction (int8 in, int8 out); the
    multiply-accumulate runs int8 x int8 -> int32 on the MXU as one
    dot_general batched over quantization groups, and both scale sets fold
    in AFTER the dot:  y[b,n] = sum_g sx[g,b] * s[g,n] * D[g,b,n].

    MEASURED NEGATIVE RESULT (v5e, 2026-08-18, tools/bench_int8_mxu.py):
    Mosaic cannot compile the group-BATCHED int8 dot_general on real
    hardware (tpu_compile_helper internal error; plain 2-D int8 dots DO
    compile, tools/bench_unpack2.py i8dot2d). The same structure with bf16
    dots compiles but is SLOWER than the production shift-unpack kernel
    (~470 vs ~565 GB/s) — the batched [G, B, BN] accumulator defeats XLA's
    MXU tiling. Exact Q4_0 numerics fundamentally need the per-group
    partial sums (both scale sets vary along the contraction), so there is
    no 2-D reformulation; this path stays interpret/CPU-only until Mosaic
    grows batched integer dots. Kept for the NumPy/interpret twin tests."""
    half, bn = p_ref.shape
    g = s_ref.shape[0]
    m = half // g  # QK // 2
    p = p_ref[:].astype(jnp.int32).reshape(m, g, bn)
    lo = ((p << 28) >> 28).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=0)  # [2M, G, BN] int8 nibble values
    xq = xq_ref[:]  # [2M, G, BB] int8
    d = jax.lax.dot_general(
        xq, w, (((0,), (0,)), ((1,), (1,))), preferred_element_type=jnp.int32
    )  # [G, BB, BN] int32
    sx = sx_ref[:].astype(jnp.float32)  # [G, BB]
    s = s_ref[:].astype(jnp.float32)  # [G, BN]
    o_ref[:] = (
        (d.astype(jnp.float32) * sx[:, :, None] * s[:, None, :])
        .sum(axis=0)
        .astype(o_ref.dtype)
    )


def _kernel_q4_i8_stacked(idx_ref, xq_ref, sx_ref, p_ref, s_ref, o_ref):
    del idx_ref
    _kernel_q4_i8(xq_ref, sx_ref, p_ref.at[0], s_ref.at[0], o_ref.at[0])


def _chunk_matmul_i8(xq, sx, packed, scales, layer_idx, c: int, bn: int):
    """One packed chunk on the int8-MXU path. xq [2M, Gc, BP] int8 and
    sx [Gc, BP] f32 are this chunk's pre-quantized activations; the batch is
    NOT tiled (the path is decode-only, BP <= _I8_MAX_B). layer_idx None =
    flat [K/2, N] weights; else stacked [L, K/2, N] selected by prefetch."""
    mm, gc, bp = xq.shape
    half = mm // 2 * gc
    npad = packed.shape[-1]
    grid = (npad // bn,)
    cost = pl.CostEstimate(
        flops=2 * bp * (mm * gc) * npad,
        bytes_accessed=half * npad + 4 * gc * npad + mm * gc * bp + 4 * bp * npad,
        transcendentals=0,
    )
    if layer_idx is None:
        return pl.pallas_call(
            _kernel_q4_i8,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((bp, npad), jnp.float32),
            in_specs=[
                pl.BlockSpec((mm, gc, bp), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gc, bp), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((half, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gc, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bp, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            cost_estimate=cost,
            interpret=interpret_mode(),
        )(xq, sx, packed, scales)
    return pl.pallas_call(
        _kernel_q4_i8_stacked,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mm, gc, bp), lambda j, idx: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gc, bp), lambda j, idx: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, half, bn), lambda j, idx: (idx[0], c, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gc, bn), lambda j, idx: (idx[0], c, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bp, bn), lambda j, idx: (0, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, bp, npad), jnp.float32),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xq, sx, packed, scales)[0]


def _kernel_q4_stacked(
    idx_ref, x_ref, p_ref, s_ref, o_ref, *, layout, mul_dtype, unpack
):
    """Stacked-weight kernel body: weight/output refs carry a leading
    singleton layer dim (the index_map already selected layer idx_ref[0]);
    delegate to the flat kernel through sub-refs."""
    del idx_ref
    _kernel_q4(
        x_ref, p_ref.at[0], s_ref.at[0], o_ref.at[0],
        layout=layout, mul_dtype=mul_dtype, unpack=unpack,
    )


def _chunk_matmul_stacked(
    xc, packed, scales, layer_idx, c: int, bn: int, bb: int, layout, out_dtype,
    mul_dtype, unpack="shift",
):
    """One packed chunk of a STACKED weight [L, K/2, N], layer chosen by a
    scalar-prefetch index inside the BlockSpec index_map.

    This is the reason decode reaches HBM roofline: a `lax.scan` over layers
    that slices the stacked array with dynamic-slice makes XLA materialize a
    full copy of every layer's packed weights before each kernel (measured
    ~5 ms/token on 7B — a third of the step). Indexing in the index_map
    streams tiles straight from the stacked array instead.
    """
    bp, kc = xc.shape
    L, half_full, npad = packed.shape
    g_full = scales.shape[1]
    # packed rows per chunk: int4 planes (LAYOUT_I4) carry one row per
    # element (xc width == storage width), byte planes pack two per row
    half = kc if layout == LAYOUT_I4 else kc // 2
    g = kc // QK
    grid = (bp // bb, npad // bn)
    cost = pl.CostEstimate(
        flops=2 * bp * kc * npad,
        bytes_accessed=kc // 2 * npad + 2 * g * npad + 2 * bp * kc
        + 4 * bp * npad,
        transcendentals=0,
    )
    # block indices are in units of the block shape; chunk c's rows start at
    # element c*half = block index c (block dim = half), same for scales
    return pl.pallas_call(
        functools.partial(
            _kernel_q4_stacked, layout=layout, mul_dtype=mul_dtype, unpack=unpack
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bb, kc), lambda i, j, idx: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, half, bn),
                    lambda i, j, idx: (idx[0], c, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, g, bn),
                    lambda i, j, idx: (idx[0], c, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bb, bn), lambda i, j, idx: (0, i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((1, bp, npad), out_dtype),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), xc, packed, scales)[0]


def _chunk_matmul(
    xc, packed, scales, bn: int, bb: int, layout: str, out_dtype, mul_dtype,
    unpack="shift",
):
    """One packed chunk: xc [BP, Kc] (storage order), packed [Kc/2, NP]."""
    bp, kc = xc.shape
    half, npad = packed.shape
    g = scales.shape[0]
    grid = (bp // bb, npad // bn)
    cost = pl.CostEstimate(
        flops=2 * bp * kc * npad,
        bytes_accessed=half * npad + 2 * g * npad + 2 * bp * kc + 4 * bp * npad,
        transcendentals=0,
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_q4, layout=layout, mul_dtype=mul_dtype, unpack=unpack
        ),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((bp, npad), out_dtype),
        in_specs=[
            pl.BlockSpec((bb, kc), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=cost,
        interpret=interpret_mode(),
    )(xc, packed, scales)


# defaults tunable via env for end-to-end A/B runs (bench.py).
# MEASURED NULL RESULT (v5e, 2026-08-19): bn2048 wins STANDALONE kernel A/Bs
# by ~15% at B=1 (wqkv 870 vs ~640 GB/s; layer-matmul sum 6.30 vs 7.29 ms,
# tools/bench_{kernels,bn_sweep}.py) but end-to-end decode is UNCHANGED
# (bench.py 7.87 ms/step with a bn2048 decode default vs 7.76 at bn512):
# in-program, XLA already overlaps the next matmul's weight DMA with the
# current kernel, which is exactly what the larger tile buys standalone.
# The default therefore stays 512 everywhere; _pick_bn is the seam where a
# per-(batch, shape) table would go if a future config shows an E2E win.
_ENV_BN = int(os.environ.get("LLAMAVK_Q4_BN", "0"))


def _pick_bn(b: int) -> int:
    """Default N-tile request for a flattened batch of b rows (env wins).

    `b` is RESERVED for the future per-(batch, shape) table described above
    — every measured config so far picks the same 512, so it is unused."""
    del b
    return _ENV_BN or 512


_ENV_BB = int(os.environ.get("LLAMAVK_Q4_BB", "512"))
_ENV_MUL = (
    jnp.bfloat16 if os.environ.get("LLAMAVK_Q4_MUL", "f32") == "bf16" else jnp.float32
)
# bf16 = VPU dequant + bf16 MXU dot; i8 = int8 activation quant + int8 MXU
# dot with post-dot scale fold (decode batches only, see _I8_MAX_B).
# f32 = feed the f32 dequant product straight to the MXU (skips the bf16
# pack, ~1 VPU op/weight): measured +2% single-stream decode on int4
# planes (6.36 vs 6.49 ms/step, v5e r4) but SLOWER wherever the MXU
# matters (prefill 56.1 vs 54.0 ms/chunk; batch-64 serving would be
# f32-FLOP-bound). Not batch-gated because the dot dtype changes numerics
# and every exact-stream invariant (batched==single, lookup==plain)
# requires ONE dtype per process — opt in per deployment for
# latency-critical single-stream serving.
_ENV_DOT = os.environ.get("LLAMAVK_Q4_DOT", "bf16")
# scoped-VMEM budget per kernel instance (v5e exposes ~16 MB; leave headroom)
_VMEM_BUDGET = 10 * 1024 * 1024
# int8 path: batch cap — the [G, B, BN] int32 group-dot accumulator lives in
# VMEM, so the path is for decode-shaped batches; prefill keeps bf16
_I8_MAX_B = 64


def _i8_vmem_need(bn: int, half: int, gc: int, bp: int) -> int:
    packed = half * bn
    w = 2 * half * bn  # unpacked nibble planes, int8
    d = gc * bp * bn * 8  # group-dot accumulator int32 + its f32 convert
    s = gc * bn * 4
    out = bp * bn * 4
    return packed + w + d + s + out


def _fit_bn_i8(bn: int, half: int, gc: int, bp: int) -> int:
    """Shrink the N tile until the int8 kernel's VMEM working set fits;
    returns 0 when even bn=128 does not fit (caller falls back to bf16)."""
    while bn > 128 and _i8_vmem_need(bn, half, gc, bp) > _VMEM_BUDGET:
        bn //= 2
    if _i8_vmem_need(bn, half, gc, bp) > _VMEM_BUDGET:
        return 0
    return bn


def _q4_matmul_i8(xf, qw, stacked, layer_idx, k, n, g, chunks, out_dtype, lead):
    """int8-MXU decode path: quantize activations per 32-block, run the
    batched int8 group dot, fold both scale sets after."""
    b = xf.shape[0]
    kc = k // chunks
    gc = g // chunks
    half = kc // 2
    bp = _round_up(max(b, 8), 8)
    if bp != b:
        xf = jnp.pad(xf, ((0, bp - b), (0, 0)))
    xq, sx = quantize_act_blocks(xf)  # [QK, G, BP] int8, [G, BP] f32

    bn = _fit_bn_i8(min(_pick_bn(b), _round_up(n, 128)), half, gc, bp)
    if bn == 0:
        return None  # working set too large even at bn=128 (big K x big B):
        # caller falls back to the bf16 path
    bn_div = bn
    while bn_div >= 128 and (n % bn_div or bn_div % 128):
        bn_div -= 128
    npad = n
    packed, scales = qw.packed, qw.scales
    if bn_div >= 128:
        bn = bn_div
    elif stacked:
        return None  # cannot pad a stacked weight per-call; caller falls back
    else:
        npad = _round_up(n, bn)
        packed = jnp.pad(packed, ((0, 0), (0, npad - n)))
        scales = jnp.pad(scales, ((0, 0), (0, npad - n)))

    y = None
    for c in range(chunks):
        xq_c = xq[:, c * gc : (c + 1) * gc, :]
        sx_c = sx[c * gc : (c + 1) * gc, :]
        if stacked:
            yc = _chunk_matmul_i8(xq_c, sx_c, packed, scales, layer_idx, c, bn)
        else:
            yc = _chunk_matmul_i8(
                xq_c, sx_c,
                packed[c * half : (c + 1) * half],
                scales[c * gc : (c + 1) * gc],
                None, c, bn,
            )
        y = yc if y is None else y + yc
    return y[:b, :n].astype(out_dtype).reshape(*lead, n)


def _check_i8_supported() -> None:
    """dot_mode="i8" cannot run on real TPU hardware: Mosaic fails to
    compile the group-BATCHED int8 dot_general (tpu_compile_helper internal
    error, measured 2026-08-18 on v5e — see _kernel_q4_i8 and
    tools/bench_int8_mxu.py, the go/no-go probe to re-run after toolchain
    updates). Fail loudly at trace time instead of shipping a kernel the
    backend will reject (VERDICT r3 #7)."""
    if interpret_mode():
        return
    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "tpu":
        raise NotImplementedError(
            "dot_mode='i8' (LLAMAVK_Q4_DOT=i8) is not compilable on TPU: "
            "Mosaic lacks batched int8 group dots (measured 2026-08-18). "
            "Use the default bf16 path, or re-probe with "
            "tools/bench_int8_mxu.py after a toolchain update. The i8 path "
            "remains available in Pallas interpret mode (CPU tests)."
        )


def _fit_bn(bn: int, kc: int, g: int, bb: int) -> int:
    """Shrink the N tile until the kernel's VMEM working set fits."""
    def need(bn_):
        packed = kc // 2 * bn_  # int8 tile
        scales = g * bn_ * 4
        x = bb * kc * 2
        out = bb * bn_ * 4
        temps = 4 * g * bn_ * 4  # unpack/scale intermediates (f32 worst case)
        return packed + scales + x + out + temps

    while bn > 128 and need(bn) > _VMEM_BUDGET:
        bn //= 2
    return bn


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_n", "block_b", "use_ref", "mul_dtype",
                     "dot_mode"),
)
def q4_matmul(
    x: jax.Array,
    qw: QWeight,
    out_dtype=jnp.bfloat16,
    block_n: int | None = None,
    block_b: int | None = None,
    use_ref: bool = False,
    mul_dtype=None,
    dot_mode: str | None = None,
    layer_idx: jax.Array | None = None,
) -> jax.Array:
    """y = x @ W for a packed QWeight. x: [..., K] (any leading dims).

    layer_idx: when given, qw's leaves are STACKED over a leading layer dim
    ([L, K/2, N] / [L, G, N]) and the kernel streams layer `layer_idx`'s
    tiles directly from the stacked arrays (no dynamic-slice copy — see
    _chunk_matmul_stacked)."""
    if use_ref:
        if layer_idx is not None:
            qw = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, False), qw
            )
        return q4_matmul_ref(x, qw, out_dtype=out_dtype)
    if block_b is None:
        block_b = _ENV_BB
    if mul_dtype is None:
        mul_dtype = _ENV_MUL
    stacked = layer_idx is not None
    chunks = qw.chunks
    i4 = qw.layout == LAYOUT_I4
    if i4:
        # int4-plane storage: the plane rows are group-PADDED, so the
        # logical K comes from x; per-chunk storage width is QK * Gp.
        # N may be storage-padded too (qweight_to_i4 pad_n): tiles run over
        # the padded width, outputs slice back to the real n_orig.
        # f32 scale mul is the measured-fastest variant (bf16 mul is
        # SLOWER here — tools/bench_i4_stacked.py i4st vs i4st_bf16).
        mul_dtype = jnp.float32
        k = x.shape[-1]
        n_stor = qw.packed.shape[-1]
        n = qw.n_orig or n_stor
        g = qw.scales.shape[-2]  # chunks * Gp
        assert g // chunks == i4_group_pad((k // chunks) // QK), (k, g, chunks)
    elif stacked:
        k = 2 * qw.packed.shape[-2]
        n = n_stor = qw.packed.shape[-1]
        g = qw.scales.shape[-2]
    else:
        k, n, g = qw.k, qw.n, qw.g
        n_stor = n
    kc = k // chunks
    # per-chunk STORAGE rows of x/packed (i4st pads groups to 128)
    kc_eff = QK * (g // chunks) if i4 else kc
    lead = x.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    xf = x.reshape(b, k).astype(jnp.bfloat16)
    if block_n is None:
        # int4 planes halve the weight-tile bytes, so the DMA-efficiency
        # sweet spot doubles at DECODE batches: bn1024 measured 149.4 tok/s
        # E2E vs 146.1 at 512 (bn2048 regresses to 143.0 — v5e B=1,
        # 2026-08-20). Prefill-sized batches keep 512 (bigger x/out tiles
        # already amortize the DMA; 1024 measured prefill 54.0 vs 51.3
        # ms/chunk). bn only splits N — outputs are bitwise identical
        # across bn, so a batch-dependent default cannot flip streams.
        # The byte path keeps 512 everywhere (bn2048 was a r3 null result).
        block_n = _ENV_BN or (1024 if (i4 and b <= 64) else _pick_bn(b))
    mode = dot_mode or _ENV_DOT
    # "i4": int4-bitcast unpack of the SAME ilv byte plane (see _kernel_q4)
    unpack = "i4" if (mode == "i4" and qw.layout == LAYOUT_ILV) else "shift"

    if mode == "i8":
        _check_i8_supported()
    if (
        mode == "i8"
        and qw.bias is None
        and qw.layout == LAYOUT_ILV
        and b <= _I8_MAX_B
        # VMEM pre-check at the gate: when the int8 working set cannot fit
        # (big K x batch near the cap), fall through to the NORMAL paths —
        # crucially keeping `stacked` so the bf16 stacked streaming stays
        and _fit_bn_i8(
            min(_pick_bn(b), _round_up(n, 128)),
            (k // chunks) // 2, g // chunks, _round_up(max(b, 8), 8),
        ) > 0
    ):
        y = _q4_matmul_i8(
            xf, qw, stacked, layer_idx, k, n, g, chunks, out_dtype, lead
        )
        if y is not None:
            return y
        if stacked:
            # un-tileable N on the stacked path: slice the layer out and fall
            # through to the flat bf16 path
            qw = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, False),
                qw,
            )
            stacked = False

    if stacked:
        # the stacked path tiles N without padding; need a lane-aligned tile
        # that divides N exactly (true for every LLaMA matmul width)
        bp = _round_up(max(b, 8), 8)
        bb = min(block_b, bp)
        while bb > 8 and bb * kc_eff * 2 > 6 * 1024 * 1024:
            bb //= 2  # keep the activation tile within VMEM for large K
        bn = _fit_bn(min(block_n, n_stor), kc_eff, g // chunks, bb)
        while bn >= 128 and (n_stor % bn or bn % 128):
            bn -= 128
        if bn < 128:
            # fall back: slice this layer out and use the flat path
            qw = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, False), qw
            )
            stacked = False
        else:
            xg = (
                _group_sums(xf.astype(jnp.float32), k).astype(jnp.bfloat16)
                if qw.bias is not None
                else None
            )
            if i4:
                xf = to_i4st(xf, k, chunks, g // chunks)
            elif qw.layout == LAYOUT_ILV:
                xf = to_i4lv(xf, k, chunks) if unpack == "i4" else to_ilv(
                    xf, k, chunks
                )
            bp_pad = _round_up(bp, bb)
            if bp_pad != b:
                xf = jnp.pad(xf, ((0, bp_pad - b), (0, 0)))
            gc = g // chunks
            y = None
            for c in range(chunks):
                yc = _chunk_matmul_stacked(
                    xf[:, c * kc_eff : (c + 1) * kc_eff],
                    qw.packed,
                    qw.scales,
                    layer_idx,
                    c,
                    bn,
                    bb,
                    qw.layout,
                    jnp.float32,
                    mul_dtype,
                    unpack,
                )
                y = yc if y is None else y + yc
            y = y[:b, :n]
            if qw.bias is not None:
                bias_l = jax.lax.dynamic_index_in_dim(qw.bias, layer_idx, 0, False)
                y = y + jnp.dot(
                    xg[:b], bias_l.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            return y.astype(out_dtype).reshape(*lead, n)

    xg = (
        _group_sums(xf.astype(jnp.float32), k).astype(jnp.bfloat16)
        if qw.bias is not None
        else None
    )
    if i4:
        xf = to_i4st(xf, k, chunks, g // chunks)
    elif qw.layout == LAYOUT_ILV:
        xf = to_i4lv(xf, k, chunks) if unpack == "i4" else to_ilv(xf, k, chunks)

    # pad batch to a sublane multiple; pad N to a lane multiple
    bp = _round_up(max(b, 8), 8)
    bn = min(block_n, _round_up(n_stor, 128))
    bb = min(block_b, bp)
    while bb > 8 and bb * kc_eff * 2 > 6 * 1024 * 1024:
        bb //= 2  # keep the activation tile within VMEM for large K
    bn = _fit_bn(bn, kc_eff, g // chunks, bb)
    # prefer a tile that divides N exactly: XLA otherwise pads the packed
    # weight + scales on every call (measured ~0.45 ms/token on the 32000-wide
    # logits matmul, which 512 does not divide)
    bn_div = bn
    while bn_div >= 128 and (n_stor % bn_div or bn_div % 128):
        bn_div -= 128
    if bn_div >= 128:
        bn = bn_div
    npad = _round_up(n_stor, bn)
    bp = _round_up(bp, bb)
    if bp != b:
        xf = jnp.pad(xf, ((0, bp - b), (0, 0)))
    packed, scales = qw.packed, qw.scales
    if npad != n_stor:
        packed = jnp.pad(packed, ((0, 0), (0, npad - n_stor)))
        scales = jnp.pad(scales, ((0, 0), (0, npad - n_stor)))

    gc = g // chunks
    prows = kc_eff if i4 else kc_eff // 2  # packed rows per chunk
    y = None
    for c in range(chunks):
        yc = _chunk_matmul(
            xf[:, c * kc_eff : (c + 1) * kc_eff],
            packed[c * prows : (c + 1) * prows],
            scales[c * gc : (c + 1) * gc],
            bn,
            bb,
            qw.layout,
            jnp.float32,
            mul_dtype,
            unpack,
        )
        y = yc if y is None else y + yc
    y = y[:b, :n]
    if qw.bias is not None:
        # Q4_1 affine term: sum_k x_k * bias[group(k), n]
        y = y + jnp.dot(
            xg[:b], qw.bias.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    return y.astype(out_dtype).reshape(*lead, n)
