"""Flat-work-list decode attention: ONE Pallas program per layer.

Why: the grid decode kernel (ops/flash_attn.py) runs one program per batch
row, and each program pays its own exposed DMA startup latency (issue the
first block fetch, wait, compute) plus program setup. At B=1 that is one
program and decode hits 74% of HBM speed-of-light — but at serving batch
sizes the per-program overhead multiplies: B=32 int8 decode attention
measured 9.35 ms read-only against a ~5.9 ms roofline, and the paged
serving config (page_size 64 → 64-row KV blocks) multiplies the block count
per program by another 4x (tools/diag_step_decomp.py --attn-sweep, r5).

Design: flatten ALL (batch row, KV block) work items of a decode step into
one list and run a single program that loops over it with double-buffered
DMA across ITEMS — the fetch of item j+1 (even when it belongs to a
different batch row) overlaps the compute of item j, so per-item latency is
paid once per kernel instead of once per row. The online-softmax carry
resets at each row's first block (items of a row are consecutive), and the
finished row's output writes to its slice of a whole-VMEM output block.
Cache writes (the fused RMW insert of the new K/V row, quantize for int8)
run as a first phase with the same cross-row pipelining: read window r+1
while merging r, write back r while reading r+2.

Block partitioning, masking, and f32 accumulation order are IDENTICAL to
the grid kernel at the same block_k, so token streams are bit-comparable
with the existing engine (the tests assert byte-equal caches and equal
outputs).

Reference seam: this replaces the same per-token attention pass as the
reference's KernelThinFp16Attention (vulkan/llama-vk.hlsl:343-699) — its
occupancy design point is workgroups-per-head; the TPU analog of "keep the
machine busy" is keeping the DMA queue full across rows, which a
one-program work list does and a per-row grid cannot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attn import _fit_block_k
from .pallas_backend import interpret_mode

_NEG = -1e30


def decode_work_list(n_past: jax.Array, b: int, cap: int, bk: int):
    """Flatten per-row ragged block counts into (row_of, blk_of, total).

    Row r owns ceil(min(n_past[r]+1, cap)/bk) consecutive items (its KV
    blocks in ascending order — the grid kernel's accumulation order).
    Arrays are padded to the static MAXJ = b * cap/bk with the last row."""
    maxj = b * (cap // bk)
    nb = -(-jnp.minimum(n_past + 1, cap) // bk)  # [B] >= 1
    ends = jnp.cumsum(nb)
    j = jnp.arange(maxj, dtype=jnp.int32)
    row_of = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    row_of = jnp.minimum(row_of, b - 1)
    starts = ends - nb
    blk_of = (j - starts[row_of]).astype(jnp.int32)
    return row_of, blk_of, ends[-1].astype(jnp.int32)


def _flat_kernel(*args, quantized: bool, paged: bool, block_k: int,
                 scale: float, maxj: int):
    it = iter(args)
    idx_ref, npast_ref, boff_ref, total_ref, row_ref, blk_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it)
    )
    ptab_ref = next(it) if paged else None
    q_ref, knew_ref, vnew_ref = next(it), next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased with *_out
    if quantized:
        _ks_in, _vs_in = next(it), next(it)
    o_ref = next(it)
    k_out, v_out = next(it), next(it)
    ks_out = vs_out = None
    if quantized:
        ks_out, vs_out = next(it), next(it)
    kbuf, vbuf, rsems = next(it), next(it), next(it)
    ksbuf = vsbuf = ssems = None
    if quantized:
        ksbuf, vsbuf, ssems = next(it), next(it), next(it)
    kwin, vwin, wrsems, wbsems = next(it), next(it), next(it), next(it)
    if quantized:
        kswin, vswin, srsems, sbsems = next(it), next(it), next(it), next(it)

    layer = idx_ref[0]
    boff = boff_ref[0]
    total = total_ref[0]
    bq, h, d = q_ref.shape
    s_total = k_out.shape[3]
    step = 32 if quantized else 8
    w = kwin.shape[2]  # window rows (== step at bt=1)
    bk = block_k

    # ---------------------------------------------------------------- phase 1
    # pipelined RMW insert of each row's new K/V row (and scales) at
    # position n_past[r]: read window r+1 while merging r, write back r
    # while reading r+2 (disjoint windows — distinct cache rows).
    def wloc(r):
        start = npast_ref[r]
        if paged:
            ps = s_total
            pidx = start // ps
            page = ptab_ref[boff + r, pidx]
            inpage = start - pidx * ps
            win0 = jnp.minimum((inpage // step) * step, ps - w)
            return page, pl.multiple_of(win0, step), inpage - win0
        win0 = jnp.minimum((start // step) * step, s_total - w)
        return boff + r, pl.multiple_of(win0, step), start - win0

    def win_at(src, r):
        row, win0, _ = wloc(r)
        return src.at[layer, row, :, pl.ds(win0, w), :]

    def wread(slot, r):
        return [
            pltpu.make_async_copy(win_at(k_out, r), kwin.at[slot], wrsems.at[0, slot]),
            pltpu.make_async_copy(win_at(v_out, r), vwin.at[slot], wrsems.at[1, slot]),
        ]

    def wback(slot, r):
        return [
            pltpu.make_async_copy(kwin.at[slot], win_at(k_out, r), wbsems.at[0, slot]),
            pltpu.make_async_copy(vwin.at[slot], win_at(v_out, r), wbsems.at[1, slot]),
        ]

    if quantized:
        ws = kswin.shape[1]  # scale window rows (8 at bt=1)

        def sloc(r):
            start = npast_ref[r]
            s_rows = ks_out.shape[2]
            if paged:
                sp = start // s_rows
                srow = ptab_ref[boff + r, sp]
                sstart = start - sp * s_rows
            else:
                srow, sstart = boff + r, start
            swin0 = jnp.minimum((sstart // 8) * 8, s_rows - ws)
            return srow, pl.multiple_of(swin0, 8), sstart - swin0

        def swin_at(src, r):
            srow, swin0, _ = sloc(r)
            return src.at[layer, srow, pl.ds(swin0, ws), :]

        def sread(slot, r):
            return [
                pltpu.make_async_copy(swin_at(ks_out, r), kswin.at[slot], srsems.at[0, slot]),
                pltpu.make_async_copy(swin_at(vs_out, r), vswin.at[slot], srsems.at[1, slot]),
            ]

        def sback(slot, r):
            return [
                pltpu.make_async_copy(kswin.at[slot], swin_at(ks_out, r), sbsems.at[0, slot]),
                pltpu.make_async_copy(vswin.at[slot], swin_at(vs_out, r), sbsems.at[1, slot]),
            ]

        n_lanes = ks_out.shape[3]
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1)
        own_lane = lane_h < h  # [1, Hs]
        # one-hot head->lane scatter matrix (hg == h here; lane j <- head j)
        onehot_w = (
            jax.lax.broadcasted_iota(jnp.int32, (h, n_lanes), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (h, n_lanes), 0)
        ).astype(jnp.float32)

    def all_wread(slot, r):
        return wread(slot, r) + (sread(slot, r) if quantized else [])

    def all_wback(slot, r):
        return wback(slot, r) + (sback(slot, r) if quantized else [])

    for c in all_wread(0, 0):
        c.start()

    def wbody(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < bq)
        def _():
            @pl.when(r >= 1)
            def _():
                for c in all_wback(1 - slot, r - 1):
                    c.wait()
            for c in all_wread(1 - slot, r + 1):
                c.start()

        for c in all_wread(slot, r):
            c.wait()

        if quantized:
            kf = knew_ref[r].astype(jnp.float32)  # [H, D]
            vf = vnew_ref[r].astype(jnp.float32)
            kamax = jnp.max(jnp.abs(kf), axis=-1)
            vamax = jnp.max(jnp.abs(vf), axis=-1)
            ksc = jnp.where(kamax > 0, kamax / 127.0, 1.0)
            vsc = jnp.where(vamax > 0, vamax / 127.0, 1.0)
            k_row = jnp.clip(jnp.round(kf / ksc[..., None]), -127, 127).astype(jnp.int8)
            v_row = jnp.clip(jnp.round(vf / vsc[..., None]), -127, 127).astype(jnp.int8)
        else:
            k_row = knew_ref[r]
            v_row = vnew_ref[r]

        _, _, off = wloc(r)

        def merge(o):
            def _do():
                kwin[slot, :, o, :] = k_row
                vwin[slot, :, o, :] = v_row
            return _do

        jax.lax.switch(off, [merge(o) for o in range(w)])

        if quantized:
            # scatter the [H] scale vectors to head lanes of one [Hs] row
            # (exact f32, same math as the grid kernel's one-hot scatter)
            k_sc_l = jax.lax.dot_general(
                ksc[None, :], onehot_w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [1, Hs]
            v_sc_l = jax.lax.dot_general(
                vsc[None, :], onehot_w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            _, _, soff = sloc(r)

            def smerge(o):
                def _do():
                    kswin[slot, o : o + 1, :] = jnp.where(
                        own_lane, k_sc_l, kswin[slot, o : o + 1, :]
                    )
                    vswin[slot, o : o + 1, :] = jnp.where(
                        own_lane, v_sc_l, vswin[slot, o : o + 1, :]
                    )
                return _do

            jax.lax.switch(soff, [smerge(o) for o in range(ws)])

        for c in all_wback(slot, r):
            c.start()
        return 0

    jax.lax.fori_loop(0, bq, wbody, 0)
    for r in range(max(bq - 2, 0), bq):
        for c in all_wback(r % 2, r):
            c.wait()

    # ---------------------------------------------------------------- phase 2
    # flattened attend loop: item j = (row_of[j], blk_of[j]); fetch j+1
    # while computing j. All writes above completed, so reads see the
    # updated cache.
    bpp = (s_total // bk) if paged else 1

    def kv_src(hbm, r, i):
        if paged:
            return hbm.at[layer, ptab_ref[boff + r, i // bpp], :,
                          pl.ds((i % bpp) * bk, bk), :]
        return hbm.at[layer, boff + r, :, pl.ds(i * bk, bk), :]

    def s_src(hbm, r, i):
        if paged:
            return hbm.at[layer, ptab_ref[boff + r, i // bpp],
                          pl.ds((i % bpp) * bk, bk), :]
        return hbm.at[layer, boff + r, pl.ds(i * bk, bk), :]

    def fetch(slot, j):
        r = row_ref[j]
        i = blk_ref[j]
        cs = [
            pltpu.make_async_copy(kv_src(k_out, r, i), kbuf.at[slot], rsems.at[0, slot]),
            pltpu.make_async_copy(kv_src(v_out, r, i), vbuf.at[slot], rsems.at[1, slot]),
        ]
        if quantized:
            cs += [
                pltpu.make_async_copy(s_src(ks_out, r, i), ksbuf.at[slot], ssems.at[0, slot]),
                pltpu.make_async_copy(s_src(vs_out, r, i), vsbuf.at[slot], ssems.at[1, slot]),
            ]
        return cs

    @pl.when(total > 0)
    def _():
        for c in fetch(0, 0):
            c.start()

    if quantized:
        n_heads = ks_out.shape[3]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (h, n_heads), 0)
        ).astype(jnp.float32)

    m0 = jnp.full((h, 1, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((h, 1, 1), jnp.float32)
    a0 = jnp.zeros((h, 1, d), jnp.float32)

    def abody(j, carry):
        m, l, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < total)
        def _():
            for c in fetch(1 - slot, j + 1):
                c.start()

        for c in fetch(slot, j):
            c.wait()

        r = row_ref[j]
        i = blk_ref[j]
        first = i == 0
        m = jnp.where(first, m0, m)
        l = jnp.where(first, l0, l)
        acc = jnp.where(first, a0, acc)

        q = q_ref[r].astype(jnp.float32)[:, None, :] * scale  # [H, 1, D]
        kk = kbuf[slot]  # [H, BK, D]
        mul_dtype = jnp.bfloat16 if quantized else kk.dtype
        s = jax.lax.dot_general(
            q.astype(mul_dtype), kk.astype(mul_dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, 1, BK]
        if quantized:
            ksc = jax.lax.dot_general(
                onehot, ksbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [H, BK]
            s = s * ksc[:, None, :]
        col = i * bk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, bk), 2)
        s = jnp.where(col <= npast_ref[r], s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            vsc = jax.lax.dot_general(
                onehot, vsbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            p = p * vsc[:, None, :]
        vv = vbuf[slot]
        vmul = jnp.bfloat16 if quantized else vv.dtype
        pv = jax.lax.dot_general(
            p.astype(vmul), vv.astype(vmul),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, 1, D]
        acc_new = acc * alpha + pv

        nxt = row_ref[jnp.minimum(j + 1, maxj - 1)]
        last = (j + 1 >= total) | (nxt != r)

        @pl.when(last)
        def _():
            o_ref[pl.ds(r, 1)] = (acc_new / l_new).astype(o_ref.dtype)[:, 0, :][None]

        return m_new, l_new, acc_new

    jax.lax.fori_loop(0, total, abody, (m0, l0, a0))


@functools.partial(
    jax.jit,
    static_argnames=("block_k",),
)
def flash_decode_update(
    q: jax.Array,  # [B, 1, H, D]
    k_new: jax.Array,  # [B, 1, H, D]
    v_new: jax.Array,
    k: jax.Array,  # stacked cache [L, B, H, S, D] or page pool [L, NP, H, PS, D]
    v: jax.Array,
    n_past: jax.Array,  # scalar or [B] int32
    layer_idx: jax.Array,
    block_k: int = 256,
    k_scale: jax.Array | None = None,  # [L, B, S, H] / [L, NP, PS, H]
    v_scale: jax.Array | None = None,
    page_table: jax.Array | None = None,  # [B, MAXLB] int32
    batch_offset: jax.Array | int = 0,
):
    """Single-token fused cache-insert + attention, flat work list (see
    module docstring). Drop-in for flash_attention_update at t == 1 on
    non-ring, non-prefix caches; identical accumulation order at equal
    block_k. Returns (out [B,1,H,D] f32, k, v[, k_scale, v_scale])."""
    quantized = k_scale is not None
    paged = page_table is not None
    b, t, h, d = q.shape
    assert t == 1, "flash_decode_update is the single-token decode path"
    s = k.shape[3]
    step = 32 if quantized else 8
    bk = _fit_block_k(block_k, s, step=step)
    cap = page_table.shape[1] * s if paged else s
    npast_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))
    row_of, blk_of, total = decode_work_list(npast_vec, b, cap, bk)
    maxj = b * (cap // bk)

    qt = q[:, 0].astype(jnp.bfloat16)  # [B, H, D]
    knt = k_new[:, 0]
    vnt = v_new[:, 0]
    if not quantized:
        knt = knt.astype(k.dtype)
        vnt = vnt.astype(v.dtype)
    else:
        knt = knt.astype(jnp.bfloat16)
        vnt = vnt.astype(jnp.bfloat16)

    kernel = functools.partial(
        _flat_kernel, quantized=quantized, paged=paged, block_k=bk,
        scale=1.0 / (d**0.5), maxj=maxj,
    )
    n_scalars = 6 + paged
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [vmem, vmem, vmem, any_spec, any_spec]
    out_specs = [vmem, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    operands = [qt, knt, vnt, k, v]
    aliases = {n_scalars + 3: 1, n_scalars + 4: 2}
    w = step  # RMW window rows at bt=1
    scratch = [
        pltpu.VMEM((2, h, bk, d), k.dtype),
        pltpu.VMEM((2, h, bk, d), v.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if quantized:
        hs = k_scale.shape[-1]
        in_specs += [any_spec, any_spec]
        out_specs += [any_spec, any_spec]
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ]
        operands += [k_scale, v_scale]
        aliases.update({n_scalars + 5: 3, n_scalars + 6: 4})
        scratch += [
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    scratch += [
        pltpu.VMEM((2, h, w, d), k.dtype),
        pltpu.VMEM((2, h, w, d), v.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if quantized:
        ws = 8
        scratch += [
            pltpu.VMEM((2, ws, hs), jnp.float32),
            pltpu.VMEM((2, ws, hs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalars,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret_mode(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        npast_vec,
        jnp.asarray(batch_offset, jnp.int32).reshape(1),
        total.reshape(1),
        row_of,
        blk_of,
        *([jnp.asarray(page_table, jnp.int32)] if paged else []),
        *operands,
    )
    out = results[0][:, None]  # [B, 1, H, D]
    if quantized:
        return (out,) + tuple(results[1:5])
    return out, results[1], results[2]
