"""Flash attention over the KV cache — the fused-attention kernel of this
engine (the role `KernelThinFp16Attention` plays in the reference's Vulkan
path, vulkan/llama-vk.hlsl:343-699, and the library-surface analog of ggml's
fused `flash_attn` ops, ggml.c:7866-8560 / ggml.h:632-645).

Design (TPU-native, online-softmax blocked attention):
  * grid = (batch, heads, query blocks); one program owns one [BT, D] query
    tile and scans the key/value cache in [BK, D] blocks.
  * K/V stay in HBM (`memory_space=ANY`); the kernel DMAs blocks into a
    double-buffered VMEM scratch, overlapping the next block's fetch with the
    current block's compute (the guide's double-buffering pattern).
  * **Ragged bound**: `n_past` rides in as a scalar-prefetch operand and caps
    the scan at ceil((n_past + T) / BK) blocks — only the *valid* prefix of
    the cache is ever read. The reference's GPU kernel does the same thing
    with its historyLength loop bound (llama-vk.hlsl:529-580); a dense einsum
    would stream all S slots every decode step.
  * causal + cache-length masking, numerically-stable online softmax
    (running max/sum), f32 accumulation, bf16 MXU operands.

q: [B, T, H, D] (new queries), k/v: [B, H, S, D] (updated cache),
n_past: scalar or [B] int32. Returns [B, T, H, D] f32.
Requires S % block_k == 0 and n_past + T <= S (caller invariant).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_backend import interpret_mode

_NEG = -1e30


# Import-time tuning default for the KV block cap (like q4_matmul._ENV_BN).
# MUST be read at import, never at trace time: JAX's jit cache dedupes
# same-code closures by their captured VALUES, so a hidden trace-time env
# read poisons later same-shaped traces in the process with whatever value
# was live first (observed: a fresh engine reusing another engine's kernels
# compiled under a different cap). Per-call variation goes through the
# explicit block_k / llama_forward(kv_block=...) arguments instead.
_ENV_BK = int(os.environ.get("LLAMAVK_KV_BLOCK", "0"))
# Diagnostic (read at IMPORT, like every env knob here): force 'arbitrary'
# grid dimension semantics on the bf16 fused-update kernel to test whether
# the int8 B=1 in-program regression is the 'arbitrary' semantics blocking
# cross-kernel overlap (the quantized kernel needs them for its shared
# scale-window RMW). tools/diag_int8_b1.py / ROADMAP item 0.
_ENV_FORCE_ARB = os.environ.get("LLAMAVK_FORCE_ARB", "") == "1"
# Diagnostic override for the quantized-decode heads-per-program default
# (0 = keep the built-in default). Import-time read, same rule as above.
_ENV_HG_Q = int(os.environ.get("LLAMAVK_HG_Q", "0"))
# Same for the bf16 PREFILL (bt > 16) heads-per-program default. The hg=1
# grid is h tiny programs per t-block paying serialized DMA round-trips
# (~15 us each); hg=4 measured faster BOTH standalone (0.94 vs 1.00
# ms/layer at T=512, 0.88 with bk=512) AND end-to-end (full 7B chunk 47.7
# vs 50.0 ms — tools/bench_prefill.py --only-forward A/B, v5e 2026-08-19),
# so 4 is the default; 0 here keeps it.
_ENV_HG_PF = int(os.environ.get("LLAMAVK_HG_PF", "0"))
# MEASURED NEGATIVE RESULT (v5e 2026-08-20): overlapping the RMW window
# write-back with the attend loop (async start + a pl.when(jstar) wait
# before the first overlapping block's fetch) measured SLOWER end-to-end —
# decode 6.74 vs 6.49 ms/step, prefill 54.5 vs 54.0 ms/chunk — the
# conditional wait in the prefetch chain costs more than the overlap buys
# (and at decode XLA already overlaps the whole kernel with the next
# matmul's weight DMA). Default stays SYNChronous; set LLAMAVK_ASYNC_WB=1
# to re-probe after Mosaic updates. Numerics of both paths verified
# on-chip (byte-exact caches, exact scales at HIGHEST one-hot precision).
_ENV_ASYNC_WB = os.environ.get("LLAMAVK_ASYNC_WB", "") == "1"


def _fit_block_k(block_k: int, s: int, step: int = 8) -> int:
    """Largest KV block <= block_k that divides s (8-row aligned; 32 for int8
    caches, whose Mosaic tile is (32, 128)); arbitrary n_ctx values work
    instead of asserting on non-multiples of 256.

    A block cap (LLAMAVK_KV_BLOCK at import, or kv_block through
    llama_forward) also pins the online-softmax ACCUMULATION ORDER: a flat
    cache at cap c and a paged pool with page_size c partition the KV
    identically, so their streams are bit-comparable (tests/test_paged.py
    exploits this for exact sampled-stream equality — without the cap the
    flat kernel fits its block to n_ctx, a different f32 summation order,
    and seeded categorical draws near a probability boundary can
    legitimately flip)."""
    if _ENV_BK > 0:
        block_k = min(block_k, _ENV_BK)
    bk = min(block_k, s)
    while bk > step and s % bk:
        bk -= step
    if s % bk:
        raise ValueError(f"KV cache length {s} must be a multiple of {step}")
    return bk


def attention_ref(q, k, v, n_past):
    """jnp reference (dense scores over the whole cache; parity oracle)."""
    b, t, h, d = q.shape
    s = k.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = (
        jnp.einsum("bthd,bhsd->bhts", q.astype(k.dtype), k,
                   preferred_element_type=jnp.float32)
        * scale
    )
    jpos = jnp.arange(s)
    npast_b = jnp.broadcast_to(jnp.asarray(n_past), (b,))
    tpos = npast_b[:, None] + jnp.arange(t)[None, :]
    mask = jpos[None, None, :] <= tpos[:, :, None]
    scores = jnp.where(mask[:, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out


def _update_kernel(*args, quantized: bool, ring: bool, prefix: bool = False,
                   paged: bool = False, straddle: bool = False,
                   block_t: int, block_k: int, scale: float,
                   ring_bounded: bool = False, pblock_k: int = 0):
    """Fused cache-write + attention: merge this program's new K/V rows into
    the aliased cache, then attend over the updated cache — the design of the
    reference's attention shader, which also writes K,V to its cache slot
    in-kernel (llama-vk.hlsl:343-699). Removes every XLA-level cache-update
    op from the step (the per-slot dynamic_update_slice chain dominated
    batched decode).

    The write position is arbitrary but the cache memref is tiled ((8,128)
    bf16, (32,128) int8), so the write is a read-modify-write of the
    containing aligned window: DMA the window in, merge the new rows at the
    (dynamic, bounded) offset via a static-offset switch, DMA it back. Grid
    programs touch disjoint (b, head range) slices except consecutive
    t-blocks' shared boundary tile, which is safe because the t dimension is
    sequential ('arbitrary' semantics).

    quantized: the new rows are quantized in VMEM (same absmax formula as
    ops/kv_quant.quantize_rows) and the f32 per-row scales RMW-merge into the
    [S, H] scale plane (8-aligned windows, this program's head lanes masked
    in). Scale windows are shared between head-programs, so the h grid dim
    then also runs 'arbitrary' (sequential on a core; v5e has one core).

    ring: rows land at the physical ring row `wrow[b] + t0` instead of the
    logical position, and attention masks by the per-row logical positions
    (kv_pos, updated by the caller BEFORE this kernel runs)."""
    it = iter(args)
    idx_ref, npast_ref, wrow_ref, commit_ref, boff_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    ptab_ref = next(it) if paged else None
    pid_ref = next(it) if prefix else None
    plen_ref = next(it) if prefix else None
    q_ref, knew_ref, vnew_ref = next(it), next(it), next(it)
    _k_in, _v_in = next(it), next(it)  # aliased with *_out
    pk_hbm = next(it) if prefix else None
    pv_hbm = next(it) if prefix else None
    if quantized:
        _ks_in, _vs_in = next(it), next(it)
    pos_hbm = next(it) if ring else None
    o_ref = next(it)
    k_out, v_out = next(it), next(it)
    ks_out = vs_out = None
    if quantized:
        ks_out, vs_out = next(it), next(it)
    kbuf, vbuf, sems = next(it), next(it), next(it)
    ksbuf = vsbuf = ssems = posbuf = psems = None
    if quantized:
        ksbuf, vsbuf, ssems = next(it), next(it), next(it)
    if ring:
        posbuf, psems = next(it), next(it)
    kwin, vwin, wsems = next(it), next(it), next(it)
    if quantized:
        kswin, vswin, swsems = next(it), next(it), next(it)
    pkbuf = pvbuf = pfsems = None
    if prefix:
        pkbuf, pvbuf, pfsems = next(it), next(it), next(it)

    b = pl.program_id(0)
    babs = boff_ref[0] + b  # absolute cache batch row (pp microbatch offset)
    hb = pl.program_id(1)
    tb = pl.program_id(2)
    layer = idx_ref[0]
    t0 = tb * block_t
    hg, bt = knew_ref.shape[1], knew_ref.shape[2]
    w = kwin.shape[1]  # window rows (tile-aligned)
    s_total = k_out.shape[3]
    n_heads = k_out.shape[2]
    commit = commit_ref[0] != 0
    start = wrow_ref[b] + t0  # physical write row (== logical when not ring)
    step = 32 if quantized else 8

    if paged:
        # block-table indirection: the logical write row `start` lives in
        # page ptab[b, start // PS] at in-page offset start % PS. Without
        # `straddle`, the RMW window stays inside that one page (caller
        # invariant: power-of-two admission chunking means a t-block never
        # straddles a page). With `straddle` (multi-token speculative
        # verify at arbitrary n_past), rows past the page end spill into
        # the NEXT logical page via a second RMW window below.
        ps = s_total  # cache memref is the page pool [L, NP, H, PS, D]
        pidx = start // ps
        page = ptab_ref[babs, pidx]
        inpage = start - pidx * ps
        win0 = jnp.minimum((inpage // step) * step, ps - w)
        win0 = pl.multiple_of(win0, step)
        off = inpage - win0
        if straddle:
            # rows [bt - c_over, bt) belong to page B; c_over == 0 when the
            # block fits page A (pidx2 then reads this slot's own next table
            # entry or — past the mapped range — the reserved trash page 0,
            # and window B rewrites it unchanged)
            c_over = jnp.maximum(inpage + bt - ps, 0)
            pidx2 = jnp.minimum((start + bt - 1) // ps, ptab_ref.shape[1] - 1)
            page2 = ptab_ref[babs, pidx2]
    else:
        win0 = jnp.minimum((start // step) * step, s_total - w)
        win0 = pl.multiple_of(win0, step)
        off = start - win0  # in [0, step); larger only when clamped at the end

    if quantized:
        # quantize the new rows (VPU): [HG, BT, D] -> int8 + scale [HG, BT]
        kf = knew_ref[0].astype(jnp.float32)
        vf = vnew_ref[0].astype(jnp.float32)
        kamax = jnp.max(jnp.abs(kf), axis=-1)
        vamax = jnp.max(jnp.abs(vf), axis=-1)
        ksc = jnp.where(kamax > 0, kamax / 127.0, 1.0)
        vsc = jnp.where(vamax > 0, vamax / 127.0, 1.0)
        k_rows = jnp.clip(jnp.round(kf / ksc[..., None]), -127, 127).astype(jnp.int8)
        v_rows = jnp.clip(jnp.round(vf / vsc[..., None]), -127, 127).astype(jnp.int8)
    else:
        k_rows = knew_ref[0]
        v_rows = vnew_ref[0]

    def data_at(src):
        row = page if paged else babs
        return src.at[layer, row, pl.ds(hb * hg, hg), pl.ds(win0, w), :]

    kr = pltpu.make_async_copy(data_at(k_out), kwin, wsems.at[0])
    vr = pltpu.make_async_copy(data_at(v_out), vwin, wsems.at[1])
    kr.start()
    vr.start()

    if quantized:
        # scale RMW (8-aligned window along S of the [S, H] plane; paged:
        # the window lives inside page ptab[b, start // PS] of the
        # [L, NP, PS, H] scale pool — same indirection as the data pages)
        ws = kswin.shape[0]
        s_rows = ks_out.shape[2]  # S (flat) or PS (paged pool)
        if paged:
            sp_idx = start // s_rows
            srow = ptab_ref[babs, sp_idx]
            sstart = start - sp_idx * s_rows
        else:
            srow = babs
            sstart = start
        swin0 = jnp.minimum((sstart // 8) * 8, s_rows - ws)
        swin0 = pl.multiple_of(swin0, 8)
        soff = sstart - swin0

        def scale_at(src):
            return src.at[layer, srow, pl.ds(swin0, ws), :]

        ksr = pltpu.make_async_copy(scale_at(ks_out), kswin, swsems.at[0])
        vsr = pltpu.make_async_copy(scale_at(vs_out), vswin, swsems.at[1])
        ksr.start()
        vsr.start()
    kr.wait()
    vr.wait()
    if quantized:
        ksr.wait()
        vsr.wait()

    # commit gate (pipeline-parallel ring: non-active stages rewrite the
    # window unchanged — see models/llama.py pp schedule)
    def merge_data(o):
        def _do():
            kwin[:, o : o + bt, :] = jnp.where(commit, k_rows, kwin[:, o : o + bt, :])
            vwin[:, o : o + bt, :] = jnp.where(commit, v_rows, vwin[:, o : o + bt, :])
        return _do

    def merge_data_head(o):
        # straddle window A: only rows [0, bt - c_over) land here; the write
        # offset can reach w - 1 (row bt-1 spilled to page B), so branches
        # truncate the slice to the window end and mask the spilled rows
        m = min(bt, w - o)

        def _do():
            jm = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
            keep = commit & (jm < bt - c_over)
            kwin[:, o : o + m, :] = jnp.where(
                keep, k_rows[:, :m, :], kwin[:, o : o + m, :]
            )
            vwin[:, o : o + m, :] = jnp.where(
                keep, v_rows[:, :m, :], vwin[:, o : o + m, :]
            )
        return _do

    # off is dynamic but bounded: static-slice merge selected by switch
    if paged and straddle:
        jax.lax.switch(off, [merge_data_head(o) for o in range(w)])
    else:
        jax.lax.switch(off, [merge_data(o) for o in range(w - bt + 1)])

    writes = [
        pltpu.make_async_copy(kwin, data_at(k_out), wsems.at[0]),
        pltpu.make_async_copy(vwin, data_at(v_out), wsems.at[1]),
    ]

    if quantized:
        # scatter scales [HG, BT] to this program's head lanes of [BT, Hs]
        # (Hs = lane-padded head count of the scale plane)
        n_lanes = ks_out.shape[3]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (hg, n_lanes), 1)
            == hb * hg + jax.lax.broadcasted_iota(jnp.int32, (hg, n_lanes), 0)
        ).astype(jnp.float32)
        # HIGHEST: the MXU's default f32 path rounds through bf16 passes —
        # measured 2e-3 relative on written scales (pre-r4, on-chip); these
        # dots are tiny, so exact f32 is free
        k_sc_bt = jax.lax.dot_general(  # [BT, H]
            ksc, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        v_sc_bt = jax.lax.dot_general(
            vsc, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, n_lanes), 1)
        own = (lane >= hb * hg) & (lane < hb * hg + hg)

        def merge_scale(o):
            def _do():
                kswin[o : o + bt, :] = jnp.where(
                    own & commit, k_sc_bt, kswin[o : o + bt, :]
                )
                vswin[o : o + bt, :] = jnp.where(
                    own & commit, v_sc_bt, vswin[o : o + bt, :]
                )
            return _do

        def merge_scale_head(o):
            # straddle window A for scales (same geometry as merge_data_head):
            # soff can reach ws - 1 when swin0 clamps at the page end; rows
            # spilling to page B are masked out here and merged below
            m = min(bt, ws - o)

            def _do():
                jm = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
                keep = own[:m] & commit & (jm < bt - c_over)
                kswin[o : o + m, :] = jnp.where(
                    keep, k_sc_bt[:m], kswin[o : o + m, :]
                )
                vswin[o : o + m, :] = jnp.where(
                    keep, v_sc_bt[:m], vswin[o : o + m, :]
                )
            return _do

        if paged and straddle:
            jax.lax.switch(soff, [merge_scale_head(o) for o in range(ws)])
        else:
            jax.lax.switch(soff, [merge_scale(o) for o in range(ws - bt + 1)])
        writes += [
            pltpu.make_async_copy(kswin, scale_at(ks_out), swsems.at[0]),
            pltpu.make_async_copy(vswin, scale_at(vs_out), swsems.at[1]),
        ]

    for c in writes:
        c.start()
    write_wait = None
    if not (paged and straddle) and _ENV_ASYNC_WB:
        # ASYNC write-back: attention starts immediately and overlaps the
        # window write-back with its prefix-block reads (the serialized
        # readwin -> merge -> writeback -> attend chain cost ~55 us/program
        # at prefill, tools/bench_prefill.py r4). Blocks before the RMW
        # window are untouched by the write; the attend loop waits the
        # write copies once, right before fetching the first overlapping
        # block (jstar). jstar < nblocks always: the attend limit covers
        # the written rows, so the wait cannot be skipped.
        jstar = (start - off) // block_k
        if quantized:
            jstar = jnp.minimum(jstar, (start - soff) // block_k)
        write_wait = (writes, jstar)
    else:
        for c in writes:
            c.wait()

    if paged and straddle:
        # window B: the spilled rows [bt - c_over, bt) land at the START of
        # page B (in-page rows [0, c_over)). Reuses the window buffers after
        # window A's write-back completed above; when c_over == 0 this
        # rewrites page B's head window unchanged (benign — it is either
        # this slot's own next page or the reserved trash page).
        def dataB_at(src):
            return src.at[layer, page2, pl.ds(hb * hg, hg), pl.ds(0, w), :]

        krB = pltpu.make_async_copy(dataB_at(k_out), kwin, wsems.at[0])
        vrB = pltpu.make_async_copy(dataB_at(v_out), vwin, wsems.at[1])
        krB.start()
        vrB.start()
        krB.wait()
        vrB.wait()

        def merge_over(c):
            def _do():
                if c:
                    kwin[:, 0:c, :] = jnp.where(
                        commit, k_rows[:, bt - c :, :], kwin[:, 0:c, :]
                    )
                    vwin[:, 0:c, :] = jnp.where(
                        commit, v_rows[:, bt - c :, :], vwin[:, 0:c, :]
                    )
            return _do

        jax.lax.switch(c_over, [merge_over(c) for c in range(bt)])
        wB = [
            pltpu.make_async_copy(kwin, dataB_at(k_out), wsems.at[0]),
            pltpu.make_async_copy(vwin, dataB_at(v_out), wsems.at[1]),
        ]
        for c in wB:
            c.start()
        for c in wB:
            c.wait()

        if quantized:
            # page-B SCALE window: the spilled rows' scales land at rows
            # [0, c_over) of page2's scale plane (the scale pool shares the
            # data pool's page ids). Reuses the scale window buffers after
            # window A's write-back completed above.
            def scaleB_at(src):
                return src.at[layer, page2, pl.ds(0, ws), :]

            ksrB = pltpu.make_async_copy(scaleB_at(ks_out), kswin, swsems.at[0])
            vsrB = pltpu.make_async_copy(scaleB_at(vs_out), vswin, swsems.at[1])
            ksrB.start()
            vsrB.start()
            ksrB.wait()
            vsrB.wait()

            def merge_scale_over(c):
                def _do():
                    if c:
                        kswin[0:c, :] = jnp.where(
                            own[:c] & commit, k_sc_bt[bt - c :], kswin[0:c, :]
                        )
                        vswin[0:c, :] = jnp.where(
                            own[:c] & commit, v_sc_bt[bt - c :], vswin[0:c, :]
                        )
                return _do

            jax.lax.switch(c_over, [merge_scale_over(c) for c in range(bt)])
            wsB = [
                pltpu.make_async_copy(kswin, scaleB_at(ks_out), swsems.at[0]),
                pltpu.make_async_copy(vswin, scaleB_at(vs_out), swsems.at[1]),
            ]
            for c in wsB:
                c.start()
            for c in wsB:
                c.wait()

    _attend(idx_ref, npast_ref, q_ref, k_out, v_out, o_ref, kbuf, vbuf, sems,
            ks_hbm=ks_out, vs_hbm=vs_out, ksbuf=ksbuf, vsbuf=vsbuf,
            ssems=ssems, pos_hbm=pos_hbm, posbuf=posbuf, psems=psems,
            babs=babs, pk_hbm=pk_hbm, pv_hbm=pv_hbm, pid_ref=pid_ref,
            plen_ref=plen_ref, ptab_ref=ptab_ref,
            pkbuf=pkbuf, pvbuf=pvbuf, pfsems=pfsems, write_wait=write_wait,
            block_t=block_t, block_k=block_k, scale=scale,
            ring_bounded=ring_bounded, pblock_k=pblock_k)


def _read_kernel(*args, quantized: bool, ring: bool, prefix: bool = False,
                 paged: bool = False,
                 block_t: int, block_k: int, scale: float,
                 ring_bounded: bool = False, pblock_k: int = 0):
    """Generic read-path entry: unpacks the (quantized x ring x prefix)-
    dependent positional ref list Pallas passes and routes to _attend."""
    it = iter(args)
    idx_ref, npast_ref, boff_ref = next(it), next(it), next(it)
    ptab_ref = next(it) if paged else None
    pid_ref = next(it) if prefix else None
    plen_ref = next(it) if prefix else None
    q_ref, k_hbm, v_hbm = next(it), next(it), next(it)
    pk_hbm = next(it) if prefix else None
    pv_hbm = next(it) if prefix else None
    ks_hbm = next(it) if quantized else None
    vs_hbm = next(it) if quantized else None
    pos_hbm = next(it) if ring else None
    o_ref = next(it)
    kbuf, vbuf, sems = next(it), next(it), next(it)
    ksbuf = vsbuf = ssems = posbuf = psems = None
    if quantized:
        ksbuf, vsbuf, ssems = next(it), next(it), next(it)
    if ring:
        posbuf, psems = next(it), next(it)
    pkbuf = pvbuf = pfsems = None
    if prefix:
        pkbuf, pvbuf, pfsems = next(it), next(it), next(it)
    babs = boff_ref[0] + pl.program_id(0)
    _attend(idx_ref, npast_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems,
            ks_hbm=ks_hbm, vs_hbm=vs_hbm, ksbuf=ksbuf, vsbuf=vsbuf,
            ssems=ssems, pos_hbm=pos_hbm, posbuf=posbuf, psems=psems,
            babs=babs, pk_hbm=pk_hbm, pv_hbm=pv_hbm, pid_ref=pid_ref,
            plen_ref=plen_ref, ptab_ref=ptab_ref,
            pkbuf=pkbuf, pvbuf=pvbuf, pfsems=pfsems,
            block_t=block_t, block_k=block_k, scale=scale,
            ring_bounded=ring_bounded, pblock_k=pblock_k)


def _attend(idx_ref, npast_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems,
            ks_hbm=None, vs_hbm=None, ksbuf=None, vsbuf=None, ssems=None,
            pos_hbm=None, posbuf=None, psems=None, babs=None,
            pk_hbm=None, pv_hbm=None, pid_ref=None, plen_ref=None,
            ptab_ref=None, pkbuf=None, pvbuf=None, pfsems=None,
            write_wait=None, *,
            block_t: int, block_k: int, scale: float,
            ring_bounded: bool = False, pblock_k: int = 0):
    """One program: HG heads x BT queries against the ragged cache prefix.

    HG > 1 (decode) makes each DMA HG x (BK x D) — per-program DMA startup
    latency amortizes over 8x the bytes, which is what batched decode needs
    (256 tiny per-head programs were latency-bound).

    Quantized cache (ks_hbm/vs_hbm given): K/V blocks arrive int8 and per-row
    f32 scales [BK, H] ride their own double-buffered DMAs. Scales fold into
    the matmuls algebraically — scores *= kscale (per key row) after the QK
    product and p *= vscale before the PV product — so the int8 blocks only
    pay one int8→bf16 convert, never a full [BK, D] dequant multiply. The
    per-program head slice of the [BK, H] scale tile is extracted with a
    one-hot [HG, H] matmul: no lane-axis slicing, so any H / HG stays
    DMA-aligned."""
    b = pl.program_id(0)
    hb = pl.program_id(1)
    tb = pl.program_id(2)
    layer = idx_ref[0]
    npast = npast_ref[b]
    t0 = tb * block_t
    quantized = ks_hbm is not None
    ring = pos_hbm is not None
    if babs is None:
        babs = b  # absolute cache batch row (pp microbatch offset)

    q = q_ref[0].astype(jnp.float32) * scale  # [HG, BT, D]
    hg, bt, d = q.shape

    # rows of this block see cache positions [0, npast + t0 + BT - 1];
    # clamp to the cache extent — query-padding rows (tpad > t) would
    # otherwise push the DMA bound past the last cache row (OOB read).
    # Ring mode (pos_hbm given): rows live anywhere in the ring — scan all of
    # it; validity comes from the per-row logical positions, not the bound.
    paged = ptab_ref is not None
    s_total = k_hbm.shape[3]  # per-PAGE rows when paged (pool [L,NP,H,PS,D])
    if ring and not ring_bounded:
        nblocks = s_total // block_k
    else:
        # ring_bounded: sound when the ring invariant pos[r] >= r holds
        # (engine-produced rings) — rows past min(npast+t, S) then hold
        # either empty or future positions, both masked; pre-wrap this
        # recovers the full ragged-prefix saving
        cap = ptab_ref.shape[1] * s_total if paged else s_total
        limit = jnp.minimum(npast + t0 + bt, cap)
        nblocks = pl.cdiv(limit, block_k)
    # paged: logical kv block i lives in page ptab[b, i // bpp] at in-page
    # block i % bpp (block_k divides PS — _fit_block_k on the pool's page
    # rows). The block-table generalization of the reference's historyIndex
    # indirection (vulkan/llama-vk.cpp:984-987).
    bpp = (s_total // block_k) if paged else 1

    def kv_src(hbm, i):
        if paged:
            return hbm.at[layer, ptab_ref[babs, i // bpp],
                          pl.ds(hb * hg, hg),
                          pl.ds((i % bpp) * block_k, block_k), :]
        return hbm.at[layer, babs, pl.ds(hb * hg, hg),
                      pl.ds(i * block_k, block_k), :]

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            kv_src(k_hbm, i), kbuf.at[slot], sems.at[0, slot],
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            kv_src(v_hbm, i), vbuf.at[slot], sems.at[1, slot],
        )

    def scale_dmas(slot, i):
        # paged: scale pool [L, NP, PS, H] — logical block i's scale rows
        # live in the same page as its data rows
        def src(s_hbm):
            if paged:
                return s_hbm.at[layer, ptab_ref[babs, i // bpp],
                                pl.ds((i % bpp) * block_k, block_k), :]
            return s_hbm.at[layer, babs, pl.ds(i * block_k, block_k), :]

        return [
            pltpu.make_async_copy(src(s_hbm), sbuf.at[slot], ssems.at[j, slot])
            for j, (s_hbm, sbuf) in enumerate(((ks_hbm, ksbuf), (vs_hbm, vsbuf)))
        ]

    def pos_dma(slot, i):
        return pltpu.make_async_copy(
            pos_hbm.at[pl.ds(i * block_k, block_k), :], posbuf.at[slot],
            psems.at[slot],
        )

    def start_dmas(slot, i):
        # async write-back overlap (_update_kernel): blocks strictly before
        # the RMW window read untouched rows and overlap with the
        # write-back in flight; the first overlapping block waits the
        # write copies ONCE, right before its own fetch is issued
        if write_wait is not None:
            wcopies, jstar = write_wait

            @pl.when(i == jstar)
            def _():
                for c in wcopies:
                    c.wait()

        k_dma(slot, i).start()
        v_dma(slot, i).start()
        if quantized:
            for c in scale_dmas(slot, i):
                c.start()
        if ring:
            pos_dma(slot, i).start()

    def wait_dmas(slot, i):
        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        if quantized:
            for c in scale_dmas(slot, i):
                c.wait()
        if ring:
            pos_dma(slot, i).wait()

    m0 = jnp.full((hg, bt, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((hg, bt, 1), jnp.float32)
    a0 = jnp.zeros((hg, bt, d), jnp.float32)

    if pk_hbm is not None:
        # shared read-only prefix pre-pass: rows [0, plen) of prefix-pool
        # entry pid[b] hold positions [0, plen) shared by every query of this
        # program (queries sit at logical positions >= plen, so no causal
        # masking — only the ragged plen bound). The online-softmax carry
        # flows straight into the main (per-slot suffix) loop below. This is
        # the general form of prefix caching: ONE pool copy of a shared
        # system prompt serves every batch row (reference seed: historyIndex
        # indirection, vulkan/llama-vk.cpp:984-987).
        #
        # The pool stays bf16 even over an int8 slot cache (prefix rows are
        # written once and read by every batch row — full precision costs
        # O(pool), not O(batch)), so the pre-pass streams through its OWN
        # scratch buffers (pkbuf/pvbuf, pool dtype) rather than reusing the
        # cache-dtype kbuf/vbuf.
        pid = pid_ref[b]
        plen = plen_ref[b]
        # the prefix pass uses its own block size (a divisor of the pool
        # length, <= block_k so VMEM stays bounded — the slot cache's block
        # need not divide the pool length)
        pbk = pblock_k or block_k
        pnblocks = pl.cdiv(plen, pbk)

        def pk_dma(slot, i):
            return pltpu.make_async_copy(
                pk_hbm.at[layer, pid, pl.ds(hb * hg, hg),
                          pl.ds(i * pbk, pbk), :],
                pkbuf.at[slot], pfsems.at[0, slot],
            )

        def pv_dma(slot, i):
            return pltpu.make_async_copy(
                pv_hbm.at[layer, pid, pl.ds(hb * hg, hg),
                          pl.ds(i * pbk, pbk), :],
                pvbuf.at[slot], pfsems.at[1, slot],
            )

        @pl.when(pnblocks > 0)
        def _():
            pk_dma(0, 0).start()
            pv_dma(0, 0).start()

        def pbody(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < pnblocks)
            def _():
                pk_dma(1 - slot, i + 1).start()
                pv_dma(1 - slot, i + 1).start()

            pk_dma(slot, i).wait()
            pv_dma(slot, i).wait()
            kk = pkbuf[slot]
            s = jax.lax.dot_general(
                q.astype(kk.dtype), kk,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [HG, BT, PBK]
            col = i * pbk + jax.lax.broadcasted_iota(
                jnp.int32, (1, bt, pbk), 2
            )
            s = jnp.where(col < plen, s, _NEG)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vv = pvbuf[slot]
            pv = jax.lax.dot_general(
                p.astype(vv.dtype), vv,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * alpha + pv

        m0, l0, a0 = jax.lax.fori_loop(0, pnblocks, pbody, (m0, l0, a0))

    start_dmas(0, 0)

    if quantized:
        # one-hot head selector [HG, H]: row g picks head hb*hg + g
        n_heads = ks_hbm.shape[3]  # ks_hbm: [L, B, S, H]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (hg, n_heads), 1)
            == hb * hg + jax.lax.broadcasted_iota(jnp.int32, (hg, n_heads), 0)
        ).astype(jnp.float32)
    if ring:
        # one-hot batch-row selector [1, B] for the [BK, B] position tiles
        n_b = pos_hbm.shape[1]
        onehot_b = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_b), 1) == babs
        ).astype(jnp.float32)

    row_pos = npast + t0 + jax.lax.broadcasted_iota(jnp.int32, (1, bt, 1), 1)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblocks)
        def _():
            start_dmas(1 - slot, i + 1)

        wait_dmas(slot, i)

        kk = kbuf[slot]  # [HG, BK, D] storage dtype
        mul_dtype = jnp.bfloat16 if quantized else kk.dtype
        s = jax.lax.dot_general(
            q.astype(mul_dtype), kk.astype(mul_dtype),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HG, BT, BK]
        if quantized:
            ksc = jax.lax.dot_general(  # [HG, BK]: this program's head rows
                onehot, ksbuf[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            s = s * ksc[:, None, :]
        if ring:
            # per-row logical positions (f32 via one-hot matmul; positions
            # < 2^24 are exact): visible iff 0 <= pos <= query position
            posb = jax.lax.dot_general(
                onehot_b, posbuf[slot].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, BK]
            visible = (posb[:, None, :] >= 0) & (
                posb[:, None, :] <= row_pos.astype(jnp.float32)
            )  # [1, BT, BK]
            s = jnp.where(visible, s, _NEG)
        else:
            col = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, bt, block_k), 2
            )
            s = jnp.where(col <= row_pos, s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if ring:
            # a block (even the first) can be fully masked for a row — kill
            # the exp(_NEG - _NEG) = 1 artifact of the running-max init
            p = jnp.where(s <= _NEG * 0.5, 0.0, p)
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
        )  # [HG, BT, D]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "block_k", "heads_per_program", "ring_bounded"),
)
def flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, H, S, D] — or STACKED [L, B, H, S, D] with layer_idx
    v: jax.Array,  # like k
    n_past: jax.Array,  # scalar or [B] int32
    block_t: int = 256,
    block_k: int = 256,
    layer_idx: jax.Array | None = None,
    heads_per_program: int | None = None,
    k_scale: jax.Array | None = None,  # [(L,) B, S, H] f32: int8 cache rows
    v_scale: jax.Array | None = None,
    kv_pos: jax.Array | None = None,  # [S, B] int32: history-ring positions
    batch_offset: jax.Array | int = 0,  # first cache row of this microbatch
    ring_bounded: bool = False,  # ragged bound on rings with pos[r] >= r
    prefix_k: jax.Array | None = None,  # [(L,) NP, H, Sp, D] shared pool
    prefix_v: jax.Array | None = None,
    prefix_id: jax.Array | None = None,  # [B] int32 pool entry per row
    prefix_len: jax.Array | None = None,  # [B] int32 valid prefix rows
    page_table: jax.Array | None = None,  # [B, MAXLB] int32: k/v are then a
    # PAGE POOL [(L,) NP, H, PS, D] and row b's logical block j lives in page
    # page_table[b, j] (block-table paged KV; runtime/paged.py)
) -> jax.Array:
    """layer_idx: read layer `layer_idx` of a stacked KV cache directly (the
    DMA slices [l, b, h, ...] from HBM) — avoids the whole-layer cache copy a
    lax.scan dynamic-slice would materialize.

    k_scale/v_scale: per-row dequant scales of an int8 cache (layout in
    ops/kv_quant.py); k/v must then be int8.

    kv_pos: per-row logical positions of a history-ring cache (the
    generalization of the reference's historyIndex ring,
    vulkan/llama-vk.cpp:984-987): row j is visible to a query at logical
    position p iff 0 <= kv_pos[j] <= p. The whole ring is scanned; masking
    replaces the prefix bound."""
    quantized = k_scale is not None
    ring = kv_pos is not None
    prefix = prefix_k is not None
    paged = page_table is not None
    assert not (prefix and ring), (
        "shared-prefix attention: non-ring slot caches only"
    )
    assert not (paged and (ring or prefix)), (
        "paged KV: non-ring caches, no prefix-pool pre-pass (prefix "
        "sharing happens through the block table instead)"
    )
    if layer_idx is None:
        k = k[None]
        v = v[None]
        if quantized:
            k_scale = k_scale[None]
            v_scale = v_scale[None]
        if prefix:
            prefix_k = prefix_k[None]
            prefix_v = prefix_v[None]
        layer_idx = jnp.int32(0)
    b, t, h, d = q.shape
    s = k.shape[3]
    bk = _fit_block_k(block_k, s, step=32 if quantized else 8)
    pbk = 0
    if prefix:
        # the pool is ALWAYS bf16, even over an int8 slot cache: one pool
        # copy serves every batch row, so full precision costs O(pool)
        assert prefix_k.dtype == jnp.bfloat16 == prefix_v.dtype, (
            "prefix pool must be bf16"
        )
        pbk = _fit_block_k(min(bk, prefix_k.shape[3]), prefix_k.shape[3])
    bt = min(block_t, t)
    tpad = -(-t // bt) * bt
    if tpad != t:
        # pad queries; padded rows compute garbage rows that are sliced off
        q = jnp.pad(q, ((0, 0), (0, tpad - t), (0, 0), (0, 0)))
    npast_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))

    # heads per program: decode (small q tiles) groups heads so each DMA
    # moves HG x BK x D bytes; prefill groups 4 (per-head programs were
    # DMA-latency-bound — see _ENV_HG_PF). Quantized caches group MORE
    # heads: the [BK, Hs] scale tiles are shared across head-programs, so
    # fewer programs = less duplicated scale traffic (int8 data is
    # half-size, so VMEM fits).
    hg = heads_per_program
    if hg is None:
        if quantized:
            hg = (_ENV_HG_Q or 32) if bt <= 16 else 8
        else:
            hg = 8 if bt <= 16 else (_ENV_HG_PF or 4)
    while h % hg:
        hg //= 2
    hg = max(hg, 1)

    # heads-major query layout so the block's trailing dims are (BT, D) —
    # Mosaic requires the last two block dims be (8k, 128k) or whole-dim
    qt = q.transpose(0, 2, 1, 3)  # [B, H, Tpad, D]

    grid = (b, h // hg, tpad // bt)
    kernel = functools.partial(
        _read_kernel, quantized=quantized, ring=ring, prefix=prefix,
        paged=paged, block_t=bt, block_k=bk, scale=1.0 / (d**0.5),
        ring_bounded=ring_bounded, pblock_k=pbk,
    )
    extra_in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (
        2 * quantized + ring
    )
    prefix_in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (2 * prefix)
    prefix_scalars = []
    prefix_args = []
    if prefix:
        prefix_scalars = [
            jnp.broadcast_to(jnp.asarray(prefix_id, jnp.int32), (b,)),
            jnp.broadcast_to(jnp.asarray(prefix_len, jnp.int32), (b,)),
        ]
        prefix_args = [prefix_k, prefix_v]
    extra_scratch = []
    extra_args = []
    if quantized:
        hs = k_scale.shape[-1]  # lane-padded head count (init_kv_cache)
        extra_scratch += [
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        extra_args += [k_scale, v_scale]
    if ring:
        # DMA slice shapes on the lane axis must be 128-aligned: pad the
        # (tiny, per-forward-constant) position plane at trace time — XLA
        # hoists the pad out of the layer scan
        bpad = -(-kv_pos.shape[1] // 128) * 128
        if bpad != kv_pos.shape[1] and not interpret_mode():
            kv_pos = jnp.pad(
                kv_pos, ((0, 0), (0, bpad - kv_pos.shape[1])),
                constant_values=-1,
            )
        extra_scratch += [
            pltpu.VMEM((2, bk, kv_pos.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        extra_args += [kv_pos]
    if prefix:
        # dedicated bf16 double-buffers for the pool pre-pass (the slot
        # cache's kbuf/vbuf may be int8 and are sized for bk, not pbk)
        extra_scratch += [
            pltpu.VMEM((2, hg, pbk, d), jnp.bfloat16),
            pltpu.VMEM((2, hg, pbk, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    paged_scalars = (
        [jnp.asarray(page_table, jnp.int32)] if paged else []
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3 + paged + 2 * prefix,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                *prefix_in_specs,
                *extra_in_specs,
            ],
            out_specs=pl.BlockSpec(
                (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, hg, bk, d), k.dtype),
                pltpu.VMEM((2, hg, bk, d), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                *extra_scratch,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tpad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1), npast_vec,
        jnp.asarray(batch_offset, jnp.int32).reshape(1), *paged_scalars,
        *prefix_scalars,
        qt, k, v, *prefix_args, *extra_args,
    )
    return out.transpose(0, 2, 1, 3)[:, :t]


@functools.partial(
    jax.jit,
    static_argnames=("block_t", "block_k", "heads_per_program", "ring_bounded",
                     "page_straddle"),
)
def flash_attention_update(
    q: jax.Array,  # [B, T, H, D]
    k_new: jax.Array,  # [B, T, H, D] (RoPE'd K rows to cache)
    v_new: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # STACKED cache [L, B, H, S, D]
    v: jax.Array,
    n_past: jax.Array,  # scalar or [B] int32
    layer_idx: jax.Array,
    block_t: int = 256,
    block_k: int = 256,
    heads_per_program: int | None = None,
    commit: jax.Array | bool = True,
    k_scale: jax.Array | None = None,  # [L, B, S, H] f32: int8 cache
    v_scale: jax.Array | None = None,
    kv_pos: jax.Array | None = None,  # [S, B] int32: history-ring positions
    write_row: jax.Array | None = None,  # [B] int32 physical start rows
    batch_offset: jax.Array | int = 0,  # first cache row of this microbatch
    ring_bounded: bool = False,  # ragged bound on rings with pos[r] >= r
    prefix_k: jax.Array | None = None,  # [L, NP, H, Sp, D] shared pool
    prefix_v: jax.Array | None = None,
    prefix_id: jax.Array | None = None,  # [B] int32 pool entry per row
    prefix_len: jax.Array | None = None,  # [B] int32 valid prefix rows
    page_table: jax.Array | None = None,  # [B, MAXLB] int32: k/v are then a
    # PAGE POOL [L, NP, H, PS, D]; writes and reads address logical block j
    # of row b through page_table[b, j]. Caller invariant: every t-block
    # write [n_past+t0, +bt) stays within one page (power-of-two chunking)
    # — UNLESS page_straddle is set.
    page_straddle: bool = False,  # paged multi-token writes at ARBITRARY
    # n_past (speculative verify): rows past the page end spill into the
    # next logical page via a second RMW window (int8 pools spill the scale
    # plane rows the same way). Caller invariant: n_past + T <= MAXLB * PS
    # (the spill page's table entry must exist; unmapped entries hold the
    # reserved trash page).
):
    """Fused cache update + attention: writes the T new K/V rows at
    [n_past[b], n_past[b]+T) of layer `layer_idx` in the aliased cache, then
    attends. Returns (out [B,T,H,D] f32, k, v) with k/v updated in place —
    plus the updated (k_scale, v_scale) when the cache is int8 (the kernel
    quantizes the new rows itself; k_new/v_new arrive unquantized).
    Requires T % block_t == 0 so no query-padding rows write garbage.
    `commit=False` leaves the cache unchanged (pipeline-parallel idle hops).

    History-ring mode (kv_pos given): rows land at physical rows
    [write_row[b], +T) while n_past stays the LOGICAL query position; kv_pos
    must already hold the new rows' logical positions (the caller updates it
    before this kernel — it is read, not written, here). [write_row, +T) must
    not cross the ring end (caller invariant)."""
    quantized = k_scale is not None
    ring = kv_pos is not None
    prefix = prefix_k is not None
    paged = page_table is not None
    assert not (prefix and ring), (
        "shared-prefix attention: non-ring slot caches only"
    )
    assert not (paged and (ring or prefix)), (
        "paged KV: non-ring caches, no prefix-pool pre-pass"
    )
    assert not (page_straddle and not paged), (
        "page_straddle only applies to paged pools"
    )
    b, t, h, d = q.shape
    s = k.shape[3]
    bk = _fit_block_k(block_k, s, step=32 if quantized else 8)
    pbk = 0
    if prefix:
        # pool stays bf16 even over int8 slot caches (see flash_attention)
        assert prefix_k.dtype == jnp.bfloat16 == prefix_v.dtype, (
            "prefix pool must be bf16"
        )
        pbk = _fit_block_k(min(bk, prefix_k.shape[3]), prefix_k.shape[3])
    bt = min(block_t, t)
    assert t % bt == 0, (t, bt)  # caller falls back to the unfused path
    step = 32 if quantized else 8
    assert s % step == 0, f"KV cache length must be a multiple of {step}, got {s}"
    wwin = min(-(-(bt + step - 1) // step) * step, s)  # data RMW window rows
    npast_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))
    if write_row is None:
        wrow_vec = npast_vec
    else:
        wrow_vec = jnp.broadcast_to(jnp.asarray(write_row, jnp.int32), (b,))

    hg = heads_per_program
    if hg is None:
        if quantized:
            hg = (_ENV_HG_Q or 32) if bt <= 16 else 8
        else:
            hg = 8 if bt <= 16 else (_ENV_HG_PF or 4)
    while h % hg:
        hg //= 2
    hg = max(hg, 1)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    knt = k_new.transpose(0, 2, 1, 3)
    vnt = v_new.transpose(0, 2, 1, 3)
    if not quantized:
        knt = knt.astype(k.dtype)
        vnt = vnt.astype(v.dtype)

    grid = (b, h // hg, t // bt)
    blk = pl.BlockSpec(
        (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    kernel = functools.partial(
        _update_kernel, quantized=quantized, ring=ring, prefix=prefix,
        paged=paged, straddle=page_straddle, block_t=bt, block_k=bk,
        scale=1.0 / (d**0.5),
        ring_bounded=ring_bounded, pblock_k=pbk,
    )
    # operand assembly (must mirror _update_kernel's unpacking order):
    # scalars: layer_idx, npast, wrow, commit, batch_offset, [page_table],
    #          [pid, plen]
    # inputs:  q, k_new, v_new, k, v, [pk, pv], [k_scale, v_scale], [kv_pos]
    # outputs: o, k, v, [k_scale, v_scale]
    n_scalars = 5 + paged + 2 * prefix
    in_specs = [blk, blk, blk, any_spec, any_spec]
    out_specs = [blk, any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    operands = [qt, knt, vnt, k, v]
    if prefix:
        in_specs += [any_spec, any_spec]
        operands += [prefix_k, prefix_v]
    # aliases index the FLATTENED inputs (scalar-prefetch args included):
    # n_scalars + q,knew,vnew → k is input n_scalars+3, v +4; the scale
    # planes sit after the (optional) prefix pool operands, so they alias at
    # +5+2p / +6+2p with p = 1 when a prefix pool rides along
    aliases = {n_scalars + 3: 1, n_scalars + 4: 2}
    scratch = [
        pltpu.VMEM((2, hg, bk, d), k.dtype),
        pltpu.VMEM((2, hg, bk, d), v.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if quantized:
        swin = min(-(-(bt + 7) // 8) * 8, s)  # scale RMW window rows
        hs = k_scale.shape[-1]  # lane-padded head count (init_kv_cache)
        in_specs += [any_spec, any_spec]
        out_specs += [any_spec, any_spec]
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ]
        operands += [k_scale, v_scale]
        poff = 2 * prefix
        aliases.update({n_scalars + 5 + poff: 3, n_scalars + 6 + poff: 4})
        scratch += [
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.VMEM((2, bk, hs), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    if ring:
        bpad = -(-kv_pos.shape[1] // 128) * 128
        if bpad != kv_pos.shape[1] and not interpret_mode():
            kv_pos = jnp.pad(
                kv_pos, ((0, 0), (0, bpad - kv_pos.shape[1])),
                constant_values=-1,
            )
        in_specs += [any_spec]
        operands += [kv_pos]
        scratch += [
            pltpu.VMEM((2, bk, kv_pos.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    scratch += [
        pltpu.VMEM((hg, wwin, d), k.dtype),
        pltpu.VMEM((hg, wwin, d), v.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quantized:
        scratch += [
            pltpu.VMEM((swin, hs), jnp.float32),
            pltpu.VMEM((swin, hs), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if prefix:
        # dedicated bf16 pre-pass buffers (pool dtype; see flash_attention)
        scratch += [
            pltpu.VMEM((2, hg, pbk, d), jnp.bfloat16),
            pltpu.VMEM((2, hg, pbk, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    results = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalars,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            # h must be 'arbitrary' when head-programs RMW shared scale
            # windows (quantized); otherwise head slices are disjoint
            dimension_semantics=(
                "parallel",
                "arbitrary" if (quantized or _ENV_FORCE_ARB) else "parallel",
                "arbitrary",
            ),
        ),
        interpret=interpret_mode(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        npast_vec,
        wrow_vec,
        jnp.asarray(commit, jnp.int32).reshape(1),
        jnp.asarray(batch_offset, jnp.int32).reshape(1),
        *([jnp.asarray(page_table, jnp.int32)] if paged else []),
        *(
            [
                jnp.broadcast_to(jnp.asarray(prefix_id, jnp.int32), (b,)),
                jnp.broadcast_to(jnp.asarray(prefix_len, jnp.int32), (b,)),
            ]
            if prefix else []
        ),
        *operands,
    )
    out = results[0].transpose(0, 2, 1, 3)
    if quantized:
        return (out,) + tuple(results[1:5])
    return out, results[1], results[2]
