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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_backend import interpret_mode

_NEG = -1e30


def _fit_block_k(block_k: int, s: int) -> int:
    """Largest KV block <= block_k that divides s (8-row aligned); arbitrary
    n_ctx values work instead of asserting on non-multiples of 256."""
    bk = min(block_k, s)
    while bk > 8 and s % bk:
        bk -= 8
    if s % bk:
        raise ValueError(f"KV cache length {s} must be a multiple of 8")
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


def _kernel_update(idx_ref, npast_ref, commit_ref, q_ref, knew_ref, vnew_ref,
                   k_in, v_in, o_ref, k_out, v_out, kbuf, vbuf, sems, kwin,
                   vwin, wsems, *, block_t: int, block_k: int, scale: float):
    """Fused cache-write + attention: merge this program's new K/V rows into
    the aliased cache at positions [n_past[b]+t0, +BT), then attend over the
    updated prefix — the design of the reference's attention shader, which
    also writes K,V to its cache slot in-kernel (llama-vk.hlsl:343-699).
    Removes every XLA-level cache-update op from the step (the per-slot
    dynamic_update_slice chain dominated batched decode).

    The write position is arbitrary but the cache memref is (8,128)-tiled, so
    the write is a read-modify-write of the containing 8-aligned window: DMA
    the window in, merge the new rows at the (dynamic, <8) offset via a
    static-offset switch, DMA it back. Grid programs touch disjoint (b, head
    range) slices except consecutive t-blocks' shared boundary tile, which is
    safe because the t dimension is sequential ('arbitrary' semantics)."""
    del k_in, v_in  # aliased with k_out/v_out; all access goes through *_out
    b = pl.program_id(0)
    hb = pl.program_id(1)
    tb = pl.program_id(2)
    layer = idx_ref[0]
    npast = npast_ref[b]
    t0 = tb * block_t
    hg, bt = knew_ref.shape[1], knew_ref.shape[2]
    w = kwin.shape[1]  # window rows: round_up(bt + 7, 8)
    s_total = k_out.shape[3]

    start = npast + t0
    win0 = jnp.minimum((start // 8) * 8, s_total - w)
    win0 = pl.multiple_of(win0, 8)
    off = start - win0  # in [0, 8) normally; larger only when clamped at end

    def win_dma(src_out, buf, sem):
        return pltpu.make_async_copy(
            src_out.at[layer, b, pl.ds(hb * hg, hg), pl.ds(win0, w), :],
            buf,
            sem,
        )

    kr = win_dma(k_out, kwin, wsems.at[0])
    vr = win_dma(v_out, vwin, wsems.at[1])
    kr.start()
    vr.start()
    kr.wait()
    vr.wait()

    # commit gate (pipeline-parallel ring: non-active stages rewrite the
    # window unchanged — see models/llama.py pp schedule)
    commit = commit_ref[0] != 0

    def merge(o):
        def _do():
            kwin[:, o : o + bt, :] = jnp.where(
                commit, knew_ref[0], kwin[:, o : o + bt, :]
            )
            vwin[:, o : o + bt, :] = jnp.where(
                commit, vnew_ref[0], vwin[:, o : o + bt, :]
            )
        return _do

    # off is dynamic but bounded: static-slice merge selected by switch
    jax.lax.switch(off, [merge(o) for o in range(w - bt + 1)])

    kw = pltpu.make_async_copy(
        kwin, k_out.at[layer, b, pl.ds(hb * hg, hg), pl.ds(win0, w), :],
        wsems.at[0],
    )
    vw = pltpu.make_async_copy(
        vwin, v_out.at[layer, b, pl.ds(hb * hg, hg), pl.ds(win0, w), :],
        wsems.at[1],
    )
    kw.start()
    vw.start()
    kw.wait()
    vw.wait()
    _attend(idx_ref, npast_ref, q_ref, k_out, v_out, o_ref, kbuf, vbuf, sems,
            block_t=block_t, block_k=block_k, scale=scale)


def _kernel(idx_ref, npast_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems, *,
            block_t: int, block_k: int, scale: float):
    _attend(idx_ref, npast_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems,
            block_t=block_t, block_k=block_k, scale=scale)


def _attend(idx_ref, npast_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, sems, *,
            block_t: int, block_k: int, scale: float):
    """One program: HG heads x BT queries against the ragged cache prefix.

    HG > 1 (decode) makes each DMA HG x (BK x D) — per-program DMA startup
    latency amortizes over 8x the bytes, which is what batched decode needs
    (256 tiny per-head programs were latency-bound)."""
    b = pl.program_id(0)
    hb = pl.program_id(1)
    tb = pl.program_id(2)
    layer = idx_ref[0]
    npast = npast_ref[b]
    t0 = tb * block_t

    q = q_ref[0].astype(jnp.float32) * scale  # [HG, BT, D]
    hg, bt, d = q.shape

    # rows of this block see cache positions [0, npast + t0 + BT - 1];
    # clamp to the cache extent — query-padding rows (tpad > t) would
    # otherwise push the DMA bound past the last cache row (OOB read)
    s_total = k_hbm.shape[3]
    limit = jnp.minimum(npast + t0 + bt, s_total)
    nblocks = pl.cdiv(limit, block_k)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[layer, b, pl.ds(hb * hg, hg), pl.ds(i * block_k, block_k), :],
            kbuf.at[slot],
            sems.at[0, slot],
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[layer, b, pl.ds(hb * hg, hg), pl.ds(i * block_k, block_k), :],
            vbuf.at[slot],
            sems.at[1, slot],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    row_pos = npast + t0 + jax.lax.broadcasted_iota(jnp.int32, (1, bt, 1), 1)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblocks)
        def _():
            k_dma(1 - slot, i + 1).start()
            v_dma(1 - slot, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        kk = kbuf[slot]  # [HG, BK, D] storage dtype
        s = jax.lax.dot_general(
            q.astype(kk.dtype), kk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HG, BT, BK]
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, bt, block_k), 2)
        s = jnp.where(col <= row_pos, s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vbuf.dtype), vbuf[slot],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [HG, BT, D]
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((hg, bt, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((hg, bt, 1), jnp.float32)
    a0 = jnp.zeros((hg, bt, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_k", "heads_per_program")
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
) -> jax.Array:
    """layer_idx: read layer `layer_idx` of a stacked KV cache directly (the
    DMA slices [l, b, h, ...] from HBM) — avoids the whole-layer cache copy a
    lax.scan dynamic-slice would materialize."""
    if layer_idx is None:
        k = k[None]
        v = v[None]
        layer_idx = jnp.int32(0)
    b, t, h, d = q.shape
    s = k.shape[3]
    bk = _fit_block_k(block_k, s)
    bt = min(block_t, t)
    tpad = -(-t // bt) * bt
    if tpad != t:
        # pad queries; padded rows compute garbage rows that are sliced off
        q = jnp.pad(q, ((0, 0), (0, tpad - t), (0, 0), (0, 0)))
    npast_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))

    # heads per program: decode (small q tiles) groups heads so each DMA
    # moves HG x BK x D bytes; prefill keeps one head per program (its q/score
    # tiles are already large)
    hg = heads_per_program
    if hg is None:
        hg = 8 if bt <= 16 else 1
    while h % hg:
        hg //= 2
    hg = max(hg, 1)

    # heads-major query layout so the block's trailing dims are (BT, D) —
    # Mosaic requires the last two block dims be (8k, 128k) or whole-dim
    qt = q.transpose(0, 2, 1, 3)  # [B, H, Tpad, D]

    grid = (b, h // hg, tpad // bt)
    kernel = functools.partial(
        _kernel, block_t=bt, block_k=bk, scale=1.0 / (d**0.5)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, hg, bk, d), k.dtype),
                pltpu.VMEM((2, hg, bk, d), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tpad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), npast_vec, qt, k, v)
    return out.transpose(0, 2, 1, 3)[:, :t]


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_k", "heads_per_program")
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
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused cache update + attention: writes the T new K/V rows at
    [n_past[b], n_past[b]+T) of layer `layer_idx` in the aliased cache, then
    attends. Returns (out [B,T,H,D] f32, k, v) with k/v updated in place.
    Requires T % block_t == 0 so no query-padding rows write garbage.
    `commit=False` leaves the cache unchanged (pipeline-parallel idle hops)."""
    b, t, h, d = q.shape
    s = k.shape[3]
    bk = _fit_block_k(block_k, s)
    bt = min(block_t, t)
    assert t % bt == 0, (t, bt)  # caller falls back to the unfused path
    assert s % 8 == 0, f"KV cache length must be a multiple of 8, got {s}"
    wwin = min(-(-(bt + 7) // 8) * 8, s)  # RMW window rows (8-aligned)
    npast_vec = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32), (b,))

    hg = heads_per_program
    if hg is None:
        hg = 8 if bt <= 16 else 1
    while h % hg:
        hg //= 2
    hg = max(hg, 1)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, T, D]
    knt = k_new.transpose(0, 2, 1, 3).astype(k.dtype)
    vnt = v_new.transpose(0, 2, 1, 3).astype(v.dtype)

    grid = (b, h // hg, t // bt)
    kernel = functools.partial(
        _kernel_update, block_t=bt, block_k=bk, scale=1.0 / (d**0.5)
    )
    blk = pl.BlockSpec(
        (1, hg, bt, d), lambda b_, h_, t_, *prefetch: (b_, h_, t_, 0),
        memory_space=pltpu.VMEM,
    )
    out, k, v = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                blk,  # q
                blk,  # k_new
                blk,  # v_new
                pl.BlockSpec(memory_space=pl.ANY),  # k cache (aliased)
                pl.BlockSpec(memory_space=pl.ANY),  # v cache (aliased)
            ],
            out_specs=[
                blk,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, hg, bk, d), k.dtype),
                pltpu.VMEM((2, hg, bk, d), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((hg, wwin, d), k.dtype),
                pltpu.VMEM((hg, wwin, d), v.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        # flattened input positions: 0=layer_idx, 1=npast, 2=commit, 3=q,
        # 4=k_new, 5=v_new, 6=k cache, 7=v cache → outputs 1, 2
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode(),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        npast_vec,
        jnp.asarray(commit, jnp.int32).reshape(1),
        qt,
        knt,
        vnt,
        k,
        v,
    )
    return out.transpose(0, 2, 1, 3), k, v
