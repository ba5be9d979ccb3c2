"""Prefill attention ceiling probe (r4): how much of the fused
write+attend kernel's ~0.9 ms/layer is the RMW window discipline?

The production kernel (ops/flash_attn._update_kernel) always does
read-window -> merge -> write-back -> attend, ~4-6 serialized DMA
round-trips per program. For ALIGNED prefill t-blocks (start % block == 0,
whole tiles) none of that is necessary:

  direct — write the new rows STRAIGHT from the (VMEM) input block to the
           cache (no window read, no merge), attend previous blocks from
           HBM, attend the block's OWN rows from the input ref (never
           reads them back), wait the write only at program end.

Variants at T=512, bt=bk=256, h=32, d=128 (7B layer geometry), vs the
production flash_attention_update on identical inputs (numerics checked).

Run:  PYTHONPATH=.:/root/.axon_site python tools/bench_prefill_ownrows.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamavk_tpu.ops.flash_attn import attention_ref, flash_attention_update

_NEG = -1e30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kern_direct(q_ref, knew_ref, vnew_ref, _k_in, _v_in, o_ref, k_out, v_out,
                kbuf, vbuf, sems, wsems, *, bt, bk, scale):
    hb = pl.program_id(1)
    tb = pl.program_id(2)
    hg = q_ref.shape[1]
    d = q_ref.shape[3]
    t0 = tb * bt

    # 1. direct aligned write-back of this block's rows (async; waited at
    # program end — nothing in THIS program reads them from HBM, and the
    # grid's t dimension is sequential so later programs see them complete)
    kw = pltpu.make_async_copy(
        knew_ref.at[0], k_out.at[0, 0, pl.ds(hb * hg, hg), pl.ds(t0, bt), :],
        wsems.at[0],
    )
    vw = pltpu.make_async_copy(
        vnew_ref.at[0], v_out.at[0, 0, pl.ds(hb * hg, hg), pl.ds(t0, bt), :],
        wsems.at[1],
    )
    kw.start()
    vw.start()

    q = q_ref[0].astype(jnp.float32) * scale  # [HG, BT, D]
    m = jnp.full((hg, bt, 1), _NEG, jnp.float32)
    l = jnp.zeros((hg, bt, 1), jnp.float32)
    acc = jnp.zeros((hg, bt, d), jnp.float32)
    nprev = t0 // bk  # whole blocks strictly before this one (aligned)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_out.at[0, 0, pl.ds(hb * hg, hg), pl.ds(i * bk, bk), :],
            kbuf.at[slot], sems.at[0, slot],
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_out.at[0, 0, pl.ds(hb * hg, hg), pl.ds(i * bk, bk), :],
            vbuf.at[slot], sems.at[1, slot],
        )

    @pl.when(nprev > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nprev)
        def _():
            k_dma(1 - slot, i + 1).start()
            v_dma(1 - slot, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        kk = kbuf[slot]
        s = jax.lax.dot_general(
            q.astype(kk.dtype), kk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # all previous rows are visible (they precede every own query)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vbuf[slot].dtype), vbuf[slot],
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc * alpha + pv

    m, l, acc = jax.lax.fori_loop(0, nprev, body, (m, l, acc))

    # 2. own rows straight from the input ref (never read back from HBM)
    kk = knew_ref[0]
    s = jax.lax.dot_general(
        q.astype(kk.dtype), kk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [HG, BT, BT]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bt, bt), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bt, bt), 2)
    s = jnp.where(col <= row, s, _NEG)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(vnew_ref.dtype), vnew_ref[0],
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    acc = acc * alpha + pv
    o_ref[0] = (acc / l).astype(o_ref.dtype)

    kw.wait()
    vw.wait()


def make_direct(b, t, h, s, d, bt, bk, hg):
    scale = 1.0 / (d ** 0.5)
    blk = pl.BlockSpec((1, hg, bt, d), lambda b_, h_, t_: (b_, h_, t_, 0),
                       memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        partial(kern_direct, bt=bt, bk=bk, scale=scale),
        grid=(b, h // hg, t // bt),
        in_specs=[blk, blk, blk, any_spec, any_spec],
        out_specs=[blk, any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
            jax.ShapeDtypeStruct((1, b, h, s, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, b, h, s, d), jnp.bfloat16),
        ],
        input_output_aliases={3: 1, 4: 2},
        scratch_shapes=[
            pltpu.VMEM((2, hg, bk, d), jnp.bfloat16),
            pltpu.VMEM((2, hg, bk, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )


def time_fn(fn, *args, lo=10, hi=50):
    @partial(jax.jit, static_argnames=("inner",))
    def loop(x0, *a, inner):
        def body(c, _):
            x = x0.at[(0,) * x0.ndim].add(c * 1e-6)
            y = fn(x, *a)
            return jax.tree.leaves(y)[0].astype(jnp.float32).ravel()[0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return s

    def run(inner):
        np.asarray(loop(*args, inner=inner))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args, inner=inner))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo)


def main():
    b, t, h, s, d = 1, 512, 32, 512, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kc = jnp.zeros((1, b, h, s, d), jnp.bfloat16)
    vc = jnp.zeros((1, b, h, s, d), jnp.bfloat16)

    # numerics: direct vs dense oracle
    for hg, bt, bk in [(4, 256, 256), (8, 256, 256), (4, 512, 512),
                       (8, 512, 512), (16, 256, 256), (2, 256, 256)]:
        try:
            call = make_direct(b, t, h, s, d, bt, bk, hg)
            qt = q.transpose(0, 2, 1, 3)
            out, k2, v2 = call(qt, kn.transpose(0, 2, 1, 3),
                               vn.transpose(0, 2, 1, 3), kc, vc)
            want = attention_ref(
                q, kn.transpose(0, 2, 1, 3), vn.transpose(0, 2, 1, 3),
                jnp.int32(0),
            )
            err = float(np.max(np.abs(
                np.asarray(out.transpose(0, 2, 1, 3)) - np.asarray(want)
            )))
            wrote = np.array_equal(
                np.asarray(k2[0, 0, :, :t]),
                np.asarray(kn.transpose(0, 2, 1, 3))[0],
            )
            dt = time_fn(
                lambda q_, kn_, vn_, kc_, vc_: call(q_, kn_, vn_, kc_, vc_),
                qt, kn.transpose(0, 2, 1, 3), vn.transpose(0, 2, 1, 3),
                kc, vc,
            )
            log(f"direct hg={hg:2d} bt={bt} bk={bk}: {dt*1e3:6.3f} ms/layer "
                f"(x32 = {dt*32*1e3:5.1f} ms/chunk)  "
                f"err {err:.4f} cache-exact {wrote}")
        except Exception as e:
            log(f"direct hg={hg:2d} bt={bt} bk={bk}: FAIL "
                f"{type(e).__name__}: {str(e)[:90]}")

    # production baseline on the same shapes
    def prod(q_, kn_, vn_, kc_, vc_):
        out, k2, v2 = flash_attention_update(
            q_, kn_, vn_, kc_, vc_, jnp.int32(0), jnp.int32(0),
            block_t=256, block_k=256,
        )
        return out

    dt = time_fn(prod, q, kn, vn, kc, vc)
    log(f"production bt=256 bk=256:  {dt*1e3:6.3f} ms/layer "
        f"(x32 = {dt*32*1e3:5.1f} ms/chunk)")


if __name__ == "__main__":
    main()
