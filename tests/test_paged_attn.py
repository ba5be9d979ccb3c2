"""Paged flash attention vs the dense oracle: the kernels address K/V through
a per-row block table into a shared page pool (the block-table generalization
of the reference's historyIndex indirection, vulkan/llama-vk.cpp:984-987).
Tables are deliberately scrambled so physical page order never matches
logical order."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.ops.flash_attn import (
    attention_ref, flash_attention, flash_attention_update,
)


def gather_pages(pool, table):
    """[NP, H, PS, D] pool + [B, MAXLB] table -> dense [B, H, S, D]."""
    npages, h, ps, d = pool.shape
    b, maxlb = table.shape
    g = pool[table.reshape(-1)]  # [B*MAXLB, H, PS, D]
    g = g.reshape(b, maxlb, h, ps, d).transpose(0, 2, 1, 3, 4)
    return g.reshape(b, h, maxlb * ps, d)


def make_paged(rng, b, h, ps, maxlb, d, n_pages, fill):
    """Pool with random data in the first `fill` logical rows of each row's
    mapped pages; scrambled page assignment."""
    perm = rng.permutation(n_pages)
    table = perm[: b * maxlb].reshape(b, maxlb).astype(np.int32)
    pool_k = rng.standard_normal((n_pages, h, ps, d)).astype(np.float32)
    pool_v = rng.standard_normal((n_pages, h, ps, d)).astype(np.float32)
    return (
        jnp.asarray(pool_k, jnp.bfloat16),
        jnp.asarray(pool_v, jnp.bfloat16),
        jnp.asarray(table),
    )


@pytest.mark.parametrize(
    "b,t,h,ps,maxlb,d,npast,bk",
    [
        (2, 1, 2, 64, 4, 32, [17, 130], 64),   # decode, mid-page bounds
        (1, 1, 2, 64, 4, 32, [0], 64),          # first token
        (2, 8, 2, 64, 4, 32, [13, 56], 64),     # multi-token
        (1, 64, 2, 64, 2, 32, [64], 32),        # prefill block, sub-page bk
        (2, 1, 4, 128, 2, 32, [100, 255], 128), # bigger pages
    ],
)
def test_paged_read_matches_dense(b, t, h, ps, maxlb, d, npast, bk):
    rng = np.random.default_rng(0)
    n_pages = b * maxlb + 3
    pk, pv, table = make_paged(rng, b, h, ps, maxlb, d, n_pages, None)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)
    k_dense = gather_pages(pk, table)
    v_dense = gather_pages(pv, table)
    ref = attention_ref(q, k_dense, v_dense, npast)
    got = flash_attention(
        q, pk, pv, npast, block_t=32, block_k=bk, page_table=table
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_paged_read_stacked_layers():
    rng = np.random.default_rng(1)
    L, b, t, h, ps, maxlb, d = 2, 2, 1, 2, 64, 2, 32
    n_pages = b * maxlb + 1
    perm = rng.permutation(n_pages)
    table = jnp.asarray(perm[: b * maxlb].reshape(b, maxlb).astype(np.int32))
    pk = jnp.asarray(
        rng.standard_normal((L, n_pages, h, ps, d)), jnp.bfloat16
    )
    pv = jnp.asarray(
        rng.standard_normal((L, n_pages, h, ps, d)), jnp.bfloat16
    )
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([40, 90], jnp.int32)
    for l in range(L):
        ref = attention_ref(
            q, gather_pages(pk[l], table), gather_pages(pv[l], table), npast
        )
        got = flash_attention(
            q, pk, pv, npast, block_t=32, block_k=64,
            layer_idx=jnp.int32(l), page_table=table,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


@pytest.mark.parametrize(
    "b,t,npast",
    [
        (2, 1, [17, 130]),   # decode write mid-page
        (2, 1, [63, 127]),   # write at page tail
        (2, 1, [64, 128]),   # write at page head
        (2, 64, [0, 64]),    # page-aligned prefill chunk (t == ps)
        (2, 32, [32, 96]),   # half-page chunk, aligned to its own size
    ],
)
def test_paged_update_write_and_attend(b, t, npast):
    """Fused paged write+attend: new rows land in the right page/offset and
    the attention output matches the dense oracle computed over the
    post-write gathered cache."""
    rng = np.random.default_rng(2)
    h, ps, maxlb, d = 2, 64, 4, 32
    n_pages = b * maxlb + 2
    pk, pv, table = make_paged(rng, b, h, ps, maxlb, d, n_pages, None)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)

    # oracle: write into the dense gather, attend, then compare both the
    # output and the pages the kernel wrote back
    k_dense = np.asarray(gather_pages(pk, table)).copy()
    v_dense = np.asarray(gather_pages(pv, table)).copy()
    kn = np.asarray(k_new.transpose(0, 2, 1, 3))  # [B, H, T, D]
    vn = np.asarray(v_new.transpose(0, 2, 1, 3))
    for bi in range(b):
        p0 = int(npast[bi])
        k_dense[bi, :, p0 : p0 + t] = kn[bi]
        v_dense[bi, :, p0 : p0 + t] = vn[bi]
    ref = attention_ref(
        q, jnp.asarray(k_dense, jnp.bfloat16),
        jnp.asarray(v_dense, jnp.bfloat16), npast,
    )

    out, pk2, pv2 = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    got_k = np.asarray(gather_pages(pk2[0], table), np.float32)
    want_k = np.asarray(
        jnp.asarray(k_dense, jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got_k, want_k)
    got_v = np.asarray(gather_pages(pv2[0], table), np.float32)
    want_v = np.asarray(
        jnp.asarray(v_dense, jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got_v, want_v)


def test_paged_update_untouched_pages_unchanged():
    """Pages not covered by any write keep their exact bytes (RMW windows
    stay within the written page)."""
    rng = np.random.default_rng(3)
    b, t, h, ps, maxlb, d = 2, 1, 2, 64, 3, 32
    n_pages = b * maxlb + 4
    pk, pv, table = make_paged(rng, b, h, ps, maxlb, d, n_pages, None)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([10, 70], jnp.int32)  # rows in pages 0 and 1
    touched = {int(table[0, 10 // ps]), int(table[1, 70 // ps])}
    before_k = np.asarray(pk).copy()
    _, pk2, _ = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table,
    )
    after_k = np.asarray(pk2[0])
    for p in range(n_pages):
        if p not in touched:
            np.testing.assert_array_equal(after_k[p], before_k[p])


def test_paged_shared_page_read():
    """Two rows alias the same physical page for their first logical block
    (prefix sharing): both must attend the shared data."""
    rng = np.random.default_rng(4)
    b, t, h, ps, maxlb, d = 2, 1, 2, 64, 2, 32
    n_pages = 4
    pk = jnp.asarray(rng.standard_normal((n_pages, h, ps, d)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((n_pages, h, ps, d)), jnp.bfloat16)
    table = jnp.asarray(np.array([[2, 0], [2, 1]], np.int32))  # page 2 shared
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([80, 100], jnp.int32)
    ref = attention_ref(
        q, gather_pages(pk, table), gather_pages(pv, table), npast
    )
    got = flash_attention(
        q, pk, pv, npast, block_t=32, block_k=64, page_table=table
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


# ---------------------------------------------------------------------------
# int8 paged pools: data pages int8, per-row scale planes paged through the
# same block table ([NP, PS, Hpad] pools — ops/kv_quant.py layout per page)

def gather_scales(pool_s, table):
    """[NP, PS, Hp] scale pool + [B, MAXLB] table -> dense [B, S, Hp]."""
    npages, ps, hp = pool_s.shape
    b, maxlb = table.shape
    g = np.asarray(pool_s)[np.asarray(table).reshape(-1)]
    return g.reshape(b, maxlb * ps, hp)


def make_paged_int8(rng, b, h, ps, maxlb, d, n_pages, hpad=128):
    perm = rng.permutation(n_pages)
    table = perm[: b * maxlb].reshape(b, maxlb).astype(np.int32)
    pool_k = rng.integers(-127, 128, (n_pages, h, ps, d)).astype(np.int8)
    pool_v = rng.integers(-127, 128, (n_pages, h, ps, d)).astype(np.int8)
    ks = rng.uniform(0.001, 0.1, (n_pages, ps, hpad)).astype(np.float32)
    vs = rng.uniform(0.001, 0.1, (n_pages, ps, hpad)).astype(np.float32)
    return (jnp.asarray(pool_k), jnp.asarray(pool_v), jnp.asarray(ks),
            jnp.asarray(vs), jnp.asarray(table))


def _dense_dequant(pool, scales, table, h):
    """Gathered + dequantized dense cache [B, H, S, D] (f32)."""
    data = np.asarray(gather_pages(pool, table), np.float32)  # [B, H, S, D]
    sc = gather_scales(scales, table)[..., :h]  # [B, S, H]
    return jnp.asarray(data * sc.transpose(0, 2, 1)[..., None])


@pytest.mark.parametrize(
    "b,t,npast,bk",
    [
        (2, 1, [17, 130], 64),   # decode, mid-page bounds
        (2, 8, [13, 56], 32),    # multi-token, sub-page block
        (1, 64, [64], 64),       # prefill block
    ],
)
def test_paged_read_int8_matches_dense(b, t, npast, bk):
    rng = np.random.default_rng(11)
    h, ps, maxlb, d = 2, 64, 4, 32
    n_pages = b * maxlb + 3
    pk, pv, ks, vs, table = make_paged_int8(rng, b, h, ps, maxlb, d, n_pages)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)
    ref = attention_ref(
        q, _dense_dequant(pk, ks, table, h), _dense_dequant(pv, vs, table, h),
        npast,
    )
    got = flash_attention(
        q, pk, pv, npast, block_t=32, block_k=bk, page_table=table,
        k_scale=ks, v_scale=vs,
    )
    # int8 rows here have ~70x unit magnitude after dequant; scale atol with
    # the output magnitude like the flat int8 test does
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-2,
        atol=3e-2 * max(1.0, float(np.abs(np.asarray(ref)).max())),
    )


@pytest.mark.parametrize(
    "b,t,npast",
    [
        (2, 1, [17, 130]),   # decode write mid-page
        (2, 1, [63, 127]),   # write at page tail
        (2, 1, [64, 128]),   # write at page head
        (2, 32, [32, 96]),   # half-page chunk, aligned to its own size
        (2, 8, [8, 72]),     # small admission bucket
    ],
)
def test_paged_update_int8_write_and_attend(b, t, npast):
    """Fused paged quantize+write+attend: int8 rows and their scales land in
    the right page/offset (exact bytes) and the output matches the dense
    dequant oracle."""
    from llamavk_tpu.ops.kv_quant import quantize_rows

    rng = np.random.default_rng(12)
    h, ps, maxlb, d, hpad = 2, 64, 4, 32, 128
    n_pages = b * maxlb + 2
    pk, pv, ks, vs, table = make_paged_int8(rng, b, h, ps, maxlb, d, n_pages,
                                            hpad)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)

    # oracle: quantize the new rows with the twin quantizer, write data rows
    # + scale rows into the gathered dense views, attend over the dequant
    knq, kns = quantize_rows(k_new)  # [b,t,h,d] int8, [b,t,h] f32
    vnq, vns = quantize_rows(v_new)
    k_dense = np.asarray(gather_pages(pk, table)).copy()
    v_dense = np.asarray(gather_pages(pv, table)).copy()
    ks_dense = gather_scales(ks, table).copy()  # [B, S, Hp]
    vs_dense = gather_scales(vs, table).copy()
    for bi in range(b):
        p0 = int(npast[bi])
        k_dense[bi, :, p0 : p0 + t] = np.asarray(knq)[bi].transpose(1, 0, 2)
        v_dense[bi, :, p0 : p0 + t] = np.asarray(vnq)[bi].transpose(1, 0, 2)
        ks_dense[bi, p0 : p0 + t, :h] = np.asarray(kns)[bi]
        vs_dense[bi, p0 : p0 + t, :h] = np.asarray(vns)[bi]
    kf = k_dense.astype(np.float32) * ks_dense[..., :h].transpose(0, 2, 1)[..., None]
    vf = v_dense.astype(np.float32) * vs_dense[..., :h].transpose(0, 2, 1)[..., None]
    want = attention_ref(q, jnp.asarray(kf), jnp.asarray(vf), npast)

    out, pk2, pv2, ks2, vs2 = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table,
        k_scale=ks[None], v_scale=vs[None],
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=3e-2,
        atol=3e-2 * max(1.0, float(np.abs(np.asarray(want)).max())),
    )
    # written int8 rows match the twin quantizer up to 1 LSB on round-to-
    # nearest boundary elements (XLA may compile x/s as x*(1/s) on one side);
    # untouched rows must be bit-identical, which the mask below implies
    for got_pool, want_dense in (
        (gather_pages(pk2[0], table), k_dense),
        (gather_pages(pv2[0], table), v_dense),
    ):
        diff = np.abs(
            np.asarray(got_pool, np.int32) - want_dense.astype(np.int32)
        )
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 1e-3
    # scales to 1 f32 ULP on the written rows (the /127 may compile as
    # *(1/127) on either side); head lanes >= h in written rows are merged
    # as garbage-masked, so compare only the real head lanes
    got_ks = gather_scales(ks2[0], table)
    got_vs = gather_scales(vs2[0], table)
    np.testing.assert_allclose(got_ks[..., :h], ks_dense[..., :h], rtol=1e-6)
    np.testing.assert_allclose(got_vs[..., :h], vs_dense[..., :h], rtol=1e-6)


def test_paged_update_int8_untouched_pages_unchanged():
    """Neither data nor scale pages outside the written page change."""
    rng = np.random.default_rng(13)
    b, t, h, ps, maxlb, d = 2, 1, 2, 64, 3, 32
    n_pages = b * maxlb + 4
    pk, pv, ks, vs, table = make_paged_int8(rng, b, h, ps, maxlb, d, n_pages)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([10, 70], jnp.int32)
    touched = {int(table[0, 10 // ps]), int(table[1, 70 // ps])}
    before_k = np.asarray(pk).copy()
    before_ks = np.asarray(ks).copy()
    _, pk2, _, ks2, _ = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table,
        k_scale=ks[None], v_scale=vs[None],
    )
    after_k, after_ks = np.asarray(pk2[0]), np.asarray(ks2[0])
    for p in range(n_pages):
        if p not in touched:
            np.testing.assert_array_equal(after_k[p], before_k[p])
            np.testing.assert_array_equal(after_ks[p], before_ks[p])


# ---------------------------------------------------------------------------
# page_straddle: multi-token writes at arbitrary n_past (speculative verify)
# may cross a page boundary — the kernel spills the tail rows into the next
# logical page via a second RMW window

@pytest.mark.parametrize(
    "npast,desc",
    [
        ([61, 10], "row0 straddles 3 rows into its next page"),
        ([63, 127], "single spilled row / boundary at page 2"),
        ([60, 59], "exact fit (t=4 ends at the boundary, no spill)"),
        ([8, 40], "mid-page, no spill"),
    ],
)
def test_paged_update_straddle_write(npast, desc):
    rng = np.random.default_rng(21)
    b, t, h, ps, maxlb, d = 2, 4, 2, 64, 4, 32
    n_pages = b * maxlb + 2
    pk, pv, table = make_paged(rng, b, h, ps, maxlb, d, n_pages, None)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)

    k_dense = np.asarray(gather_pages(pk, table)).copy()
    v_dense = np.asarray(gather_pages(pv, table)).copy()
    kn = np.asarray(k_new.transpose(0, 2, 1, 3))
    vn = np.asarray(v_new.transpose(0, 2, 1, 3))
    for bi in range(b):
        p0 = int(npast[bi])
        k_dense[bi, :, p0 : p0 + t] = kn[bi]
        v_dense[bi, :, p0 : p0 + t] = vn[bi]
    ref = attention_ref(
        q, jnp.asarray(k_dense, jnp.bfloat16),
        jnp.asarray(v_dense, jnp.bfloat16), npast,
    )

    out, pk2, pv2 = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table, page_straddle=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_array_equal(
        np.asarray(gather_pages(pk2[0], table), np.float32),
        np.asarray(jnp.asarray(k_dense, jnp.bfloat16).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(gather_pages(pv2[0], table), np.float32),
        np.asarray(jnp.asarray(v_dense, jnp.bfloat16).astype(jnp.float32)),
    )


@pytest.mark.parametrize(
    "npast,desc",
    [
        ([61, 10], "row0 straddles 3 rows into its next page"),
        ([63, 127], "single spilled row / boundary at page 2"),
        ([60, 59], "exact fit (t=4 ends at the boundary, no spill)"),
    ],
)
def test_paged_update_straddle_int8(npast, desc):
    """Quantized page_straddle: spilled rows land at the head of the next
    mapped page in BOTH the data pool and the scale pool (exact bytes /
    1-ULP scales), and the fused attend matches the dense dequant oracle."""
    from llamavk_tpu.ops.kv_quant import quantize_rows

    rng = np.random.default_rng(23)
    b, t, h, ps, maxlb, d, hpad = 2, 4, 2, 64, 4, 32, 128
    n_pages = b * maxlb + 2
    pk, pv, ks, vs, table = make_paged_int8(rng, b, h, ps, maxlb, d, n_pages,
                                            hpad)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray(npast, jnp.int32)

    knq, kns = quantize_rows(k_new)
    vnq, vns = quantize_rows(v_new)
    k_dense = np.asarray(gather_pages(pk, table)).copy()
    v_dense = np.asarray(gather_pages(pv, table)).copy()
    ks_dense = gather_scales(ks, table).copy()
    vs_dense = gather_scales(vs, table).copy()
    for bi in range(b):
        p0 = int(npast[bi])
        k_dense[bi, :, p0 : p0 + t] = np.asarray(knq)[bi].transpose(1, 0, 2)
        v_dense[bi, :, p0 : p0 + t] = np.asarray(vnq)[bi].transpose(1, 0, 2)
        ks_dense[bi, p0 : p0 + t, :h] = np.asarray(kns)[bi]
        vs_dense[bi, p0 : p0 + t, :h] = np.asarray(vns)[bi]
    kf = k_dense.astype(np.float32) * ks_dense[..., :h].transpose(0, 2, 1)[..., None]
    vf = v_dense.astype(np.float32) * vs_dense[..., :h].transpose(0, 2, 1)[..., None]
    want = attention_ref(q, jnp.asarray(kf), jnp.asarray(vf), npast)

    out, pk2, pv2, ks2, vs2 = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table, page_straddle=True,
        k_scale=ks[None], v_scale=vs[None],
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=3e-2,
        atol=3e-2 * max(1.0, float(np.abs(np.asarray(want)).max())),
    )
    for got_pool, want_dense in (
        (gather_pages(pk2[0], table), k_dense),
        (gather_pages(pv2[0], table), v_dense),
    ):
        diff = np.abs(
            np.asarray(got_pool, np.int32) - want_dense.astype(np.int32)
        )
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 1e-3
    got_ks = gather_scales(ks2[0], table)
    got_vs = gather_scales(vs2[0], table)
    np.testing.assert_allclose(got_ks[..., :h], ks_dense[..., :h], rtol=1e-6)
    np.testing.assert_allclose(got_vs[..., :h], vs_dense[..., :h], rtol=1e-6)


def test_paged_update_straddle_int8_untouched_pages_unchanged():
    """int8 straddle: pages outside {written, spill} keep exact bytes in the
    data AND scale pools; a no-spill page-B rewrite is byte-identical."""
    rng = np.random.default_rng(24)
    b, t, h, ps, maxlb, d = 2, 4, 2, 64, 3, 32
    n_pages = b * maxlb + 4
    pk, pv, ks, vs, table = make_paged_int8(rng, b, h, ps, maxlb, d, n_pages)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([62, 10], jnp.int32)  # row0 spills 2 rows; row1 not
    touched = {
        int(table[0, 62 // ps]), int(table[0, (62 + t - 1) // ps]),
        int(table[1, 10 // ps]),
    }
    before_k = np.asarray(pk).copy()
    before_ks = np.asarray(ks).copy()
    _, pk2, _, ks2, _ = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table, page_straddle=True,
        k_scale=ks[None], v_scale=vs[None],
    )
    after_k, after_ks = np.asarray(pk2[0]), np.asarray(ks2[0])
    for p in range(n_pages):
        if p not in touched:
            np.testing.assert_array_equal(after_k[p], before_k[p])
            np.testing.assert_array_equal(after_ks[p], before_ks[p])


def test_paged_update_straddle_untouched_pages_unchanged():
    """Pages outside {written page, spill page} keep their exact bytes; when
    nothing spills, the benign page-B rewrite must be byte-identical."""
    rng = np.random.default_rng(22)
    b, t, h, ps, maxlb, d = 2, 4, 2, 64, 3, 32
    n_pages = b * maxlb + 4
    pk, pv, table = make_paged(rng, b, h, ps, maxlb, d, n_pages, None)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    npast = jnp.asarray([62, 10], jnp.int32)  # row0 spills 2 rows; row1 not
    touched = {
        int(table[0, 62 // ps]), int(table[0, (62 + t - 1) // ps]),
        int(table[1, 10 // ps]),
    }
    before_k = np.asarray(pk).copy()
    _, pk2, _ = flash_attention_update(
        q, k_new, v_new, pk[None], pv[None], npast, jnp.int32(0),
        block_t=32, block_k=64, page_table=table, page_straddle=True,
    )
    after_k = np.asarray(pk2[0])
    # row1's no-spill page-B rewrite hits table[1, 1] — unchanged bytes
    for p in range(n_pages):
        if p not in touched:
            np.testing.assert_array_equal(after_k[p], before_k[p])
