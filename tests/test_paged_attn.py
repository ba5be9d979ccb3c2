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
