"""Paged KV cache: allocator semantics, paged flash attention vs the dense
oracle, and paged-vs-flat engine stream equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest

from llamavk_tpu.models import (
    init_kv_cache, init_paged_kv_cache, llama_forward, load_model,
    random_tiny_model,
)
from llamavk_tpu.runtime.batching import BatchConfig, BatchedEngine
from llamavk_tpu.runtime.paged import PageAllocator, SlotPages
from llamavk_tpu.runtime.sampling import SamplerParams

GREEDY = SamplerParams(temp=0.0)


def test_allocator_alloc_release():
    a = PageAllocator(4)
    p = a.alloc(3)
    assert len(set(p)) == 3 and a.n_free == 1
    a.release(p[:2])
    assert a.n_free == 3
    with pytest.raises(MemoryError):
        a.alloc(4)
    a.release(p[2:])
    assert a.n_free == 4


def test_allocator_refcount_sharing():
    a = PageAllocator(4)
    shared = a.alloc(2)
    a.retain(shared)  # second user
    a.release(shared)
    assert a.n_free == 2  # still held by the first user
    a.release(shared)
    assert a.n_free == 4


def test_slot_pages_ensure_and_free():
    a = PageAllocator(8)
    sp = SlotPages(max_batch=2, max_pages_per_slot=4, allocator=a)
    sp.ensure(0, 100, page_size=64)  # 2 pages
    assert sp.n_mapped[0] == 2 and a.n_free == 6
    sp.ensure(0, 120, page_size=64)  # still 2 pages
    assert sp.n_mapped[0] == 2 and a.n_free == 6
    sp.ensure(0, 129, page_size=64)  # 3 pages
    assert sp.n_mapped[0] == 3 and a.n_free == 5
    sp.ensure(1, 64, page_size=64)
    assert a.n_free == 4
    sp.free_slot(0)
    assert a.n_free == 7 and sp.n_mapped[0] == 0


def test_slot_pages_share_prefix():
    a = PageAllocator(8)
    sp = SlotPages(max_batch=2, max_pages_per_slot=4, allocator=a)
    pfx = a.alloc(2)  # a registered prefix owns 2 full pages
    sp.share(0, pfx)
    sp.ensure(0, 3 * 64, page_size=64)  # 1 more page for the suffix
    assert list(sp.table[0, :3]) == pfx + sp.owned[0][2:]
    assert a.n_free == 5
    sp.free_slot(0)  # returns the suffix page; prefix pages stay retained
    assert a.n_free == 6
    a.release(pfx)
    assert a.n_free == 8


def test_slot_pages_exhaustion():
    a = PageAllocator(2)
    sp = SlotPages(max_batch=2, max_pages_per_slot=4, allocator=a)
    sp.ensure(0, 128, page_size=64)
    with pytest.raises(MemoryError):
        sp.ensure(1, 64, page_size=64)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-q4_0.bin")
    random_tiny_model(write_path=path, quantize=True)
    return load_model(path)


def test_paged_forward_matches_flat(tiny):
    """llama_forward through a scrambled page table == flat-cache forward,
    across prefill + per-row-n_past decode steps."""
    cfg, params, _ = tiny
    rng = np.random.default_rng(5)
    b, ps, maxlb = 2, 8, 4
    toks = rng.integers(0, cfg.n_vocab, (b, 8)).astype(np.int32)

    flat = init_kv_cache(cfg, b, ps * maxlb)
    pool = init_paged_kv_cache(cfg, n_pages=b * maxlb + 3, page_size=ps)
    perm = rng.permutation(pool.k.shape[1])
    table = jnp.asarray(perm[: b * maxlb].reshape(b, maxlb).astype(np.int32))

    # prefill (t=8 fills exactly one page per row)
    lf, flat, _ = llama_forward(
        params, jnp.asarray(toks), flat, jnp.zeros(b, jnp.int32), cfg
    )
    lp, pool, _ = llama_forward(
        params, jnp.asarray(toks), pool, jnp.zeros(b, jnp.int32), cfg,
        page_table=table,
    )
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lp), rtol=2e-2, atol=2e-2
    )

    # decode with per-row positions (crosses a page boundary at 16)
    n_past = jnp.asarray([8, 8], jnp.int32)
    tok = jnp.argmax(lp[:, -1], -1).astype(jnp.int32)
    for _ in range(10):
        lf, flat, _ = llama_forward(
            params, tok[:, None], flat, n_past, cfg
        )
        lp, pool, _ = llama_forward(
            params, tok[:, None], pool, n_past, cfg, page_table=table
        )
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lp), rtol=2e-2, atol=2e-2
        )
        assert (np.argmax(np.asarray(lf)[:, -1], -1)
                == np.argmax(np.asarray(lp)[:, -1], -1)).all()
        tok = jnp.argmax(lp[:, -1], -1).astype(jnp.int32)
        n_past = n_past + 1


def _flat_streams(cfg, params, subs, n_ctx=64, **kw):
    """Flat-engine oracle streams, with the kernels' KV block pinned to the
    paged engine's page size (8): identical online-softmax accumulation
    order makes even seeded SAMPLED streams exactly comparable (a flat
    kernel fitted to n_ctx sums in a different f32 order, and a categorical
    draw near a probability boundary can flip — not a paging bug)."""
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=4, n_ctx=n_ctx,
                                                block=4, kv_block=8))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    return [r.generated for r in reqs]


def test_paged_engine_matches_flat(tiny):
    """Paged engine greedy + seeded-sampled streams == flat engine streams
    (same admission chunking, same sampler state machine)."""
    cfg, params, _ = tiny
    subs = [
        (([5, 9, 2, 30], 6, GREEDY), {}),
        (([7, 3, 11], 6, GREEDY), {}),
        (([1, 2, 3, 4, 5, 6], 5,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
        (([42], 6, GREEDY), {}),
    ]
    want = _flat_streams(cfg, params, subs)
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, paged=True, page_size=8,
    ))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    # pages all returned (plus the reserved trash page)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_prefix_page_sharing(tiny):
    """register_prefix shares the prefix's full pages read-only across
    slots; streams equal the flat engine's prefix-caching streams."""
    cfg, params, _ = tiny
    prefix = list(range(3, 22))  # 19 tokens: 2 full 8-row pages + 3 rem
    suffixes = [[3, 1], [4, 4, 4], [8]]

    flat = BatchedEngine(cfg, params, BatchConfig(max_batch=4, n_ctx=64,
                                                  block=4, kv_block=8))
    fp = flat.register_prefix(prefix)
    fr = [flat.submit(s, 5, GREEDY, ignore_eos=True, prefix=fp)
          for s in suffixes]
    flat.run()

    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, paged=True, page_size=8,
    ))
    pid = be.register_prefix(prefix)
    pages = be.prefixes[pid][0]
    assert len(pages) == 2
    rs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
          for s in suffixes]
    be.run()
    for a, b in zip(rs, fr):
        assert a.generated == b.generated
    # prefix pages survive slot frees (still retained by the registry)
    assert all(be.pager.alloc.refs[p] == 1 for p in pages)


def test_paged_engine_preemption_and_oversubscription(tiny):
    """A pool smaller than max_batch x n_ctx serves every request anyway:
    the youngest is preempted when pages run dry and recomputes on
    re-admission — greedy streams stay EXACT."""
    cfg, params, _ = tiny
    prompts = [[5, 9, 2, 30], [7, 3, 11], [1, 2, 3]]
    want = _flat_streams(cfg, params, [((p, 20, GREEDY), {}) for p in prompts])
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=3, n_ctx=64, block=4, paged=True, page_size=8,
        n_pages=8,  # 7 usable pages = 56 rows for 3 requests needing ~28 each
    ))
    reqs = [be.submit(p, 20, GREEDY, ignore_eos=True) for p in prompts]
    be.run()
    assert be.stats.get("preempted", 0) > 0
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_page_reuse_across_waves(tiny):
    """Second wave reuses the first wave's freed pages (scrambled physical
    order) and still matches the flat streams."""
    cfg, params, _ = tiny
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=2, n_ctx=64, block=4, paged=True, page_size=8,
    ))
    waves = [[[5, 9, 2], [7, 3]], [[11, 12, 13], [1]]]
    for wave in waves:
        want = _flat_streams(cfg, params, [((p, 6, GREEDY), {}) for p in wave])
        reqs = [be.submit(p, 6, GREEDY, ignore_eos=True) for p in wave]
        be.run()
        for r, w in zip(reqs, want):
            assert r.generated == w


# ---------------------------------------------------------------------------
# int8 paged pools (paged x quantized composition)

def test_paged_forward_matches_flat_int8(tiny):
    """int8 paged forward == int8 flat forward with the SAME kv block (32):
    identical quantization and online-softmax accumulation order."""
    cfg, params, _ = tiny
    rng = np.random.default_rng(6)
    b, ps, maxlb = 2, 32, 2
    toks = rng.integers(0, cfg.n_vocab, (b, 8)).astype(np.int32)

    flat = init_kv_cache(cfg, b, ps * maxlb, dtype=jnp.int8)
    pool = init_paged_kv_cache(cfg, n_pages=b * maxlb + 3, page_size=ps,
                               dtype=jnp.int8)
    assert pool.quantized and pool.k_scale.shape[1] == b * maxlb + 3
    perm = rng.permutation(pool.k.shape[1])
    table = jnp.asarray(perm[: b * maxlb].reshape(b, maxlb).astype(np.int32))

    lf, flat, _ = llama_forward(
        params, jnp.asarray(toks), flat, jnp.zeros(b, jnp.int32), cfg,
        kv_block=ps,
    )
    lp, pool, _ = llama_forward(
        params, jnp.asarray(toks), pool, jnp.zeros(b, jnp.int32), cfg,
        kv_block=ps, page_table=table,
    )
    np.testing.assert_allclose(
        np.asarray(lf), np.asarray(lp), rtol=2e-2, atol=2e-2
    )

    n_past = jnp.asarray([8, 8], jnp.int32)
    tok = jnp.argmax(lp[:, -1], -1).astype(jnp.int32)
    for _ in range(8):
        lf, flat, _ = llama_forward(
            params, tok[:, None], flat, n_past, cfg, kv_block=ps
        )
        lp, pool, _ = llama_forward(
            params, tok[:, None], pool, n_past, cfg, kv_block=ps,
            page_table=table,
        )
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lp), rtol=2e-2, atol=2e-2
        )
        assert (np.argmax(np.asarray(lf)[:, -1], -1)
                == np.argmax(np.asarray(lp)[:, -1], -1)).all()
        tok = jnp.argmax(lp[:, -1], -1).astype(jnp.int32)
        n_past = n_past + 1


def test_paged_engine_matches_flat_int8(tiny):
    """int8 paged engine streams == int8 flat engine streams (kv block
    pinned to the page size on both sides — same f32 summation order)."""
    cfg, params, _ = tiny
    subs = [
        (([5, 9, 2, 30], 6, GREEDY), {}),
        (([7, 3, 11], 6, GREEDY), {}),
        (([1, 2, 3, 4, 5, 6], 5,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
        (([42], 6, GREEDY), {}),
    ]
    flat = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, kv_dtype="int8", kv_block=32,
    ))
    fr = [flat.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    flat.run()

    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, kv_dtype="int8", paged=True,
        page_size=32,
    ))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, fr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_int8_prefix_and_preemption(tiny):
    """int8 pools: prefix full-page sharing (data + scale pages aliased) and
    preempt-recompute both keep greedy streams exact."""
    cfg, params, _ = tiny
    prefix = list(range(3, 40))  # 37 tokens: 1 full 32-row page + 5 rem
    suffixes = [[3, 1], [4, 4, 4], [8]]
    flat = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, kv_dtype="int8", kv_block=32,
    ))
    fp = flat.register_prefix(prefix)
    fr = [flat.submit(s, 5, GREEDY, ignore_eos=True, prefix=fp)
          for s in suffixes]
    flat.run()

    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, kv_dtype="int8", paged=True,
        page_size=32, n_pages=7,  # tight pool: exercises preemption too
    ))
    pid = be.register_prefix(prefix)
    assert len(be.prefixes[pid][0]) == 1
    rs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
          for s in suffixes]
    be.run()
    for a, b in zip(rs, fr):
        assert a.generated == b.generated


# ---------------------------------------------------------------------------
# paged x lookup speculation (verify writes straddle page boundaries)

def _flat_lookup_streams(cfg, params, subs, gamma, n_ctx=64, kv_block=8,
                         kv_dtype="bfloat16", max_batch=4):
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=max_batch, n_ctx=n_ctx, block=4, kv_block=kv_block,
        lookup_gamma=gamma, kv_dtype=kv_dtype,
    ))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    return [r.generated for r in reqs]


def test_paged_engine_lookup_matches_flat(tiny):
    """Paged + prompt-lookup speculation: greedy and seeded-sampled streams
    equal the flat lookup engine's (same kv block => same accumulation
    order; the gamma-row verify writes cross page boundaries through the
    kernel's page_straddle path)."""
    cfg, params, _ = tiny
    subs = [
        (([5, 9, 2, 30, 5, 9], 8, GREEDY), {}),
        (([7, 3, 11, 7, 3], 8, GREEDY), {}),
        (([1, 2, 3, 1, 2, 3], 6,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
    ]
    g = 3
    want = _flat_lookup_streams(cfg, params, subs, g)
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, paged=True, page_size=8,
        lookup_gamma=g,
    ))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_lookup_matches_flat_int8(tiny):
    """int8 paged + prompt-lookup: the gamma-row verify writes spill across
    page boundaries through the kernel's quantized page_straddle path (data
    pages AND scale-plane pages); greedy and seeded-sampled streams equal
    the int8 flat lookup engine's (kv block pinned to the page size)."""
    cfg, params, _ = tiny
    subs = [
        (([5, 9, 2, 30, 5, 9], 10, GREEDY), {}),
        (([7, 3, 11, 7, 3], 8, GREEDY), {}),
        (([1, 2, 3, 1, 2, 3], 6,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
    ]
    g = 3
    want = _flat_lookup_streams(
        cfg, params, subs, g, kv_block=32, kv_dtype="int8"
    )
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=4, n_ctx=64, block=4, paged=True, page_size=32,
        kv_dtype="int8", lookup_gamma=g,
    ))
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_lookup_int8_preemption(tiny):
    """int8 paged lookup under a tight pool: preempt + recompute keeps
    greedy streams exact (scale pages freed and reused with the data)."""
    cfg, params, _ = tiny
    prompts = [[5, 9, 2, 30, 5, 9], [7, 3, 11, 7], [1, 2, 3, 1]]
    g = 3
    # n_predict 24 pushes every slot past one 32-row page mid-decode while
    # the pool holds only 3 usable pages — decode-time preemption must fire
    want = _flat_lookup_streams(
        cfg, params, [((p, 24, GREEDY), {}) for p in prompts], g,
        kv_block=32, kv_dtype="int8", max_batch=3,
    )
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=3, n_ctx=64, block=4, paged=True, page_size=32,
        kv_dtype="int8", lookup_gamma=g, n_pages=4,
    ))
    reqs = [be.submit(p, 24, GREEDY, ignore_eos=True) for p in prompts]
    be.run()
    assert be.stats.get("preempted", 0) > 0
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_paged_engine_lookup_preemption(tiny):
    """Lookup + tight pool: preempt-youngest + recompute-on-readmission
    (generated tokens re-enter the prefill, ctx rows reseeded) keeps greedy
    streams exact."""
    cfg, params, _ = tiny
    prompts = [[5, 9, 2, 30, 5, 9], [7, 3, 11, 7], [1, 2, 3, 1]]
    g = 3
    want = _flat_lookup_streams(
        cfg, params, [((p, 16, GREEDY), {}) for p in prompts], g
    )
    be = BatchedEngine(cfg, params, BatchConfig(
        max_batch=3, n_ctx=64, block=4, paged=True, page_size=8,
        lookup_gamma=g, n_pages=9,
    ))
    reqs = [be.submit(p, 16, GREEDY, ignore_eos=True) for p in prompts]
    be.run()
    assert be.stats.get("preempted", 0) > 0
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1
