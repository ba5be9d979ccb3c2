"""Tensor-parallel serving: BatchedEngine(mesh=...) runs the continuous-
batching scheduler over a TP replica (Megatron split per parallel/sharding).
Oracle: a manual greedy loop over make_sharded_forward with the SAME tp
config — identical math, so streams must match exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.formats.ggml_io import CheckpointReader
from llamavk_tpu.models import init_kv_cache, random_tiny_model
from llamavk_tpu.models.loader import params_from_reader
from llamavk_tpu.parallel import (
    make_mesh, make_sharded_forward, shard_cache, shard_params,
)
from llamavk_tpu.runtime.batching import BatchConfig, BatchedEngine
from llamavk_tpu.runtime.sampling import SamplerParams

GREEDY = SamplerParams(temp=0.0)


@pytest.fixture(scope="module")
def tiny_tp(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-tp.bin")
    # dims divisible by tp with >=64-wide row chunks (like test_parallel)
    random_tiny_model(
        write_path=path, n_embd=512, n_head=8, n_ff=512, n_vocab=256,
        quantize=True,
    )
    return path


def _oracle_streams(cfg, params_shard, mesh, prompts, n_pred, n_ctx=64,
                    kv_dtype="bfloat16"):
    quantized = jnp.dtype(kv_dtype) == jnp.int8
    fwd = make_sharded_forward(cfg, params_shard, mesh, quantized_kv=quantized)
    from llamavk_tpu.models.llama import scale_lane_pad

    hpad = scale_lane_pad(cfg.n_head, int(mesh.shape["tp"]))
    outs = []
    for p, n in zip(prompts, n_pred):
        cache = shard_cache(
            init_kv_cache(cfg, 1, n_ctx, dtype=jnp.dtype(kv_dtype), h_pad=hpad),
            mesh,
        )
        logits, cache, _ = fwd(
            params_shard, jnp.asarray([p], jnp.int32), cache, jnp.int32(0)
        )
        tok = int(np.argmax(np.asarray(logits)[0, -1]))
        stream, n_past = [tok], len(p)
        for _ in range(n - 1):
            logits, cache, _ = fwd(
                params_shard, jnp.asarray([[tok]], jnp.int32), cache,
                jnp.int32(n_past),
            )
            tok = int(np.argmax(np.asarray(logits)[0, -1]))
            stream.append(tok)
            n_past += 1
        outs.append(stream)
    return outs


def test_tp_engine_matches_sharded_forward(tiny_tp):
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_tp, mesh)

    prompts = [[5, 9, 2, 30], [7, 3, 11], [1, 2, 3, 4, 5, 6]]
    n_pred = [6, 6, 5]
    want = _oracle_streams(cfg, params_shard, mesh, prompts, n_pred)

    be = BatchedEngine(
        cfg, params_tp, BatchConfig(max_batch=4, n_ctx=64, block=4),
        mesh=mesh,
    )
    reqs = [be.submit(p, n, GREEDY, ignore_eos=True)
            for p, n in zip(prompts, n_pred)]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)


def test_tp_engine_prefix_caching(tiny_tp):
    """register_prefix under TP: prefix rows prefill once into a sharded
    cache and seed admissions; streams equal the flat-prompt oracle."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_tp, mesh)

    prefix = list(range(3, 20))
    suffixes = [[3, 1], [4, 4, 4]]
    want = _oracle_streams(
        cfg, params_shard, mesh, [prefix + s for s in suffixes], [5, 5]
    )

    be = BatchedEngine(
        cfg, params_tp, BatchConfig(max_batch=4, n_ctx=64, block=4),
        mesh=mesh,
    )
    pid = be.register_prefix(prefix)
    reqs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
            for s in suffixes]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)


def test_tp_engine_int8_kv(tiny_tp):
    """int8 KV x tensor parallel: the scale planes carry a per-shard
    128-aligned lane tile (scale_lane_pad) so global-sharded caches and the
    shard_map-local admission scratch caches agree; streams must match the
    int8 sharded-forward oracle exactly."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_tp, mesh)

    prompts = [[5, 9, 2, 30], [7, 3, 11]]
    n_pred = [6, 5]
    want = _oracle_streams(
        cfg, params_shard, mesh, prompts, n_pred, kv_dtype="int8"
    )

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8"),
        mesh=mesh,
    )
    reqs = [be.submit(p, n, GREEDY, ignore_eos=True)
            for p, n in zip(prompts, n_pred)]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)


def test_tp_engine_int8_prefix_caching(tiny_tp):
    """int8 KV x tp x prefix caching: the prefix cache prefills into a
    sharded int8 cache (global lane pad) and seeds suffix-only admissions."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_tp, mesh)

    prefix = list(range(3, 15))
    suffixes = [[3, 1], [4, 4, 4]]
    want = _oracle_streams(
        cfg, params_shard, mesh, [prefix + s for s in suffixes], [5, 5],
        kv_dtype="int8",
    )

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8"),
        mesh=mesh,
    )
    pid = be.register_prefix(prefix)
    reqs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
            for s in suffixes]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)


def test_dp_engine_matches_plain(tiny_tp):
    """dp-only mesh: request slots shard over the dp axis, every dp group
    decodes its slice in one lockstep program. No tp collectives are
    involved, so streams equal the plain single-device engine's exactly —
    greedy AND seeded-sampled (sampling is row-wise)."""
    reader = CheckpointReader(tiny_tp)
    cfg, params = params_from_reader(reader)
    subs = [
        (([5, 9, 2, 30], 6, GREEDY), {}),
        (([7, 3, 11], 6, GREEDY), {}),
        (([1, 2, 3, 4, 5, 6], 5,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
        (([42], 6, GREEDY), {}),
    ]
    bcfg = BatchConfig(max_batch=4, n_ctx=64, block=4)
    plain = BatchedEngine(cfg, params, bcfg)
    pr = [plain.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    plain.run()

    mesh = make_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    be = BatchedEngine(cfg, params, bcfg, mesh=mesh)
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, pr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)


def test_dp_tp_engine_with_prefix_and_int8(tiny_tp):
    """dp x tp x int8 KV x prefix caching all composed: streams equal the
    tp-only (dp=1) mesh engine's — the dp axis only re-partitions slots."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    prefix = list(range(3, 15))
    suffixes = [[3, 1], [4, 4, 4], [9], [2, 2]]
    bcfg = BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8")

    mesh1 = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    ref = BatchedEngine(cfg, params_tp, bcfg, mesh=mesh1)
    fp = ref.register_prefix(prefix)
    fr = [ref.submit(s, 5, GREEDY, ignore_eos=True, prefix=fp)
          for s in suffixes]
    ref.run()

    mesh2 = make_mesh(tp=tp, dp=2, devices=jax.devices()[:2 * tp])
    be = BatchedEngine(cfg, params_tp, bcfg, mesh=mesh2)
    pid = be.register_prefix(prefix)
    reqs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
            for s in suffixes]
    be.run()
    for r, w in zip(reqs, fr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)


def test_tp_engine_paged_matches_flat_tp(tiny_tp):
    """Paged KV x tensor parallel: the page pool's head axis shards like the
    flat cache's; block tables and per-slot vectors stay replicated. Streams
    equal the flat tp engine's with the kv block pinned to the page size
    (same psum order, same online-softmax accumulation order)."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    subs = [
        (([5, 9, 2, 30], 6, GREEDY), {}),
        (([7, 3, 11], 6, GREEDY), {}),
        (([1, 2, 3, 4, 5, 6], 5,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
    ]
    flat = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_block=8), mesh=mesh,
    )
    fr = [flat.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    flat.run()

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, paged=True, page_size=8),
        mesh=mesh,
    )
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, fr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_tp_engine_paged_int8_prefix(tiny_tp):
    """int8 page pool x tp x prefix page sharing: the scale-plane pool
    carries the per-shard lane pad; prefix full pages prefill once through
    _prefill_paged (shard_map) and alias read-only across slots."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    prefix = list(range(3, 40))  # 37 tokens: 1 full 32-row page + 5 rem
    suffixes = [[3, 1], [4, 4, 4]]

    flat = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8",
                    kv_block=32),
        mesh=mesh,
    )
    fp = flat.register_prefix(prefix)
    fr = [flat.submit(s, 5, GREEDY, ignore_eos=True, prefix=fp)
          for s in suffixes]
    flat.run()

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8",
                    paged=True, page_size=32),
        mesh=mesh,
    )
    pid = be.register_prefix(prefix)
    assert len(be.prefixes[pid][0]) == 1
    rs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
          for s in suffixes]
    be.run()
    for a, b in zip(rs, fr):
        assert a.generated == b.generated, (a.generated, b.generated)


def test_tp_engine_lookup_greedy_equivalence(tiny_tp):
    """Prompt-lookup speculation x tensor parallel: greedy lookup streams
    equal the plain tp engine's exactly (lookup is lossless for greedy),
    with real acceptances on self-repeating prompts."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    prompts = [[5, 9, 2, 30, 5, 9], [7, 3, 11, 7, 3]]

    plain = BatchedEngine(
        cfg, params_tp, BatchConfig(max_batch=2, n_ctx=64, block=4),
        mesh=mesh,
    )
    # 24 tokens: tiny-model greedy streams go periodic within a few tokens,
    # so the 2-gram matcher reliably finds acceptances over this horizon
    pr = [plain.submit(p, 24, GREEDY, ignore_eos=True) for p in prompts]
    plain.run()

    look = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=2, n_ctx=64, block=4, lookup_gamma=3),
        mesh=mesh,
    )
    lr = [look.submit(p, 24, GREEDY, ignore_eos=True) for p in prompts]
    look.run()
    assert look.stats.get("accepted", 0) > 0  # speculation really fired
    for a, b in zip(lr, pr):
        assert a.generated == b.generated, (a.prompt, a.generated, b.generated)


def test_tp_engine_lookup_paged(tiny_tp):
    """lookup x paged x tp: verify writes straddle pages through the meshed
    paged closures; greedy streams equal the flat-tp lookup engine's with
    the kv block pinned to the page size."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    prompts = [[5, 9, 2, 30, 5, 9], [7, 3, 11, 7, 3]]

    flat = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=2, n_ctx=64, block=4, lookup_gamma=3,
                    kv_block=8),
        mesh=mesh,
    )
    fr = [flat.submit(p, 8, GREEDY, ignore_eos=True) for p in prompts]
    flat.run()

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=2, n_ctx=64, block=4, lookup_gamma=3,
                    paged=True, page_size=8),
        mesh=mesh,
    )
    reqs = [be.submit(p, 8, GREEDY, ignore_eos=True) for p in prompts]
    be.run()
    for r, w in zip(reqs, fr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)
    assert be.pager.alloc.n_free == be.pager.alloc.n_pages - 1


def test_dp_engine_lookup_sampled_matches_plain(tiny_tp):
    """Lookup speculation x dp: greedy AND seeded-sampled streams equal the
    plain (non-mesh) lookup engine's — dp only re-partitions the slot rows,
    the per-row rejection sampling draws identically."""
    reader = CheckpointReader(tiny_tp)
    cfg, params = params_from_reader(reader)
    subs = [
        (([5, 9, 2, 30, 5, 9], 8, GREEDY), {}),
        (([1, 2, 3, 1, 2, 3], 6,
          SamplerParams(temp=1.1, top_k=20, top_p=0.9)), {"seed": 7}),
    ]
    bcfg = BatchConfig(max_batch=2, n_ctx=64, block=4, lookup_gamma=3)
    plain = BatchedEngine(cfg, params, bcfg)
    pr = [plain.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    plain.run()

    mesh = make_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    be = BatchedEngine(cfg, params, bcfg, mesh=mesh)
    reqs = [be.submit(*a, **dict(k, ignore_eos=True)) for a, k in subs]
    be.run()
    for r, w in zip(reqs, pr):
        assert r.generated == w.generated, (r.prompt, r.generated, w.generated)


def test_tp_engine_sampled_deterministic(tiny_tp):
    """Seeded sampled streams are reproducible across engine instances (the
    per-device sampler runs on replicated logits — every device draws the
    same token)."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    sp = SamplerParams(temp=1.1, top_k=20, top_p=0.9)

    def run_once():
        be = BatchedEngine(
            cfg, params_tp, BatchConfig(max_batch=2, n_ctx=64, block=4),
            mesh=mesh,
        )
        r = be.submit([1, 2, 3, 4], 6, sp, seed=7, ignore_eos=True)
        be.run()
        return r.generated

    s1, s2 = run_once(), run_once()
    assert s1 == s2 and len(s1) == 6


def _prefix_pool_oracle_tp(cfg, params_shard, mesh, prefix, suffixes, n_pred,
                           kv_dtype="int8", n_ctx=64, prefix_ctx=256,
                           kv_block=32):
    """Sharded oracle for the shared-prefix POOL under tp: prefill the
    prefix once into a bf16 single-row cache (the pool, heads tp-sharded),
    then run each suffix + greedy decode against an int8 slot cache holding
    ONLY suffix rows — per-request llama_forward execution of exactly the
    composition BatchedEngine(shared_prefix, mesh=) implements."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from llamavk_tpu.models.llama import llama_forward, scale_lane_pad
    from llamavk_tpu.parallel.sharding import cache_pspec, param_pspecs

    tp_size = int(mesh.shape["tp"])
    quantized = jnp.dtype(kv_dtype) == jnp.int8
    hpad = scale_lane_pad(cfg.n_head, tp_size)
    pspecs = param_pspecs(params_shard)
    cspec_pool = cache_pspec(quantized=False, batch_axis=None)
    cspec_slot = cache_pspec(quantized=quantized, batch_axis=None)
    POOL = P(None, None, "tp", None, None)
    R = P()

    def fwd_pool(p, toks, cache, n_past, last_idx):
        return llama_forward(p, toks, cache, n_past, cfg, last_idx=last_idx,
                             tp_axis="tp", tp_size=tp_size, kv_block=kv_block)

    pool_sh = jax.jit(jax.shard_map(
        fwd_pool, mesh=mesh, in_specs=(pspecs, R, cspec_pool, R, R),
        out_specs=(R, cspec_pool, R), check_vma=False,
    ))

    def fwd_pfx(p, toks, cache, n_past, last_idx, pk, pv, pid, plen):
        return llama_forward(p, toks, cache, n_past, cfg, last_idx=last_idx,
                             tp_axis="tp", tp_size=tp_size, kv_block=kv_block,
                             prefix_kv=(pk, pv), prefix_id=pid,
                             prefix_len=plen)

    pfx_sh = jax.jit(jax.shard_map(
        fwd_pfx, mesh=mesh,
        in_specs=(pspecs, R, cspec_slot, R, R, POOL, POOL, R, R),
        out_specs=(R, cspec_slot, R), check_vma=False,
    ))

    plen = len(prefix)
    bucket = 8
    while bucket < plen:
        bucket *= 2
    cacheP = shard_cache(init_kv_cache(cfg, 1, prefix_ctx), mesh,
                         batch_axis=None)
    toksP = np.zeros((1, bucket), np.int32)
    toksP[0, :plen] = prefix
    _, cacheP, _ = pool_sh(params_shard, jnp.asarray(toksP), cacheP,
                           jnp.int32(0), jnp.int32(plen - 1))
    pk, pv = cacheP.k, cacheP.v  # [L, 1, Hloc(sharded), Sp, D] pool, NP=1
    pid = jnp.zeros((1,), jnp.int32)
    pvec = jnp.full((1,), plen, jnp.int32)

    outs = []
    for s, n in zip(suffixes, n_pred):
        slot = shard_cache(
            init_kv_cache(cfg, 1, n_ctx, dtype=jnp.dtype(kv_dtype),
                          h_pad=hpad),
            mesh, batch_axis=None,
        )
        sb = 8
        while sb < len(s):
            sb *= 2
        toksS = np.zeros((1, sb), np.int32)
        toksS[0, : len(s)] = s
        logits, slot, _ = pfx_sh(
            params_shard, jnp.asarray(toksS), slot, pvec,
            jnp.asarray([len(s) - 1], np.int32), pk, pv, pid, pvec,
        )
        tok = int(np.argmax(np.asarray(logits)[0, -1]))
        stream, npos = [tok], plen + len(s)
        for _ in range(n - 1):
            logits, slot, _ = pfx_sh(
                params_shard, jnp.asarray([[tok]], jnp.int32), slot,
                jnp.asarray([npos], np.int32), jnp.asarray([0], np.int32),
                pk, pv, pid, pvec,
            )
            tok = int(np.argmax(np.asarray(logits)[0, -1]))
            stream.append(tok)
            npos += 1
        outs.append(stream)
    return outs


def test_tp_engine_shared_prefix_int8(tiny_tp):
    """Shared-prefix POOL x int8 KV x tensor parallel (VERDICT r3 #3): the
    pool's head axis shards over tp, slots hold only int8 suffix rows, and
    streams equal the sharded per-request oracle exactly (same tp psum
    order, kv_block pinned)."""
    tp = 2
    reader = CheckpointReader(tiny_tp)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_tp, mesh)

    prefix = list(range(3, 15))
    suffixes = [[3, 1], [4, 4, 4], [9]]
    want = _prefix_pool_oracle_tp(
        cfg, params_shard, mesh, prefix, suffixes, [5, 5, 5]
    )

    be = BatchedEngine(
        cfg, params_tp,
        BatchConfig(max_batch=4, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256, kv_dtype="int8", kv_block=32),
        mesh=mesh,
    )
    pid = be.register_prefix(prefix)
    reqs = [be.submit(s, 5, GREEDY, ignore_eos=True, prefix=pid)
            for s in suffixes]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)
