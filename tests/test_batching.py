"""Continuous batching tests: batched greedy output must equal single-stream
greedy output; requests of different lengths join and leave correctly."""

import numpy as np
import pytest

from llamavk_tpu.models import load_model, random_tiny_model
from llamavk_tpu.runtime import Engine, EngineConfig, SamplerParams
from llamavk_tpu.runtime.batching import BatchConfig, BatchedEngine

GREEDY = SamplerParams(temp=0.0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    random_tiny_model(write_path=path, quantize=True)
    return load_model(path)


def _single_stream(cfg, params, prompt, n, n_ctx=64):
    e = Engine(cfg, params, EngineConfig(n_ctx=n_ctx))
    return e.generate(prompt, n, GREEDY, ignore_eos=True)


def test_batched_matches_single(model):
    cfg, params, _ = model
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=4, n_ctx=64, block=4))
    prompts = [[5, 9, 2, 30], [7, 3, 11], [1, 2, 3, 4, 5, 6], [42]]
    reqs = [be.submit(p, 6, GREEDY, ignore_eos=True) for p in prompts]
    done = be.run()
    assert len(done) == 4
    for p, r in zip(prompts, reqs):
        want = _single_stream(cfg, params, p, 6)
        assert r.generated == want, (p, r.generated, want)


def test_more_requests_than_slots(model):
    cfg, params, _ = model
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=2, n_ctx=64, block=4))
    prompts = [[i + 1, i + 2] for i in range(5)]
    reqs = [be.submit(p, 4, GREEDY, ignore_eos=True) for p in prompts]
    done = be.run()
    assert len(done) == 5
    for p, r in zip(prompts, reqs):
        want = _single_stream(cfg, params, p, 4)
        assert r.generated == want


def test_mixed_lengths_and_budgets(model):
    cfg, params, _ = model
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=3, n_ctx=64, block=3))
    r1 = be.submit([5, 6], 2, GREEDY, ignore_eos=True)
    r2 = be.submit([9, 8, 7], 7, GREEDY, ignore_eos=True)
    be.run()
    assert len(r1.generated) == 2
    assert len(r2.generated) == 7
    assert r1.generated == _single_stream(cfg, params, [5, 6], 2)
    assert r2.generated == _single_stream(cfg, params, [9, 8, 7], 7)


def test_stochastic_per_slot_params(model):
    """Different temperature per slot in the same batch must both produce
    valid tokens (smoke: no cross-slot contamination of params)."""
    cfg, params, _ = model
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=2, n_ctx=64, block=4))
    r1 = be.submit([3, 4], 5, SamplerParams(temp=0.0), ignore_eos=True)
    r2 = be.submit([3, 4], 5, SamplerParams(temp=1.2, top_k=20, top_p=0.9),
                   seed=7, ignore_eos=True)
    be.run()
    assert r1.generated == _single_stream(cfg, params, [3, 4], 5)
    assert len(r2.generated) == 5
    assert all(0 <= t < cfg.n_vocab for t in r2.generated)


def test_prefix_caching_matches_full_prompt(model):
    """register_prefix + suffix submit must equal submitting prefix+suffix."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30, 7]
    suffixes = [[3, 1], [4, 4, 4], [8]]

    be_plain = BatchedEngine(cfg, params, BatchConfig(max_batch=3, n_ctx=64, block=4))
    plain = [
        be_plain.submit(prefix + s, 6, GREEDY, ignore_eos=True) for s in suffixes
    ]
    be_plain.run()

    be_pfx = BatchedEngine(cfg, params, BatchConfig(max_batch=3, n_ctx=64, block=4))
    pid = be_pfx.register_prefix(prefix)
    pfx = [
        be_pfx.submit(s, 6, GREEDY, ignore_eos=True, prefix=pid) for s in suffixes
    ]
    be_pfx.run()
    # only ONE prefill pass covered the prefix tokens
    assert be_pfx.stats["prefills"] == len(suffixes)

    for a, b in zip(plain, pfx):
        assert a.generated == b.generated, (a.generated, b.generated)


def test_prefix_and_plain_mix(model):
    cfg, params, _ = model
    be = BatchedEngine(cfg, params, BatchConfig(max_batch=2, n_ctx=64, block=4))
    pid = be.register_prefix([5, 6, 7])
    r1 = be.submit([9], 5, GREEDY, ignore_eos=True, prefix=pid)
    r2 = be.submit([5, 6, 7, 9], 5, GREEDY, ignore_eos=True)
    be.run()
    # same effective prompt -> same greedy continuation
    assert r1.generated == r2.generated


def test_lookup_batched_matches_single(model):
    """lookup_gamma: batched prompt-lookup speculation must emit exactly the
    plain greedy streams, for repetitive AND generic prompts, across
    admission waves (more requests than slots)."""
    cfg, params, _ = model
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=2, n_ctx=128, block=4, lookup_gamma=4),
    )
    prompts = [
        [5, 9, 2, 30, 5, 9, 2, 30, 5, 9],  # repetitive: drafts will match
        [7, 3, 11],
        [1, 2, 3, 4, 1, 2, 3, 4],
        [42],
    ]
    reqs = [be.submit(p, 8, GREEDY, ignore_eos=True) for p in prompts]
    done = be.run()
    assert len(done) == 4
    for p, r in zip(prompts, reqs):
        want = _single_stream(cfg, params, p, 8, n_ctx=128)
        assert r.generated == want, (p, r.generated, want)
    assert be.stats["rounds"] > 0
    # first tokens are emitted at admission (not counted in decode stats)
    assert be.stats["tokens"] == 4 * 8 - 4


def test_lookup_batched_with_prefix_cache(model):
    cfg, params, _ = model
    pfx = [3, 1, 4, 1, 5, 9, 2, 6]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=2, n_ctx=128, block=4, lookup_gamma=3),
    )
    pid = be.register_prefix(pfx)
    reqs = [
        be.submit([8, 2], 6, GREEDY, ignore_eos=True, prefix=pid),
        be.submit([7], 6, GREEDY, ignore_eos=True, prefix=pid),
    ]
    done = be.run()
    assert len(done) == 2
    for r, sfx in zip(reqs, [[8, 2], [7]]):
        want = _single_stream(cfg, params, pfx + sfx, 6, n_ctx=128)
        assert r.generated == want


def test_lookup_rejects_overflowing_requests(model):
    """lookup needs gamma-1 rows of end-of-slot slack; a request that would
    fill the slot exactly must be rejected at submit time."""
    cfg, params, _ = model
    be = BatchedEngine(
        cfg, params, BatchConfig(max_batch=2, n_ctx=64, lookup_gamma=4)
    )
    with pytest.raises(AssertionError):
        be.submit([1, 2], 62, GREEDY)


def test_lookup_batched_sampled_mixed(model):
    """Sampled lookup block: greedy rows must STILL match plain greedy
    exactly (point-mass accept), sampled rows emit full budgets of valid
    ids; the same engine config is deterministic across runs."""
    cfg, params, _ = model

    def run():
        be = BatchedEngine(
            cfg, params,
            BatchConfig(max_batch=4, n_ctx=128, block=4, lookup_gamma=3),
        )
        reqs = [
            be.submit([5, 9, 2, 30, 5, 9, 2, 30], 8, GREEDY, ignore_eos=True),
            be.submit([7, 3, 11], 8,
                      SamplerParams(temp=0.8, repeat_penalty=1.1),
                      seed=3, ignore_eos=True),
            be.submit([1, 2, 3, 4, 1, 2, 3, 4], 8, GREEDY, ignore_eos=True),
            be.submit([42, 17], 8, SamplerParams(temp=1.0), seed=9,
                      ignore_eos=True),
        ]
        be.run()
        return [r.generated for r in reqs]

    outs = run()
    for i, p in zip([0, 2], [[5, 9, 2, 30, 5, 9, 2, 30], [1, 2, 3, 4, 1, 2, 3, 4]]):
        want = _single_stream(cfg, params, p, 8, n_ctx=128)
        assert outs[i] == want, (i, outs[i], want)
    for i in (1, 3):
        assert len(outs[i]) == 8
        assert all(0 <= t < cfg.n_vocab for t in outs[i])
    assert outs == run()  # seeded-deterministic end to end


def test_shared_prefix_matches_full_prompt(model):
    """shared_prefix: the pool-attended prefix must produce exactly the same
    greedy streams as submitting prefix+suffix as one prompt; slots hold only
    suffix rows (n_ctx budget independent of prefix length)."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30, 7, 11, 4]
    suffixes = [[3, 1], [4, 4, 4], [8]]

    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=3, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256),
    )
    pid = be.register_prefix(prefix)
    reqs = [
        be.submit(s, 6, GREEDY, ignore_eos=True, prefix=pid) for s in suffixes
    ]
    be.run()
    assert be.stats["prefills"] == len(suffixes)
    for r, s in zip(reqs, suffixes):
        want = _single_stream(cfg, params, prefix + s, 6, n_ctx=128)
        assert r.generated == want, (s, r.generated, want)


def test_shared_prefix_mixed_with_plain_requests(model):
    """Rows with and without a shared prefix coexist in one batch (plen=0
    rows skip the pre-pass); two different pool entries in one batch."""
    cfg, params, _ = model
    p1 = [5, 9, 2, 30]
    p2 = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=3, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256),
    )
    i1 = be.register_prefix(p1)
    i2 = be.register_prefix(p2)
    r1 = be.submit([8, 2], 5, GREEDY, ignore_eos=True, prefix=i1)
    r2 = be.submit([7], 5, GREEDY, ignore_eos=True, prefix=i2)
    r3 = be.submit([42, 17, 3], 5, GREEDY, ignore_eos=True)  # no prefix
    be.run()
    assert r1.generated == _single_stream(cfg, params, p1 + [8, 2], 5, n_ctx=128)
    assert r2.generated == _single_stream(cfg, params, p2 + [7], 5, n_ctx=128)
    assert r3.generated == _single_stream(cfg, params, [42, 17, 3], 5, n_ctx=128)


def test_shared_prefix_slot_reuse(model):
    """A freed slot's stale prefix binding must not leak into the next
    occupant (more requests than slots, different prefixes)."""
    cfg, params, _ = model
    p1 = [5, 9, 2]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=1, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256),
    )
    i1 = be.register_prefix(p1)
    r1 = be.submit([8], 4, GREEDY, ignore_eos=True, prefix=i1)
    r2 = be.submit([8], 4, GREEDY, ignore_eos=True)  # NO prefix, same slot
    be.run()
    assert r1.generated == _single_stream(cfg, params, p1 + [8], 4, n_ctx=128)
    assert r2.generated == _single_stream(cfg, params, [8], 4, n_ctx=128)
    assert r1.generated != r2.generated  # sanity: the prefix mattered


def test_shared_prefix_lookup_streams(model):
    """shared_prefix x lookup_gamma: pool-attended prefix + speculative
    verify rounds — greedy streams equal the plain single-stream oracle
    (lookup is stream-equivalent by construction; the verify forward runs
    the prefix pre-pass with LOGICAL n_past)."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30, 7, 11, 4]
    suffixes = [[3, 1], [4, 4, 4], [8]]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=3, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256, lookup_gamma=3),
    )
    pid = be.register_prefix(prefix)
    reqs = [be.submit(s, 6, GREEDY, ignore_eos=True, prefix=pid)
            for s in suffixes]
    be.run()
    assert be.stats.get("rounds", 0) > 0
    for r, s in zip(reqs, suffixes):
        want = _single_stream(cfg, params, prefix + s, 6, n_ctx=128)
        assert r.generated == want, (s, r.generated, want)


def test_shared_prefix_lookup_slot_reuse(model):
    """Second wave over a freed slot reuses the pool entry; ctx rows reseed
    with the logical prefix+prompt history."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=1, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256, lookup_gamma=3),
    )
    pid = be.register_prefix(prefix)
    for sfx in ([3, 1], [8, 8]):
        r = be.submit(sfx, 5, GREEDY, ignore_eos=True, prefix=pid)
        be.run()
        want = _single_stream(cfg, params, prefix + sfx, 5, n_ctx=128)
        assert r.generated == want, (sfx, r.generated, want)


def _prefix_pool_single_stream(cfg, params, prefix, suffix, n, n_ctx=64,
                               prefix_ctx=256, kv_dtype="int8", kv_block=32):
    """Oracle for shared-prefix engines: straightforward per-request
    execution through llama_forward with the prefix pool — bf16 pool
    prefilled once, suffix + decode against an int8 (or bf16) slot cache
    holding ONLY suffix rows. Validates the engine's admission/slot/decode
    machinery against the composition it implements."""
    import jax.numpy as jnp
    from llamavk_tpu.models import init_kv_cache, llama_forward

    plen = len(prefix)
    bucket = 8
    while bucket < plen:
        bucket *= 2
    cacheP = init_kv_cache(cfg, 1, prefix_ctx)  # pool is ALWAYS bf16
    toksP = np.zeros((1, bucket), np.int32)
    toksP[0, :plen] = prefix
    _, cacheP, _ = llama_forward(
        params, jnp.asarray(toksP), cacheP, jnp.int32(0), cfg,
        last_idx=jnp.int32(plen - 1), kv_block=kv_block,
    )
    pk, pv = cacheP.k, cacheP.v  # [L, NP=1, H, Sp, D]
    pid = jnp.zeros((1,), jnp.int32)
    pvec = jnp.full((1,), plen, jnp.int32)

    slot = init_kv_cache(cfg, 1, n_ctx, dtype=jnp.dtype(kv_dtype))
    sbucket = 8
    while sbucket < len(suffix):
        sbucket *= 2
    toksS = np.zeros((1, sbucket), np.int32)
    toksS[0, : len(suffix)] = suffix
    logits, slot, _ = llama_forward(
        params, jnp.asarray(toksS), slot, pvec, cfg,
        last_idx=jnp.asarray([len(suffix) - 1], np.int32),
        prefix_kv=(pk, pv), prefix_id=pid, prefix_len=pvec,
        kv_block=kv_block,
    )
    tok = int(np.argmax(np.asarray(logits)[0, -1]))
    out, npos = [tok], plen + len(suffix)
    for _ in range(n - 1):
        logits, slot, _ = llama_forward(
            params, jnp.asarray([[tok]], jnp.int32), slot,
            jnp.asarray([npos], np.int32), cfg,
            prefix_kv=(pk, pv), prefix_id=pid, prefix_len=pvec,
            kv_block=kv_block,
        )
        tok = int(np.argmax(np.asarray(logits)[0, -1]))
        out.append(tok)
        npos += 1
    return out


def test_shared_prefix_int8_matches_oracle(model):
    """shared_prefix x int8 KV (VERDICT r3 #3): bf16 pool + int8 slot rows.
    Engine streams must exactly equal per-request llama_forward execution
    of the same composition (same kv_block pins the softmax order)."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30, 7, 11, 4]
    suffixes = [[3, 1], [4, 4, 4], [8]]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=3, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256, kv_dtype="int8", kv_block=32),
    )
    pid = be.register_prefix(prefix)
    reqs = [
        be.submit(s, 6, GREEDY, ignore_eos=True, prefix=pid) for s in suffixes
    ]
    be.run()
    assert be.stats["prefills"] == len(suffixes)
    for r, s in zip(reqs, suffixes):
        want = _prefix_pool_single_stream(cfg, params, prefix, s, 6)
        assert r.generated == want, (s, r.generated, want)


def test_shared_prefix_int8_lookup(model):
    """shared_prefix x int8 x prompt-lookup speculation: greedy streams equal
    the plain (non-speculative) shared-prefix int8 oracle exactly."""
    cfg, params, _ = model
    prefix = [5, 9, 2, 30, 7, 11, 4, 5, 9, 2]
    suffixes = [[5, 9], [30, 7]]
    be = BatchedEngine(
        cfg, params,
        BatchConfig(max_batch=2, n_ctx=64, block=4, shared_prefix=True,
                    prefix_ctx=256, kv_dtype="int8", kv_block=32,
                    lookup_gamma=3),
    )
    pid = be.register_prefix(prefix)
    reqs = [
        be.submit(s, 6, GREEDY, ignore_eos=True, prefix=pid) for s in suffixes
    ]
    be.run()
    for r, s in zip(reqs, suffixes):
        want = _prefix_pool_single_stream(cfg, params, prefix, s, 6)
        assert r.generated == want, (s, r.generated, want)


def test_batched_engine_int4_planes(model):
    """BatchedEngine over int4-plane weights (params_to_i4): streams equal
    the single-stream engine's over the SAME converted params (both run the
    LAYOUT_I4 kernel — same dot partition, exact agreement)."""
    from llamavk_tpu.models import params_to_i4
    from llamavk_tpu.runtime import Engine, EngineConfig

    cfg, params, _ = model
    p4 = params_to_i4(params)
    be = BatchedEngine(cfg, p4, BatchConfig(max_batch=2, n_ctx=64, block=4))
    prompts = [[5, 9, 2, 30], [7, 3, 11]]
    reqs = [be.submit(p, 5, GREEDY, ignore_eos=True) for p in prompts]
    be.run()
    for p, r in zip(prompts, reqs):
        e = Engine(cfg, p4, EngineConfig(n_ctx=64))
        want = e.generate(p, 5, GREEDY, ignore_eos=True)
        assert r.generated == want, (p, r.generated, want)
