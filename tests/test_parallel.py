"""Tensor-parallel tests on the virtual 8-device CPU mesh: sharded forward
must match the single-device forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.formats import CheckpointReader
from llamavk_tpu.models import (
    init_kv_cache,
    llama_forward,
    params_from_reader,
    random_tiny_model,
)
from llamavk_tpu.parallel import make_mesh, make_sharded_forward, shard_cache, shard_params


@pytest.fixture(scope="module")
def tiny_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    # dims divisible by tp=8 with >=64-wide row chunks: n_embd 512, n_ff 512
    random_tiny_model(
        write_path=path, n_embd=512, n_head=8, n_ff=512, n_vocab=256, quantize=True
    )
    return path


@pytest.mark.parametrize("tp,dp", [(4, 1), (2, 2), (8, 1), (4, 2)])
def test_tp_forward_matches_single(tiny_path, tp, dp):
    reader = CheckpointReader(tiny_path)
    cfg, params1 = params_from_reader(reader, scale_dtype=jnp.float32)
    cfg, params_tp = params_from_reader(reader, scale_dtype=jnp.float32, tp=tp)

    # tp must divide heads*? n_head=2, head_dim=64 → tp=4 shards within a head?
    # wq N = 128 shards by tp → head boundaries only hold if tp <= n_head...
    # heads per shard = n_head/tp can be fractional only if head_dim % ... skip
    if cfg.n_head % tp != 0 and (cfg.n_head * cfg.head_dim) % tp != 0:
        pytest.skip("tp does not divide")

    b = max(dp, 2)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.n_vocab, (b, 4)).astype(np.int32)

    cache1 = init_kv_cache(cfg, b, 8)
    want, _, want_emb = llama_forward(
        params1, jnp.asarray(tokens), cache1, jnp.int32(0), cfg
    )

    mesh = make_mesh(tp=tp, dp=dp, devices=jax.devices()[: tp * dp])
    params_tp = shard_params(params_tp, mesh)
    cache = shard_cache(init_kv_cache(cfg, b, 8), mesh)
    fwd = make_sharded_forward(cfg, params_tp, mesh)
    got, new_cache, emb = fwd(params_tp, jnp.asarray(tokens), cache, jnp.int32(0))

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2
    )
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(want_emb), rtol=5e-2, atol=6e-2
    )


def test_tp_decode_consistency(tiny_path):
    """Prefill+decode under TP matches single-device decode."""
    tp = 2
    reader = CheckpointReader(tiny_path)
    cfg, params1 = params_from_reader(reader, scale_dtype=jnp.float32)
    _, params_tp = params_from_reader(reader, scale_dtype=jnp.float32, tp=tp)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_tp = shard_params(params_tp, mesh)
    fwd = make_sharded_forward(cfg, params_tp, mesh)

    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, (1, 5)).astype(np.int32)

    cache1 = init_kv_cache(cfg, 1, 8)
    _, cache1, _ = llama_forward(params1, jnp.asarray(toks[:, :4]), cache1, jnp.int32(0), cfg)
    want, _, _ = llama_forward(params1, jnp.asarray(toks[:, 4:]), cache1, jnp.int32(4), cfg)

    cache2 = shard_cache(init_kv_cache(cfg, 1, 8), mesh)
    _, cache2, _ = fwd(params_tp, jnp.asarray(toks[:, :4]), cache2, jnp.int32(0))
    got, _, _ = fwd(params_tp, jnp.asarray(toks[:, 4:]), cache2, jnp.int32(4))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2)


def test_multihost_helpers_single_process():
    """Single-process semantics of the multi-host helpers (a pod run is just
    N of these processes; the sharding math must degenerate cleanly)."""
    import jax

    from llamavk_tpu.parallel import multihost

    devs = multihost.local_devices_first()
    assert set(devs) == set(jax.devices())
    assert devs[: len(jax.local_devices())] == jax.local_devices()

    items = list(range(10))
    assert multihost.host_shard(items) == items  # 1 process -> everything
    # explicit 3-way layout check
    assert multihost.host_shard(items, process_id=1) == items[1::1]
    multihost.shutdown()  # no-op when not initialized


@pytest.mark.parametrize("pp,tp,dp", [(2, 1, 1), (2, 2, 1), (4, 1, 1), (2, 2, 2)])
def test_pp_forward_matches_single(tiny_path, pp, tp, dp):
    """Pipeline-parallel ring (layers staged over 'pp') matches single-device."""
    reader = CheckpointReader(tiny_path)
    cfg, params1 = params_from_reader(reader, scale_dtype=jnp.float32)
    _, params_pp = params_from_reader(reader, scale_dtype=jnp.float32, tp=tp)
    if cfg.n_layer % pp != 0:
        pytest.skip("pp does not divide n_layer")

    b = max(dp, 2)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, (b, 4)).astype(np.int32)

    cache1 = init_kv_cache(cfg, b, 8)
    want, want_cache, _ = llama_forward(
        params1, jnp.asarray(tokens), cache1, jnp.int32(0), cfg
    )

    n = pp * tp * dp
    mesh = make_mesh(tp=tp, dp=dp, pp=pp, devices=jax.devices()[:n])
    params_pp = shard_params(params_pp, mesh)
    cache = shard_cache(init_kv_cache(cfg, b, 8), mesh)
    fwd = make_sharded_forward(cfg, params_pp, mesh)
    got, new_cache, _ = fwd(params_pp, jnp.asarray(tokens), cache, jnp.int32(0))

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2
    )
    # cache writes must be committed exactly once per stage (per-layer K rows
    # equal the single-device cache when tp == 1 keeps head order identical)
    if tp == 1:
        np.testing.assert_allclose(
            np.asarray(new_cache.k), np.asarray(want_cache.k), rtol=5e-2, atol=6e-2
        )


@pytest.mark.parametrize("pp,mb", [(2, 2), (2, 4), (4, 2)])
def test_pp_microbatched_matches_single(tiny_path, pp, mb):
    """GPipe-interleaved pp (M microbatches in flight) == single-device, and
    every microbatch's cache rows are committed exactly once."""
    from llamavk_tpu.parallel import make_mesh, make_sharded_forward, shard_cache, shard_params

    reader = CheckpointReader(tiny_path)
    cfg, params1 = params_from_reader(reader, scale_dtype=jnp.float32)
    _, params_pp = params_from_reader(reader, scale_dtype=jnp.float32)
    if cfg.n_layer % pp != 0:
        pytest.skip("pp does not divide n_layer")

    b = mb  # one row per microbatch keeps the test small
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.n_vocab, (b, 4)).astype(np.int32)

    cache1 = init_kv_cache(cfg, b, 8)
    want, want_cache, _ = llama_forward(
        params1, jnp.asarray(tokens), cache1, jnp.int32(0), cfg
    )

    mesh = make_mesh(tp=1, dp=1, pp=pp, devices=jax.devices()[:pp])
    params_pp = shard_params(params_pp, mesh)
    cache = shard_cache(init_kv_cache(cfg, b, 8), mesh)
    fwd = make_sharded_forward(cfg, params_pp, mesh, pp_microbatch=mb)
    got, new_cache, _ = fwd(params_pp, jnp.asarray(tokens), cache, jnp.int32(0))

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2
    )
    np.testing.assert_allclose(
        np.asarray(new_cache.k), np.asarray(want_cache.k), rtol=5e-2, atol=6e-2
    )
    np.testing.assert_allclose(
        np.asarray(new_cache.v), np.asarray(want_cache.v), rtol=5e-2, atol=6e-2
    )


def test_pp_decode_steps(tiny_path):
    """Multi-step decode through the pp ring stays consistent with 1-device."""
    pp = 2
    reader = CheckpointReader(tiny_path)
    cfg, params1 = params_from_reader(reader, scale_dtype=jnp.float32)
    _, params_pp = params_from_reader(reader, scale_dtype=jnp.float32)
    mesh = make_mesh(tp=1, dp=1, pp=pp, devices=jax.devices()[:pp])
    params_pp = shard_params(params_pp, mesh)
    cache_pp = shard_cache(init_kv_cache(cfg, 1, 8), mesh)
    fwd = make_sharded_forward(cfg, params_pp, mesh)

    cache1 = init_kv_cache(cfg, 1, 8)
    toks = jnp.asarray([[7, 3]], jnp.int32)
    want, cache1, _ = llama_forward(params1, toks, cache1, jnp.int32(0), cfg)
    got, cache_pp, _ = fwd(params_pp, toks, cache_pp, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2)

    nxt = jnp.asarray([[int(np.argmax(np.asarray(want)[0, -1]))]], jnp.int32)
    want2, _, _ = llama_forward(params1, nxt, cache1, jnp.int32(2), cfg)
    got2, _, _ = fwd(params_pp, nxt, cache_pp, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=5e-2, atol=6e-2)


def test_pp_gpipe_wave_count(tiny_path):
    """Schedule-structure evidence for the GPipe interleave's M/(M+P-1)
    utilization claim: the serial unit of the pp step is the WAVE (one
    all-stage layer sweep ending in a ring ppermute). M=1 runs P waves for
    ONE microbatch of work; M=mb runs M+P-1 waves for M microbatches —
    useful-work fraction M/(M+P-1). Count the collective-permutes in the
    lowered program to pin the wave count."""
    from llamavk_tpu.parallel import (
        make_mesh, make_sharded_forward, shard_cache, shard_params,
    )

    reader = CheckpointReader(tiny_path)
    cfg, params_pp = params_from_reader(reader, scale_dtype=jnp.float32)
    pp = 2
    if cfg.n_layer % pp != 0:
        pytest.skip("pp does not divide n_layer")
    mesh = make_mesh(tp=1, dp=1, pp=pp, devices=jax.devices()[:pp])
    params_pp = shard_params(params_pp, mesh)

    def hops(mb: int) -> int:
        b = max(mb, 1)
        cache = shard_cache(init_kv_cache(cfg, b, 8), mesh)
        fwd = make_sharded_forward(cfg, params_pp, mesh, pp_microbatch=mb)
        tokens = jnp.ones((b, 4), jnp.int32)
        txt = jax.jit(fwd).lower(
            params_pp, tokens, cache, jnp.int32(0)
        ).as_text()
        return txt.count("collective_permute")

    # ring (M=1): P hops move ONE activation through all stages — the
    # utilization of the step is 1/P per activation
    assert hops(1) == pp
    # GPipe: M+P-1 waves (the final wave's hop is elided as dead), each wave
    # a full all-stage layer sweep — M microbatches of useful work in M+P-1
    # serial waves = M/(M+P-1) utilization
    for mb in (2, 4):
        assert hops(mb) == mb + pp - 2
