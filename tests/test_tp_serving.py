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


def _oracle_streams(cfg, params_shard, mesh, prompts, n_pred, n_ctx=64):
    fwd = make_sharded_forward(cfg, params_shard, mesh)
    outs = []
    for p, n in zip(prompts, n_pred):
        cache = shard_cache(init_kv_cache(cfg, 1, n_ctx), mesh)
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
