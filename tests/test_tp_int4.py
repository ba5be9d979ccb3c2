"""int4-plane weights under tensor-parallel meshes (VERDICT r4 #5).

The int4 conversion (models/loader.params_to_i4 / ops/qweight.qweight_to_i4)
must compose with the Megatron split: column-parallel weights shard their
(unpadded — pad_n=0 under tp) N axis, row-parallel weights shard at chunk
boundaries (chunks == tp, each shard = one chunk's QK*Gp storage rows).
Oracle: a manual greedy loop over make_sharded_forward with the SAME int4
tp params — identical kernels, so streams must match exactly.

CPU-mesh interpret coverage only; the real-hardware int4 multi-device
LAYOUT validation stays env-blocked (one chip) and flagged in ROADMAP.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.formats.ggml_io import CheckpointReader
from llamavk_tpu.models import init_kv_cache, random_tiny_model
from llamavk_tpu.models.loader import params_from_reader, params_to_i4
from llamavk_tpu.ops.qweight import QWeight
from llamavk_tpu.formats.repack import LAYOUT_I4
from llamavk_tpu.parallel import (
    make_mesh, make_sharded_forward, shard_cache, shard_params,
)
from llamavk_tpu.runtime.batching import BatchConfig, BatchedEngine
from llamavk_tpu.runtime.sampling import SamplerParams

GREEDY = SamplerParams(temp=0.0)


@pytest.fixture(scope="module")
def tiny_i4_tp(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-i4-tp.bin")
    random_tiny_model(
        write_path=path, n_embd=512, n_head=8, n_ff=512, n_vocab=256,
        quantize=True,
    )
    tp = 2
    reader = CheckpointReader(path)
    cfg, params_tp = params_from_reader(reader, tp=tp)
    params_i4 = params_to_i4(params_tp, pad_n=0)
    return cfg, params_i4, tp


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


def test_i4_tp_param_structure(tiny_i4_tp):
    cfg, params_i4, tp = tiny_i4_tp
    L = params_i4.layers
    for name in ("wqkv", "w13", "wo", "w2"):
        w = getattr(L, name)
        assert isinstance(w, QWeight) and w.layout == LAYOUT_I4
        assert w.n_orig == 0, f"{name}: tp loads must not column-pad"
    assert L.wo.chunks == tp and L.w2.chunks == tp
    # row-parallel storage rows split exactly at chunk boundaries
    assert L.wo.packed.shape[-2] % tp == 0
    assert L.wo.scales.shape[-2] % tp == 0
    # shard_params must accept the int4 tree (pspec aux data matches)
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    shard_params(params_i4, mesh)


def test_tp_engine_int4_matches_oracle(tiny_i4_tp):
    cfg, params_i4, tp = tiny_i4_tp
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])
    params_shard = shard_params(params_i4, mesh)

    prompts = [[5, 9, 2, 30], [7, 3, 11], [1, 2, 3, 4, 5, 6]]
    n_pred = [6, 6, 5]
    want = _oracle_streams(cfg, params_shard, mesh, prompts, n_pred)

    be = BatchedEngine(
        cfg, params_i4, BatchConfig(max_batch=4, n_ctx=64, block=4),
        mesh=mesh,
    )
    reqs = [be.submit(p, n, GREEDY, ignore_eos=True)
            for p, n in zip(prompts, n_pred)]
    be.run()
    for r, w in zip(reqs, want):
        assert r.generated == w, (r.prompt, r.generated, w)


def test_tp_engine_int4_int8kv_paged(tiny_i4_tp):
    """The r4 flagship serving stack under tp: int4 weights x int8 KV x
    paged pool. Oracle: the flat int8 engine with the SAME kv_block
    (= page_size) — identical accumulation order, exact streams."""
    cfg, params_i4, tp = tiny_i4_tp
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])

    prompts = [[5, 9, 2, 30], [7, 3, 11]]
    n_pred = [6, 6]
    ps = 32
    flat = BatchedEngine(
        cfg, params_i4,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8",
                    kv_block=ps),
        mesh=mesh,
    )
    f_reqs = [flat.submit(p, n, GREEDY, ignore_eos=True)
              for p, n in zip(prompts, n_pred)]
    flat.run()

    be = BatchedEngine(
        cfg, params_i4,
        BatchConfig(max_batch=4, n_ctx=64, block=4, kv_dtype="int8",
                    paged=True, page_size=ps),
        mesh=mesh,
    )
    reqs = [be.submit(p, n, GREEDY, ignore_eos=True)
            for p, n in zip(prompts, n_pred)]
    be.run()
    for r, f in zip(reqs, f_reqs):
        assert r.generated == f.generated, (r.prompt, r.generated, f.generated)
