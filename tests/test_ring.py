"""History-ring KV cache (the reference's historyIndex ring,
vulkan/llama-vk.cpp:984-987, generalized): position-indexed masking in the
flash kernel, ring writes, engine-level infinite generation without re-eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.models import load_model, random_tiny_model
from llamavk_tpu.models.llama import ring_phys
from llamavk_tpu.ops.flash_attn import flash_attention
from llamavk_tpu.runtime import Engine, EngineConfig, SamplerParams

GREEDY = SamplerParams(temp=0.0)


def dense_ring_ref(q, k, v, n_past, pos):
    """Dense attention with per-row logical-position masking (pos: [S, B])."""
    b, t, h, d = q.shape
    s = k.shape[2]
    scores = np.einsum(
        "bthd,bhsd->bhts",
        np.asarray(q, np.float32),
        np.asarray(k, np.float32),
    ) / np.sqrt(d)
    posT = np.asarray(pos).T  # [B, S]
    npast = np.broadcast_to(np.asarray(n_past), (b,))
    tpos = npast[:, None] + np.arange(t)[None, :]  # [B, T]
    mask = (posT[:, None, :] >= 0) & (posT[:, None, :] <= tpos[:, :, None])
    scores = np.where(mask[:, None], scores, -np.inf)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bthd", probs, np.asarray(v, np.float32))


def test_ring_phys_mapping():
    s, keep = 32, 4
    got = [int(ring_phys(jnp.int32(p), keep, s)) for p in range(80)]
    # identity through the first fill
    assert got[:32] == list(range(32))
    # then wraps over [keep, s)
    assert got[32] == keep + (32 - keep) % (s - keep)
    assert all(keep <= g < s for g in got[32:])
    # consecutive positions map to consecutive rows (mod the span)
    for p in range(32, 79):
        assert got[p + 1] in (got[p] + 1, keep)


def test_flash_ring_read_matches_dense():
    rng = np.random.default_rng(3)
    b, h, s, d, keep = 2, 2, 64, 32, 8
    n_logical = 70  # wrapped: rows 8..13 hold positions 64..69
    pos = np.full((s, b), -1, np.int32)
    for p in range(n_logical):
        pos[int(ring_phys(jnp.int32(p), keep, s))] = p
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    ref = dense_ring_ref(q, k, v, n_logical, pos)
    got = flash_attention(
        q, k, v, jnp.int32(n_logical), block_t=32, block_k=32,
        kv_pos=jnp.asarray(pos),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


def test_flash_ring_handles_empty_rows():
    # partially-filled ring: rows past the fill are pos=-1 and a whole leading
    # block can be invalid for early queries — must not poison the softmax
    rng = np.random.default_rng(4)
    b, h, s, d = 1, 2, 64, 32
    pos = np.full((s, b), -1, np.int32)
    # only rows 32..36 hold positions 0..4 (e.g. after a restore/compaction)
    for i, p in enumerate(range(5)):
        pos[32 + i] = p
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    ref = dense_ring_ref(q, k, v, 4, pos)
    got = flash_attention(
        q, k, v, jnp.int32(4), block_t=32, block_k=32, kv_pos=jnp.asarray(pos)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    random_tiny_model(write_path=path, quantize=True)
    return load_model(path)


def test_ring_matches_plain_before_wrap(model):
    cfg, params, _ = model
    plain = Engine(cfg, params, EngineConfig(n_ctx=64))
    ring = Engine(cfg, params, EngineConfig(n_ctx=64, ctx_ring=True, ring_keep=4))
    out_p = plain.generate([5, 9, 2, 30], 10, GREEDY, ignore_eos=True)
    out_r = ring.generate([5, 9, 2, 30], 10, GREEDY, ignore_eos=True)
    assert out_p == out_r


@pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8"])
def test_ring_generates_past_the_context(model, kv_dtype):
    cfg, params, _ = model
    eng = Engine(
        cfg, params,
        EngineConfig(n_ctx=32, ctx_ring=True, ring_keep=4, kv_dtype=kv_dtype,
                     decode_block=8),
    )
    out1 = eng.generate([5, 9, 2, 30], 60, GREEDY, ignore_eos=True)
    assert len(out1) == 60 and eng.n_past > 32  # wrapped at least once
    eng.reset()
    out2 = eng.generate([5, 9, 2, 30], 60, GREEDY, ignore_eos=True)
    assert out1 == out2  # deterministic across the wrap


def test_ring_eval_chunks_across_wrap(model):
    cfg, params, _ = model
    eng = Engine(cfg, params, EngineConfig(n_ctx=32, ctx_ring=True, ring_keep=4))
    toks = list(np.random.default_rng(0).integers(3, 200, 50))
    logits = eng.eval(toks)  # longer than the whole ring: chunked internally
    assert eng.n_past == 50 and logits.shape[-1] == cfg.n_vocab
    logits2 = eng.eval([7, 8, 9], logits_all=True)
    assert logits2.shape[0] == 3
    # multi-turn continuation stays consistent after restore
    snap = eng.save_session()
    cont1 = eng.generate([3], 6, GREEDY, ignore_eos=True)
    eng.reset()
    eng.restore_session(snap)
    cont2 = eng.generate([3], 6, GREEDY, ignore_eos=True)
    assert cont1 == cont2
