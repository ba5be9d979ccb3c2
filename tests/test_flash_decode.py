"""Parity tests for the flat-work-list decode kernel (ops/flash_decode.py)
against the grid kernel (ops/flash_attn.py): same block partitioning, same
accumulation order, so outputs and updated caches must match bit-for-bit
(identical f32 ops in identical order) on every (dtype x paged) config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamavk_tpu.ops.flash_attn import flash_attention_update
from llamavk_tpu.ops.flash_decode import decode_work_list, flash_decode_update


def _mk(b, h, s, d, L, seed=0, dtype=jnp.bfloat16, quantized=False, hs=None):
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    q = r(b, 1, h, d).astype(jnp.bfloat16)
    kn = r(b, 1, h, d).astype(jnp.bfloat16)
    vn = r(b, 1, h, d).astype(jnp.bfloat16)
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (L, b, h, s, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (L, b, h, s, d)), jnp.int8)
        hs = hs or max(h, 8)
        ks = jnp.abs(r(L, b, s, hs)) + 0.01
        vs = jnp.abs(r(L, b, s, hs)) + 0.01
        return q, kn, vn, k, v, ks, vs
    k = r(L, b, h, s, d).astype(dtype)
    v = r(L, b, h, s, d).astype(dtype)
    return q, kn, vn, k, v, None, None


def test_work_list():
    npast = jnp.asarray([0, 255, 256, 511], jnp.int32)
    row, blk, total = decode_work_list(npast, 4, 512, 256)
    row, blk = np.asarray(row), np.asarray(blk)
    # per-row blocks: 1, 1, 2, 2 -> total 6
    assert int(total) == 6
    assert row[:6].tolist() == [0, 1, 2, 2, 3, 3]
    assert blk[:6].tolist() == [0, 0, 0, 1, 0, 1]
    # padding clamps to the last row with block 0
    assert row[6:].tolist() == [3, 3]


@pytest.mark.parametrize("quantized", [False, True])
def test_flat_matches_grid(quantized):
    b, h, s, d, L = 4, 4, 256, 64, 3
    q, kn, vn, k, v, ks, vs = _mk(b, h, s, d, L, quantized=quantized)
    npast = jnp.asarray([0, 7, 130, 255], jnp.int32)
    layer = jnp.int32(1)
    kw = dict(k_scale=ks, v_scale=vs) if quantized else {}
    ref = flash_attention_update(
        q, kn, vn, k, v, npast, layer, block_k=64, **kw
    )
    out = flash_decode_update(
        q, kn, vn, k, v, npast, layer, block_k=64, **kw
    )
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(ref[0][:, :, :, :])
    )
    for a, b_ in zip(out[1:], ref[1:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.parametrize("quantized", [False, True])
def test_flat_matches_grid_paged(quantized):
    b, h, d, L = 3, 2, 64, 2
    ps, npages = 64, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, (L, npages, h, ps, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (L, npages, h, ps, d)), jnp.int8)
        hs = 8
        ks = jnp.asarray(np.abs(rng.standard_normal((L, npages, ps, hs))) + 0.01,
                         jnp.float32)
        vs = jnp.asarray(np.abs(rng.standard_normal((L, npages, ps, hs))) + 0.01,
                         jnp.float32)
        kw = dict(k_scale=ks, v_scale=vs)
    else:
        k = jnp.asarray(rng.standard_normal((L, npages, h, ps, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((L, npages, h, ps, d)), jnp.bfloat16)
        kw = {}
    # 3 rows, up to 3 logical blocks each (page 0 = trash by convention)
    table = jnp.asarray([[1, 2, 3], [4, 0, 0], [5, 6, 0]], jnp.int32)
    npast = jnp.asarray([140, 0, 64], jnp.int32)
    layer = jnp.int32(1)
    ref = flash_attention_update(
        q, kn, vn, k, v, npast, layer, block_k=64, page_table=table,
        block_t=min(256, ps), **kw
    )
    out = flash_decode_update(
        q, kn, vn, k, v, npast, layer, block_k=64, page_table=table, **kw
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    for a, b_ in zip(out[1:], ref[1:]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_flat_batch_offset():
    # a batch slice against a wider cache (engine never uses this without
    # pp, but keep the contract honest)
    b, h, s, d, L = 2, 2, 64, 64, 2
    q, kn, vn, k, v, _, _ = _mk(4, h, s, d, L)
    qs, kns, vns = q[1:3], kn[1:3], vn[1:3]
    npast = jnp.asarray([3, 9], jnp.int32)
    ref = flash_attention_update(
        qs, kns, vns, k, v, npast, jnp.int32(0), block_k=64, batch_offset=1
    )
    out = flash_decode_update(
        qs, kns, vns, k, v, npast, jnp.int32(0), block_k=64, batch_offset=1
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
