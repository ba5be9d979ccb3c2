"""Flash-attention kernel parity vs the dense jnp reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.ops.flash_attn import attention_ref, flash_attention


def make_inputs(rng, b, t, h, s, d, n_valid):
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.zeros((b, h, s, d), jnp.bfloat16)
    v = jnp.zeros((b, h, s, d), jnp.bfloat16)
    # only the first n_valid + t positions hold real data (cache invariant)
    kv_len = n_valid + t
    k = k.at[:, :, :kv_len].set(
        jnp.asarray(rng.standard_normal((b, h, kv_len, d)), jnp.bfloat16)
    )
    v = v.at[:, :, :kv_len].set(
        jnp.asarray(rng.standard_normal((b, h, kv_len, d)), jnp.bfloat16)
    )
    return q, k, v


@pytest.mark.parametrize(
    "b,t,h,s,d,n_past,bk",
    [
        (1, 1, 2, 64, 32, 17, 32),    # decode step, ragged bound mid-block
        (1, 1, 2, 64, 32, 0, 32),     # first token
        (2, 8, 2, 64, 32, 13, 32),    # small batch, multi-token
        (1, 64, 2, 64, 64, 0, 32),    # full prefill, multiple q blocks
        (1, 33, 2, 128, 32, 20, 64),  # unaligned T (query padding path)
    ],
)
def test_flash_matches_reference(b, t, h, s, d, n_past, bk):
    rng = np.random.default_rng(0)
    q, k, v = make_inputs(rng, b, t, h, s, d, n_past)
    ref = attention_ref(q, k, v, jnp.int32(n_past))
    got = flash_attention(q, k, v, jnp.int32(n_past), block_t=32, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_vector_n_past():
    # per-row positions (continuous batching)
    rng = np.random.default_rng(1)
    b, t, h, s, d = 3, 1, 2, 64, 32
    n_past = jnp.asarray([5, 31, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    ref = attention_ref(q, k, v, n_past)
    got = flash_attention(q, k, v, n_past, block_t=32, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_ignores_cache_tail():
    # poison the invalid cache tail with huge values: masking + the ragged
    # bound must keep the result identical to a zero-tail cache
    rng = np.random.default_rng(2)
    b, t, h, s, d = 1, 4, 2, 128, 32
    n_past = 10
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kv_len = n_past + t
    k0 = jnp.zeros((b, h, s, d), jnp.bfloat16).at[:, :, :kv_len].set(
        jnp.asarray(rng.standard_normal((b, h, kv_len, d)), jnp.bfloat16)
    )
    v0 = jnp.zeros((b, h, s, d), jnp.bfloat16).at[:, :, :kv_len].set(
        jnp.asarray(rng.standard_normal((b, h, kv_len, d)), jnp.bfloat16)
    )
    big = jnp.full((b, h, s - kv_len, d), 1e4, jnp.bfloat16)
    k1 = k0.at[:, :, kv_len:].set(big)
    v1 = v0.at[:, :, kv_len:].set(big)
    clean = flash_attention(q, k0, v0, jnp.int32(n_past), block_t=32, block_k=32)
    poisoned = flash_attention(q, k1, v1, jnp.int32(n_past), block_t=32, block_k=32)
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(poisoned))


def test_flash_update_matches_manual_update():
    """Fused in-kernel cache write + attention vs XLA update + dense ref."""
    from llamavk_tpu.ops.flash_attn import flash_attention_update

    rng = np.random.default_rng(5)
    L, b, t, h, s, d = 3, 2, 4, 2, 64, 32
    n_past = jnp.asarray([10, 3], jnp.int32)
    layer = jnp.int32(1)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((L, b, h, s, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((L, b, h, s, d)), jnp.bfloat16)

    # manual: write rows per batch then dense-reference attention on layer 1
    kc_ref, vc_ref = np.asarray(kc).copy(), np.asarray(vc).copy()
    for bi in range(b):
        p = int(n_past[bi])
        kc_ref[1, bi, :, p : p + t] = np.asarray(k_new)[bi].transpose(1, 0, 2)
        vc_ref[1, bi, :, p : p + t] = np.asarray(v_new)[bi].transpose(1, 0, 2)
    want = attention_ref(
        q, jnp.asarray(kc_ref[1]), jnp.asarray(vc_ref[1]), n_past
    )

    out, kc2, vc2 = flash_attention_update(
        q, k_new, v_new, kc, vc, n_past, layer, block_t=4, block_k=32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-2, atol=2e-2)
    # cache rows written exactly; other layers untouched
    np.testing.assert_array_equal(np.asarray(kc2), kc_ref)
    np.testing.assert_array_equal(np.asarray(vc2), vc_ref)


def _prefix_ref(q, k, v, n_past_vec, pk, pv, pid, plen):
    """Dense oracle: per row, attention over [prefix rows | slot rows]."""
    b, t, h, d = q.shape
    outs = []
    for bi in range(b):
        pl_ = int(plen[bi])
        kcat = jnp.concatenate(
            [pk[pid[bi], :, :pl_, :], k[bi]], axis=1
        )[None]  # [1, H, pl+S, D]
        vcat = jnp.concatenate([pv[pid[bi], :, :pl_, :], v[bi]], axis=1)[None]
        # logical causal bound: slot row j visible iff j <= npast + ti;
        # prefix rows always visible == n_past' = plen + npast in cat space
        outs.append(
            attention_ref(
                q[bi : bi + 1], kcat, vcat, jnp.int32(pl_ + int(n_past_vec[bi]))
            )[0]
        )
    return jnp.stack(outs)


@pytest.mark.parametrize(
    "b,t,h,sp,s,d", [(2, 1, 2, 64, 64, 32), (3, 8, 2, 128, 64, 32)]
)
def test_flash_prefix_pool_matches_reference(b, t, h, sp, s, d):
    """Shared read-only prefix pre-pass: per-row pool entries of different
    ragged lengths (incl. plen=0 = no prefix) must equal the dense oracle
    over the concatenated [prefix | slot] sequence."""
    rng = np.random.default_rng(1)
    npast = np.array([3, 9, 5][:b], np.int32)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    np_pool = 3
    pk = jnp.asarray(rng.standard_normal((np_pool, h, sp, d)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((np_pool, h, sp, d)), jnp.bfloat16)
    pid = np.array([2, 0, 1][:b], np.int32)
    plen = np.array([33, 0, 64][:b], np.int32)  # ragged, incl. none

    got = flash_attention(
        q, k, v, jnp.asarray(npast), block_t=32, block_k=32,
        prefix_k=pk, prefix_v=pv,
        prefix_id=jnp.asarray(pid), prefix_len=jnp.asarray(plen),
    )
    ref = _prefix_ref(q, k, v, npast, pk, pv, pid, plen)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_flash_update_with_prefix_pool():
    """Fused write+attend with the shared prefix pre-pass (the decode path
    of shared-prefix serving)."""
    from llamavk_tpu.ops.flash_attn import flash_attention_update

    rng = np.random.default_rng(7)
    L, b, t, h, s, d, sp = 2, 2, 4, 2, 64, 32, 64
    n_past = jnp.asarray([10, 3], jnp.int32)  # slot-LOCAL rows
    layer = jnp.int32(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((L, b, h, s, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((L, b, h, s, d)), jnp.bfloat16)
    pk = jnp.asarray(rng.standard_normal((L, 2, h, sp, d)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((L, 2, h, sp, d)), jnp.bfloat16)
    pid = np.array([1, 0], np.int32)
    plen = np.array([40, 0], np.int32)

    kc_ref, vc_ref = np.asarray(kc).copy(), np.asarray(vc).copy()
    for bi in range(b):
        p = int(n_past[bi])
        kc_ref[0, bi, :, p : p + t] = np.asarray(k_new)[bi].transpose(1, 0, 2)
        vc_ref[0, bi, :, p : p + t] = np.asarray(v_new)[bi].transpose(1, 0, 2)
    want = _prefix_ref(
        q, jnp.asarray(kc_ref[0]), jnp.asarray(vc_ref[0]), np.asarray(n_past),
        pk[0], pv[0], pid, plen,
    )
    out, kc2, vc2 = flash_attention_update(
        q, k_new, v_new, kc, vc, n_past, layer, block_t=4, block_k=32,
        prefix_k=pk, prefix_v=pv,
        prefix_id=jnp.asarray(pid), prefix_len=jnp.asarray(plen),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_array_equal(np.asarray(kc2), kc_ref)


def test_flash_prefix_block_decoupled_from_slot_block():
    """Slot n_ctx that snaps to a kv block NOT dividing the pool length
    (s=320 -> bk=160; pool 256) must still work: the prefix pass picks its
    own divisor block."""
    rng = np.random.default_rng(3)
    b, t, h, sp, s, d = 2, 1, 2, 256, 320, 32
    npast = np.array([3, 9], np.int32)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    pk = jnp.asarray(rng.standard_normal((2, h, sp, d)), jnp.bfloat16)
    pv = jnp.asarray(rng.standard_normal((2, h, sp, d)), jnp.bfloat16)
    pid = np.array([0, 1], np.int32)
    plen = np.array([100, 256], np.int32)
    got = flash_attention(
        q, k, v, jnp.asarray(npast), block_t=32, block_k=256,
        prefix_k=pk, prefix_v=pv,
        prefix_id=jnp.asarray(pid), prefix_len=jnp.asarray(plen),
    )
    ref = _prefix_ref(q, k, v, npast, pk, pv, pid, plen)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
