"""Kernel parity tests: Pallas (interpreter on CPU) vs jnp reference vs NumPy
codec — the reference-vs-optimized idiom of quantize-stats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.formats import quantize_q4_0, quantize_q4_1, repack_q4_0, repack_q4_1
from llamavk_tpu.formats.repack import LAYOUT_ILV, LAYOUT_LIN
from llamavk_tpu.ops import (
    q4_matmul,
    q4_matmul_ref,
    rms_norm,
    apply_rope,
    rope_cos_sin,
    to_ilv,
    qweight_from_packed,
    dequantize_qweight,
)


def _make_qw(k, n, layout, q41=False, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)  # checkpoint order [N, K]
    if q41:
        d, m, q = quantize_q4_1(w)
        pk = repack_q4_1(d, m, q, layout=layout)
        wd = (q.astype(np.float32) * d[..., None] + m[..., None]).reshape(n, k).T
    else:
        d, q = quantize_q4_0(w)
        pk = repack_q4_0(d, q, layout=layout)
        wd = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n, k).T
    return qweight_from_packed(pk, scale_dtype=jnp.float32), wd  # device qw, dense [K, N]


@pytest.mark.parametrize("layout", [LAYOUT_ILV, LAYOUT_LIN])
@pytest.mark.parametrize("q41", [False, True])
def test_dequantize_qweight_exact(layout, q41):
    qw, wd = _make_qw(128, 256, layout, q41)
    got = np.asarray(dequantize_qweight(qw))
    np.testing.assert_allclose(got, wd, atol=1e-6)


def test_to_ilv():
    k = 128
    g = k // 32
    x = jnp.arange(k, dtype=jnp.float32)[None]
    y = np.asarray(to_ilv(x, k))[0]
    # x'[m*G + g] == x[g*32 + m]
    for kp in [0, 1, g, 2 * g + 3, k - 1]:
        m, gg = kp // g, kp % g
        assert y[kp] == gg * 32 + m


@pytest.mark.parametrize("layout", [LAYOUT_ILV, LAYOUT_LIN])
@pytest.mark.parametrize("q41", [False, True])
@pytest.mark.parametrize("b,k,n", [(1, 128, 256), (7, 256, 384), (16, 192, 128)])
def test_q4_matmul_vs_ref(layout, q41, b, k, n):
    qw, wd = _make_qw(k, n, layout, q41)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    y_pallas = np.asarray(q4_matmul(x, qw, out_dtype=jnp.float32))
    y_ref = np.asarray(q4_matmul_ref(x, qw))
    y_np = np.asarray(x, np.float32) @ wd
    # pallas (bf16 weights in MXU) vs f32 reference: bf16-level tolerance
    np.testing.assert_allclose(y_pallas, y_np, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(y_ref, y_np, rtol=1e-5, atol=1e-5)


def test_q4_matmul_leading_dims():
    qw, wd = _make_qw(128, 128, LAYOUT_ILV)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.bfloat16)
    y = q4_matmul(x, qw)
    assert y.shape == (2, 3, 128)
    y_np = np.asarray(x, np.float32).reshape(6, 128) @ wd
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(6, 128), y_np, rtol=3e-2, atol=3e-2
    )


def test_rms_norm():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
    want = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rope_matches_scalar_formula():
    # ggml.c:7209-7224: adjacent pairs, theta = 10000^(-i0/n_dims), p absolute
    b, t, h, d = 1, 3, 2, 8
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b, t, h, d)).astype(np.float32)
    n_past = 5
    pos = n_past + jnp.arange(t)
    cos, sin = rope_cos_sin(pos, d)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    want = np.empty_like(x)
    for tt in range(t):
        p = n_past + tt
        for hh in range(h):
            for i0 in range(0, d, 2):
                theta = 10000.0 ** (-i0 / d)
                c, s = np.cos(p * theta), np.sin(p * theta)
                x0, x1 = x[0, tt, hh, i0], x[0, tt, hh, i0 + 1]
                want[0, tt, hh, i0] = x0 * c - x1 * s
                want[0, tt, hh, i0 + 1] = x0 * s + x1 * c
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunks", [1, 2, 4])
def test_q4_matmul_chunked(chunks):
    """chunks>1 = per-TP-shard packing; results must match unchunked."""
    from llamavk_tpu.formats import quantize_q4_0, repack_q4_0
    k, n = 256, 128
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    d, q = quantize_q4_0(w)
    qw = qweight_from_packed(repack_q4_0(d, q, chunks=chunks), scale_dtype=jnp.float32)
    assert qw.chunks == chunks
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    wd = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n, k).T
    y = np.asarray(q4_matmul(x, qw, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd, rtol=2e-2, atol=2e-2)
    # dequant path must be exact
    np.testing.assert_allclose(np.asarray(dequantize_qweight(qw)), wd, atol=1e-6)


@pytest.mark.parametrize("b,k,n", [(1, 128, 256), (8, 256, 384), (16, 192, 128)])
def test_q4_matmul_i8_vs_ref(b, k, n):
    """int8-MXU path: per-block activation quantization adds ~1/127-relative
    error on top of Q4 noise — well inside bf16-path tolerance."""
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    y = np.asarray(q4_matmul(x, qw, out_dtype=jnp.float32, dot_mode="i8"))
    y_np = np.asarray(x, np.float32) @ wd
    np.testing.assert_allclose(y, y_np, rtol=3e-2, atol=3e-2)


def test_q4_matmul_i8_stacked_layer_select():
    L, k, n = 3, 128, 256
    qws, wds = [], []
    for l in range(L):
        qw, wd = _make_qw(k, n, LAYOUT_ILV, seed=l)
        qws.append(qw)
        wds.append(wd)
    import jax as _jax
    stacked = _jax.tree.map(lambda *a: jnp.stack(a), *qws)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    for l in range(L):
        y = np.asarray(
            q4_matmul(
                x, stacked, out_dtype=jnp.float32, dot_mode="i8",
                layer_idx=jnp.int32(l),
            )
        )
        y_np = np.asarray(x, np.float32) @ wds[l]
        np.testing.assert_allclose(y, y_np, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("chunks", [2])
def test_q4_matmul_i8_chunked(chunks):
    k, n = 256, 128
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    d, q = quantize_q4_0(w)
    qw = qweight_from_packed(repack_q4_0(d, q, chunks=chunks), scale_dtype=jnp.float32)
    assert qw.chunks == chunks
    x = jnp.asarray(rng.standard_normal((5, k)), jnp.bfloat16)
    wd = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n, k).T
    y = np.asarray(q4_matmul(x, qw, out_dtype=jnp.float32, dot_mode="i8"))
    y_np = np.asarray(x, np.float32) @ wd
    np.testing.assert_allclose(y, y_np, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("b,k,n", [(1, 128, 256), (8, 256, 384), (4, 704, 128)])
def test_q4_matmul_i4_matches_shift(b, k, n):
    """int4-bitcast unpack (dot_mode="i4") computes the SAME math as the f32
    shift path (int4 -> f32 widening is exact); only dot contraction order
    differs (one 2G-wide dot vs two G-wide dots), so agreement is
    f32-noise tight."""
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    y4 = np.asarray(
        q4_matmul(x, qw, out_dtype=jnp.float32, dot_mode="i4",
                  mul_dtype=jnp.float32)
    )
    ys = np.asarray(
        q4_matmul(x, qw, out_dtype=jnp.float32, dot_mode="f32",
                  mul_dtype=jnp.float32)
    )
    np.testing.assert_allclose(y4, ys, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(y4, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)


def test_q4_matmul_i4_stacked_layer_select():
    L, k, n = 3, 128, 256
    qws, wds = [], []
    for l in range(L):
        qw, wd = _make_qw(k, n, LAYOUT_ILV, seed=l)
        qws.append(qw)
        wds.append(wd)
    import jax as _jax
    stacked = _jax.tree.map(lambda *a: jnp.stack(a), *qws)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    for l in range(L):
        y = np.asarray(
            q4_matmul(
                x, stacked, out_dtype=jnp.float32, dot_mode="i4",
                layer_idx=jnp.int32(l),
            )
        )
        np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wds[l],
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("chunks", [2])
def test_q4_matmul_i4_chunked(chunks):
    k, n = 256, 128
    rng = np.random.default_rng(6)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    d, q = quantize_q4_0(w)
    qw = qweight_from_packed(repack_q4_0(d, q, chunks=chunks), scale_dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, k)), jnp.bfloat16)
    wd = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n, k).T
    y = np.asarray(q4_matmul(x, qw, out_dtype=jnp.float32, dot_mode="i4"))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)


def test_q4_matmul_i8_rejected_on_tpu(monkeypatch):
    """dot_mode='i8' must fail LOUDLY when the backend is a real TPU (Mosaic
    cannot compile the batched int8 group dot — tools/bench_int8_mxu.py),
    instead of shipping a kernel the compiler rejects mid-run."""
    import importlib

    # the ops package re-exports the q4_matmul FUNCTION under the same name,
    # shadowing the submodule attribute — resolve the module explicitly
    q4m = importlib.import_module("llamavk_tpu.ops.q4_matmul")

    monkeypatch.setattr(q4m, "interpret_mode", lambda: False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    qw, _ = _make_qw(128, 128, LAYOUT_ILV)
    x = jnp.zeros((1, 128), jnp.bfloat16)
    with pytest.raises(NotImplementedError, match="bench_int8_mxu"):
        q4_matmul(x, qw, dot_mode="i8")


# --- int4-plane storage (LAYOUT_I4, qweight_to_i4) -------------------------


def _i4_of(qw):
    from llamavk_tpu.ops.qweight import qweight_to_i4

    return qweight_to_i4(qw)


@pytest.mark.parametrize("b,k,n", [(1, 256, 256), (5, 512, 128), (2, 4096, 256)])
def test_q4_matmul_i4st_matches_dense(b, k, n):
    """int4-plane storage computes the same matmul as the dense reference
    (f32 scale mul; int4 -> f32 convert is exact, so only dot-order noise)."""
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    qw4 = _i4_of(qw)
    assert qw4.packed.dtype == jnp.int4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16)
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    y_np = np.asarray(x, np.float32) @ wd
    # bf16 MXU dot noise accumulates with K (same scaling as the shift path)
    np.testing.assert_allclose(y, y_np, rtol=3e-2, atol=2e-2 * (k / 256) ** 0.5)


def test_q4_matmul_i4st_group_padding():
    """A K whose group count is NOT a multiple of 128 pads zero groups
    (e.g. the 7B w2's K=11008 -> G 344 -> 384); results must be unchanged."""
    k, n = 9 * 32 * 2, 128  # G=18 per chunk-less weight -> pads to 128
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    qw4 = _i4_of(qw)
    from llamavk_tpu.ops.qweight import i4_group_pad

    assert qw4.scales.shape[0] == i4_group_pad(k // 32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)


def test_q4_matmul_i4st_stacked_layer_select():
    L, k, n = 3, 256, 256
    qws, wds = [], []
    for l in range(L):
        qw, wd = _make_qw(k, n, LAYOUT_ILV, seed=l)
        qws.append(qw)
        wds.append(wd)
    import jax as _jax
    stacked = _jax.tree.map(lambda *a: jnp.stack(a), *qws)
    st4 = _i4_of(stacked)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.bfloat16)
    for l in range(L):
        y = np.asarray(
            q4_matmul(x, st4, out_dtype=jnp.float32, layer_idx=jnp.int32(l))
        )
        np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wds[l],
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("chunks", [2])
def test_q4_matmul_i4st_chunked(chunks):
    k, n = 512, 128
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    d, q = quantize_q4_0(w)
    qw = qweight_from_packed(repack_q4_0(d, q, chunks=chunks),
                             scale_dtype=jnp.float32)
    qw4 = _i4_of(qw)
    assert qw4.chunks == chunks
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    wd = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n, k).T
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)


def test_q4_matmul_i4st_q4_1_bias():
    """Q4_1 affine weights: the bias plane rides outside the kernel, so the
    int4-plane path must reproduce the same affine matmul."""
    k, n = 256, 128
    rng = np.random.default_rng(4)
    w = (rng.standard_normal((n, k)) * 0.1 + 0.05).astype(np.float32)
    d, m, q = quantize_q4_1(w)
    qw = qweight_from_packed(repack_q4_1(d, m, q), scale_dtype=jnp.float32)
    qw4 = _i4_of(qw)
    assert qw4.bias is not None
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    wd = (q.astype(np.float32) * d[..., None] + m[..., None]).reshape(n, k).T
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)


def test_q4_matmul_i4st_padded_n():
    """qweight_to_i4(pad_n=...): zero-pad columns tile at the requested
    multiple and slice off — flat AND stacked, with a non-dividing N."""
    from llamavk_tpu.ops.qweight import qweight_to_i4

    k, n = 256, 384  # pad_n=256 -> storage N 512
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    qw4 = qweight_to_i4(qw, pad_n=256)
    assert qw4.packed.shape[-1] == 512 and qw4.n_orig == n
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, k)), jnp.bfloat16)
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    assert y.shape == (3, n)
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=2e-2, atol=2e-2)
    # stacked
    import jax as _jax
    qws = [_make_qw(k, n, LAYOUT_ILV, seed=i) for i in range(2)]
    stacked = _jax.tree.map(lambda *a: jnp.stack(a), *(q for q, _ in qws))
    st4 = qweight_to_i4(stacked, pad_n=256)
    for l in range(2):
        y = np.asarray(
            q4_matmul(x, st4, out_dtype=jnp.float32, layer_idx=jnp.int32(l))
        )
        assert y.shape == (3, n)
        np.testing.assert_allclose(y, np.asarray(x, np.float32) @ qws[l][1],
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("k,c_want", [(1024, 4), (2048, 2)])
def test_q4_matmul_i4st_slice_grouping(k, c_want):
    """Group counts that are not 128-multiples but reach 128-alignment by
    walking c m-stripes per slice (i4_slice_group) store UNPADDED planes
    (the 13B shapes: gc=160 at c=4) and still match the dense reference."""
    from llamavk_tpu.ops.qweight import i4_slice_group, qweight_to_i4

    gc = k // 32
    assert i4_slice_group(gc) == c_want
    n = 256
    qw, wd = _make_qw(k, n, LAYOUT_ILV)
    qw4 = qweight_to_i4(qw)
    assert qw4.scales.shape[0] == gc  # NOT padded
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.bfloat16)
    y = np.asarray(q4_matmul(x, qw4, out_dtype=jnp.float32))
    np.testing.assert_allclose(y, np.asarray(x, np.float32) @ wd,
                               rtol=3e-2, atol=2e-2 * (k / 256) ** 0.5)


def test_synthetic_int4_geometry_matches_conversion():
    """synthetic_params(int4=True) must generate EXACTLY the plane geometry
    params_to_i4 produces (bench runs the direct path; real loads convert)."""
    import jax as _jax
    from llamavk_tpu.models import ModelConfig, params_to_i4, synthetic_params

    cfg = ModelConfig(n_vocab=384, n_embd=256, n_layer=2, n_head=2,
                      n_rot=128, n_ff=320)
    p8 = synthetic_params(cfg, seed=0)
    conv = params_to_i4(p8, pad_n=256)
    gen = synthetic_params(cfg, seed=0, int4=True, pad_n=256)
    for a, b in zip(_jax.tree.leaves(conv), _jax.tree.leaves(gen)):
        assert a.shape == b.shape and a.dtype == b.dtype, (a.shape, b.shape)
    fc = _jax.tree.structure(conv)
    fg = _jax.tree.structure(gen)
    assert fc == fg
