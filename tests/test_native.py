"""Native C++ data-plane parity tests (the quantize-stats idiom: reference
NumPy implementation vs optimized native code on the same inputs)."""

import numpy as np
import pytest

from llamavk_tpu import native
from llamavk_tpu.formats.q4 import (
    GGML_FTYPE_Q4_0,
    GGML_FTYPE_Q4_1,
    QK,
    q4_0_to_bytes,
    q4_1_to_bytes,
    quantize_q4_0,
    quantize_q4_1,
    quantize_tensor_with_hist as quantize_ref,
)
from llamavk_tpu.formats.repack import repack_q4_0, repack_q4_1

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("ftype", [GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1])
def test_quantize_matches_reference(rng, ftype):
    x = rng.standard_normal((64, 256)).astype(np.float32) * 0.3
    data_n, hist_n = native.quantize_tensor_with_hist(x, ftype)
    data_r, hist_r = quantize_ref(x, ftype)
    assert data_n == data_r
    np.testing.assert_array_equal(hist_n, hist_r)


def test_quantize_edge_values(rng):
    # all-zero block (d == 0 path) and a huge-amplitude block
    x = np.zeros((4, QK), np.float32)
    x[1] = 1e30
    x[2] = rng.standard_normal(QK)
    x[3, 0] = -5.0
    for ftype in (GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1):
        data_n, _ = native.quantize_tensor_with_hist(x, ftype)
        data_r, _ = quantize_ref(x, ftype)
        assert data_n == data_r


@pytest.mark.parametrize("ftype", [GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1])
def test_dequantize_matches_reference(rng, ftype):
    n = 8 * 1024
    x = rng.standard_normal(n).astype(np.float32)
    if ftype == GGML_FTYPE_Q4_0:
        d, q = quantize_q4_0(x)
        raw = q4_0_to_bytes(d, q)
        ref = ((q.astype(np.float32) - 8.0) * d[:, None]).reshape(-1)
    else:
        d, m, q = quantize_q4_1(x)
        raw = q4_1_to_bytes(d, m, q)
        ref = (q.astype(np.float32) * d[:, None] + m[:, None]).reshape(-1)
    out = native.dequantize_stream(np.frombuffer(raw, np.uint8), n, ftype)
    if ftype == GGML_FTYPE_Q4_0:
        np.testing.assert_array_equal(out, ref.astype(np.float32))
    else:
        # q*d + m contracts to FMA under -O3 -march=native: 1-ulp tolerance
        np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-4, atol=1e-6)


def test_fp16_to_fp32_exhaustive_classes():
    # normals, subnormals, zeros, inf — every 2^16 pattern vs NumPy
    all_u16 = np.arange(65536, dtype=np.uint16)
    out = native.fp16_to_fp32(all_u16)
    ref = all_u16.view(np.float16).astype(np.float32)
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(out[finite], ref[finite])
    assert np.array_equal(np.isnan(out), np.isnan(ref))
    assert np.array_equal(np.isinf(out), np.isinf(ref))


@pytest.mark.parametrize("layout", ["ilv", "lin"])
@pytest.mark.parametrize("chunks", [1, 2])
def test_repack_q4_0_matches_reference(rng, layout, chunks):
    n_rows, k = 48, 256  # k/chunks must be a multiple of 64
    x = rng.standard_normal((n_rows, k)).astype(np.float32)
    d, q = quantize_q4_0(x)  # [N, G], [N, G, QK]
    raw = np.frombuffer(q4_0_to_bytes(d, q), np.uint8)
    ref = repack_q4_0(d, q, layout=layout, chunks=chunks)
    got = native.repack_q4_stream(raw, n_rows, k, GGML_FTYPE_Q4_0, layout, chunks)
    np.testing.assert_array_equal(got.packed, ref.packed)
    np.testing.assert_array_equal(got.scales, ref.scales)
    assert got.bias is None and ref.bias is None
    assert (got.k, got.n, got.layout, got.chunks) == (k, n_rows, layout, chunks)


def test_repack_q4_1_matches_reference(rng):
    n_rows, k = 32, 128
    x = rng.standard_normal((n_rows, k)).astype(np.float32)
    d, m, q = quantize_q4_1(x)
    raw = np.frombuffer(q4_1_to_bytes(d, m, q), np.uint8)
    ref = repack_q4_1(d, m, q, layout="ilv", chunks=1)
    got = native.repack_q4_stream(raw, n_rows, k, GGML_FTYPE_Q4_1, "ilv", 1)
    np.testing.assert_array_equal(got.packed, ref.packed)
    np.testing.assert_array_equal(got.scales, ref.scales)
    np.testing.assert_allclose(got.bias, ref.bias, rtol=1e-6)


def test_repack_rows_matches_loader_path(rng):
    # embedding-table layout: per-row split-half packing (loader._pack_embedding_rows)
    v, k = 64, 128
    x = rng.standard_normal((v, k)).astype(np.float32)
    d, q = quantize_q4_0(x)
    raw = np.frombuffer(q4_0_to_bytes(d, q), np.uint8)
    packed, scales, bias = native.repack_q4_rows_stream(raw, v, k, GGML_FTYPE_Q4_0)
    qs = (q.astype(np.int16) - 8).astype(np.int8).reshape(v, k)
    lo, hi = qs[:, : k // 2], qs[:, k // 2 :]
    ref_packed = ((lo & 0xF) | (hi << 4)).astype(np.int8)
    np.testing.assert_array_equal(packed, ref_packed)
    np.testing.assert_array_equal(scales, d)
    assert bias is None


def test_large_multithreaded_repack(rng):
    # big enough to exercise several tiles/threads
    n_rows, k = 512, 1024
    x = (rng.standard_normal((n_rows, k)) * 0.2).astype(np.float32)
    d, q = quantize_q4_0(x)
    raw = np.frombuffer(q4_0_to_bytes(d, q), np.uint8)
    ref = repack_q4_0(d, q, layout="ilv", chunks=4)
    got = native.repack_q4_stream(raw, n_rows, k, GGML_FTYPE_Q4_0, "ilv", 4)
    np.testing.assert_array_equal(got.packed, ref.packed)
    np.testing.assert_array_equal(got.scales, ref.scales)


def test_loader_native_vs_numpy_paths(tmp_path, monkeypatch):
    """Full checkpoint load must be identical through both repack paths."""
    import jax
    from llamavk_tpu.models import loader as loader_mod

    path = str(tmp_path / "tiny.bin")
    loader_mod.random_tiny_model(write_path=path, quantize=True)

    from llamavk_tpu.formats.ggml_io import CheckpointReader

    cfg_n, params_native = loader_mod.params_from_reader(CheckpointReader(path))
    # force the NumPy fallback
    monkeypatch.setattr(loader_mod.native, "repack_q4_stream", lambda *a, **k: None)
    monkeypatch.setattr(
        loader_mod.native, "repack_q4_rows_stream", lambda *a, **k: None
    )
    cfg_r, params_ref = loader_mod.params_from_reader(CheckpointReader(path))
    assert cfg_n == cfg_r
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_native,
        params_ref,
    )
