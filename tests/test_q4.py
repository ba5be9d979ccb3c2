"""Q4_0/Q4_1 codec tests — the exact-value assertions of the reference's
tests/test-quantize.c, plus round-trip and disk-layout checks."""

import numpy as np
import pytest

from llamavk_tpu.formats import (
    QK,
    dequantize_q4_0,
    dequantize_q4_1,
    q4_0_from_bytes,
    q4_0_to_bytes,
    q4_1_from_bytes,
    q4_1_to_bytes,
    quantize_q4_0,
    quantize_q4_1,
)
from llamavk_tpu.formats.q4 import quantize_tensor_with_hist, GGML_FTYPE_Q4_0


def test_q4_0_ramp_exact():
    # synthetic ramp 1..32, mirrors tests/test-quantize.c:12-26
    src = np.arange(1, QK + 1, dtype=np.float32)
    d, q = quantize_q4_0(src)
    assert d.shape == (1,) and q.shape == (1, QK)
    expected_d = src[31] / 7.0
    assert d[0] == np.float32(expected_d)
    expected_q = np.round(src / expected_d).astype(np.int64) + 8
    # roundf on exact .5 rounds away from zero; values here are positive
    expected_q = (np.floor(src / expected_d + 0.5)).astype(np.int64) + 8
    np.testing.assert_array_equal(q[0].astype(np.int64), expected_q)
    # disk block is 20 bytes
    blob = q4_0_to_bytes(d, q)
    assert len(blob) == 20


def test_q4_1_ramp_exact():
    src = np.arange(1, QK + 1, dtype=np.float32)
    d, m, q = quantize_q4_1(src)
    expected_d = (src[31] - src[0]) / 15.0
    assert d[0] == np.float32(expected_d)
    assert m[0] == src[0]
    expected_q = np.floor((src - src[0]) / expected_d + 0.5).astype(np.int64)
    np.testing.assert_array_equal(q[0].astype(np.int64), expected_q)
    blob = q4_1_to_bytes(d, m, q)
    assert len(blob) == 24


def test_roundf_half_away_from_zero():
    # np.round is banker's rounding; the codec must match C roundf
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5], np.float32) * (7.0 / 7.0)
    src = np.zeros(QK, np.float32)
    src[:6] = x
    src[6] = 7.0  # force d = 1.0
    d, q = quantize_q4_0(src)
    assert d[0] == 1.0
    np.testing.assert_array_equal(
        q[0, :6].astype(np.int64) - 8, [1, 2, 3, -1, -2, -3]
    )


@pytest.mark.parametrize("n", [32, 128, 4096])
def test_q4_0_roundtrip_bytes(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    d, q = quantize_q4_0(x)
    blob = q4_0_to_bytes(d, q)
    d2, q2 = q4_0_from_bytes(blob, n)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(q, q2)
    # dequant error bounded by half a step
    y = dequantize_q4_0(d, q)
    step = np.repeat(d, QK)
    assert np.all(np.abs(y - x) <= step * 0.5 + 1e-7)


@pytest.mark.parametrize("n", [32, 4096])
def test_q4_1_roundtrip_bytes(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n).astype(np.float32) * 3 + 1
    d, m, q = quantize_q4_1(x)
    blob = q4_1_to_bytes(d, m, q)
    d2, m2, q2 = q4_1_from_bytes(blob, n)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(m, m2)
    np.testing.assert_array_equal(q, q2)
    y = dequantize_q4_1(d, m, q)
    step = np.repeat(d, QK)
    assert np.all(np.abs(y - x) <= step * 0.5 + 1e-6)


def test_zero_block():
    d, q = quantize_q4_0(np.zeros(QK, np.float32))
    assert d[0] == 0.0
    np.testing.assert_array_equal(q[0], np.full(QK, 8))
    np.testing.assert_array_equal(dequantize_q4_0(d, q), np.zeros(QK))


def test_quantize_hist():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 128)).astype(np.float32)
    data, hist = quantize_tensor_with_hist(x, GGML_FTYPE_Q4_0)
    assert hist.sum() == x.size
    assert len(data) == (x.size // QK) * 20
