"""Float-precision contracts — the tests/test-double-float.c analog.

The reference proves (exhaustively over all 2^32 floats) that its
double→float refactors of rounding and SILU preserve results, with SILU
within 1 ulp at fp16 precision. The fp16 domain (2^16 patterns) is exhaustive
here and covers every value the engine's activations can take at the
quantization boundary.
"""

import numpy as np

from llamavk_tpu.formats.q4 import _roundf


def _all_finite_fp16() -> np.ndarray:
    all16 = np.arange(65536, dtype=np.uint16).view(np.float16)
    return all16[np.isfinite(all16)].astype(np.float64)


def test_roundf_f32_matches_f64_exhaustive_fp16():
    x = _all_finite_fp16()
    r64 = np.sign(x) * np.floor(np.abs(x) + 0.5)
    r32 = _roundf(x.astype(np.float32)).astype(np.float64)
    np.testing.assert_array_equal(r32, r64)


def test_silu_f32_within_1ulp_at_fp16():
    x = _all_finite_fp16()
    silu64 = x / (1.0 + np.exp(-x))
    x32 = x.astype(np.float32)
    silu32 = (x32 / (1.0 + np.exp(-x32))).astype(np.float64)
    # compare after rounding both to fp16 (the engine's activation dtype
    # boundary): must agree within 1 ulp
    a = silu64.astype(np.float16)
    b = silu32.astype(np.float16)
    ulp = np.abs(a.view(np.int16).astype(np.int32) - b.view(np.int16).astype(np.int32))
    # identical-sign check: 1-ulp across zero would be a sign flip
    assert (np.signbit(a) == np.signbit(b)).all()
    assert ulp.max() <= 1, f"max ulp distance {ulp.max()}"


def test_exp_f32_within_1ulp_at_fp16():
    # the softmax exponent path (the reference's fp16 exp LUT, ggml.c:303-322)
    x = _all_finite_fp16()
    x = x[(x > -20) & (x < 11)]  # fp16-representable exp outputs
    e64 = np.exp(x).astype(np.float16)
    e32 = np.exp(x.astype(np.float32)).astype(np.float16)
    ulp = np.abs(
        e64.view(np.int16).astype(np.int32) - e32.view(np.int16).astype(np.int32)
    )
    assert ulp.max() <= 1, f"max ulp distance {ulp.max()}"
