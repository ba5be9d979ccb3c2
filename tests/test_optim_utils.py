"""Tests for the optimizer / conv / instrumentation library surface
(ggml_opt, conv_1d_*, GGML_PERF analogs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.optim import AdamParams, LbfgsParams, OptResult, adam, lbfgs
from llamavk_tpu.ops.conv import conv_1d_1s, conv_1d_2s
from llamavk_tpu.utils import PerfCounters, dump_program, system_info


def quadratic(x):
    return jnp.sum((x - 3.0) ** 2)


def rosenbrock(p):
    x, y = p["x"], p["y"]
    return (1 - x) ** 2 + 100.0 * (y - x * x) ** 2


def test_adam_quadratic():
    res, x, fx, it = adam(quadratic, jnp.zeros(4), AdamParams(n_iter=2000, alpha=0.1))
    assert res == OptResult.OK
    np.testing.assert_allclose(np.asarray(x), 3.0, atol=1e-2)


def test_adam_pytree_rosenbrock():
    p0 = {"x": jnp.float32(-1.0), "y": jnp.float32(1.0)}
    res, p, fx, it = adam(
        rosenbrock, p0, AdamParams(n_iter=8000, alpha=0.02, eps_f=0.0, eps_g=1e-4)
    )
    assert fx < 1e-3


def test_lbfgs_quadratic():
    res, x, fx, it = lbfgs(quadratic, jnp.zeros(8))
    assert res == OptResult.OK
    assert it < 10  # quadratic: essentially one Newton step
    np.testing.assert_allclose(np.asarray(x), 3.0, atol=1e-4)


def test_lbfgs_rosenbrock():
    p0 = {"x": jnp.float32(-1.2), "y": jnp.float32(1.0)}
    res, p, fx, it = lbfgs(rosenbrock, p0, LbfgsParams(n_iter=200))
    assert res == OptResult.OK
    np.testing.assert_allclose(float(p["x"]), 1.0, atol=1e-3)
    np.testing.assert_allclose(float(p["y"]), 1.0, atol=1e-3)


def test_conv_1d_1s_matches_numpy():
    rng = np.random.default_rng(0)
    n_out, n_in, nk, n = 3, 2, 3, 16
    w = rng.standard_normal((n_out, n_in, nk)).astype(np.float32)
    x = rng.standard_normal((n_in, n)).astype(np.float32)
    got = np.asarray(conv_1d_1s(jnp.asarray(w), jnp.asarray(x)))
    # direct 'same' cross-correlation
    ref = np.zeros((n_out, n), np.float32)
    xp = np.pad(x, ((0, 0), (nk // 2, nk // 2)))
    for o in range(n_out):
        for t in range(n):
            ref[o, t] = np.sum(w[o] * xp[:, t : t + nk])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_conv_1d_2s_stride():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 3, 3)).astype(np.float32)
    x = rng.standard_normal((3, 32)).astype(np.float32)
    y1 = np.asarray(conv_1d_1s(jnp.asarray(w), jnp.asarray(x)))
    y2 = np.asarray(conv_1d_2s(jnp.asarray(w), jnp.asarray(x)))
    assert y2.shape == (4, 16)
    np.testing.assert_allclose(y2, y1[:, ::2], rtol=1e-5, atol=1e-5)


def test_perf_counters_report():
    pc = PerfCounters()
    with pc.timer("matmul"):
        pass
    with pc.timer("matmul"):
        pass
    pc.add("rope", 123.0)
    rep = pc.report()
    assert "matmul" in rep and "runs=     2" in rep
    assert "rope" in rep
    pc.reset()
    assert pc.stats == {}


def test_dump_program():
    f = lambda x: jnp.sin(x) * 2.0
    txt = dump_program(f, jnp.ones((4,)))
    assert "sine" in txt or "sin" in txt
    opt = dump_program(f, jnp.ones((4,)), optimized=True)
    assert "fusion" in opt or "sine" in opt


def test_system_info():
    s = system_info()
    assert "platform" in s and "devices" in s
