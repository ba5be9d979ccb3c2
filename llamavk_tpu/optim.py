"""Optimizers — the library-surface analog of ggml's ADAM and L-BFGS
(`ggml_opt`, ggml.c:9848-10518; params/enums ggml.h:686-777).

The reference ships gradient-based optimizers as part of its tensor library
even though inference never calls them. The TPU-native counterpart uses JAX
autograd (`jax.grad` — the ggml_build_backward analog, ggml.c:8700-9230) with
jit-compiled update steps over arbitrary pytrees. Both optimizers carry the
reference's convergence controls: max iterations, relative `past`/`delta`
improvement test, and max-iterations-without-improvement.

L-BFGS uses the standard two-loop recursion with a backtracking line search
enforcing Armijo + strong-Wolfe conditions (the reference's
GGML_LINESEARCH_BACKTRACKING_STRONG_WOLFE default).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


class OptResult(enum.Enum):
    # ggml.h enum ggml_opt_result
    OK = 0
    DID_NOT_CONVERGE = 1
    NO_CONTEXT = 2
    INVALID_WOLFE = 3
    FAIL = 4


@dataclass
class AdamParams:
    # defaults mirror ggml_opt_default_params GGML_OPT_ADAM (ggml.c:10380-10420)
    n_iter: int = 100
    alpha: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    eps_f: float = 1e-5  # relative function-improvement convergence test
    eps_g: float = 1e-3  # gradient-norm convergence test
    past: int = 0  # compare f against f from `past` iterations ago
    delta: float = 1e-5
    max_no_improvement: int = 100


@dataclass
class LbfgsParams:
    m: int = 6  # history size
    n_iter: int = 100
    eps: float = 1e-5  # ||g|| / max(1, ||x||) convergence
    ftol: float = 1e-4  # Armijo sufficient-decrease
    wolfe: float = 0.9  # curvature condition
    min_step: float = 1e-20
    max_step: float = 1e20
    max_linesearch: int = 20
    past: int = 0
    delta: float = 1e-5


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    shapes = [l.shape for l in leaves]
    sizes = [l.size for l in leaves]
    flat = jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
    def unflatten(v):
        out, off = [], 0
        for shp, sz in zip(shapes, sizes):
            out.append(v[off : off + sz].reshape(shp))
            off += sz
        return jax.tree.unflatten(treedef, out)
    return flat, unflatten


def adam(f, x0, params: AdamParams | None = None):
    """Minimize f(x) (x any pytree) with ADAM. Returns (result, x, f(x), n_iter)."""
    p = params or AdamParams()
    x, unflatten = _flatten(x0)
    fg = jax.jit(jax.value_and_grad(lambda v: f(unflatten(v))))

    @jax.jit
    def step(x, m, v, t):
        fx, g = fg(x)
        m = p.beta1 * m + (1 - p.beta1) * g
        v = p.beta2 * v + (1 - p.beta2) * g * g
        mh = m / (1 - p.beta1**t)
        vh = v / (1 - p.beta2**t)
        x = x - p.alpha * mh / (jnp.sqrt(vh) + p.eps)
        return x, m, v, fx, jnp.linalg.norm(g)

    m = jnp.zeros_like(x)
    v = jnp.zeros_like(x)
    fx_prev = None
    history: list[float] = []
    best = jnp.inf
    n_no_improve = 0
    for t in range(1, p.n_iter + 1):
        x, m, v, fx, gnorm = step(x, m, v, t)
        fx = float(fx)
        if fx_prev is not None and abs(fx - fx_prev) / max(abs(fx), 1e-12) < p.eps_f:
            return OptResult.OK, unflatten(x), fx, t
        if float(gnorm) < p.eps_g:
            return OptResult.OK, unflatten(x), fx, t
        if p.past > 0:
            history.append(fx)
            if len(history) > p.past and history[-p.past - 1] - fx < p.delta:
                return OptResult.OK, unflatten(x), fx, t
        if fx < best - p.delta:
            best, n_no_improve = fx, 0
        else:
            n_no_improve += 1
            if n_no_improve >= p.max_no_improvement:
                return OptResult.OK, unflatten(x), fx, t
        fx_prev = fx
    return OptResult.DID_NOT_CONVERGE, unflatten(x), fx_prev, p.n_iter


def lbfgs(f, x0, params: LbfgsParams | None = None):
    """Minimize f(x) with L-BFGS + strong-Wolfe backtracking line search."""
    p = params or LbfgsParams()
    x, unflatten = _flatten(x0)
    fg = jax.jit(jax.value_and_grad(lambda v: f(unflatten(v))))

    fx, g = fg(x)
    fx = float(fx)
    xnorm = float(jnp.linalg.norm(x))
    gnorm = float(jnp.linalg.norm(g))
    if gnorm / max(1.0, xnorm) <= p.eps:
        return OptResult.OK, unflatten(x), fx, 0

    s_hist: list[jnp.ndarray] = []
    y_hist: list[jnp.ndarray] = []
    rho_hist: list[float] = []
    history: list[float] = []
    d = -g
    step = 1.0 / max(gnorm, 1e-20)

    for it in range(1, p.n_iter + 1):
        # --- backtracking strong-Wolfe line search (ggml.c linesearch_backtracking)
        dginit = float(jnp.vdot(g, d))
        if dginit > 0:  # not a descent direction
            return OptResult.INVALID_WOLFE, unflatten(x), fx, it
        alpha = step
        fx0, g0 = fx, g
        ok = False
        for _ in range(p.max_linesearch):
            if alpha < p.min_step or alpha > p.max_step:
                break
            fx_new, g_new = fg(x + alpha * d)
            fx_new = float(fx_new)
            if fx_new > fx0 + p.ftol * alpha * dginit:
                alpha *= 0.5  # Armijo failed: decrease
                continue
            dg = float(jnp.vdot(g_new, d))
            if dg < p.wolfe * dginit:
                alpha *= 2.1  # curvature failed: increase
                continue
            if abs(dg) > -p.wolfe * dginit:  # strong Wolfe
                alpha *= 0.5
                continue
            ok = True
            break
        if not ok:
            return OptResult.FAIL, unflatten(x), fx, it

        x_new = x + alpha * d
        s = x_new - x
        y = g_new - g0
        x, fx, g = x_new, fx_new, g_new

        xnorm = float(jnp.linalg.norm(x))
        gnorm = float(jnp.linalg.norm(g))
        if gnorm / max(1.0, xnorm) <= p.eps:
            return OptResult.OK, unflatten(x), fx, it
        if p.past > 0:
            history.append(fx)
            if len(history) > p.past and history[-p.past - 1] - fx < p.delta:
                return OptResult.OK, unflatten(x), fx, it

        ys = float(jnp.vdot(y, s))
        if ys > 1e-10:
            if len(s_hist) == p.m:
                s_hist.pop(0), y_hist.pop(0), rho_hist.pop(0)
            s_hist.append(s)
            y_hist.append(y)
            rho_hist.append(1.0 / ys)

        # --- two-loop recursion
        q = g
        alphas = []
        for s_i, y_i, rho_i in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a_i = rho_i * float(jnp.vdot(s_i, q))
            q = q - a_i * y_i
            alphas.append(a_i)
        if s_hist:
            gamma = float(jnp.vdot(s_hist[-1], y_hist[-1]) / jnp.vdot(y_hist[-1], y_hist[-1]))
            q = gamma * q
        for (s_i, y_i, rho_i), a_i in zip(
            zip(s_hist, y_hist, rho_hist), reversed(alphas)
        ):
            b_i = rho_i * float(jnp.vdot(y_i, q))
            q = q + (a_i - b_i) * s_i
        d = -q
        step = 1.0
    return OptResult.DID_NOT_CONVERGE, unflatten(x), fx, p.n_iter
