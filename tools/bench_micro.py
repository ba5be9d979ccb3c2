"""Microbenchmark: per-op decode-step cost attribution on the real chip.

Times each 7B Q4_0 matmul shape (the four per-layer GEMVs + the logits
matmul), the attention einsums, and the full forward, reporting achieved HBM
bytes/s against the packed-weight streaming roofline. Diagnostics only —
the headline number stays in bench.py.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, init_kv_cache, llama_forward, synthetic_params
from llamavk_tpu.ops.q4_matmul import q4_matmul
from llamavk_tpu.ops.qweight import QWeight


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_qw(key, k, n, scale_dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (k // 2, n), -128, 128, dtype=jnp.int8)
    scales = jax.random.uniform(k2, (k // 32, n), jnp.float32, 0.005, 0.02).astype(scale_dtype)
    return QWeight(packed=packed, scales=scales, bias=None, layout="ilv", chunks=1)


def time_fn(fn, *args, lo=50, hi=250):
    # Differential timing: the axon tunnel adds a large fixed per-dispatch
    # cost, so run the op `lo` and `hi` times inside single jit programs and
    # take the slope — fixed costs cancel. The carry perturbs the first input
    # element so iterations are loop-carried (no hoisting/CSE).
    @partial(jax.jit, static_argnames=("inner",))
    def loop(x0, *a, inner):
        def body(c, _):
            x = x0.at[(0,) * x0.ndim].add(c * 1e-6)
            y = fn(x, *a)
            return y.astype(jnp.float32).ravel()[0], None
        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return s

    def run(inner):
        np.asarray(loop(*args, inner=inner))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args, inner=inner))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo)


def main():
    cfg = ModelConfig(**LLAMA_CONFIGS["7B"])
    e, f, v = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    key = jax.random.key(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1

    shapes = [
        ("wqkv", e, 3 * e),
        ("wo", e, e),
        ("w13", e, 2 * f),
        ("w2", f, e),
        ("output", e, v),
    ]
    x_cache = {}
    total_ms = 0.0
    log(f"batch={b}")
    for name, k, n in shapes:
        if k not in x_cache:
            x_cache[k] = jax.random.normal(key, (b, 1, k), jnp.bfloat16)
        qw = make_qw(jax.random.fold_in(key, k * n), k, n)
        dt = time_fn(lambda x, q: q4_matmul(x, q), x_cache[k], qw)
        nbytes = k * n // 2 + (k // 32) * n * 2 + 2 * b * k + 4 * b * n
        gbs = nbytes / dt / 1e9
        per_layer = dt * 1e3
        total_ms += per_layer if name != "output" else 0
        log(f"{name:8s} [{k:6d}x{n:6d}] {dt*1e6:9.1f} us  {gbs:7.1f} GB/s")
    log(f"4-matmul sum x32 layers = {total_ms*32*1e3:.2f} ms")

    # attention: per-layer einsum cost at n_ctx=512
    s, h, d = 512, cfg.n_head, cfg.head_dim
    q = jax.random.normal(key, (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    vc = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)

    def attn(q, kc, vc):
        scores = jnp.einsum("bthd,bhsd->bhts", q, kc, preferred_element_type=jnp.float32)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhts,bhsd->bthd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)

    dt = time_fn(attn, q, kc, vc)
    log(f"attention einsum [s={s}] {dt*1e6:9.1f} us/layer -> x32 = {dt*32*1e3:.2f} ms")

    from llamavk_tpu.ops.flash_attn import flash_attention

    for np_frac, label in [(s - 1, "full"), (s // 4, "quarter")]:
        fa = lambda q_, k_, v_: flash_attention(q_, k_, v_, jnp.int32(np_frac))
        dt = time_fn(fa, q, kc, vc)
        log(f"flash attn [{label:7s}] {dt*1e6:9.1f} us/layer -> x32 = {dt*32*1e3:.2f} ms")

    # full forward for comparison
    params = synthetic_params(cfg, seed=0)
    cache = init_kv_cache(cfg, b, 512)
    tok = jnp.ones((b, 1), jnp.int32)

    @jax.jit
    def fwd(params, tok, cache):
        logits, cache, _ = llama_forward(params, tok, cache, jnp.int32(256), cfg)
        return logits.sum()

    fwd(params, tok, cache).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fwd(params, tok, cache))
        best = min(best, time.perf_counter() - t0)
    log(f"full forward (jit, incl dispatch): {best*1e3:.2f} ms")


if __name__ == "__main__":
    main()
