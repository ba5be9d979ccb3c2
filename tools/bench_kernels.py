"""A/B kernel variants for the q4 dequant-matmul on the real chip.

Sweeps mul_dtype (f32 vs bf16 nibble*scale product) and block_n, reporting
achieved HBM GB/s per 7B matmul shape with differential timing (the axon
tunnel's fixed dispatch cost cancels between two loop lengths).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.ops.q4_matmul import q4_matmul
from llamavk_tpu.ops.qweight import QWeight


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_qw(key, k, n):
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (k // 2, n), -128, 128, dtype=jnp.int8)
    scales = jax.random.uniform(k2, (k // 32, n), jnp.float32, 0.005, 0.02).astype(
        jnp.bfloat16
    )
    return QWeight(packed=packed, scales=scales, bias=None, layout="ilv", chunks=1)


def time_fn(fn, *args, lo=50, hi=250):
    @partial(jax.jit, static_argnames=("inner",))
    def loop(x0, *a, inner):
        def body(c, _):
            x = x0.at[(0,) * x0.ndim].add(c * 1e-6)
            y = fn(x, *a)
            return y.astype(jnp.float32).ravel()[0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(inner))
        return s

    def run(inner):
        np.asarray(loop(*args, inner=inner))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(*args, inner=inner))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(hi) - run(lo)) / (hi - lo)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    key = jax.random.key(0)
    shapes = [
        ("wqkv", 4096, 12288),
        ("wo", 4096, 4096),
        ("w13", 4096, 22016),
        ("w2", 11008, 4096),
        ("output", 4096, 32000),
    ]
    variants = [
        ("f32/bn512", dict(mul_dtype=jnp.float32, block_n=512)),
        ("bf16/bn512", dict(mul_dtype=jnp.bfloat16, block_n=512)),
        ("bf16/bn1024", dict(mul_dtype=jnp.bfloat16, block_n=1024)),
        ("bf16/bn2048", dict(mul_dtype=jnp.bfloat16, block_n=2048)),
        ("f32/bn1024", dict(mul_dtype=jnp.float32, block_n=1024)),
        ("f32/bn2048", dict(mul_dtype=jnp.float32, block_n=2048)),
        ("i4/bn1024", dict(mul_dtype=jnp.float32, block_n=1024, dot_mode="i4")),
    ]
    log(f"batch={b}")
    totals = {name: 0.0 for name, _ in variants}
    for sname, k, n in shapes:
        qw = make_qw(jax.random.fold_in(key, k * n), k, n)
        x = jax.random.normal(key, (b, 1, k), jnp.bfloat16)
        nbytes = k * n // 2 + (k // 32) * n * 2 + 2 * b * k + 4 * b * n
        row = [f"{sname:7s} [{k:6d}x{n:6d}]"]
        for vname, kw in variants:
            dt = time_fn(lambda x_, q_: q4_matmul(x_, q_, **kw), x, qw)
            row.append(f"{vname}: {dt*1e6:7.1f}us {nbytes/dt/1e9:6.0f}GB/s")
            if sname != "output":
                totals[vname] += dt
        log("  ".join(row))
    for vname, t in totals.items():
        log(f"layer 4-matmul sum x32 [{vname}]: {t*32*1e3:.2f} ms")


if __name__ == "__main__":
    main()
