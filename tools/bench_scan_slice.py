"""Hypothesis test: does scanning over stacked layer weights copy them?

A: scan slices layer weights from stacked [L, K/2, N] arrays (llama_forward's
   pattern) and feeds the slice to the Pallas matmul.
B: same scan shape but a fixed (pre-sliced) weight — no per-step slicing.

If A >> B, the dynamic-slice materializes an HBM copy of the packed weight
every layer and the fix is to index the stacked array inside the kernel
(scalar-prefetch index_map) instead of slicing outside.
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


def main():
    L, K, N = 8, 4096, 12288
    key = jax.random.key(0)
    packed = jax.random.randint(key, (L, K // 2, N), -128, 128, dtype=jnp.int8)
    scales = jnp.full((L, K // 32, N), 0.01, jnp.bfloat16)
    x = jax.random.normal(key, (1, K), jnp.bfloat16)

    def qw_of(p, s):
        return QWeight(packed=p, scales=s, bias=None, layout="ilv", chunks=1)

    @partial(jax.jit, static_argnames=("mode", "inner"))
    def loop(x, packed, scales, mode, inner):
        def body(c, l):
            xx = x.at[0, 0].add(c * 1e-6)
            if mode == "sliced":
                p = jax.lax.dynamic_index_in_dim(packed, l % L, 0, keepdims=False)
                s = jax.lax.dynamic_index_in_dim(scales, l % L, 0, keepdims=False)
            else:
                p, s = packed[0], scales[0]
            y = q4_matmul(xx, qw_of(p, s))
            return y.astype(jnp.float32).ravel()[0], None

        out, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(inner, dtype=jnp.int32)
        )
        return out

    def run(mode, inner):
        np.asarray(loop(x, packed, scales, mode, inner))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(x, packed, scales, mode, inner))
            best = min(best, time.perf_counter() - t0)
        return best

    for mode in ("fixed", "sliced"):
        dt = (run(mode, 120) - run(mode, 24)) / 96
        gbs = (K * N / 2) / dt / 1e9
        log(f"{mode:7s}: {dt*1e6:8.1f} us/matmul  ({gbs:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
