"""Focused N-tile (block_n) sweep for the q4 decode matmuls, with enough
repetitions to separate real effects from differential-timing noise (single
measurements at the ~30-100us scale swing by ~30% through the axon tunnel).

Prints, per production shape, the median-of-R differential time for each
candidate block_n under dot-mode f32-mul (the measured-fastest unpack) plus
the tile the kernel ACTUALLY ran after VMEM fitting (block_n requests above
the VMEM budget silently shrink — reporting the fitted value keeps the
table honest)."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from llamavk_tpu.formats import quantize_q4_0, repack_q4_0
from llamavk_tpu.ops.qweight import qweight_from_packed
from llamavk_tpu.ops.q4_matmul import _fit_bn, q4_matmul


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_qw(key, k, n):
    w = np.asarray(
        jax.random.normal(key, (n, k), jnp.float32) * 0.05, np.float32
    )
    d, q = quantize_q4_0(w)
    return qweight_from_packed(repack_q4_0(d, q), scale_dtype=jnp.float32)


def time_fn(fn, *args, reps=5, lo=60, hi=300):
    @functools.partial(jax.jit, static_argnames=("inner",))
    def loop(*a, inner):
        def body(s, _):
            y = fn(*a)
            return s + y.astype(jnp.float32).sum(), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return s

    def once(inner):
        t0 = time.perf_counter()
        np.asarray(loop(*args, inner=inner))
        return time.perf_counter() - t0

    once(lo)  # warm both variants' compiles
    once(hi)
    vals = []
    for _ in range(reps):
        vals.append((once(hi) - once(lo)) / (hi - lo))
    return sorted(vals)[len(vals) // 2], min(vals)


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
    log(f"batch={b}")
    best = {}
    for sname, k, n in shapes:
        qw = make_qw(jax.random.fold_in(key, k * n), k, n)
        x = jax.random.normal(key, (b, k), jnp.bfloat16)
        nbytes = k * n // 2 + (k // 32) * n * 4 + 2 * b * k + 4 * b * n
        row = [f"{sname:7s} [{k:6d}x{n:6d}]"]
        for bn in (256, 512, 1024, 2048, 4096):
            fitted = _fit_bn(bn, k, k // 32, 8)
            while fitted >= 128 and (n % fitted or fitted % 128):
                fitted -= 128
            med, mn = time_fn(
                lambda x_, q_: q4_matmul(
                    x_, q_, mul_dtype=jnp.float32, block_n=bn, block_b=8
                ),
                x,
                qw,
            )
            row.append(
                f"bn{bn}->{fitted}: {med*1e6:6.1f}us {nbytes/med/1e9:5.0f}GB/s"
            )
            if (sname, "t") not in best or med < best[(sname, "t")]:
                best[(sname, "t")] = med
                best[sname] = (bn, fitted)
        log("  ".join(row))
    log("best fitted tiles: " + ", ".join(
        f"{s}={v[1]}" for s, v in best.items() if isinstance(s, str)
    ))


if __name__ == "__main__":
    main()
