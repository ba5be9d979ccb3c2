"""Quantization error statistics — parity with examples/quantize-stats
(`examples/quantize-stats/quantize-stats.cpp:136-341`).

Round-trips every 2-D weight tensor of an f16/f32 model through the Q4_0 or
Q4_1 codec and reports per-layer and total RMSE, max error, and the error
quantiles, with regex include/exclude layer filters. This is the
reference-vs-optimized parity harness: it validates the vectorized NumPy
codec (and, with --device, the on-device dequant path) against the scalar
definition of the format.
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

from ..formats.ggml_io import CheckpointReader
from ..formats.q4 import (
    GGML_FTYPE_Q4_0,
    dequantize_q4_0,
    dequantize_q4_1,
    quantize_q4_0,
    quantize_q4_1,
)


def error_stats(x: np.ndarray, y: np.ndarray) -> dict:
    err = np.abs(x - y).reshape(-1)
    return {
        "rmse": float(np.sqrt(np.mean((x - y) ** 2))),
        "maxerr": float(err.max()),
        "p95": float(np.quantile(err, 0.95)),
        "median": float(np.quantile(err, 0.5)),
    }


def run_stats(
    path: str,
    ftype: int = GGML_FTYPE_Q4_0,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    per_layer: bool = True,
    device: bool = False,
    out=sys.stdout,
) -> dict:
    r = CheckpointReader(path)
    total_sq = total_n = 0.0
    total_max = 0.0
    results = {}
    for name, t in r.tensors.items():
        if len(t.ne) != 2 or not name.endswith("weight"):
            continue
        # regex search, matching the reference's layer_included
        # (quantize-stats.cpp:70-80: exclude wins, include defaults all)
        if exclude and any(re.search(p, name) for p in exclude):
            continue
        if include and not any(re.search(p, name) for p in include):
            continue
        x = r.load_f32(name)
        if ftype == GGML_FTYPE_Q4_0:
            d, q = quantize_q4_0(x)
            y = dequantize_q4_0(d, q).reshape(x.shape)
        else:
            d, m, q = quantize_q4_1(x)
            y = dequantize_q4_1(d, m, q).reshape(x.shape)
        if device:
            # round-trip through the device packed layout + jnp dequant
            import jax.numpy as jnp

            from ..formats.repack import repack_q4_0, repack_q4_1
            from ..ops.qweight import dequantize_qweight, qweight_from_packed

            if ftype == GGML_FTYPE_Q4_0:
                pk = repack_q4_0(d, q)
            else:
                pk = repack_q4_1(d, m, q)
            qw = qweight_from_packed(pk, scale_dtype=jnp.float32)
            y = np.asarray(dequantize_qweight(qw)).T.reshape(x.shape)
        st = error_stats(x, y)
        results[name] = st
        total_sq += float(np.sum((x - y) ** 2))
        total_n += x.size
        total_max = max(total_max, st["maxerr"])
        if per_layer:
            print(
                f"{name:>48}  rmse {st['rmse']:.6f}  max {st['maxerr']:.6f}"
                f"  p95 {st['p95']:.6f}",
                file=out,
            )
    overall = {"rmse": float(np.sqrt(total_sq / max(total_n, 1))), "maxerr": total_max}
    print(f"{'TOTAL':>48}  rmse {overall['rmse']:.6f}  max {overall['maxerr']:.6f}", file=out)
    results["__total__"] = overall
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-t", "--type", type=int, default=2, help="2=q4_0, 3=q4_1")
    ap.add_argument("-l", "--include-layer", action="append", default=None)
    ap.add_argument("-L", "--exclude-layer", action="append", default=None)
    ap.add_argument("--device", action="store_true", help="validate device packed layout")
    args = ap.parse_args(argv)
    run_stats(args.model, args.type, args.include_layer, args.exclude_layer,
              device=args.device)
    return 0


if __name__ == "__main__":
    sys.exit(main())
