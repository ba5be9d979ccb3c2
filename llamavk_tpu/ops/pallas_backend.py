"""Backend dispatch for Pallas kernels.

On TPU, kernels compile natively via Mosaic. On CPU (tests, the driver's
virtual multi-device mesh) they run in Pallas interpreter mode, which has
identical semantics — the reference-vs-optimized parity idiom from the
reference's quantize-stats harness, applied to execution backends.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def interpret_mode() -> bool:
    return jax.default_backend() != "tpu"
