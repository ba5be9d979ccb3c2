"""Workaround for an int4 jit-dispatch bug in jax 0.9.0 + the axon TPU
plugin (measured 2026-08-20, see tools/bench_i4_stacked.py).

Symptom: passing ANY jnp.int4 array into a jitted function recurses forever
("Recursively calling jit" / RecursionError) in
`jax._src.array._array_shard_arg`.

Root cause: the plugin's PjRtLayout query reports
`sub_byte_element_size_in_bits=0` for int4 buffers, while compiled
executables declare their int4 inputs with `=4`. The tiling and
major_to_minor are IDENTICAL — the bytes already match — but the layout
equality check fails, so `_array_shard_arg` issues a relayout
`device_put(x, Format(layout, sharding))`, whose own input hits the same
mismatch, recursing.

Fix: wrap the shard-arg handler so an int4 argument whose layout differs
from the executable's ONLY in the sub-byte field (one side 0) skips the
relayout — the buffer is already in the right layout. Verified by value
roundtrip: jit(astype(int32)) over all 16 nibble values returns them
exactly (tools/bench_i4_stacked.py numerics, and test_ops int4 tests).

This touches jax internals and is intentionally as narrow as possible:
anything that isn't exactly this mismatch falls through to stock behavior,
and any AttributeError from a changed jax version disables the patch's
effect (the comparison just returns False). Remove once the plugin reports
sub-byte sizes correctly.
"""

from __future__ import annotations

import functools


def _subbyte_only_diff(la, lb) -> bool:
    """True iff two jax Layouts are identical except that exactly one side
    reports sub_byte_element_size_in_bits=0 (the plugin bug signature)."""
    try:
        return (
            la != lb
            and la.major_to_minor == lb.major_to_minor
            and la.tiling == lb.tiling
            and 0 in (la._sub_byte_element_size_in_bits,
                      lb._sub_byte_element_size_in_bits)
        )
    except Exception:
        return False


@functools.cache
def ensure_int4_dispatch() -> bool:
    """Install the shard-arg shim once; returns True when installed."""
    try:
        import jax._src.array as _arr
        from jax._src.interpreters import pxla

        orig = pxla.shard_arg_handlers[_arr.ArrayImpl]
        if getattr(orig, "_llamavk_int4_shim", False):
            return True

        def shard_arg_int4_shim(xs, shardings, layouts, copy_semantics):
            layouts = [
                None
                if (
                    l is not None
                    and x.dtype.name in ("int4", "uint4")
                    and _subbyte_only_diff(x.format.layout, l)
                )
                else l
                for x, l in zip(xs, layouts)
            ]
            return orig(xs, shardings, layouts, copy_semantics)

        shard_arg_int4_shim._llamavk_int4_shim = True
        pxla.shard_arg_handlers[_arr.ArrayImpl] = shard_arg_int4_shim
        return True
    except Exception:
        return False
