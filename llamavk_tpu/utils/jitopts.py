"""Compiler options for device-side decode loops (jit wrappers).

Diagnosis (ROADMAP item 0, tools/diag_int8_{b1,copy,msa}.py, 2026-08-19):
XLA's memory-space-assignment pass may promote a LARGE stacked weight
operand of an in-loop Pallas kernel into alternate memory (VMEM), inserting
a copy-start/copy-done of the WHOLE stacked array inside the layer loop —
measured on v5e as a 90 MB copy of params.layers.w2.scales every layer
iteration of the int8-KV B=1 decode (~2.9 GB/step of extra HBM reads,
+1.9 ms/step; the kernel only ever reads one layer's 2.8 MB slice). Whether
MSA "finds room" depends on the other live buffers, so the pathology
appears and disappears with unrelated config changes (int8 KV halves the
attention kernel's VMEM tiles → MSA promotes; bf16 doesn't).

Fix: reserve most of VMEM as scoped (kernel) space so MSA's alternate-memory
budget cannot fit multi-MB stacked weights. 96 MiB scoped leaves ~32 MiB for
MSA's genuinely useful small-buffer promotions. Measured: int8-KV B=1 goes
9.72 → 7.92 ms/step; bf16 unchanged (7.96 vs 7.84, noise).

The option only exists on the TPU backend (CPU rejects it with "No such
compile option"), so it is applied lazily per-backend; tests forcing
jax_platforms=cpu get plain jit.
"""

from __future__ import annotations

import functools

import jax

_TPU_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


@functools.lru_cache(maxsize=1)
def decode_compiler_options() -> dict | None:
    """The anti-MSA-promotion compile options on TPU, else None.

    Initializes the backend on first call — callers are engine/bench
    constructors, which are about to compile anyway."""
    try:
        backend = jax.default_backend()
    except Exception:
        return None
    return dict(_TPU_OPTS) if backend == "tpu" else None


def decode_jit(fun=None, **kw):
    """jax.jit for long-scan decode programs (adds the TPU options above).

    Drop-in for `partial(jax.jit, ...)` decorator usage."""
    if fun is None:
        return functools.partial(decode_jit, **kw)
    return jax.jit(fun, compiler_options=decode_compiler_options(), **kw)
