"""On-chip parity check: flash_decode_update (flat work-list kernel) vs
flash_attention_update (grid kernel) on REAL Mosaic — the interpret-mode
tests (tests/test_flash_decode.py) can't catch TPU-only lowering bugs
(dynamic-index stores, SMEM reads in dynamic loops, DMA alignment).

Run: PYTHONPATH=.:/root/.axon_site python tools/check_flat_parity.py
Prints PARITY-OK / PARITY-FAIL per config; exit 1 on any fail.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from llamavk_tpu.ops.flash_attn import flash_attention_update
from llamavk_tpu.ops.flash_decode import flash_decode_update


def run(quantized, paged, b=8, h=8, d=128, L=3, s=512, ps=128, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    q = r(b, 1, h, d).astype(jnp.bfloat16)
    kn = r(b, 1, h, d).astype(jnp.bfloat16)
    vn = r(b, 1, h, d).astype(jnp.bfloat16)
    kw = {}
    if paged:
        npages = b * (s // ps) + 1
        shape = (L, npages, h, ps, d)
        table = np.zeros((b, s // ps), np.int32)
        pages = list(range(1, npages))
        rng.shuffle(pages)
        for i in range(b):
            for j in range(s // ps):
                table[i, j] = pages.pop()
        kw["page_table"] = jnp.asarray(table)
    else:
        shape = (L, b, h, s, d)
    if quantized:
        k = jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)
        hs = max(128, h)
        sshape = shape[:2] + (shape[3], hs) if paged else (L, b, s, hs)
        kw.update(
            k_scale=jnp.asarray(
                np.abs(rng.standard_normal(sshape)) + 0.01, jnp.float32),
            v_scale=jnp.asarray(
                np.abs(rng.standard_normal(sshape)) + 0.01, jnp.float32),
        )
    else:
        k = r(*shape).astype(jnp.bfloat16)
        v = r(*shape).astype(jnp.bfloat16)
    npast = jnp.asarray(
        rng.integers(0, s - 2, b).astype(np.int32), jnp.int32
    )
    layer = jnp.int32(1)
    gkw = dict(kw)
    if paged:
        gkw["block_t"] = min(256, ps)
    ref = flash_attention_update(q, kn, vn, k, v, npast, layer, block_k=128,
                                 **gkw)
    out = flash_decode_update(q, kn, vn, k, v, npast, layer, block_k=128,
                              **kw)
    ok = True
    names = ["out", "k", "v", "ks", "vs"]
    for i, (a, bb) in enumerate(zip(out, ref)):
        a = np.asarray(a)
        bb = np.asarray(bb)
        if i == 0:
            bb = bb.reshape(a.shape)
        if not np.array_equal(a, bb, equal_nan=True):
            nbad = int((a != bb).sum())
            print(f"  MISMATCH {names[i]}: {nbad}/{a.size} elements "
                  f"(max abs diff {np.max(np.abs(a.astype(np.float64) - bb.astype(np.float64)))})")
            ok = False
    return ok


def main():
    fail = 0
    for quantized in (False, True):
        for paged in (False, True):
            ok = run(quantized, paged)
            tag = f"quantized={quantized} paged={paged}"
            print(("PARITY-OK  " if ok else "PARITY-FAIL ") + tag, flush=True)
            fail |= not ok
    sys.exit(fail)


if __name__ == "__main__":
    main()
