"""Shared optimized-HLO scanners for the diag tools.

big_insts found the int8-KV B=1 regression (a 90 MB copy-start of
w2.scales inside the layer loop — tools/diag_int8_copy.py); reuse it on any
compiled program whose measured time defies kernel-level A/Bs."""

from __future__ import annotations

import re

_ITEM = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "f16": 2, "pred": 1}

STRUCTURAL = ("parameter", "constant", "while", "conditional",
              "custom-call", "get-tuple-element", "tuple")


def big_insts(hlo: str, min_mb: float = 2.0):
    """(opcode, shape, MB) for every non-structural instruction whose OUTPUT
    tensor is >= min_mb — async copy-start, fusion outputs,
    dynamic-update-slice, transposes, all of it. Tuple-shaped outputs count
    each big element."""
    out = []
    for line in hlo.splitlines():
        m = re.search(r"= ((?:\([^)]*\)|\S+?)) ([\w-]+)\(", line)
        if not m:
            continue
        shape, op = m.groups()
        if op in STRUCTURAL:
            continue
        for dm in re.finditer(r"(\w+)\[([\d,]*)\]", shape):
            dt, dims = dm.groups()
            if dt not in _ITEM:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            mb = n * _ITEM[dt] / 1e6
            if mb >= min_mb:
                out.append((op, f"{dt}[{dims}]", mb))
    return out


def report(hlo: str, log, min_mb: float = 2.0, top: int = 24):
    """Print the big instructions + per-opcode totals through log(...)."""
    insts = big_insts(hlo, min_mb)
    log(f"large-output instructions in optimized HLO ({len(insts)} >= {min_mb} MB):")
    for op, shape, mb in sorted(insts, key=lambda t: -t[2])[:top]:
        log(f"    {op:22s} {shape:48s} {mb:8.1f} MB")
    by_op = {}
    for op, _, mb in insts:
        c, s = by_op.get(op, (0, 0.0))
        by_op[op] = (c + 1, s + mb)
    for op, (c, s) in sorted(by_op.items(), key=lambda t: -t[1][1]):
        log(f"    TOTAL {op:18s} x{c:<4d} {s:10.1f} MB")
    return insts
