"""Device mesh construction.

The reference has no multi-device story (SURVEY §2.7); the scaling seam it
does have — the checkpoint's row/column tensor-split metadata
(llama_internal.h:37-41) — becomes PartitionSpecs over this mesh. Axes:
  dp — data parallel over batch/requests (crosses DCN in multi-host pods)
  pp — pipeline parallel over layer stages (stacked [L, ...] weights and the
       KV cache shard their leading layer dim; ring schedule in llama_forward)
  tp — tensor parallel over heads / ffn-hidden / vocab (stays on ICI,
       innermost so its per-token collectives ride the fastest links)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    tp: int | None = None, dp: int | None = None, pp: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n // pp, 1
    elif tp is None:
        tp = n // (dp * pp)
    elif dp is None:
        dp = n // (tp * pp)
    assert dp * pp * tp == n, f"dp({dp}) * pp({pp}) * tp({tp}) != n_devices({n})"
    arr = np.asarray(devices).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))
