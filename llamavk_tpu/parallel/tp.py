"""shard_map-wrapped tensor-parallel forward.

The scaling-book recipe: pick a mesh, place the weights per the split table
(sharding.py), run the forward per-device with explicit psum/all_gather where
the Megatron-style column→row pairs meet. Collectives ride ICI inside a host;
only the dp axis (batch) ever crosses DCN.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import KVCache, LlamaParams, ModelConfig, llama_forward
from .sharding import cache_pspec, param_pspecs


def make_sharded_forward(
    cfg: ModelConfig,
    params: LlamaParams,
    mesh: Mesh,
    logits_all: bool = False,
    pp_microbatch: int = 1,
    quantized_kv: bool = False,
    ring_kv: bool = False,
):
    """Returns a jitted fn(params, tokens, cache, n_past) running TP+DP over
    the mesh. tokens: [B, T] with B divisible by the dp axis size.

    pp_microbatch > 1 interleaves that many microbatches across the pp
    stages (GPipe-style: utilization M/(M+P-1) instead of 1/P per
    activation); the per-device batch must divide by it."""
    pspecs = param_pspecs(params)
    cspec = cache_pspec(quantized=quantized_kv, ring=ring_kv)

    tp_size = mesh.shape["tp"]
    pp_size = mesh.shape.get("pp", 1)

    def fwd(p, tokens, cache, n_past):
        logits, new_cache, emb = llama_forward(
            p, tokens, cache, n_past, cfg,
            logits_all=logits_all, tp_axis="tp", tp_size=tp_size,
            pp_axis="pp" if pp_size > 1 else None, pp_size=pp_size,
            pp_microbatch=pp_microbatch if pp_size > 1 else 1,
        )
        return logits, new_cache, emb

    shmapped = jax.shard_map(
        fwd,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspec, P()),
        out_specs=(P("dp", None, None), cspec, P("dp", None)),
        check_vma=False,
    )
    return jax.jit(shmapped, donate_argnums=(2,))
