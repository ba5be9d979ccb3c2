"""Tensor-parallel partition specs.

The sharding table IS the checkpoint's split table (llama.cpp:276-287,
llama_internal.h:37-41) turned from a merge rule into PartitionSpecs:

  column-parallel (output/N axis on 'tp'): wq, wk, wv (head groups),
      w1, w3 (ffn hidden), output (vocab)  — the SPLIT_BY_ROWS tensors
  row-parallel (contraction/K axis on 'tp', psum after): wo, w2
      — the SPLIT_BY_COLUMNS tensors
  replicated: norms, tok_embeddings (small once packed)

QWeight leaves (packed [K/2, N], scales [G, N], bias) shard on the same
axis; row-parallel weights must be loaded with chunks=tp (see
formats/repack.pack_q4) so shard boundaries coincide with per-chunk packing.
Stacked layer params get a leading None for the n_layer dim.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import FusedLayerParams, KVCache, LlamaParams, QEmbedding
from ..ops.qweight import QWeight

# N-axis ('col') or K-axis ('row') sharding per tensor kind
KIND_PSPECS: dict[str, P] = {
    "wq": P(None, "tp"),
    "wqkv": P(None, "tp"),
    "w13": P(None, "tp"),
    "wk": P(None, "tp"),
    "wv": P(None, "tp"),
    "wo": P("tp", None),
    "w1": P(None, "tp"),
    "w3": P(None, "tp"),
    "w2": P("tp", None),
    "output": P(None, "tp"),
    "norm": P(None),
    "tok_embeddings": P(None, None),
}


def _weight_pspec(kind: str, w, stacked: bool):
    """Pytree of PartitionSpecs matching a Weight (QWeight or dense array)."""
    spec = KIND_PSPECS[kind]
    if stacked:
        spec = P("pp", *spec)  # layer dim over pipeline stages (size-1 = no-op)
    if isinstance(w, QWeight):
        # static aux data (layout/chunks/n_orig) must MATCH the weight's or
        # tree.map(params, specs) fails on treedef mismatch — int4 planes
        # carry n_orig (column padding; 0 on tp loads, which never pad)
        return QWeight(
            packed=spec, scales=spec, bias=None if w.bias is None else spec,
            layout=w.layout, chunks=w.chunks, n_orig=w.n_orig,
        )
    return spec


def param_pspecs(params: LlamaParams) -> LlamaParams:
    """PartitionSpec pytree with the same structure as the params."""
    norm1 = P(None)
    normL = P("pp", None)
    emb = params.tok_embeddings
    if isinstance(emb, QEmbedding):
        emb_spec = QEmbedding(
            packed=P(None, None),
            scales=P(None, None),
            bias=None if emb.bias is None else P(None, None),
            k=emb.k,
        )
    else:
        emb_spec = P(None, None)
    L = params.layers
    if isinstance(L, FusedLayerParams):
        layers = FusedLayerParams(
            attn_norm=normL,
            wqkv=_weight_pspec("wqkv", L.wqkv, True),
            wo=_weight_pspec("wo", L.wo, True),
            ffn_norm=normL,
            w13=_weight_pspec("w13", L.w13, True),
            w2=_weight_pspec("w2", L.w2, True),
        )
    else:
        layers = type(L)(
            attn_norm=normL,
            wq=_weight_pspec("wq", L.wq, True),
            wk=_weight_pspec("wk", L.wk, True),
            wv=_weight_pspec("wv", L.wv, True),
            wo=_weight_pspec("wo", L.wo, True),
            ffn_norm=normL,
            w1=_weight_pspec("w1", L.w1, True),
            w2=_weight_pspec("w2", L.w2, True),
            w3=_weight_pspec("w3", L.w3, True),
        )
    return LlamaParams(
        tok_embeddings=emb_spec,
        layers=layers,
        norm=norm1,
        output=_weight_pspec("output", params.output, False),
    )


def cache_pspec(
    quantized: bool = False, ring: bool = False,
    batch_axis: str | None = "dp",
) -> KVCache:
    """KV cache [L, B, H, S, D]: layers on pp, batch on dp, heads on tp.
    int8 caches add per-row scales [L, B, S, H] (heads still on tp); ring
    caches add the position plane [S, B] (batch on dp). batch_axis=None
    replicates the batch dim (single-row prefix caches under a dp mesh)."""
    s = P("pp", batch_axis, "tp", None, None)
    extra = {}
    if quantized:
        sc = P("pp", batch_axis, None, "tp")
        extra.update(k_scale=sc, v_scale=sc)
    if ring:
        extra.update(pos=P(None, batch_axis))
    return KVCache(k=s, v=s, **extra)


def _spec_leaves(tree):
    return jax.tree.leaves(tree, is_leaf=lambda x: isinstance(x, P))


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """device_put the params with NamedShardings from the spec table."""
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(
    cache: KVCache, mesh: Mesh, batch_axis: str | None = "dp"
) -> KVCache:
    specs = cache_pspec(
        quantized=cache.quantized, ring=cache.ring, batch_axis=batch_axis
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )
