"""LLaMA forward pass, TPU-native.

The reference builds a fresh ggml graph per eval (`llama_eval_internal`,
`llama.cpp:927-1197`); here the whole forward is one traced jit program with
a `lax.scan` over layers (stacked layer weights), static shapes, and an
in-place-updated dense KV cache. Mirrors the reference graph exactly:

  x = embed(tokens)
  per layer:  h  = x + wo @ attn(rope(wq·rms(x)·attn_norm), ...)   (KQ scaled
              x  = h + w2 @ (silu(w1·rms(h)·ffn_norm) * (w3·rms(h)·ffn_norm))
  logits = output @ (rms(x) · norm)

K is RoPE'd before caching, like the reference (`llama.cpp:1005`); scores are
scaled by 1/sqrt(head_dim) with a causal + cache-length mask
(`llama.cpp:1027-1039` KQ_scaled/diag_mask/softmax).

Weights may be QWeight (4-bit packed, Pallas fused dequant matmul) or dense
jnp arrays (f16/f32 checkpoints) — `_linear` dispatches.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial

import jax
import jax.numpy as jnp

from ..formats.ggml_io import Hparams
from ..ops.flash_attn import flash_attention, flash_attention_update
from ..ops.norms import rms_norm
from ..ops.pallas_backend import interpret_mode
from ..ops.q4_matmul import q4_matmul
from ..ops.qweight import QWeight
from ..ops.rope import apply_rope, rope_cos_sin


@dataclass(frozen=True)
class ModelConfig:
    n_vocab: int
    n_embd: int
    n_layer: int
    n_head: int
    n_rot: int
    n_ff: int
    norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @classmethod
    def from_hparams(cls, hp: Hparams) -> "ModelConfig":
        return cls(
            n_vocab=hp.n_vocab,
            n_embd=hp.n_embd,
            n_layer=hp.n_layer,
            n_head=hp.n_head,
            n_rot=hp.n_rot,
            n_ff=hp.n_ff,
        )

    # model-size names from n_layer, llama.cpp:773-779
    @property
    def type_name(self) -> str:
        return {32: "7B", 40: "13B", 60: "30B", 80: "65B"}.get(self.n_layer, "custom")


Weight = QWeight | jax.Array  # a linear layer's weight: packed q4 or dense [K, N]


@jax.tree_util.register_dataclass
@dataclass
class QEmbedding:
    """Q4-quantized embedding table: per-token-row nibbles + scales.

    packed: int8 [V, K//2] (split-half along the embedding dim, linear order),
    scales: [V, G]; bias: optional [V, G] (Q4_1).
    """

    packed: jax.Array
    scales: jax.Array
    bias: jax.Array | None
    k: int = field(metadata=dict(static=True), default=0)


Embedding = QEmbedding | jax.Array  # dense [V, K] or quantized


@jax.tree_util.register_dataclass
@dataclass
class LayerParams:
    attn_norm: jax.Array  # [n_embd]
    wq: Weight
    wk: Weight
    wv: Weight
    wo: Weight
    ffn_norm: jax.Array  # [n_embd]
    w1: Weight  # gate  [n_embd, n_ff]
    w2: Weight  # down  [n_ff, n_embd]
    w3: Weight  # up    [n_embd, n_ff]


@jax.tree_util.register_dataclass
@dataclass
class FusedLayerParams:
    """Launch-fused layer weights: wq/wk/wv concatenated into one [K, 3E]
    matmul and w1/w3 into [K, 2F] — halves the Pallas dispatches per layer.
    Under TP the concatenation interleaves per-shard segments
    [q_i | k_i | v_i] so a 'tp' shard of the N axis stays self-contained."""

    attn_norm: jax.Array
    wqkv: Weight  # [n_embd, 3*n_embd]
    wo: Weight
    ffn_norm: jax.Array
    w13: Weight  # [n_embd, 2*n_ff] (gate | up)
    w2: Weight


@jax.tree_util.register_dataclass
@dataclass
class LlamaParams:
    tok_embeddings: Embedding
    layers: LayerParams  # stacked: every leaf has a leading n_layer dim
    norm: jax.Array
    output: Weight


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    """Dense per-layer KV slabs, [L, B, H, S, D] — heads-major so the
    attention einsums are plain batched GEMMs with no cache relayout. The TPU
    analog of the reference's kv_cache (llama.cpp:671-700); stored bf16 by
    default (the f16_kv option)."""

    k: jax.Array
    v: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16, n_head_local: int | None = None
) -> KVCache:
    h = cfg.n_head if n_head_local is None else n_head_local
    shape = (cfg.n_layer, batch, h, max_len, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _linear(x: jax.Array, w: Weight, **kw) -> jax.Array:
    if isinstance(w, QWeight):
        return q4_matmul(x, w, **kw)
    return jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def embed_tokens(emb: Embedding, tokens: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """tokens [B, T] → activations [B, T, n_embd]."""
    if isinstance(emb, QEmbedding):
        p = emb.packed[tokens].astype(jnp.int32)  # [B, T, K//2]
        lo = (p << 28) >> 28
        hi = p >> 4
        qs = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)  # [B, T, K]
        s = jnp.repeat(emb.scales[tokens].astype(jnp.float32), 32, axis=-1)
        # linear layout: element order after concat is [0..K/2) ++ [K/2..K)
        x = qs * s
        if emb.bias is not None:
            x = x + jnp.repeat(emb.bias[tokens].astype(jnp.float32), 32, axis=-1)
        return x.astype(dtype)
    return emb[tokens].astype(dtype)


def _attention(
    q: jax.Array,  # [B, T, H, D]
    k_cache: jax.Array,  # [B, H, S, D]
    v_cache: jax.Array,  # [B, H, S, D]
    n_past: jax.Array,  # scalar int32
    mesh_axis: str | None = None,
) -> jax.Array:
    """Causal attention of T new queries against the (updated) cache.

    Cache operands stay in their storage dtype (bf16) on the MXU with f32
    accumulation and heads-major layout, so each head's score/value products
    are contiguous batched GEMMs — no per-step cache relayout."""
    b, t, h, d = q.shape
    s = k_cache.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = (
        jnp.einsum(
            "bthd,bhsd->bhts",
            q.astype(k_cache.dtype),
            k_cache,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    # position j visible to query t iff j <= n_past + t
    # (n_past may be per-batch-row [B] for continuous batching)
    jpos = jnp.arange(s)  # [S]
    npast_b = jnp.broadcast_to(jnp.asarray(n_past), (b,))  # [B]
    tpos = npast_b[:, None] + jnp.arange(t)[None, :]  # [B, T]
    mask = jpos[None, None, :] <= tpos[:, :, None]  # [B, T, S]
    scores = jnp.where(mask[:, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bthd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out


def llama_forward(
    params: LlamaParams,
    tokens: jax.Array,  # [B, T] int32
    cache: KVCache,
    n_past: jax.Array,  # int32 scalar (or [B] vector: per-row positions)
    cfg: ModelConfig,
    logits_all: bool = False,
    dtype=jnp.bfloat16,
    tp_axis: str | None = None,
    tp_size: int = 1,
    pp_axis: str | None = None,
    pp_size: int = 1,
    attn_impl: str = "auto",
    collect_acts: bool = False,
    last_idx: jax.Array | None = None,
) -> tuple[jax.Array, KVCache, jax.Array]:
    """Evaluate T new tokens. Returns (logits, updated cache, embeddings).

    logits: [B, T, n_vocab] f32 if logits_all else [B, 1, n_vocab] (last
    position only — the reference's default, llama.cpp:1152-1163).
    embeddings: [B, n_embd] f32 — final-norm activations of the last token
    (llama_get_embeddings parity, llama.cpp:1166-1171).

    tp_axis: when called inside shard_map over a mesh with that axis, weights
    arrive as tensor-parallel shards (see parallel/sharding.py) and the
    partial products of the row-parallel matmuls (wo, w2) are psum-reduced;
    vocab-sharded logits are all-gathered.
    """
    b, t = tokens.shape
    h, d = cfg.n_head, cfg.head_dim

    def _linear_l(xx, w, l):
        # stacked per-layer weight: QWeights stream layer l's tiles straight
        # from the stacked HBM array inside the kernel (scalar-prefetch
        # index_map). Letting lax.scan dynamic-slice the stacked weights
        # instead costs a full HBM copy of every layer's packed weights
        # (~5 ms/token on 7B, measured).
        if isinstance(w, QWeight):
            return q4_matmul(xx, w, layer_idx=l)
        return _linear(xx, jax.lax.dynamic_index_in_dim(w, l, 0, keepdims=False))

    def _row_linear_l(xx, w, l):
        # row-parallel weights were chunk-packed tp_size-ways globally; the
        # shard_map-local view is chunks/tp_size independent packings
        if isinstance(w, QWeight) and tp_size > 1:
            w = replace(w, chunks=max(1, w.chunks // tp_size))
        return _linear_l(xx, w, l)

    x = embed_tokens(params.tok_embeddings, tokens, dtype=dtype)  # [B, T, K]

    n_past = jnp.asarray(n_past)
    vector_past = n_past.ndim == 1  # per-row positions (continuous batching)
    positions = (n_past[:, None] if vector_past else n_past) + jnp.arange(t)
    cos, sin = rope_cos_sin(positions, cfg.n_rot, cfg.rope_theta)  # [(B,) T, D/2]

    lp = params.layers  # stacked weights, captured (NOT scan xs — see above)
    fused = isinstance(lp, FusedLayerParams)

    def make_layer_step(commit):
      def layer_step(carry, l):
        # the full cache rides the carry so XLA updates it in place; only the
        # current layer's slice is read and only T new positions are written
        # (threading per-layer slices through scan xs/ys forced whole-cache
        # copies every step)
        x, ck, cv = carry
        # --- attention block (llama.cpp:976-1070)
        attn_norm_l = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, False)
        xa = rms_norm(x, attn_norm_l, cfg.norm_eps)
        if fused:
            qkv = _linear_l(xa, lp.wqkv, l)
            e_loc = qkv.shape[-1] // 3
            q = qkv[..., :e_loc].reshape(b, t, -1, d)
            k = qkv[..., e_loc : 2 * e_loc].reshape(b, t, -1, d)
            v = qkv[..., 2 * e_loc :].reshape(b, t, -1, d)
        else:
            q = _linear_l(xa, lp.wq, l).reshape(b, t, -1, d)  # local heads under TP
            k = _linear_l(xa, lp.wk, l).reshape(b, t, -1, d)
            v = _linear_l(xa, lp.wv, l).reshape(b, t, -1, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)  # RoPE'd K is what gets cached
        # Flash (default): ONE kernel writes the new K/V rows into layer l of
        # the stacked cache (aliased, in place) and attends over the ragged
        # valid prefix — no per-layer cache slice copies, no XLA update ops
        # (per-slot update chains dominated batched decode). The einsum path
        # (numerics oracle) updates via XLA and pays the slice copies.
        impl = "flash" if attn_impl == "auto" else attn_impl
        if impl == "flash" and not interpret_mode() and d % 128 != 0:
            # Mosaic DMA slices need 128-lane-aligned head_dim on real TPUs;
            # every LLaMA family model has d=128, only toy configs fall back
            impl = "einsum"
        if impl == "flash" and t % min(256, t) == 0:
            attn, ck, cv = flash_attention_update(
                q, k, v, ck, cv, n_past, l, commit=commit
            )
        else:
            k_w = k.swapaxes(1, 2)  # [B, H, T, D]
            v_w = v.swapaxes(1, 2)
            def gated_dus(buf, upd, start):
                # commit=False (pp idle hop): re-write the existing rows
                if commit is not True:
                    old = jax.lax.dynamic_slice(buf, start, upd.shape)
                    upd = jnp.where(commit, upd, old)
                return jax.lax.dynamic_update_slice(buf, upd, start)

            if vector_past:
                # per-row write offsets: one dynamic_update_slice per batch
                # row (static unroll). An advanced-index scatter here lowers
                # to an XLA scatter over the whole multi-GB cache — measured
                # 20x slower per decode step on v5e.
                for bi in range(b):
                    ck = gated_dus(
                        ck,
                        k_w[bi : bi + 1][None].astype(ck.dtype),
                        (l, bi, 0, n_past[bi], 0),
                    )
                    cv = gated_dus(
                        cv,
                        v_w[bi : bi + 1][None].astype(cv.dtype),
                        (l, bi, 0, n_past[bi], 0),
                    )
            else:
                # write only the T new positions of this layer
                ck = gated_dus(ck, k_w[None].astype(ck.dtype), (l, 0, 0, n_past, 0))
                cv = gated_dus(cv, v_w[None].astype(cv.dtype), (l, 0, 0, n_past, 0))
            if impl == "flash":
                attn = flash_attention(q, ck, cv, n_past, layer_idx=l)
            else:
                k_l = jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False)
                v_l = jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False)
                attn = _attention(q, k_l, v_l, n_past)  # [B,T,H,D] f32
        attn = attn.reshape(b, t, -1).astype(dtype)
        wo_out = _row_linear_l(attn, lp.wo, l)
        if tp_axis is not None:
            wo_out = jax.lax.psum(wo_out, tp_axis)
        x = x + wo_out
        # --- FFN block (llama.cpp:1073-1101)
        ffn_norm_l = jax.lax.dynamic_index_in_dim(lp.ffn_norm, l, 0, False)
        xf = rms_norm(x, ffn_norm_l, cfg.norm_eps)
        if fused:
            gu = _linear_l(xf, lp.w13, l)
            f_loc = gu.shape[-1] // 2
            gate, up = gu[..., :f_loc], gu[..., f_loc:]
        else:
            gate = _linear_l(xf, lp.w1, l)
            up = _linear_l(xf, lp.w3, l)
        act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
            dtype
        )
        w2_out = _row_linear_l(act, lp.w2, l)
        if tp_axis is not None:
            w2_out = jax.lax.psum(w2_out, tp_axis)
        x = x + w2_out
        # per-layer activation capture: the submitPass(debug) layer-parity
        # tool of the reference (vulkan/llama-vk.cpp:2271-2340)
        acts = (
            dict(attn_norm=xa, attn_out=attn, ffn_norm=xf, layer_out=x)
            if collect_acts
            else None
        )
        return (x, ck, cv), acts

      return layer_step

    n_layers = cache.k.shape[0]  # LOCAL layers (pp shard when pp_size > 1)
    layer_ids = jnp.arange(n_layers, dtype=jnp.int32)
    if pp_axis is None:
        (x, new_k, new_v), layer_acts = jax.lax.scan(
            make_layer_step(True), (x, cache.k, cache.v), layer_ids
        )
    else:
        # pipeline-parallel ring (stage s holds layers [s*Ll, (s+1)*Ll) and
        # its cache shard): the activation hops stages via ppermute; stage s
        # does its real work at hop s and commits cache writes only then.
        # This is the un-microbatched schedule — correct, compiles the ICI
        # collectives; utilization comes from batching over dp.
        stage = jax.lax.axis_index(pp_axis)
        new_k, new_v = cache.k, cache.v
        layer_acts = None
        ring = [(i, (i + 1) % pp_size) for i in range(pp_size)]
        for hop in range(pp_size):
            step = make_layer_step(stage == hop)
            (x, new_k, new_v), _ = jax.lax.scan(step, (x, new_k, new_v), layer_ids)
            x = jax.lax.ppermute(x, pp_axis, ring)
        # the fully-processed activation now sits on stage 0: broadcast it
        x = jax.lax.psum(
            jnp.where(stage == 0, x, jnp.zeros_like(x)), pp_axis
        )

    xn = rms_norm(x, params.norm, cfg.norm_eps)
    # last_idx: true final position when the caller bucket-padded T (traced,
    # so one compiled program serves every prompt length within a bucket)
    if last_idx is None:
        last = xn[:, -1:, :]
    else:
        last = jax.lax.dynamic_slice_in_dim(xn, last_idx, 1, axis=1)
    embeddings = last[:, 0, :].astype(jnp.float32)
    if not logits_all:
        xn = last
    if isinstance(params.output, QWeight):
        # run through the stacked (L=1) kernel path: the flat path makes XLA
        # stage loop-invariant copies of the whole packed weight inside the
        # decode while-loop
        out_w = jax.tree.map(lambda a: a[None], params.output)
        logits = q4_matmul(xn, out_w, out_dtype=jnp.float32, layer_idx=jnp.int32(0))
    else:
        logits = jnp.dot(
            xn.astype(jnp.float32),
            params.output.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if tp_axis is not None:
        # vocab-sharded logits → full logits on every device
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    if collect_acts:
        return (
            logits.astype(jnp.float32),
            KVCache(k=new_k, v=new_v),
            embeddings,
            layer_acts,
        )
    return logits.astype(jnp.float32), KVCache(k=new_k, v=new_v), embeddings
