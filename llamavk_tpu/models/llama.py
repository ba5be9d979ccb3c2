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
from ..ops.flash_decode import flash_decode_update
from ..ops.kv_quant import quantize_rows
from ..ops.norms import rms_norm
from ..ops.pallas_backend import interpret_mode
from ..ops.q4_matmul import q4_matmul
from ..ops.qweight import QWeight
from ..ops.rope import apply_rope, apply_rope_pairwise, rope_cos_sin


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
    default (the f16_kv option), or int8 with per-row f32 scales
    [L, B, S, H] (ops/kv_quant.py) — half the KV memory and attention read
    bandwidth, double the context per chip."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None
    pos: jax.Array | None = None  # [S, B] int32 history-ring positions

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def ring(self) -> bool:
        return self.pos is not None


def scale_lane_pad(n_head: int, tp: int = 1) -> int:
    """GLOBAL lane pad of an int8 cache's scale planes. Each tp shard of the
    lane (head) axis must independently satisfy Mosaic's 128-lane DMA slice
    alignment, so the global pad is tp * (local heads padded to 128) — a
    tp-sharded scale plane then splits into tp self-contained 128-aligned
    tiles. tp=1 reproduces the plain single-replica pad."""
    local = -(-(n_head // tp) // 128) * 128
    return tp * local


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
    n_head_local: int | None = None, ring: bool = False,
    h_pad: int | None = None,
) -> KVCache:
    h = cfg.n_head if n_head_local is None else n_head_local
    dtype = jnp.dtype(dtype)
    shape = (cfg.n_layer, batch, h, max_len, cfg.head_dim)
    extra = {}
    if dtype == jnp.int8:
        # head lanes padded to the 128-lane tile: Mosaic DMA slice SHAPES on
        # the minor dim must be 128-aligned, and XLA pads the HBM footprint
        # to 128 lanes anyway — the padding costs nothing extra. h_pad
        # overrides for tensor-parallel caches (scale_lane_pad: each tp
        # shard needs its own 128-aligned lane tile).
        if h_pad is None:
            h_pad = -(-h // 128) * 128
        sshape = (cfg.n_layer, batch, max_len, h_pad)
        extra.update(
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
        )
    if ring:
        # history ring (the reference's historyIndex generalization): row j
        # holds the token whose logical position is pos[j, b]; -1 = empty
        extra.update(pos=jnp.full((max_len, batch), -1, jnp.int32))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), **extra)


def init_paged_kv_cache(
    cfg: ModelConfig, n_pages: int, page_size: int, dtype=jnp.bfloat16,
    n_head_local: int | None = None, h_pad: int | None = None,
) -> KVCache:
    """Paged KV pool [L, NP, H, PS, D]: fixed-size pages shared by every
    request slot, addressed through per-row block tables (runtime/paged.py;
    pass `page_table` to llama_forward). Page size must be a multiple of 8
    (the bf16 RMW window alignment; 32 for int8 — its Mosaic tile) and of
    every admission chunk size it must contain — powers of two >= 64 are
    the natural choice.

    dtype=int8 pages the per-row scale planes too: [L, NP, PS, Hpad] pools
    addressed through the same block table as the data pages."""
    h = cfg.n_head if n_head_local is None else n_head_local
    dtype = jnp.dtype(dtype)
    extra = {}
    if dtype == jnp.int8:
        assert page_size % 32 == 0, "int8 page_size: multiple of 32"
        if h_pad is None:
            h_pad = -(-h // 128) * 128  # lane-padded, as init_kv_cache
        sshape = (cfg.n_layer, n_pages, page_size, h_pad)
        extra.update(
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
        )
    else:
        assert page_size % 8 == 0
    shape = (cfg.n_layer, n_pages, h, page_size, cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   **extra)


def ring_phys(pos: jax.Array, n_keep: int, s: int) -> jax.Array:
    """Logical position → physical ring row: the first fill is the identity;
    past the end, rows [n_keep, s) recycle (the first n_keep rows — attention
    sinks / the kept prompt prefix — are pinned, main.cpp:246-266 semantics
    without the re-eval)."""
    span = max(s - n_keep, 1)
    wrapped = n_keep + jax.lax.rem(pos - n_keep, span)
    return jnp.where(pos < s, pos, wrapped)


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
    k_scale: jax.Array | None = None,  # [B, S, H]: int8 cache (numerics oracle
    v_scale: jax.Array | None = None,  # dequantizes the whole layer slice)
    kv_pos: jax.Array | None = None,  # [S, B]: history-ring positions
    softmax_fn=None,  # ggml-emulation override (ggml_numerics.softmax_ggml)
) -> jax.Array:
    """Causal attention of T new queries against the (updated) cache.

    Cache operands stay in their storage dtype (bf16) on the MXU with f32
    accumulation and heads-major layout, so each head's score/value products
    are contiguous batched GEMMs — no per-step cache relayout."""
    if k_scale is not None:
        hh = k_cache.shape[1]  # scale planes may be lane-padded past H
        k_cache = (
            k_cache.astype(jnp.float32)
            * k_scale[..., :hh].transpose(0, 2, 1)[..., None]
        )
        v_cache = (
            v_cache.astype(jnp.float32)
            * v_scale[..., :hh].transpose(0, 2, 1)[..., None]
        )
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
    npast_b = jnp.broadcast_to(jnp.asarray(n_past), (b,))  # [B]
    tpos = npast_b[:, None] + jnp.arange(t)[None, :]  # [B, T]
    if kv_pos is not None:
        # ring: visibility by each row's logical position (and occupancy)
        posT = kv_pos.T  # [B, S]
        mask = (posT[:, None, :] >= 0) & (posT[:, None, :] <= tpos[:, :, None])
    else:
        jpos = jnp.arange(s)  # [S]
        mask = jpos[None, None, :] <= tpos[:, :, None]  # [B, T, S]
    scores = jnp.where(mask[:, None], scores, -jnp.inf)
    probs = (softmax_fn or jax.nn.softmax)(scores, axis=-1)
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
    pp_microbatch: int = 1,  # microbatches interleaved across pp stages
    attn_impl: str = "auto",
    collect_acts: bool = False,
    last_idx: jax.Array | None = None,
    ring_keep: int = 0,  # pinned prefix rows of a history-ring cache
    cache_batch_offset: jax.Array | int = 0,  # first cache row these tokens
    # occupy (pp microbatching: a stage runs a batch SLICE against its
    # full-batch cache; kernels index rows at offset instead of slicing)
    prefix_kv: tuple | None = None,  # ([L,NP,H,Sp,D], [L,NP,H,Sp,D]):
    # shared read-only prefix pool — per-row entry prefix_id[b] rows
    # [0, prefix_len[b]) hold logical positions [0, prefix_len[b]); slot
    # cache rows then hold logical positions prefix_len[b] + row. n_past
    # stays LOGICAL (RoPE); cache writes/bounds use n_past - prefix_len.
    prefix_id: jax.Array | None = None,  # [B] int32
    prefix_len: jax.Array | None = None,  # [B] int32
    ggml_rounding: str | None = None,  # differential-parity oracle: emulate
    # the C reference's scalar numerics (f16/q4_0 activation rounding per
    # matmul, f16-table silu/exp, 1/sqrt rms_norm — models/ggml_numerics.py).
    # Requires dense (dequantized) weights, attn_impl="einsum", dtype=f32.
    page_table: jax.Array | None = None,  # [B, MAXLB] int32: the cache is a
    # PAGE POOL [L, NP, H, PS, D] and row b's logical block j lives in page
    # page_table[b, j] (block-table paged KV, the general form of the
    # reference's historyIndex indirection, vulkan/llama-vk.cpp:984-987;
    # runtime/paged.py manages the tables). Caller invariant: every t-block
    # write [n_past+t0, +bt) stays within one page (power-of-two chunking).
    page_straddle: bool = False,  # paged + multi-token writes at ARBITRARY
    # n_past (speculative verify): allow a t-block write to cross a page
    # boundary (second RMW window in the kernel). bf16 pools only.
    flat_decode: bool = True,  # t==1 flash decode through the flat
    # work-list kernel (ops/flash_decode.py): one program per layer instead
    # of one per batch row. Bit-identical streams at equal kv_block; False
    # keeps the per-row grid kernel (A/B probe).
    kv_block: int | None = None,  # cap the flash kernels' KV block
    # (None/0 = fitted default, which is T-DEPENDENT: 512 for prefill-sized
    # calls t>=256, 256 for decode — exact-stream comparisons across chunk
    # sizes must pin an explicit value). Pins the online-softmax
    # accumulation order — a flat cache at kv_block=c sums exactly like a
    # paged pool with page_size=c (see ops/flash_attn._fit_block_k).
    # Explicit argument, NOT an env read: env reads at trace time poison
    # JAX's same-code-closure jit cache.
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
    boff = cache_batch_offset

    if ggml_rounding is not None:
        from . import ggml_numerics as gn

        act_rt = gn.act_rounding(ggml_rounding)
        _rms_norm = gn.rms_norm_ggml
        _silu = gn.silu_ggml
        _softmax = gn.softmax_ggml
        if attn_impl != "einsum":
            raise ValueError("ggml_rounding requires attn_impl='einsum'")
        if isinstance(params.output, QWeight):
            raise ValueError(
                "ggml_rounding requires dense weights (load with dequantize=True)"
            )
    else:
        act_rt = None
        _rms_norm = rms_norm
        _silu = None
        _softmax = None

    def _linear_l(xx, w, l):
        if act_rt is not None:
            xx = act_rt(xx)
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

    paged = page_table is not None
    if paged:
        assert cache.pos is None, "paged KV: non-ring pools only"
        assert prefix_kv is None, "paged KV and prefix pool are exclusive"
        # tp composes: the pool's head axis shards like the flat cache's and
        # block tables are replicated. pp would shard the pool's layer dim
        # against a layer-oblivious allocator — out of scope.
        assert pp_axis is None, "paged KV: no pipeline stages (v1)"
        assert attn_impl in ("auto", "flash"), "paged KV is flash-only"

    prefix = prefix_kv is not None
    if prefix:
        # slot cache may be bf16 or int8; the POOL is always bf16 (one pool
        # copy serves every row — full precision costs O(pool), not O(batch))
        assert cache.pos is None, "shared-prefix: non-ring slot caches only"
        assert pp_axis is None, "shared-prefix: no pipeline stages (v1)"
        assert vector_past, "shared-prefix requires per-row n_past"
        pfx_len_vec = jnp.asarray(prefix_len, jnp.int32)
        pfx_id_vec = jnp.asarray(prefix_id, jnp.int32)
        local_past = n_past - pfx_len_vec  # slot-cache row positions
    else:
        pfx_len_vec = pfx_id_vec = None
        local_past = n_past

    # history ring: physical write rows + the updated position plane (done
    # ONCE per forward — positions are layer-independent; kernels read the
    # already-updated plane). RoPE stays on logical positions: relative
    # offsets keep their meaning, so no re-eval on wrap (unlike the
    # reference CLI's swap, main.cpp:246-266).
    ring = cache.ring
    if ring:
        s_ctx = cache.k.shape[3]
        wstart = ring_phys(n_past, ring_keep, s_ctx)  # scalar or [B]
        new_pos = cache.pos
        pos_i32 = jnp.asarray(positions, jnp.int32)
        if vector_past:
            for bi in range(b):
                new_pos = jax.lax.dynamic_update_slice(
                    new_pos, pos_i32[bi][:, None],
                    (wstart[bi], jnp.int32(boff) + bi),
                )
        else:
            new_pos = jax.lax.dynamic_update_slice(
                new_pos, jnp.broadcast_to(pos_i32[:, None], (t, b)),
                (wstart, jnp.int32(boff)),
            )
    else:
        wstart = local_past  # == n_past without a shared prefix
        new_pos = None

    lp = params.layers  # stacked weights, captured (NOT scan xs — see above)
    fused = isinstance(lp, FusedLayerParams)

    # default flash KV block: prefill-sized calls (t >= 256) read the whole
    # ragged prefix anyway, and bigger blocks amortize per-block DMA latency
    # — bk=512 measured ~7% faster per layer standalone than 256 at T=512
    # (tools/bench_prefill.py, v5e). Decode keeps 256 (the ragged bound
    # rounds UP to a whole block: a short context would read past it).
    # An explicit kv_block always wins (it pins accumulation order).
    bk_default = 512 if t >= 256 else 256

    quantized_kv = cache.quantized

    def make_layer_step(commit, npast_l=None, wstart_l=None, boff_l=None,
                        cos_l=None, sin_l=None):
      # per-call context (pp microbatching runs a batch SLICE per stage):
      # defaults are the whole-batch values
      npast_l = local_past if npast_l is None else npast_l
      wstart_l = wstart if wstart_l is None else wstart_l
      boff_l = boff if boff_l is None else boff_l
      cos_l = cos if cos_l is None else cos_l
      sin_l = sin if sin_l is None else sin_l

      def layer_step(carry, l):
        # the full cache rides the carry so XLA updates it in place; only the
        # current layer's slice is read and only T new positions are written
        # (threading per-layer slices through scan xs/ys forced whole-cache
        # copies every step)
        x, ck, cv, cks, cvs = carry
        bq = x.shape[0]  # rows this step operates on (b, or b/M under pp)
        # --- attention block (llama.cpp:976-1070)
        attn_norm_l = jax.lax.dynamic_index_in_dim(lp.attn_norm, l, 0, False)
        xa = _rms_norm(x, attn_norm_l, cfg.norm_eps)
        if fused:
            qkv = _linear_l(xa, lp.wqkv, l)
            e_loc = qkv.shape[-1] // 3
            q = qkv[..., :e_loc].reshape(bq, t, -1, d)
            k = qkv[..., e_loc : 2 * e_loc].reshape(bq, t, -1, d)
            v = qkv[..., 2 * e_loc :].reshape(bq, t, -1, d)
        else:
            q = _linear_l(xa, lp.wq, l).reshape(bq, t, -1, d)  # local heads under TP
            k = _linear_l(xa, lp.wk, l).reshape(bq, t, -1, d)
            v = _linear_l(xa, lp.wv, l).reshape(bq, t, -1, d)
        # ggml-emulation oracle keeps the reference's pairwise rope graph
        # shape (FMA-contraction-sensitive bit parity — ops/rope.py)
        _rope = apply_rope if act_rt is None else apply_rope_pairwise
        q = _rope(q, cos_l, sin_l)
        k = _rope(k, cos_l, sin_l)  # RoPE'd K is what gets cached
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
        if prefix and impl != "flash":
            raise ValueError(
                "shared-prefix attention requires the flash path "
                f"(impl={impl}, head_dim={d})"
            )
        if paged and not (impl == "flash" and t % min(256, t) == 0):
            raise ValueError(
                "paged KV requires the fused flash path "
                f"(impl={impl}, t={t}, head_dim={d})"
            )
        wrow = wstart_l if ring else None
        # single-token decode on plain (non-ring, non-prefix) caches routes
        # through the FLAT work-list kernel: one program per layer instead of
        # one per batch row — the per-program DMA latency that dominated
        # batched decode attention (B=32 int8: 6.1-9.3 ms/step read vs a
        # ~2.8-5.9 ms roofline, tools/diag_step_decomp.py --attn-sweep r5).
        # Identical block partitioning/accumulation order at equal block_k,
        # so streams are bit-identical to the grid kernel (tests/
        # test_flash_decode.py). pp (traced commit / batch offsets) and
        # ring/prefix modes keep the grid kernel; so does B=1, where the
        # grid is already one program and measured marginally faster
        # (6.48 vs 6.61 ms/step, r5 — the flat kernel's separate
        # write/attend phases cost one extra DMA rendezvous).
        if (
            flat_decode and impl == "flash" and t == 1 and b > 1
            and not ring and not prefix and commit is True
        ):
            args_fd = dict(
                block_k=kv_block or bk_default, batch_offset=boff_l,
            )
            if paged:
                args_fd["page_table"] = page_table
            if quantized_kv:
                attn, ck, cv, cks, cvs = flash_decode_update(
                    q, k, v, ck, cv, npast_l, l,
                    k_scale=cks, v_scale=cvs, **args_fd,
                )
            else:
                attn, ck, cv = flash_decode_update(
                    q, k, v, ck, cv, npast_l, l, **args_fd,
                )
        elif impl == "flash" and t % min(256, t) == 0:
            if quantized_kv:
                # fused quantize + write + attend (one kernel, no XLA-level
                # cache update ops — the per-slot DUS chain dominated batched
                # decode on the bf16 path too)
                attn, ck, cv, cks, cvs = flash_attention_update(
                    q, k, v, ck, cv, npast_l, l, commit=commit,
                    k_scale=cks, v_scale=cvs, kv_pos=new_pos, write_row=wrow,
                    batch_offset=boff_l, ring_bounded=True,
                    block_k=kv_block or bk_default,
                    prefix_k=prefix_kv[0] if prefix else None,
                    prefix_v=prefix_kv[1] if prefix else None,
                    prefix_id=pfx_id_vec, prefix_len=pfx_len_vec,
                    # paged: cap the query block at the page size so a write
                    # block never straddles a page (see the bf16 call below)
                    # — unless page_straddle explicitly allows the spill
                    **(
                        {"page_table": page_table,
                         "page_straddle": page_straddle,
                         "block_t": min(256, ck.shape[3])}
                        if paged else {}
                    ),
                )
            else:
                attn, ck, cv = flash_attention_update(
                    q, k, v, ck, cv, npast_l, l, commit=commit,
                    kv_pos=new_pos, write_row=wrow, batch_offset=boff_l,
                    ring_bounded=True, block_k=kv_block or bk_default,
                    prefix_k=prefix_kv[0] if prefix else None,
                    prefix_v=prefix_kv[1] if prefix else None,
                    prefix_id=pfx_id_vec, prefix_len=pfx_len_vec,
                    # paged: cap the query block at the page size so a write
                    # block never straddles a page (page-aligned n_past +
                    # power-of-two chunking keep each block in one page) —
                    # unless page_straddle explicitly allows the spill
                    **(
                        {"page_table": page_table,
                         "page_straddle": page_straddle,
                         "block_t": min(256, ck.shape[3])}
                        if paged else {}
                    ),
                )
        else:
            if quantized_kv:
                # per-row int8: quantize the new rows once, write data rows
                # (heads-major) + scale rows [T, H] (positions-major)
                k_q, k_sc = quantize_rows(k)  # [B,T,H,D] int8, [B,T,H] f32
                v_q, v_sc = quantize_rows(v)
                k_w = k_q.swapaxes(1, 2)  # [B, H, T, D]
                v_w = v_q.swapaxes(1, 2)
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
                for bi in range(bq):
                    ck = gated_dus(
                        ck,
                        k_w[bi : bi + 1][None].astype(ck.dtype),
                        (l, boff_l + bi, 0, wstart_l[bi], 0),
                    )
                    cv = gated_dus(
                        cv,
                        v_w[bi : bi + 1][None].astype(cv.dtype),
                        (l, boff_l + bi, 0, wstart_l[bi], 0),
                    )
                    if quantized_kv:
                        cks = gated_dus(
                            cks, k_sc[bi : bi + 1][None], (l, boff_l + bi, wstart_l[bi], 0)
                        )
                        cvs = gated_dus(
                            cvs, v_sc[bi : bi + 1][None], (l, boff_l + bi, wstart_l[bi], 0)
                        )
            else:
                # write only the T new positions of this layer
                ck = gated_dus(ck, k_w[None].astype(ck.dtype), (l, boff_l, 0, wstart_l, 0))
                cv = gated_dus(cv, v_w[None].astype(cv.dtype), (l, boff_l, 0, wstart_l, 0))
                if quantized_kv:
                    cks = gated_dus(cks, k_sc[None], (l, boff_l, wstart_l, 0))
                    cvs = gated_dus(cvs, v_sc[None], (l, boff_l, wstart_l, 0))
            if impl == "flash":
                attn = flash_attention(
                    q, ck, cv, npast_l, layer_idx=l,
                    k_scale=cks, v_scale=cvs, kv_pos=new_pos,
                    batch_offset=boff_l, block_k=kv_block or bk_default,
                    prefix_k=prefix_kv[0] if prefix else None,
                    prefix_v=prefix_kv[1] if prefix else None,
                    prefix_id=pfx_id_vec, prefix_len=pfx_len_vec,
                )
            else:
                def brows(a, axis=0):
                    return jax.lax.dynamic_slice_in_dim(a, boff_l, bq, axis=axis)

                k_l = brows(jax.lax.dynamic_index_in_dim(ck, l, 0, keepdims=False))
                v_l = brows(jax.lax.dynamic_index_in_dim(cv, l, 0, keepdims=False))
                ks_l = vs_l = None
                if quantized_kv:
                    ks_l = brows(jax.lax.dynamic_index_in_dim(cks, l, 0, keepdims=False))
                    vs_l = brows(jax.lax.dynamic_index_in_dim(cvs, l, 0, keepdims=False))
                attn = _attention(
                    q, k_l, v_l, npast_l, k_scale=ks_l, v_scale=vs_l,
                    kv_pos=None if new_pos is None else brows(new_pos, axis=1),
                    softmax_fn=_softmax,
                )  # [B,T,H,D] f32
        attn = attn.reshape(bq, t, -1).astype(dtype)
        wo_out = _row_linear_l(attn, lp.wo, l)
        if tp_axis is not None:
            wo_out = jax.lax.psum(wo_out, tp_axis)
        x = x + wo_out
        # --- FFN block (llama.cpp:1073-1101)
        ffn_norm_l = jax.lax.dynamic_index_in_dim(lp.ffn_norm, l, 0, False)
        xf = _rms_norm(x, ffn_norm_l, cfg.norm_eps)
        if fused:
            gu = _linear_l(xf, lp.w13, l)
            f_loc = gu.shape[-1] // 2
            gate, up = gu[..., :f_loc], gu[..., f_loc:]
        else:
            gate = _linear_l(xf, lp.w1, l)
            up = _linear_l(xf, lp.w3, l)
        act = (
            (_silu or jax.nn.silu)(gate.astype(jnp.float32))
            * up.astype(jnp.float32)
        ).astype(dtype)
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
        return (x, ck, cv, cks, cvs), acts

      return layer_step

    n_layers = cache.k.shape[0]  # LOCAL layers (pp shard when pp_size > 1)
    layer_ids = jnp.arange(n_layers, dtype=jnp.int32)
    if pp_axis is None:
        (x, new_k, new_v, new_ks, new_vs), layer_acts = jax.lax.scan(
            make_layer_step(True),
            (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
            layer_ids,
        )
    else:
        # pipeline-parallel ring (stage s holds layers [s*Ll, (s+1)*Ll) and
        # its cache shard): activations hop stages via ppermute; a stage
        # commits cache writes only while holding a real microbatch.
        stage = jax.lax.axis_index(pp_axis)
        new_k, new_v = cache.k, cache.v
        new_ks, new_vs = cache.k_scale, cache.v_scale
        layer_acts = None
        perm = [(i, (i + 1) % pp_size) for i in range(pp_size)]
        M = max(1, pp_microbatch)
        if M == 1:
            # un-microbatched: ONE activation circles the ring; stage s does
            # its real work at hop s (1/P utilization per activation —
            # utilization then comes from batching over dp)
            for hop in range(pp_size):
                step = make_layer_step(stage == hop)
                (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
                    step, (x, new_k, new_v, new_ks, new_vs), layer_ids
                )
                x = jax.lax.ppermute(x, pp_axis, perm)
            # the fully-processed activation now sits on stage 0: broadcast
            x = jax.lax.psum(
                jnp.where(stage == 0, x, jnp.zeros_like(x)), pp_axis
            )
        else:
            # GPipe-style interleave: the batch splits into M microbatches;
            # at step tau, stage s runs microbatch tau - s, so after the
            # P-1-step fill EVERY stage computes every step — utilization
            # M/(M+P-1) instead of 1/P. Each stage addresses its microbatch's
            # cache rows via the kernels' batch_offset (no cache slicing).
            assert b % M == 0, (b, M)
            b0 = b // M
            kdim = x.shape[-1]
            xm = x.reshape(M, b0, t, kdim)
            cur = jnp.zeros_like(xm[0])
            outs = jnp.zeros((M, b0, t, kdim), x.dtype)
            for tau in range(M + pp_size - 1):
                if tau < M:
                    # stage 0 ingests microbatch tau this step
                    cur = jnp.where(stage == 0, xm[tau], cur)
                m = tau - stage  # this stage's microbatch index (traced)
                valid = (m >= 0) & (m < M)
                mc = jnp.clip(m, 0, M - 1)
                boff_m = jnp.int32(boff) + mc * b0
                npast_m = (
                    jax.lax.dynamic_slice_in_dim(n_past, mc * b0, b0)
                    if vector_past else n_past
                )
                if ring:
                    wstart_m = (
                        jax.lax.dynamic_slice_in_dim(wstart, mc * b0, b0)
                        if vector_past else wstart
                    )
                else:
                    wstart_m = npast_m
                cos_m = (
                    jax.lax.dynamic_slice_in_dim(cos, mc * b0, b0, 0)
                    if vector_past else cos
                )
                sin_m = (
                    jax.lax.dynamic_slice_in_dim(sin, mc * b0, b0, 0)
                    if vector_past else sin
                )
                step = make_layer_step(
                    valid, npast_l=npast_m, wstart_l=wstart_m, boff_l=boff_m,
                    cos_l=cos_m, sin_l=sin_m,
                )
                (cur, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
                    step, (cur, new_k, new_v, new_ks, new_vs), layer_ids
                )
                out_idx = tau - (pp_size - 1)
                if 0 <= out_idx < M:
                    # the last stage just finished microbatch out_idx
                    outs = outs.at[out_idx].set(
                        jnp.where(stage == pp_size - 1, cur, outs[out_idx])
                    )
                if tau < M + pp_size - 2:
                    # the final wave's hop would be dead (nothing consumes it)
                    cur = jax.lax.ppermute(cur, pp_axis, perm)
            # only the last stage deposited real rows; broadcast via psum
            x = jax.lax.psum(outs, pp_axis).reshape(b, t, kdim)

    xn = _rms_norm(x, params.norm, cfg.norm_eps)
    # last_idx: true final position when the caller bucket-padded T (traced,
    # so one compiled program serves every prompt length within a bucket);
    # a [B] vector gives per-row positions (batched admission prefill)
    if last_idx is None:
        last = xn[:, -1:, :]
    elif jnp.asarray(last_idx).ndim == 1:
        last = jnp.take_along_axis(
            xn, jnp.asarray(last_idx, jnp.int32)[:, None, None], axis=1
        )
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
            (act_rt(xn) if act_rt is not None else xn).astype(jnp.float32),
            params.output.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    if tp_axis is not None:
        # vocab-sharded logits → full logits on every device
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    new_cache = KVCache(
        k=new_k, v=new_v, k_scale=new_ks, v_scale=new_vs, pos=new_pos
    )
    if collect_acts:
        return logits.astype(jnp.float32), new_cache, embeddings, layer_acts
    return logits.astype(jnp.float32), new_cache, embeddings
