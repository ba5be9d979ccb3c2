"""Checkpoint → device-params loader.

The TPU analog of the reference's llama_model_load_internal + the Vulkan
engine's uploadModel (`llama.cpp:751-898`, `vulkan/llama-vk.cpp:1988-2062`):
reads GGML/GGMF/GGJT tensors (mmap-backed), repacks quantized weights into
the TPU device layout, stacks the per-layer pytrees for `lax.scan`, and
device_puts everything (optionally with shardings).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..formats.ggml_io import CheckpointReader, Hparams
from ..formats.q4 import (
    GGML_FTYPE_F16,
    GGML_FTYPE_F32,
    GGML_FTYPE_Q4_0,
    GGML_FTYPE_Q4_1,
    QK,
    quantize_q4_0,
)
from ..formats.repack import (
    LAYOUT_ILV,
    PackedQ4,
    _interleave_cols,
    fuse_packed,
    repack_q4_0,
    repack_q4_1,
)
from ..ops.qweight import QWeight, qweight_from_packed
from ..tokenizer import Tokenizer
from .. import native
from .llama import FusedLayerParams, LayerParams, LlamaParams, ModelConfig, QEmbedding


# file-level ftype → the activation rounding ggml's mul_mat INIT phase
# applies for that weight format (llama_forward ggml_rounding; the
# differential-parity oracle, models/ggml_numerics.py)
GGML_ROUNDING_BY_FTYPE = {
    GGML_FTYPE_F32: "f32",
    GGML_FTYPE_F16: "f16",
    GGML_FTYPE_Q4_0: "q4_0",
}


def _put(arr, sharding=None, dtype=None):
    if dtype is not None:
        arr = np.asarray(arr, dtype)
    return jax.device_put(arr, sharding) if sharding is not None else jnp.asarray(arr)


def _read_packed(reader: CheckpointReader, name: str, layout: str, chunks: int):
    """Read a 2-D matmul weight as PackedQ4 (q4) or dense f32 [K, N].

    chunks > 1 packs the K axis as `chunks` independent tensor-parallel row
    shards (for wo/w2 under TP — the inverse of the checkpoint's
    SPLIT_BY_COLUMNS merge, llama.cpp:276-287)."""
    t = reader.tensors[name]
    if t.ftype in (GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1):
        # single-pass native repack straight off the mmap when built (the
        # pipelined-uploader analog, vulkan/llama-vk.cpp:1988-2062)
        pk = native.repack_q4_stream(
            reader.raw_tensor(name), t.shape[0], t.ne[0], t.ftype, layout, chunks
        )
        if pk is not None:
            return pk
    if t.ftype == GGML_FTYPE_Q4_0:
        d, q = reader.load_q4(name)
        return repack_q4_0(d, q, layout=layout, chunks=chunks)
    if t.ftype == GGML_FTYPE_Q4_1:
        d, m, q = reader.load_q4(name)
        return repack_q4_1(d, m, q, layout=layout, chunks=chunks)
    return np.ascontiguousarray(reader.load_f32(name).T)  # dense [K, N]


def _to_device(pk, scale_dtype, dense_dtype, sharding=None):
    if isinstance(pk, PackedQ4):
        return QWeight(
            packed=_put(pk.packed, sharding),
            scales=_put(pk.scales, sharding, scale_dtype),
            bias=None if pk.bias is None else _put(pk.bias, sharding, scale_dtype),
            layout=pk.layout,
            chunks=pk.chunks,
        )
    return _put(pk, sharding, dense_dtype)


def _fuse(parts, tp: int):
    if all(isinstance(p, PackedQ4) for p in parts):
        return fuse_packed(parts, tp)
    if all(isinstance(p, np.ndarray) for p in parts):
        return _interleave_cols(parts, tp)
    return None  # mixed q4/dense: caller falls back to unfused


def _pack_embedding_rows(qs_signed: np.ndarray) -> np.ndarray:
    """[V, K] signed nibbles → [V, K//2] split-half packed bytes (linear)."""
    k = qs_signed.shape[1]
    lo = qs_signed[:, : k // 2]
    hi = qs_signed[:, k // 2 :]
    return ((lo & 0xF) | (hi << 4)).astype(np.int8)


def _load_embedding(reader: CheckpointReader, name: str, scale_dtype, dense_dtype):
    t = reader.tensors[name]
    if t.ftype in (GGML_FTYPE_F16, GGML_FTYPE_F32):
        return _put(reader.load_f32(name), dtype=dense_dtype)
    packed_sb = native.repack_q4_rows_stream(
        reader.raw_tensor(name), t.shape[0], t.ne[0], t.ftype
    )
    if packed_sb is not None:
        packed, scales, bias = packed_sb
        return QEmbedding(
            packed=_put(packed),
            scales=_put(scales, dtype=scale_dtype),
            bias=None if bias is None else _put(bias, dtype=scale_dtype),
            k=t.ne[0],
        )
    if t.ftype == GGML_FTYPE_Q4_0:
        d, q = reader.load_q4(name)  # [V, G], [V, G, QK]
        bias = None
    else:
        d, m, q = reader.load_q4(name)
        bias = m + 8.0 * d
    v, g, _ = q.shape
    qs = (q.astype(np.int16) - 8).astype(np.int8).reshape(v, g * QK)
    return QEmbedding(
        packed=_put(_pack_embedding_rows(qs)),
        scales=_put(d, dtype=scale_dtype),
        bias=None if bias is None else _put(bias, dtype=scale_dtype),
        k=g * QK,
    )


ROW_PARALLEL_KINDS = ("wo", "w2")  # K (contraction) axis sharded under TP


def params_from_reader(
    reader: CheckpointReader,
    layout: str = LAYOUT_ILV,
    scale_dtype=jnp.bfloat16,
    dense_dtype=jnp.bfloat16,
    shardings=None,
    tp: int = 1,
    fuse: bool = True,
    progress_callback=None,
    dequantize: bool = False,
) -> tuple[ModelConfig, LlamaParams]:
    """Build the device param pytree. `shardings`: optional dict mapping
    tensor-kind ('wq', 'w2', 'output', ...) → jax.sharding.Sharding.
    `tp` > 1 chunk-packs row-parallel weights for a tp-way mesh axis.
    `fuse` concatenates wq|wk|wv and w1|w3 (fewer, larger kernel launches).
    `progress_callback(frac)` is invoked per layer (llama_progress_callback
    parity, llama.h:48/62-65).
    `dequantize` loads every 2-D weight as dense f32 holding the EXACT
    dequantized file values (d*(q-8) per element, same fp32 product the
    reference's scalar vec_dot computes) — the differential-parity oracle
    path (llama_forward ggml_rounding)."""
    cfg = ModelConfig.from_hparams(reader.hparams)
    # trust the tensors over the n_mult-derived n_ff (a checkpoint written
    # with a free-standing FFN width is otherwise mis-reported)
    w1 = reader.tensors.get("layers.0.feed_forward.w1.weight")
    if w1 is not None and w1.ne[1] != cfg.n_ff:
        from dataclasses import replace as _replace

        cfg = _replace(cfg, n_ff=int(w1.ne[1]))
    sh = shardings or {}

    # memory-requirements report (llama_model_load_internal's budget print,
    # llama.cpp:809-827): packed weights ≈ nibbles/2 + scales
    total_bytes = sum(t.nbytes for t in reader.tensors.values())
    import sys as _sys

    print(
        f"llamavk: model {cfg.type_name}: n_vocab={cfg.n_vocab} n_embd={cfg.n_embd}"
        f" n_layer={cfg.n_layer} n_head={cfg.n_head} n_ff={cfg.n_ff};"
        f" checkpoint {total_bytes / 1e9:.2f} GB",
        file=_sys.stderr,
    )

    if dequantize:
        scale_dtype = dense_dtype = jnp.float32

    def rp(name: str, kind: str):
        if dequantize:
            return np.ascontiguousarray(reader.load_f32(name).T.astype(np.float32))
        return _read_packed(
            reader, name, layout, tp if kind in ROW_PARALLEL_KINDS else 1
        )

    def lw(name: str, kind: str):
        return _to_device(rp(name, kind), scale_dtype, dense_dtype, sh.get(kind))

    layers = []
    for i in range(cfg.n_layer):
        if progress_callback is not None:
            progress_callback(i / cfg.n_layer)
        p = f"layers.{i}."
        fused_qkv = fused_13 = None
        if fuse:
            fused_qkv = _fuse(
                [rp(p + "attention.wq.weight", "wq"),
                 rp(p + "attention.wk.weight", "wk"),
                 rp(p + "attention.wv.weight", "wv")], tp,
            )
            fused_13 = _fuse(
                [rp(p + "feed_forward.w1.weight", "w1"),
                 rp(p + "feed_forward.w3.weight", "w3")], tp,
            )
        if fused_qkv is not None and fused_13 is not None:
            layers.append(
                FusedLayerParams(
                    attn_norm=_put(reader.load_f32(p + "attention_norm.weight"), sh.get("norm")),
                    wqkv=_to_device(fused_qkv, scale_dtype, dense_dtype, sh.get("wq")),
                    wo=lw(p + "attention.wo.weight", "wo"),
                    ffn_norm=_put(reader.load_f32(p + "ffn_norm.weight"), sh.get("norm")),
                    w13=_to_device(fused_13, scale_dtype, dense_dtype, sh.get("w1")),
                    w2=lw(p + "feed_forward.w2.weight", "w2"),
                )
            )
            continue
        layers.append(
            LayerParams(
                attn_norm=_put(reader.load_f32(p + "attention_norm.weight"), sh.get("norm")),
                wq=lw(p + "attention.wq.weight", "wq"),
                wk=lw(p + "attention.wk.weight", "wk"),
                wv=lw(p + "attention.wv.weight", "wv"),
                wo=lw(p + "attention.wo.weight", "wo"),
                ffn_norm=_put(reader.load_f32(p + "ffn_norm.weight"), sh.get("norm")),
                w1=lw(p + "feed_forward.w1.weight", "w1"),
                w2=lw(p + "feed_forward.w2.weight", "w2"),
                w3=lw(p + "feed_forward.w3.weight", "w3"),
            )
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    params = LlamaParams(
        tok_embeddings=(
            _put(reader.load_f32("tok_embeddings.weight"), dtype=jnp.float32)
            if dequantize
            else _load_embedding(
                reader, "tok_embeddings.weight", scale_dtype, dense_dtype
            )
        ),
        layers=stacked,
        norm=_put(reader.load_f32("norm.weight"), sh.get("norm")),
        output=lw("output.weight", "output"),
    )
    return cfg, params


def params_to_i4(params: LlamaParams, pad_n: int = 1024,
                 consume: bool = False) -> LlamaParams:
    """Convert every packed linear weight to int4-PLANE storage
    (ops/qweight.qweight_to_i4): the HBM array becomes jnp.int4 in ilv row
    order (per-chunk group count padded to 128), and the matmul kernel
    replaces the widen/shift/mask unpack with one native int4->f32 convert
    — measured 533 -> 854 GB/s on the B=1 wqkv matmul, +17-60% on every
    decode matmul shape (tools/bench_i4_stacked.py, v5e 2026-08-20).

    Same HBM bytes per real weight (two nibbles per byte either way; the
    only overhead is zero-padding group counts to 128 — 11.6% extra reads
    on the 7B w2, still a net win). The quantized EMBEDDING stays byte-
    packed (it is gathered, not matmul'd). Conversion runs once, on device,
    inside a jit.

    pad_n: zero-pad output widths to this multiple so every matmul can run
    the int4 N-tile sweet spot bn1024 (w13's 22016 and the 32000-wide
    logits otherwise fall back to narrow tiles — measured +0.3 ms/step).
    Applied only to UNCHUNKED weights; pass 0 for tp-sharded params (a
    padded global N would land the pad in one column shard).

    consume=True CONSUMES the input params: each source byte plane is
    deleted as soon as its int4 plane exists (holding every source alive
    through the whole tree put the 13B conversion's HBM peak past 16 GB).
    The input tree is unusable afterwards — rebind, as in
    `params = params_to_i4(params, consume=True)`. Load paths pass it;
    leave False when the source tree must stay usable."""
    from ..ops.qweight import QWeight, qweight_to_i4

    def conv(w):
        if not isinstance(w, QWeight):
            return w
        out = qweight_to_i4(w, pad_n=0 if w.chunks > 1 else pad_n)
        if consume:
            jax.block_until_ready(out)
            w.packed.delete()
            w.scales.delete()
        return out

    return jax.tree.map(
        conv, params, is_leaf=lambda x: isinstance(x, QWeight)
    )


def load_model(
    path: str, n_parts: int | None = None, int4_planes: bool = False, **kw
) -> tuple[ModelConfig, LlamaParams, Tokenizer]:
    reader = CheckpointReader(path, n_parts)
    cfg, params = params_from_reader(reader, **kw)
    if int4_planes:
        # tp loads interleave per-shard column segments: N-padding would
        # break the shard structure, so pad only single-replica loads
        params = params_to_i4(
            params, pad_n=0 if kw.get("tp", 1) > 1 else 1024, consume=True
        )
    return cfg, params, Tokenizer(reader.vocab)


# ---------------------------------------------------------------------------
# tiny random model for tests / benchmarks without real weights


def random_tiny_model(
    n_vocab=256,
    n_embd=128,
    n_layer=2,
    n_head=2,
    n_ff=256,
    n_mult=32,
    seed=0,
    write_path: str | None = None,
    quantize: bool = True,
):
    """Create a tiny random LLaMA checkpoint (numpy tensors + hparams).

    If write_path is given, writes a real GGJT file; returns (hparams, tensors)
    where tensors maps name → f32 numpy array (pre-quantization values)."""
    from ..formats.ggml_io import CheckpointWriter, TokenEntry
    from ..formats.q4 import q4_0_to_bytes

    rng = np.random.default_rng(seed)
    hp = Hparams(
        n_vocab=n_vocab,
        n_embd=n_embd,
        n_mult=n_mult,
        n_head=n_head,
        n_layer=n_layer,
        n_rot=n_embd // n_head,
        ftype=GGML_FTYPE_Q4_0 if quantize else GGML_FTYPE_F32,
    )

    def w(*shape, scale=0.1):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors: dict[str, np.ndarray] = {
        "tok_embeddings.weight": w(n_vocab, n_embd),
        "norm.weight": np.abs(w(n_embd)) + 0.5,
        "output.weight": w(n_vocab, n_embd),
    }
    for i in range(n_layer):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = np.abs(w(n_embd)) + 0.5
        tensors[p + "ffn_norm.weight"] = np.abs(w(n_embd)) + 0.5
        for nm, shape in [
            ("attention.wq.weight", (n_embd, n_embd)),
            ("attention.wk.weight", (n_embd, n_embd)),
            ("attention.wv.weight", (n_embd, n_embd)),
            ("attention.wo.weight", (n_embd, n_embd)),
            ("feed_forward.w1.weight", (n_ff, n_embd)),
            ("feed_forward.w2.weight", (n_embd, n_ff)),
            ("feed_forward.w3.weight", (n_ff, n_embd)),
        ]:
            tensors[p + nm] = w(*shape)

    if write_path is not None:
        vocab = [TokenEntry(f"<t{i}>".encode(), -float(i)) for i in range(n_vocab)]
        with CheckpointWriter(write_path, hp, vocab) as wtr:
            for name, arr in tensors.items():
                if quantize and arr.ndim == 2 and name.endswith("weight") and "norm" not in name:
                    d, q = quantize_q4_0(arr)
                    wtr.write_tensor(
                        name,
                        tuple(reversed(arr.shape)),
                        GGML_FTYPE_Q4_0,
                        q4_0_to_bytes(d, q),
                    )
                else:
                    wtr.write_array(name, arr, GGML_FTYPE_F32)
    return hp, tensors


def random_ref_model(
    write_path: str,
    vocab_path: str,
    n_embd: int = 128,
    n_head: int = 4,
    n_layer: int = 32,
    n_mult: int = 32,
    seed: int = 3,
    scale: float = 0.4,
    ftype: int = GGML_FTYPE_F16,
):
    """Write a tiny checkpoint the *compiled C reference* can load and run.

    Differences from random_tiny_model that the reference requires:
    - n_layer=32 so llama_model_load_internal classifies it MODEL_7B — its
      memory-budget maps are keyed by model type and `.at()` an unknown type
      throws (llama.cpp:24-67,773-779).
    - n_ff comes from the reference's formula ((2*4*n_embd/3 + n_mult-1) /
      n_mult)*n_mult (llama.cpp:771) because the reference derives it and
      shape-checks every FFN tensor against the derived value.
    - a real vocab (e.g. the reference's models/ggml-vocab.bin fixture) so
      both sides tokenize prompts identically.
    - 2-D weights stored f16, norms f32 (convert-pth-to-ggml.py layout) so
      ./quantize accepts the file.

    Returns (hparams, tensors dict of f32 arrays as written pre-f16-rounding).
    """
    from ..formats.ggml_io import CheckpointReader, CheckpointWriter

    vocab = CheckpointReader(vocab_path).vocab
    rng = np.random.default_rng(seed)
    hp = Hparams(
        n_vocab=len(vocab),
        n_embd=n_embd,
        n_mult=n_mult,
        n_head=n_head,
        n_layer=n_layer,
        n_rot=n_embd // n_head,
        ftype=ftype,
    )
    n_ff = hp.n_ff

    def w(*shape):
        a = (rng.standard_normal(shape) * scale).astype(np.float32)
        # round through f16 so the in-memory tensors equal the file contents
        return a.astype(np.float16).astype(np.float32)

    tensors: dict[str, np.ndarray] = {
        "tok_embeddings.weight": w(len(vocab), n_embd),
        "norm.weight": np.abs(w(n_embd)) + 0.5,
        "output.weight": w(len(vocab), n_embd),
    }
    for i in range(n_layer):
        p = f"layers.{i}."
        tensors[p + "attention_norm.weight"] = np.abs(w(n_embd)) + 0.5
        tensors[p + "ffn_norm.weight"] = np.abs(w(n_embd)) + 0.5
        for nm, shape in [
            ("attention.wq.weight", (n_embd, n_embd)),
            ("attention.wk.weight", (n_embd, n_embd)),
            ("attention.wv.weight", (n_embd, n_embd)),
            ("attention.wo.weight", (n_embd, n_embd)),
            ("feed_forward.w1.weight", (n_ff, n_embd)),
            ("feed_forward.w2.weight", (n_embd, n_ff)),
            ("feed_forward.w3.weight", (n_ff, n_embd)),
        ]:
            tensors[p + nm] = w(*shape)

    with CheckpointWriter(write_path, hp, vocab) as wtr:
        for name, arr in tensors.items():
            if arr.ndim == 2:
                wtr.write_array(name, arr.astype(np.float16), GGML_FTYPE_F16)
            else:
                wtr.write_array(name, arr, GGML_FTYPE_F32)
    return hp, tensors


# ---------------------------------------------------------------------------
# synthetic on-device params (benchmarks / compile checks without real weights)

LLAMA_CONFIGS = {
    # n_layer-keyed family table, llama.cpp:773-779 + n_ff derivation
    "7B": dict(n_vocab=32000, n_embd=4096, n_layer=32, n_head=32, n_rot=128, n_ff=11008),
    "13B": dict(n_vocab=32000, n_embd=5120, n_layer=40, n_head=40, n_rot=128, n_ff=13824),
    "30B": dict(n_vocab=32000, n_embd=6656, n_layer=60, n_head=52, n_rot=128, n_ff=17920),
    "65B": dict(n_vocab=32000, n_embd=8192, n_layer=80, n_head=64, n_rot=128, n_ff=22016),
}


def synthetic_params(
    cfg: ModelConfig,
    seed: int = 0,
    scale_dtype=jnp.bfloat16,
    tp: int = 1,
    layout: str = LAYOUT_ILV,
    int4: bool = False,
    pad_n: int = 1024,
) -> LlamaParams:
    """Random Q4_0-packed params generated directly on device (no host copy).

    Weight values are plausible-magnitude random nibbles/scales; used for
    benchmarking the compute path at full 7B/13B/... shapes. The whole pytree
    is generated inside ONE jit program (one dispatch — device/remote
    round-trips are not free).

    int4=True generates LAYOUT_I4 planes DIRECTLY (same geometry as
    params_to_i4: padded group counts, pad_n column padding) — the bench
    path for big models, where generate-then-convert transiently needs
    ~2x the weights and can fragment HBM (13B hit 16 GB)."""
    from ..models.llama import QEmbedding
    from ..ops.qweight import QWeight, i4_group_pad

    if tp > 1:
        # column-parallel weights (wqkv/w13/output) shard N over tp: a
        # padded global N would land the pad entirely in the last shard
        pad_n = 0
    if int4:
        from ..utils.int4_dispatch import ensure_int4_dispatch

        ensure_int4_dispatch()
    from ..formats.repack import LAYOUT_I4

    L = cfg.n_layer
    e, f, v = cfg.n_embd, cfg.n_ff, cfg.n_vocab

    def qw(key, k, n, lead=(), chunks=1):
        k1, k2 = jax.random.split(key)
        if int4:
            gc = (k // chunks) // QK
            gp = i4_group_pad(gc)
            np_ = n
            if chunks == 1 and pad_n and n % pad_n:
                np_ = -(-n // pad_n) * pad_n
            packed = jax.random.randint(
                k1, (*lead, chunks * QK * gp, np_), -8, 8, dtype=jnp.int8
            ).astype(jnp.int4)
            scales = jax.random.uniform(
                k2, (*lead, chunks * gp, np_), jnp.float32, 0.005, 0.02
            ).astype(scale_dtype)
            return QWeight(packed=packed, scales=scales, bias=None,
                           layout=LAYOUT_I4, chunks=chunks,
                           n_orig=n if np_ != n else 0)
        packed = jax.random.randint(k1, (*lead, k // 2, n), -128, 128, dtype=jnp.int8)
        scales = jax.random.uniform(
            k2, (*lead, k // QK, n), jnp.float32, 0.005, 0.02
        ).astype(scale_dtype)
        return QWeight(packed=packed, scales=scales, bias=None, layout=layout, chunks=chunks)

    @jax.jit
    def build(key):
        ks = jax.random.split(key, 12)
        norm1 = jnp.ones((e,), jnp.float32)
        normL = jnp.ones((L, e), jnp.float32)
        layers = FusedLayerParams(
            attn_norm=normL,
            wqkv=qw(ks[0], e, 3 * e, (L,)),
            wo=qw(ks[3], e, e, (L,), chunks=tp),
            ffn_norm=normL,
            w13=qw(ks[4], e, 2 * f, (L,)),
            w2=qw(ks[5], f, e, (L,), chunks=tp),
        )
        emb = QEmbedding(
            packed=jax.random.randint(ks[7], (v, e // 2), -128, 128, dtype=jnp.int8),
            scales=jax.random.uniform(ks[8], (v, e // QK), jnp.float32, 0.005, 0.02).astype(
                scale_dtype
            ),
            bias=None,
            k=e,
        )
        return LlamaParams(
            tok_embeddings=emb, layers=layers, norm=norm1, output=qw(ks[9], e, v)
        )

    return build(jax.random.key(seed))
