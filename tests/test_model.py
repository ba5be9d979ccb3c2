"""Model forward tests: JAX model vs an independent NumPy reference forward,
prefill/decode equivalence, and checkpoint-loaded forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llamavk_tpu.formats import CheckpointReader, quantize_q4_0
from llamavk_tpu.models import (
    ModelConfig,
    init_kv_cache,
    llama_forward,
    load_model,
    params_from_reader,
    random_tiny_model,
)


def numpy_forward(hp_tensors, cfg: ModelConfig, tokens: np.ndarray, quantized: bool):
    """Straight-line f32 LLaMA forward (independent reference; no jax).

    If quantized, weights are first passed through the Q4_0 codec so values
    match what the device model sees.
    """
    _, tensors = hp_tensors

    def weight(name):
        w = tensors[name]
        if quantized and w.ndim == 2 and "norm" not in name:
            d, q = quantize_q4_0(w)
            w = ((q.astype(np.float32) - 8) * d[..., None]).reshape(w.shape)
        return w

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w

    def rope(x, n_past):
        t, h, d = x.shape
        out = x.copy()
        for tt in range(t):
            p = n_past + tt
            for i0 in range(0, d, 2):
                theta = 10000.0 ** (-i0 / d)
                c, s = np.cos(p * theta), np.sin(p * theta)
                x0, x1 = x[tt, :, i0].copy(), x[tt, :, i0 + 1].copy()
                out[tt, :, i0] = x0 * c - x1 * s
                out[tt, :, i0 + 1] = x0 * s + x1 * c
        return out

    T = len(tokens)
    h, d = cfg.n_head, cfg.head_dim
    x = weight("tok_embeddings.weight")[tokens]  # [T, K]
    for l in range(cfg.n_layer):
        pfx = f"layers.{l}."
        xa = rms(x, tensors[pfx + "attention_norm.weight"])
        q = (xa @ weight(pfx + "attention.wq.weight").T).reshape(T, h, d)
        k = (xa @ weight(pfx + "attention.wk.weight").T).reshape(T, h, d)
        v = (xa @ weight(pfx + "attention.wv.weight").T).reshape(T, h, d)
        q, k = rope(q, 0), rope(k, 0)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(d)
        mask = np.tril(np.ones((T, T), bool))
        scores = np.where(mask[None], scores, -np.inf)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", probs, v).reshape(T, h * d)
        x = x + attn @ weight(pfx + "attention.wo.weight").T
        xf = rms(x, tensors[pfx + "ffn_norm.weight"])
        gate = xf @ weight(pfx + "feed_forward.w1.weight").T
        up = xf @ weight(pfx + "feed_forward.w3.weight").T
        act = gate / (1 + np.exp(-gate)) * up
        x = x + act @ weight(pfx + "feed_forward.w2.weight").T
    xn = rms(x, tensors["norm.weight"])
    return xn @ weight("output.weight").T  # [T, V]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-q4_0.bin")
    hp_tensors = random_tiny_model(write_path=path, quantize=True)
    return path, hp_tensors


def test_forward_matches_numpy_q4(tiny):
    path, hp_tensors = tiny
    cfg, params, tok = load_model(path, scale_dtype=jnp.float32)
    tokens = np.array([5, 17, 250, 3, 99], np.int32)
    want = numpy_forward(hp_tensors, cfg, tokens, quantized=True)

    cache = init_kv_cache(cfg, 1, 16)
    logits, cache, emb = llama_forward(
        params, jnp.asarray(tokens)[None], cache, jnp.int32(0), cfg, logits_all=True
    )
    got = np.asarray(logits)[0]
    assert got.shape == want.shape
    # bf16 activations → compare loosely + argmax agreement on every position
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.15)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_prefill_then_decode_matches_full(tiny):
    path, _ = tiny
    cfg, params, _ = load_model(path)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.n_vocab, 8).astype(np.int32)

    # full prefill
    cache = init_kv_cache(cfg, 1, 16)
    full_logits, _, _ = llama_forward(
        params, jnp.asarray(tokens)[None], cache, jnp.int32(0), cfg
    )

    # prefill 5 then decode 3 one-by-one
    cache = init_kv_cache(cfg, 1, 16)
    _, cache, _ = llama_forward(
        params, jnp.asarray(tokens[:5])[None], cache, jnp.int32(0), cfg
    )
    logits = None
    for i in range(5, 8):
        logits, cache, _ = llama_forward(
            params, jnp.asarray(tokens[i : i + 1])[None], cache, jnp.int32(i), cfg
        )
    np.testing.assert_allclose(
        np.asarray(full_logits)[0, -1], np.asarray(logits)[0, -1], rtol=2e-2, atol=2e-2
    )


def test_embeddings_output(tiny):
    path, _ = tiny
    cfg, params, _ = load_model(path)
    cache = init_kv_cache(cfg, 1, 8)
    _, _, emb = llama_forward(
        params, jnp.asarray([[1, 2, 3]], jnp.int32), cache, jnp.int32(0), cfg
    )
    assert emb.shape == (1, cfg.n_embd)
    assert np.isfinite(np.asarray(emb)).all()


def test_batched_forward(tiny):
    path, _ = tiny
    cfg, params, _ = load_model(path)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, (3, 4)).astype(np.int32)
    cache = init_kv_cache(cfg, 3, 8)
    logits, _, _ = llama_forward(params, jnp.asarray(toks), cache, jnp.int32(0), cfg)
    assert logits.shape == (3, 1, cfg.n_vocab)
    # each batch row must equal the single-row result
    cache1 = init_kv_cache(cfg, 1, 8)
    l0, _, _ = llama_forward(params, jnp.asarray(toks[:1]), cache1, jnp.int32(0), cfg)
    np.testing.assert_allclose(
        np.asarray(logits)[0], np.asarray(l0)[0], rtol=1e-3, atol=1e-3
    )


def test_dense_f32_model_close_to_numpy(tmp_path):
    path = str(tmp_path / "tiny-f32.bin")
    hp_tensors = random_tiny_model(write_path=path, quantize=False, seed=7)
    cfg, params, _ = load_model(
        path, scale_dtype=jnp.float32, dense_dtype=jnp.float32
    )
    tokens = np.array([1, 2, 3, 4], np.int32)
    want = numpy_forward(hp_tensors, cfg, tokens, quantized=False)
    cache = init_kv_cache(cfg, 1, 8, dtype=jnp.float32)
    logits, _, _ = llama_forward(
        params,
        jnp.asarray(tokens)[None],
        cache,
        jnp.int32(0),
        cfg,
        logits_all=True,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits)[0], want, rtol=2e-4, atol=2e-4)


def test_forward_flash_vs_einsum_attention(tiny):
    """Both attention implementations must agree through the full model."""
    import jax.numpy as jnp
    from llamavk_tpu.models import init_kv_cache

    path, _ = tiny
    cfg, params, _tok = load_model(path, scale_dtype=jnp.float32)
    toks = jnp.asarray([[3, 14, 15, 9, 2]], jnp.int32)
    cache_a = init_kv_cache(cfg, 1, 32)
    cache_b = init_kv_cache(cfg, 1, 32)
    la, _, _ = llama_forward(
        params, toks, cache_a, jnp.int32(0), cfg, logits_all=True, attn_impl="flash"
    )
    lb, _, _ = llama_forward(
        params, toks, cache_b, jnp.int32(0), cfg, logits_all=True, attn_impl="einsum"
    )
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-2, atol=3e-2)


def test_commit_gating_preserves_cache(tiny):
    """commit=False hops (pipeline-parallel idle stages) must leave the cache
    bit-identical on every write path (fused kernel + gated DUS)."""
    import jax.numpy as jnp
    from llamavk_tpu.models import init_kv_cache
    from llamavk_tpu.ops.flash_attn import flash_attention_update

    path, _ = tiny
    cfg, params, _tok = load_model(path, scale_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    b, t, h, d, s = 1, 2, cfg.n_head, cfg.head_dim, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((cfg.n_layer, b, h, s, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((cfg.n_layer, b, h, s, d)), jnp.bfloat16)
    out0, kc2, vc2 = flash_attention_update(
        q, kn, vn, kc, vc, jnp.int32(3), jnp.int32(0),
        block_t=2, block_k=8, commit=False,
    )
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc))
    # attention still sees the (unchanged) cache plus masked garbage rows
    assert bool(jnp.isfinite(out0).all())


def test_vector_npast_einsum_path(tiny):
    """Continuous-batching positions through the einsum (oracle) path must
    match the flash path (covers the per-row gated DUS writes)."""
    import jax.numpy as jnp
    from llamavk_tpu.models import init_kv_cache

    path, _ = tiny
    cfg, params, _tok = load_model(path, scale_dtype=jnp.float32)
    toks = jnp.asarray([[3, 14], [9, 2]], jnp.int32)
    n_past = jnp.asarray([0, 5], jnp.int32)
    ca = init_kv_cache(cfg, 2, 16)
    cb = init_kv_cache(cfg, 2, 16)
    la, ca2, _ = llama_forward(params, toks, ca, n_past, cfg, attn_impl="flash")
    lb, cb2, _ = llama_forward(params, toks, cb, n_past, cfg, attn_impl="einsum")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-2, atol=3e-2)
    np.testing.assert_allclose(
        np.asarray(ca2.k), np.asarray(cb2.k), rtol=2e-2, atol=3e-2
    )
