"""Differential parity against the COMPILED C reference.

These tests build the reference's scalar binaries (tools/build_reference.sh →
.refbuild/{main,perplexity,quantize,ref_logits}) and diff them against this
framework on shared tiny GGJT checkpoints written by our CheckpointWriter:

- ``./quantize`` output bytes vs ``cli/quantize.py``: IDENTICAL.
- ``./main --temp 0 --memory_f32`` greedy token streams vs
  ``Engine(ggml_numerics=...)``: IDENTICAL for both f16 and q4_0 models.
- per-position logits (tools/ref_logits.cpp) vs ``llama_forward``: ~1e-4.
- ``./perplexity`` per-chunk running ppl vs ``cli/perplexity.py``: ~1e-4 rel,
  and the PRODUCTION path (bf16 + Pallas kernels + packed q4 weights) within
  a few percent — the quality contract of the shipping engine.

The oracle that makes exact parity possible is models/ggml_numerics.py: the
reference's scalar engine rounds matmul activations through the weight's
storage format (f16, or q4_0 per-32-block), runs silu/exp through f16 lookup
tables, and computes rms_norm as 1/sqrtf — llama_forward(dtype=f32,
attn_impl="einsum", ggml_rounding=...) over dequantized dense weights
reproduces it bit-for-bit at every rounding gate.

Chaos caveat (measured, see git history): q4_0 activation rounding AMPLIFIES
sub-ulp accumulation-order differences — on a scale-0.4 random 32-layer
model, perturbing our own activations by 1 ulp flips a single q4 rounding at
position 3 and shifts logits by ~4.8, numerically identical to the
ours-vs-reference delta at that position. Stream parity on such a model is
below the reproducibility of the reference itself (its own SIMD builds
diverge the same way). The fixtures therefore use scale=0.1 weights, where
rounding absorption wins and streams match exactly for 24+ tokens.

Reference anchors: examples/main/main.cpp:138 (prompt gets a leading space
before tokenization), llama.cpp:1382-1394 (temp<=0 is pure argmax, no
repeat penalty), examples/perplexity/perplexity.cpp:36-79 (chunking + NLL
window), llama.cpp:1465-1577 (quantize tensor selection).
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REFSRC = Path("/root/reference")
REFBUILD = REPO / ".refbuild"
VOCAB = REFSRC / "models" / "ggml-vocab.bin"

pytestmark = pytest.mark.skipif(
    not REFSRC.exists(), reason="reference checkout not available"
)

PROMPT = "The quick brown fox"  # main.cpp:138 prepends ' ' before tokenizing


@pytest.fixture(scope="session")
def refbin():
    """Scalar reference binaries (built once, cached in .refbuild/)."""
    need = [REFBUILD / n for n in ("main", "perplexity", "quantize")]
    if not all(p.exists() for p in need):
        subprocess.run(
            ["sh", str(REPO / "tools" / "build_reference.sh")],
            check=True,
            capture_output=True,
        )
    probe = REFBUILD / "ref_logits"
    if not probe.exists():
        subprocess.run(
            [
                "g++", "-O2", "-std=c++11", "-I.", "../tools/ref_logits.cpp",
                "llama.o", "ggml.o", "-o", "ref_logits", "-pthread",
            ],
            cwd=REFBUILD,
            check=True,
            capture_output=True,
        )
    return REFBUILD


@pytest.fixture(scope="session")
def models(tmp_path_factory, refbin):
    """Shared tiny checkpoints: f16 written by our writer, q4_0 produced by
    the REFERENCE ./quantize (so the stream tests exercise its file)."""
    from llamavk_tpu.models.loader import random_ref_model

    d = tmp_path_factory.mktemp("parity")
    f16 = str(d / "tiny-f16.bin")
    q4 = str(d / "tiny-q4_0.bin")
    random_ref_model(f16, str(VOCAB), seed=7, scale=0.1)
    subprocess.run(
        [str(refbin / "quantize"), f16, q4, "2"], check=True, capture_output=True
    )
    return {"f16": f16, "q4_0": q4}


def ref_main_stream(refbin, model: str, n: int, n_ctx: int = 128) -> bytes:
    """Greedy generation text from the reference CLI (prompt echo stripped)."""
    out = subprocess.run(
        [
            str(refbin / "main"), "-m", model, "-p", PROMPT, "-n", str(n),
            "-t", "1", "-s", "1", "--temp", "0", "--memory_f32",
            "-c", str(n_ctx), "-b", "8",
        ],
        check=True,
        capture_output=True,
    ).stdout
    prefix = (" " + PROMPT).encode()
    assert out.startswith(prefix), out[:80]
    return out[len(prefix):].rstrip(b"\n")


def our_stream(model: str, mode: str, n: int, n_ctx: int = 128) -> bytes:
    from llamavk_tpu.models import load_model
    from llamavk_tpu.runtime.engine import Engine, EngineConfig
    from llamavk_tpu.runtime.sampling import SamplerParams

    cfg, params, tok = load_model(model, dequantize=True)
    ids = tok.encode(" " + PROMPT, bos=True)
    eng = Engine(
        cfg,
        params,
        EngineConfig(
            n_ctx=n_ctx, kv_dtype="float32", dtype="float32",
            ggml_numerics=mode, decode_block=8,
        ),
    )
    out = eng.generate(ids, n, SamplerParams(temp=0.0), ignore_eos=True)
    return tok.decode(out)


def test_quantize_bytes_identical(models, refbin, tmp_path):
    """cli/quantize.py output is byte-for-byte the reference ./quantize's."""
    from llamavk_tpu.cli.quantize import quantize_file
    from llamavk_tpu.formats.q4 import GGML_FTYPE_Q4_0

    ours = tmp_path / "ours-q4_0.bin"
    quantize_file(models["f16"], str(ours), GGML_FTYPE_Q4_0, verbose=False)
    assert ours.read_bytes() == Path(models["q4_0"]).read_bytes()


@pytest.mark.parametrize("mode", ["f16", "q4_0"])
def test_greedy_stream_exact(models, refbin, mode):
    """24 greedy tokens, bit-identical to the compiled reference binary."""
    ref = ref_main_stream(refbin, models[mode], 24)
    ours = our_stream(models[mode], mode, 24)
    assert ours == ref


@pytest.mark.parametrize(
    "mode,atol",
    [("f16", 5e-3), ("q4_0", 2e-4)],
    # q4_0 is TIGHTER: its coarse activation rounding re-absorbs f32
    # accumulation-order noise at every matmul gate; f16's finer grid lets
    # ~1e-3 drift through 32 layers (measured 2.6e-3 max on this fixture).
)
def test_logits_parity(models, refbin, mode, atol):
    """Per-position full-batch logits from tools/ref_logits.cpp vs ours."""
    import jax.numpy as jnp
    from llamavk_tpu.models import init_kv_cache, llama_forward, load_model

    cfg, params, tok = load_model(models[mode], dequantize=True)
    ids = tok.encode(" " + PROMPT, bos=True)
    raw = subprocess.run(
        [str(refbin / "ref_logits"), models[mode], "128", *map(str, ids)],
        check=True,
        capture_output=True,
    ).stdout
    ref = np.frombuffer(raw, np.float32).reshape(len(ids), -1)
    cache = init_kv_cache(cfg, 1, 128, dtype=jnp.float32)
    lg, _, _ = llama_forward(
        params, jnp.asarray(ids, jnp.int32)[None], cache, jnp.int32(0), cfg,
        logits_all=True, dtype=jnp.float32, attn_impl="einsum",
        ggml_rounding=mode,
    )
    ours = np.asarray(lg[0], np.float32)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=0)
    assert (ours.argmax(-1) == ref.argmax(-1)).all()


def _ppl_text(tok) -> bytes:
    """Deterministic pseudo-text tokenizing to >= 5 n_ctx=32 chunks."""
    words = [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs",
        "while", "seven", "wizards", "toast", "bright", "morning", "tea",
    ]
    rng = np.random.default_rng(11)
    text = " ".join(words[i] for i in rng.integers(0, len(words), 400))
    assert len(tok.encode(" " + text, bos=True)) >= 5 * 32
    return text.encode()


def test_perplexity_parity(models, refbin, tmp_path):
    """Per-chunk running perplexity: oracle ~1e-4, production path few %.

    The production leg runs the SHIPPING configuration — packed q4 weights,
    bf16 activations, Pallas kernels (interpreter mode on CPU) — against the
    reference binary's numbers: the quality contract of the engine itself,
    not just of the oracle.
    """
    from llamavk_tpu.cli.perplexity import perplexity_chunks
    from llamavk_tpu.models import load_model

    cfg, params, tok = load_model(models["f16"], dequantize=True)
    text = _ppl_text(tok)
    tf = tmp_path / "ppl.txt"
    tf.write_bytes(text)
    out = subprocess.run(
        [
            str(refbin / "perplexity"), "-m", models["f16"], "-f", str(tf),
            "-c", "32", "-b", "32", "-t", "1", "-s", "1", "--memory_f32",
        ],
        check=True,
        capture_output=True,
    ).stdout.decode()
    ref_ppl = [float(x) for x in re.findall(r"\[\d+\]([0-9.]+),", out)]
    assert len(ref_ppl) >= 5

    ours = perplexity_chunks(
        cfg, params, tok, text, n_ctx=32, max_chunks=len(ref_ppl),
        dtype=np.float32, attn_impl="einsum", kv_dtype=np.float32,
        verbose=False, ggml_rounding="f16",
    )
    np.testing.assert_allclose(ours, ref_ppl, rtol=5e-4)

    # production path on the q4_0 file (bf16 + kernels + packed weights)
    cfg_q, params_q, _ = load_model(models["q4_0"])
    prod = perplexity_chunks(
        cfg_q, params_q, tok, text, n_ctx=32, max_chunks=len(ref_ppl),
        verbose=False,
    )
    ref_q = subprocess.run(
        [
            str(refbin / "perplexity"), "-m", models["q4_0"], "-f", str(tf),
            "-c", "32", "-b", "32", "-t", "1", "-s", "1", "--memory_f32",
        ],
        check=True,
        capture_output=True,
    ).stdout.decode()
    ref_q_ppl = [float(x) for x in re.findall(r"\[\d+\]([0-9.]+),", ref_q)]
    # bf16 activations vs the scalar engine's f16-gated f32 on a RANDOM
    # (untrained, high-entropy) model: measured max per-chunk delta 5.5%.
    np.testing.assert_allclose(prod, ref_q_ppl, rtol=0.10)


def test_perplexity_parity_production_paths(models, refbin, tmp_path):
    """VERDICT r3 #6: the PRODUCTION serving paths' quality vs the compiled
    reference — int8 KV (fused in-kernel quantize/write/attend), paged KV
    (block-table pool), paged x int8, and int4-plane weight storage — each
    diffed against ./perplexity's per-chunk numbers on the q4_0 fixture.
    Records the measured deltas for BASELINE.json `measured`."""
    import jax.numpy as jnp

    from llamavk_tpu.cli.perplexity import perplexity_chunks
    from llamavk_tpu.models import load_model, params_to_i4

    cfg_q, params_q, tok = load_model(models["q4_0"])
    text = _ppl_text(tok)
    tf = tmp_path / "ppl.txt"
    tf.write_bytes(text)
    ref_q = subprocess.run(
        [
            str(refbin / "perplexity"), "-m", models["q4_0"], "-f", str(tf),
            "-c", "32", "-b", "32", "-t", "1", "-s", "1", "--memory_f32",
        ],
        check=True,
        capture_output=True,
    ).stdout.decode()
    ref_q_ppl = [float(x) for x in re.findall(r"\[\d+\]([0-9.]+),", ref_q)]
    assert len(ref_q_ppl) >= 5

    def run(label, **kw):
        ours = perplexity_chunks(
            cfg_q, kw.pop("params", params_q), tok, text, n_ctx=32,
            max_chunks=len(ref_q_ppl), verbose=False, **kw,
        )
        rel = float(np.max(np.abs(np.asarray(ours) / np.asarray(ref_q_ppl)
                                  - 1.0)))
        print(f"ppl-parity {label}: max per-chunk rel delta {rel:.4f}")
        return ours, rel

    # int8 KV: per-row quantization noise on top of the bf16-vs-f16 gap.
    # On this random tiny model (high-entropy, untrained) measured ~7%.
    int8_ppl, int8_rel = run("int8-kv", kv_dtype=jnp.int8)
    np.testing.assert_allclose(int8_ppl, ref_q_ppl, rtol=0.15)

    # paged KV (bf16 pool): identical math to flat bf16 modulo the block
    # partition — must sit at the flat production delta (<10%)
    paged_ppl, _ = run("paged-bf16", paged=True)
    np.testing.assert_allclose(paged_ppl, ref_q_ppl, rtol=0.10)

    # paged x int8 (the flagship serving config)
    paged8_ppl, _ = run("paged-int8", paged=True, kv_dtype=jnp.int8)
    np.testing.assert_allclose(paged8_ppl, ref_q_ppl, rtol=0.15)

    # int4-plane weight storage (identical quantized VALUES — only dot
    # partition order differs from the byte-packed path)
    i4_ppl, _ = run("int4-planes", params=params_to_i4(params_q))
    np.testing.assert_allclose(i4_ppl, ref_q_ppl, rtol=0.10)
