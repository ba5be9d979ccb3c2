"""Checkpoint IO tests: writer↔reader round trip, vocab-only fixture from the
reference repo, and device repack correctness."""

import numpy as np
import pytest

from llamavk_tpu.formats import (
    CheckpointReader,
    CheckpointWriter,
    Hparams,
    TokenEntry,
    QK,
    quantize_q4_0,
    quantize_q4_1,
    q4_0_to_bytes,
    q4_1_to_bytes,
    repack_q4_0,
    repack_q4_1,
    unpack_q4,
    ilv_perm,
    ilv_inv_perm,
)
from llamavk_tpu.formats.q4 import GGML_FTYPE_F32, GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1
from llamavk_tpu.formats.repack import LAYOUT_ILV, LAYOUT_LIN

VOCAB_FIXTURE = "/root/reference/models/ggml-vocab.bin"


def _tiny_vocab(n=16):
    return [TokenEntry(f"tok{i}".encode(), float(-i)) for i in range(n)]


def test_writer_reader_roundtrip(tmp_path):
    hp = Hparams(n_vocab=16, n_embd=64, n_mult=32, n_head=2, n_layer=1, n_rot=32, ftype=2)
    rng = np.random.default_rng(0)
    w_f32 = rng.standard_normal((16, 64)).astype(np.float32)
    wq = rng.standard_normal((64, 64)).astype(np.float32)
    d, q = quantize_q4_0(wq)
    path = str(tmp_path / "model.bin")
    with CheckpointWriter(path, hp, _tiny_vocab()) as w:
        w.write_array("norm.weight", w_f32[0], GGML_FTYPE_F32)
        w.write_tensor("tok_embeddings.weight", (64, 16), GGML_FTYPE_F32,
                       w_f32.astype(np.float32).tobytes())
        w.write_tensor(
            "layers.0.attention.wq.weight", (64, 64), GGML_FTYPE_Q4_0, q4_0_to_bytes(d, q)
        )

    r = CheckpointReader(path)
    assert r.hparams == hp
    assert [t.text for t in r.vocab] == [t.text for t in _tiny_vocab()]
    assert r.vocab[3].score == -3.0
    np.testing.assert_array_equal(r.load_f32("tok_embeddings.weight"), w_f32)
    np.testing.assert_array_equal(r.load_f32("norm.weight"), w_f32[0])
    d2, q2 = r.load_q4("layers.0.attention.wq.weight")
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_array_equal(q2, q)
    # dequantized load
    deq = r.load_f32("layers.0.attention.wq.weight")
    assert deq.shape == (64, 64)
    np.testing.assert_allclose(
        deq, ((q.astype(np.float32) - 8) * d[..., None]).reshape(64, 64), rtol=0
    )


def test_vocab_only_fixture():
    r = CheckpointReader(VOCAB_FIXTURE)
    hp = r.hparams
    assert hp.n_vocab == 32000
    assert hp.n_embd == 4096
    assert hp.n_head == 32
    assert hp.n_layer == 32
    assert hp.n_ff == 11008  # llama-7B
    assert len(r.vocab) == 32000
    assert len(r.tensors) == 0  # vocab-only file
    # known sentencepiece pieces ("▁" already mapped to " " in the file)
    assert r.vocab[15043].text == b" Hello"
    assert r.vocab[10994].text == b"Hello"
    assert r.vocab[29871].text == b" "


def test_ilv_perm_roundtrip():
    k = 256
    p = ilv_perm(k)
    inv = ilv_inv_perm(k)
    np.testing.assert_array_equal(p[inv], np.arange(k))
    g = k // QK
    # storage row r holds original (r % g)*32 + r//g
    assert p[0] == 0 and p[1] == QK and p[g] == 1


@pytest.mark.parametrize("layout", [LAYOUT_ILV, LAYOUT_LIN])
def test_repack_q4_0_exact(layout):
    rng = np.random.default_rng(3)
    n_out, k = 96, 128
    w = rng.standard_normal((n_out, k)).astype(np.float32)
    d, q = quantize_q4_0(w)  # [n_out, G], [n_out, G, QK]
    pk = repack_q4_0(d, q, layout=layout)
    assert pk.packed.shape == (k // 2, n_out)
    assert pk.scales.shape == (k // QK, n_out)
    want = ((q.astype(np.float32) - 8) * d[..., None]).reshape(n_out, k).T
    np.testing.assert_array_equal(unpack_q4(pk), want)


@pytest.mark.parametrize("layout", [LAYOUT_ILV, LAYOUT_LIN])
def test_repack_q4_1_exact(layout):
    rng = np.random.default_rng(4)
    n_out, k = 64, 256
    w = rng.standard_normal((n_out, k)).astype(np.float32) + 0.5
    d, m, q = quantize_q4_1(w)
    pk = repack_q4_1(d, m, q, layout=layout)
    want = (q.astype(np.float32) * d[..., None] + m[..., None]).reshape(n_out, k).T
    np.testing.assert_allclose(unpack_q4(pk), want, atol=1e-6)


def test_multipart_column_and_row_merge(tmp_path):
    """Shard-merge parity with llama.cpp:607-652: write two part files whose
    same-named tensors merge by rows (wq) and by columns (wo)."""
    hp = Hparams(n_vocab=4, n_embd=64, n_mult=32, n_head=2, n_layer=1, n_rot=32, ftype=0)
    vocab = _tiny_vocab(4)
    rng = np.random.default_rng(5)
    # full tensors we expect after the merge
    wq = rng.standard_normal((128, 64)).astype(np.float32)  # split by rows (ne[1])
    wo = rng.standard_normal((64, 128)).astype(np.float32)  # split by columns (ne[0])
    base = str(tmp_path / "model.bin")
    for part in range(2):
        path = base if part == 0 else f"{base}.{part}"
        with CheckpointWriter(path, hp, vocab) as w:
            # rows split: part p gets rows [p*64:(p+1)*64] (outer numpy dim)
            w.write_tensor(
                "layers.0.attention.wq.weight", (64, 64), GGML_FTYPE_F32,
                np.ascontiguousarray(wq[part * 64 : (part + 1) * 64]).tobytes(),
            )
            # column split: part p gets contiguous halves of each row
            w.write_tensor(
                "layers.0.attention.wo.weight", (64, 64), GGML_FTYPE_F32,
                np.ascontiguousarray(wo[:, part * 64 : (part + 1) * 64]).tobytes(),
            )
    r = CheckpointReader(base)
    assert len(r.paths) == 2
    np.testing.assert_array_equal(r.load_f32("layers.0.attention.wq.weight"), wq)
    np.testing.assert_array_equal(r.load_f32("layers.0.attention.wo.weight"), wo)
