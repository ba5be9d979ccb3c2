"""Converter tests: sentencepiece proto IO, Meta .pth (multi-part merge),
HF (wq/wk unpermute), GPTQ → Q4_1, and format migration."""

import json
import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from llamavk_tpu.convert import (
    convert_gptq,
    convert_hf,
    convert_pth,
    ggml_to_pth,
    migrate_to_ggjt,
    read_spm_vocab,
    write_spm_model,
)
from llamavk_tpu.convert.spm_reader import (
    SPM_BYTE,
    SPM_CONTROL,
    SPM_NORMAL,
    SPM_UNKNOWN,
)
from llamavk_tpu.formats import CheckpointReader
from llamavk_tpu.formats.q4 import GGML_FTYPE_F32, QK


def make_spm(path, n_extra=13):
    pieces = [("<unk>", 0.0, SPM_UNKNOWN), ("<s>", 0.0, SPM_CONTROL),
              ("</s>", 0.0, SPM_CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, SPM_BYTE) for b in range(4)]
    pieces += [(f"▁tok{i}", -float(i), SPM_NORMAL) for i in range(n_extra)]
    write_spm_model(str(path), pieces)
    return len(pieces)


def test_spm_roundtrip(tmp_path):
    p = tmp_path / "tokenizer.model"
    n = make_spm(p)
    vocab = read_spm_vocab(str(p))
    assert len(vocab) == n
    assert vocab[0].text == " ⁇ ".encode()  # unknown
    assert vocab[1].text == b""  # control
    assert vocab[3].text == b"\x00"  # byte 0
    assert vocab[7].text == b" tok0"  # ▁ → space
    assert vocab[8].score == -1.0


def _meta_tensors(rng, n_embd=64, n_ff=96, n_vocab=20, n_layer=1):
    t = {
        "tok_embeddings.weight": rng.standard_normal((n_vocab, n_embd)),
        "norm.weight": rng.standard_normal(n_embd),
        "output.weight": rng.standard_normal((n_vocab, n_embd)),
    }
    for i in range(n_layer):
        p = f"layers.{i}."
        t[p + "attention_norm.weight"] = rng.standard_normal(n_embd)
        t[p + "ffn_norm.weight"] = rng.standard_normal(n_embd)
        t[p + "attention.wq.weight"] = rng.standard_normal((n_embd, n_embd))
        t[p + "attention.wk.weight"] = rng.standard_normal((n_embd, n_embd))
        t[p + "attention.wv.weight"] = rng.standard_normal((n_embd, n_embd))
        t[p + "attention.wo.weight"] = rng.standard_normal((n_embd, n_embd))
        t[p + "feed_forward.w1.weight"] = rng.standard_normal((n_ff, n_embd))
        t[p + "feed_forward.w2.weight"] = rng.standard_normal((n_embd, n_ff))
        t[p + "feed_forward.w3.weight"] = rng.standard_normal((n_ff, n_embd))
    return {k: v.astype(np.float32) for k, v in t.items()}


def test_convert_pth_two_parts(tmp_path):
    rng = np.random.default_rng(0)
    n_embd, n_ff, n_layer = 64, 96, 1
    n_vocab = make_spm(tmp_path / "tokenizer.model")
    full = _meta_tensors(rng, n_embd, n_ff, n_vocab, n_layer)
    (tmp_path / "params.json").write_text(
        json.dumps({"dim": n_embd, "multiple_of": 32, "n_heads": 2, "n_layers": n_layer})
    )
    # split into 2 parts along the merge axes
    col_split = ("tok_embeddings.weight",)
    parts = [dict(), dict()]
    for name, arr in full.items():
        if arr.ndim == 1:
            parts[0][name] = torch.from_numpy(arr)
            parts[1][name] = torch.from_numpy(arr)
        elif name in col_split or ".wo." in name or ".w2." in name:
            h = arr.shape[1] // 2
            parts[0][name] = torch.from_numpy(arr[:, :h].copy())
            parts[1][name] = torch.from_numpy(arr[:, h:].copy())
        else:
            h = arr.shape[0] // 2
            parts[0][name] = torch.from_numpy(arr[:h].copy())
            parts[1][name] = torch.from_numpy(arr[h:].copy())
    torch.save(parts[0], tmp_path / "consolidated.00.pth")
    torch.save(parts[1], tmp_path / "consolidated.01.pth")

    out = convert_pth(str(tmp_path), ftype=0)
    r = CheckpointReader(out)
    assert r.hparams.n_vocab == n_vocab
    for name, arr in full.items():
        np.testing.assert_allclose(r.load_f32(name), arr, rtol=0, atol=0)


def test_convert_hf_unpermute(tmp_path):
    """HF→ggml conversion must undo the rotate-half row permutation so that
    adjacent-pair RoPE sees Meta-order rows."""
    rng = np.random.default_rng(1)
    n_embd, n_head, n_layer, n_ff = 64, 2, 1, 96
    n_vocab = make_spm(tmp_path / "tokenizer.model")
    meta = _meta_tensors(rng, n_embd, n_ff, n_vocab, n_layer)

    def permute_to_hf(w):
        dh = n_embd // n_head
        return (
            w.reshape(n_head, dh // 2, 2, n_embd).swapaxes(1, 2).reshape(n_embd, n_embd)
        )

    hf = {
        "model.embed_tokens.weight": meta["tok_embeddings.weight"],
        "model.norm.weight": meta["norm.weight"],
        "lm_head.weight": meta["output.weight"],
        "model.layers.0.self_attn.q_proj.weight": permute_to_hf(meta["layers.0.attention.wq.weight"]),
        "model.layers.0.self_attn.k_proj.weight": permute_to_hf(meta["layers.0.attention.wk.weight"]),
        "model.layers.0.self_attn.v_proj.weight": meta["layers.0.attention.wv.weight"],
        "model.layers.0.self_attn.o_proj.weight": meta["layers.0.attention.wo.weight"],
        "model.layers.0.mlp.gate_proj.weight": meta["layers.0.feed_forward.w1.weight"],
        "model.layers.0.mlp.down_proj.weight": meta["layers.0.feed_forward.w2.weight"],
        "model.layers.0.mlp.up_proj.weight": meta["layers.0.feed_forward.w3.weight"],
        "model.layers.0.input_layernorm.weight": meta["layers.0.attention_norm.weight"],
        "model.layers.0.post_attention_layernorm.weight": meta["layers.0.ffn_norm.weight"],
    }
    torch.save({k: torch.from_numpy(v) for k, v in hf.items()},
               tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(
        json.dumps({"hidden_size": n_embd, "num_attention_heads": n_head,
                    "num_hidden_layers": n_layer, "intermediate_size": n_ff})
    )
    out = convert_hf(str(tmp_path), ftype=0)
    r = CheckpointReader(out)
    for name, arr in meta.items():
        np.testing.assert_allclose(r.load_f32(name), arr, atol=0, err_msg=name)


def test_convert_gptq(tmp_path):
    rng = np.random.default_rng(2)
    n_embd, n_head, n_layer, n_ff = 64, 2, 1, 96
    n_vocab = make_spm(tmp_path / "tokenizer.model")

    def pack_qweight(q):  # [N, K] nibbles → int32 [K/8, N]
        n, k = q.shape
        w = np.zeros((n, k // 8), np.uint32)
        for j in range(8):
            w |= q[:, j::8].astype(np.uint32) << (4 * j)
        return torch.from_numpy(w.T.astype(np.int32))

    model = {
        "model.embed_tokens.weight": torch.randn(n_vocab, n_embd, dtype=torch.float16),
        "model.norm.weight": torch.randn(n_embd),
        "lm_head.weight": torch.randn(n_vocab, n_embd, dtype=torch.float16),
    }
    expected = {}
    for i in range(n_layer):
        p = f"model.layers.{i}."
        model[p + "input_layernorm.weight"] = torch.randn(n_embd)
        model[p + "post_attention_layernorm.weight"] = torch.randn(n_embd)
        for proj, k_in, n_out in [
            ("self_attn.q_proj", n_embd, n_embd), ("self_attn.k_proj", n_embd, n_embd),
            ("self_attn.v_proj", n_embd, n_embd), ("self_attn.o_proj", n_embd, n_embd),
            ("mlp.gate_proj", n_embd, n_ff), ("mlp.down_proj", n_ff, n_embd),
            ("mlp.up_proj", n_embd, n_ff),
        ]:
            q = rng.integers(0, 16, (n_out, k_in)).astype(np.uint8)
            scales = rng.uniform(0.01, 0.1, n_out).astype(np.float32)
            zeros = rng.uniform(-0.5, 0.5, n_out).astype(np.float32)
            model[p + proj + ".qweight"] = pack_qweight(q)
            model[p + proj + ".scales"] = torch.from_numpy(scales)
            model[p + proj + ".zeros"] = torch.from_numpy(zeros)
            model[p + proj + ".bias"] = torch.zeros(n_out)
            # dequantized expectation: q*scale - zeros (reference semantics)
            expected[proj] = q.astype(np.float32) * scales[:, None] - zeros[:, None]
    torch.save(model, tmp_path / "model.pt")
    out = convert_gptq(
        str(tmp_path / "model.pt"), str(tmp_path / "tokenizer.model"),
        str(tmp_path / "out.bin"), n_head=n_head,
    )
    r = CheckpointReader(out)
    # v_proj has no permutation: exact match expected
    got = r.load_f32("layers.0.attention.wv.weight")
    np.testing.assert_allclose(got, expected["self_attn.v_proj"], rtol=1e-6, atol=1e-6)
    got = r.load_f32("layers.0.feed_forward.w1.weight")
    np.testing.assert_allclose(got, expected["mlp.gate_proj"], rtol=1e-6, atol=1e-6)


def test_migrate_from_ggmf(tmp_path):
    """Hand-write a ggmf v1 file, migrate to ggjt, verify contents."""
    rng = np.random.default_rng(3)
    arr = rng.standard_normal((8, 64)).astype(np.float32)
    p_in = tmp_path / "old.bin"
    with open(p_in, "wb") as f:
        f.write(struct.pack("<II", 0x67676D66, 1))  # ggmf v1
        f.write(struct.pack("<7I", 2, 64, 32, 2, 1, 32, 0))
        for i in range(2):
            txt = f"t{i}".encode()
            f.write(struct.pack("<I", len(txt)) + txt + struct.pack("<f", -float(i)))
        name = b"tok_embeddings.weight"
        f.write(struct.pack("<III", 2, len(name), 0))
        f.write(struct.pack("<II", 64, 8))
        f.write(name)
        f.write(arr.tobytes())  # ggmf: unaligned
    out = migrate_to_ggjt(str(p_in), str(tmp_path / "new.bin"))
    r = CheckpointReader(out)
    assert r.magic.name == "GGJT"
    np.testing.assert_array_equal(r.load_f32("tok_embeddings.weight"), arr)
    # reverse converter
    pth = ggml_to_pth(out, str(tmp_path / "model.pth"))
    sd = torch.load(pth, weights_only=True)
    np.testing.assert_array_equal(sd["tok_embeddings.weight"].numpy(), arr)


def test_gpt4all_converter(tmp_path):
    """v0 'ggml' file without scores + tokenizer.model → scored GGJT."""
    import struct

    import numpy as np

    from llamavk_tpu.convert.gpt4all import convert_gpt4all
    from llamavk_tpu.convert.spm_reader import write_spm_model
    from llamavk_tpu.formats.ggml_io import CheckpointReader

    n_vocab = 8
    # hand-build an unversioned 'ggml' v0 file: no version, no vocab scores
    buf = struct.pack("<I", 0x67676D6C)
    buf += struct.pack("<7I", n_vocab, 16, 2, 2, 1, 8, 0)  # hparams
    for i in range(n_vocab):
        text = f"p{i}".encode()
        buf += struct.pack("<I", len(text)) + text
    data = np.arange(16, dtype=np.float32)
    name = b"norm.weight"
    buf += struct.pack("<III", 1, len(name), 0) + struct.pack("<I", 16) + name
    buf += data.tobytes()
    src = tmp_path / "gpt4all.bin"
    src.write_bytes(buf)

    spm = tmp_path / "tokenizer.model"
    write_spm_model(str(spm), [(f"p{i}", -float(i), 1) for i in range(n_vocab)])

    out = tmp_path / "out.bin"
    convert_gpt4all(str(src), str(spm), str(out))

    r = CheckpointReader(str(out))
    assert [t.score for t in r.vocab] == [-float(i) for i in range(n_vocab)]
    assert [t.text for t in r.vocab] == [f"p{i}".encode() for i in range(n_vocab)]
    np.testing.assert_array_equal(r.load_f32("norm.weight"), data)
