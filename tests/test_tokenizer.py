"""Tokenizer golden tests — the vectors from the reference's
tests/test-tokenizer-0.cpp against the checked-in vocab-only fixture."""

import pytest

from llamavk_tpu.formats import CheckpointReader
from llamavk_tpu.tokenizer import Tokenizer, BOS_ID

VOCAB_FIXTURE = "/root/reference/models/ggml-vocab.bin"

GOLDEN = {
    "Hello World": [1, 10994, 2787],
    " Hello World": [1, 15043, 2787],
    " Hello World!": [1, 15043, 2787, 29991],
    " this is 🦙.cpp": [1, 445, 338, 29871, 243, 162, 169, 156, 29889, 8223],
    "w048 7tuijk dsdfhu": [1, 29893, 29900, 29946, 29947, 29871, 29955, 9161,
                           13535, 18031, 2176, 6905],
    "нещо на Български": [1, 821, 4851, 665, 1386, 29713, 1305],
}


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(CheckpointReader(VOCAB_FIXTURE).vocab)


@pytest.mark.parametrize("text,ids", GOLDEN.items(), ids=list(GOLDEN))
def test_golden(tok, text, ids):
    assert tok.encode(text, bos=True) == ids


def test_empty(tok):
    assert tok.encode("", bos=False) == []
    assert tok.encode("", bos=True) == [BOS_ID]


def test_decode_roundtrip(tok):
    for text in GOLDEN:
        ids = tok.encode(text, bos=False)
        assert tok.decode(ids).decode("utf-8") == text


def test_byte_fallback(tok):
    # bytes that can't merge fall back to id = byte + 3
    ids = tok.encode(b"\x00\x01", bos=False)
    assert ids == [3, 4]


def test_native_matches_python(tok, monkeypatch):
    """The C++ tokenizer must be BIT-IDENTICAL to the Python twin on golden
    vectors, random byte soup (incl. invalid utf-8 -> byte fallback), and
    repetitive text (heap tie-break order)."""
    import numpy as np
    from llamavk_tpu import native as nv

    if not nv.available():
        pytest.skip("native lib unavailable")
    # fresh instances: one forced-Python, one native
    py_tok = Tokenizer(tok.vocab)
    py_tok._native_tried = True  # never builds the native path
    nat_tok = Tokenizer(tok.vocab)
    nat_tok.encode("warm")  # builds the handle
    assert nat_tok._native is not None, "native tokenizer failed to build"

    rng = np.random.default_rng(0)
    cases = list(GOLDEN) + [
        " the quick brown fox " * 40,
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "".join(chr(32 + int(c) % 95) for c in rng.integers(0, 1000, 500)),
    ]
    byte_cases = [bytes(rng.integers(0, 256, 300).astype(np.uint8)) for _ in range(3)]
    for case in cases + byte_cases:
        assert nat_tok.encode(case) == py_tok.encode(case), case
