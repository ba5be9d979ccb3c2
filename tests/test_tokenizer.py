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
