"""Minimal SentencePiece ModelProto reader (no sentencepiece dependency).

Parses just enough of the protobuf wire format to extract the vocabulary:
ModelProto field 1 = repeated SentencePiece { piece: string = 1,
score: float = 2, type: enum = 3 }. Piece→ggml-vocab-text conversion matches
the reference converter (convert-pth-to-ggml.py:120-137): unknown → " ⁇ ",
control → empty, byte piece <0xXX> → the raw byte, else "▁" → " ".

Also includes a writer (same subset) so tests can synthesize tokenizer.model
fixtures without the sentencepiece library.
"""

from __future__ import annotations

import struct

from ..formats.ggml_io import TokenEntry

# SentencePiece.Type enum values
SPM_NORMAL = 1
SPM_UNKNOWN = 2
SPM_CONTROL = 3
SPM_USER_DEFINED = 4
SPM_UNUSED = 5
SPM_BYTE = 6


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


def _parse_piece(buf: bytes) -> tuple[bytes, float, int]:
    piece, score, ptype = b"", 0.0, SPM_NORMAL
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:
            ln, pos = _read_varint(buf, pos)
            piece = buf[pos : pos + ln]
            pos += ln
        elif field == 2 and wt == 5:
            score = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif field == 3 and wt == 0:
            ptype, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wt)
    return piece, score, ptype


def read_spm_vocab(path: str) -> list[TokenEntry]:
    """tokenizer.model → ggml vocab entries (text already surface-converted)."""
    with open(path, "rb") as f:
        buf = f.read()
    vocab: list[TokenEntry] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if field == 1 and wt == 2:  # repeated SentencePiece
            ln, pos = _read_varint(buf, pos)
            piece, score, ptype = _parse_piece(buf[pos : pos + ln])
            pos += ln
            if ptype == SPM_UNKNOWN:
                text = " ⁇ ".encode()
            elif ptype in (SPM_CONTROL, SPM_UNUSED):
                text = b""
            elif ptype == SPM_BYTE:
                s = piece.decode()
                if len(s) != 6 or not s.startswith("<0x"):
                    raise ValueError(f"invalid byte token {piece!r}")
                text = bytes([int(s[3:-1], 16)])
            else:
                text = piece.decode().replace("▁", " ").encode()
            vocab.append(TokenEntry(text, score))
        else:
            pos = _skip_field(buf, pos, wt)
    return vocab


# --- writer (test fixtures) -------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def write_spm_model(
    path: str, pieces: list[tuple[str, float, int]]
) -> None:
    """Write a minimal tokenizer.model with (piece, score, type) entries."""
    out = bytearray()
    for piece, score, ptype in pieces:
        pb = piece.encode()
        body = (
            _varint((1 << 3) | 2) + _varint(len(pb)) + pb
            + _varint((2 << 3) | 5) + struct.pack("<f", score)
            + _varint((3 << 3) | 0) + _varint(ptype)
        )
        out += _varint((1 << 3) | 2) + _varint(len(body)) + body
    with open(path, "wb") as f:
        f.write(out)
