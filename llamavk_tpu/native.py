"""ctypes bindings for the native host data-plane library (native/).

The reference keeps its host hot paths in C/C++ (ggml.c quantize/dequantize
codecs, llama_util.h mmap, the Vulkan upload/repack path); ours live in
native/llamavk_native.cpp. This module loads the shared library, building it
on first use if a toolchain is available, and every wrapper has a NumPy
fallback so the framework works (slower) without a compiler.

Set LLAMAVK_NO_NATIVE=1 to force the NumPy paths (used by parity tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libllamavk_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_c_i64 = ctypes.c_int64
_c_int = ctypes.c_int
_p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_p_u16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "llamavk_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _declare(lib: ctypes.CDLL) -> None:
    lib.lvk_version.restype = _c_int
    lib.lvk_hardware_threads.restype = _c_int
    lib.lvk_quantize_q4_0.restype = _c_i64
    lib.lvk_quantize_q4_0.argtypes = [_p_f32, _c_i64, _p_u8, ctypes.c_void_p, _c_int]
    lib.lvk_quantize_q4_1.restype = _c_i64
    lib.lvk_quantize_q4_1.argtypes = [_p_f32, _c_i64, _p_u8, ctypes.c_void_p, _c_int]
    lib.lvk_dequantize_q4_0.argtypes = [_p_u8, _c_i64, _p_f32, _c_int]
    lib.lvk_dequantize_q4_1.argtypes = [_p_u8, _c_i64, _p_f32, _c_int]
    lib.lvk_fp16_to_fp32.argtypes = [_p_u16, _c_i64, _p_f32, _c_int]
    lib.lvk_repack_q4.argtypes = [
        _p_u8, _c_i64, _c_i64, _c_int, _c_int, _c_int,
        _p_i8, _p_f32, ctypes.c_void_p, _c_int,
    ]
    lib.lvk_repack_q4_rows.argtypes = [
        _p_u8, _c_i64, _c_i64, _c_int,
        _p_i8, _p_f32, ctypes.c_void_p, _c_int,
    ]
    lib.lvk_tokenizer_create.restype = ctypes.c_void_p
    lib.lvk_tokenizer_create.argtypes = [_p_u8, _p_i64, _p_f32, _c_i64]
    lib.lvk_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.lvk_tokenize.restype = _c_i64
    lib.lvk_tokenize.argtypes = [ctypes.c_void_p, _p_u8, _c_i64, _p_i32, _c_i64]
    lib.lvk_mmap_open.restype = ctypes.c_void_p
    lib.lvk_mmap_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(_c_i64)]
    lib.lvk_mmap_close.argtypes = [ctypes.c_void_p, _c_i64]


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, or None (unavailable / disabled)."""
    global _lib, _tried
    if os.environ.get("LLAMAVK_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _declare(lib)
            if lib.lvk_version() != 1:
                return None
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# quantize / dequantize (byte-stream form, matching formats/q4.py)

from .formats.q4 import (  # noqa: E402  (import after helpers to avoid cycle)
    GGML_FTYPE_Q4_0,
    GGML_FTYPE_Q4_1,
    Q4_0_BLOCK_BYTES,
    Q4_1_BLOCK_BYTES,
    QK,
)


def quantize_tensor_with_hist(x: np.ndarray, ftype: int) -> tuple[bytes, np.ndarray]:
    """Native-accelerated equivalent of formats.q4.quantize_tensor_with_hist."""
    lib = get_lib()
    if lib is None:
        from .formats.q4 import quantize_tensor_with_hist as ref

        return ref(x, ftype)
    flat = np.ascontiguousarray(x.reshape(-1), np.float32)
    n = flat.size
    nb = n // QK
    hist = np.zeros(16, np.int64)
    if ftype == GGML_FTYPE_Q4_0:
        out = np.empty(nb * Q4_0_BLOCK_BYTES, np.uint8)
        lib.lvk_quantize_q4_0(flat, n, out, hist.ctypes.data, 0)
    elif ftype == GGML_FTYPE_Q4_1:
        out = np.empty(nb * Q4_1_BLOCK_BYTES, np.uint8)
        lib.lvk_quantize_q4_1(flat, n, out, hist.ctypes.data, 0)
    else:
        raise ValueError(f"not a q4 ftype: {ftype}")
    return out.tobytes(), hist


def dequantize_stream(raw: np.ndarray, n: int, ftype: int) -> np.ndarray | None:
    """Block stream → f32[n]; None if native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(np.frombuffer(raw, np.uint8) if isinstance(raw, bytes) else raw)
    out = np.empty(n, np.float32)
    if ftype == GGML_FTYPE_Q4_0:
        lib.lvk_dequantize_q4_0(raw, n, out, 0)
    elif ftype == GGML_FTYPE_Q4_1:
        lib.lvk_dequantize_q4_1(raw, n, out, 0)
    else:
        return None
    return out


def fp16_to_fp32(raw_u16: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    raw_u16 = np.ascontiguousarray(raw_u16, np.uint16)
    out = np.empty(raw_u16.size, np.float32)
    lib.lvk_fp16_to_fp32(raw_u16, raw_u16.size, out, 0)
    return out


# ---------------------------------------------------------------------------
# repack: disk q4 block stream → device planes (see formats/repack.py contract)


def repack_q4_stream(
    raw: np.ndarray,
    n_rows: int,
    row_elems: int,
    ftype: int,
    layout: str = "ilv",
    chunks: int = 1,
):
    """Native single-pass repack. Returns PackedQ4 or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from .formats.repack import PackedQ4

    k, n = row_elems, n_rows
    g = k // QK
    is_q41 = 1 if ftype == GGML_FTYPE_Q4_1 else 0
    raw = np.ascontiguousarray(np.frombuffer(raw, np.uint8) if isinstance(raw, bytes) else raw)
    packed = np.empty((k // 2, n), np.int8)
    scales = np.empty((g, n), np.float32)
    bias = np.empty((g, n), np.float32) if is_q41 else None
    lib.lvk_repack_q4(
        raw, n, k, is_q41, 0 if layout == "ilv" else 1, chunks,
        packed, scales, bias.ctypes.data if is_q41 else None, 0,
    )
    return PackedQ4(
        packed=packed, scales=scales, bias=bias, k=k, n=n, layout=layout, chunks=chunks
    )


def repack_q4_rows_stream(raw: np.ndarray, n_rows: int, row_elems: int, ftype: int):
    """Embedding-table repack → (packed [V,K/2] i8, scales [V,G], bias|None)."""
    lib = get_lib()
    if lib is None:
        return None
    k = row_elems
    g = k // QK
    is_q41 = 1 if ftype == GGML_FTYPE_Q4_1 else 0
    raw = np.ascontiguousarray(np.frombuffer(raw, np.uint8) if isinstance(raw, bytes) else raw)
    packed = np.empty((n_rows, k // 2), np.int8)
    scales = np.empty((n_rows, g), np.float32)
    bias = np.empty((n_rows, g), np.float32) if is_q41 else None
    lib.lvk_repack_q4_rows(
        raw, n_rows, k, is_q41, packed, scales,
        bias.ctypes.data if is_q41 else None, 0,
    )
    return packed, scales, bias


class NativeTokenizer:
    """Handle to the C++ greedy bigram-merge tokenizer (bit-identical twin of
    llamavk_tpu/tokenizer.py — tests/test_native.py cross-checks)."""

    def __init__(self, lib: ctypes.CDLL, handle: int):
        self._lib = lib
        self._handle = handle

    def encode(self, data: bytes) -> list[int] | None:
        if not data:
            return []
        buf = np.frombuffer(data, np.uint8)
        cap = len(data) + 8
        out = np.empty(cap, np.int32)
        m = self._lib.lvk_tokenize(
            self._handle, buf, len(data), out, cap
        )
        if m < 0:
            return None  # capacity overflow (cannot happen: <= 1 id/byte)
        return out[:m].tolist()

    def __del__(self):
        try:
            if self._handle:
                self._lib.lvk_tokenizer_free(self._handle)
        except Exception:
            pass


def make_tokenizer(texts: list[bytes], scores) -> "NativeTokenizer | None":
    """Build a native tokenizer from vocab pieces + scores, or None."""
    lib = get_lib()
    if lib is None:
        return None
    blob = b"".join(texts) or b"\x00"
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum([len(t) for t in texts], out=offsets[1:])
    handle = lib.lvk_tokenizer_create(
        np.frombuffer(blob, np.uint8), offsets,
        np.ascontiguousarray(scores, np.float32), len(texts),
    )
    if not handle:
        return None
    return NativeTokenizer(lib, handle)
