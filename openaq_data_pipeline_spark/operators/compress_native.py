"""Gated ctypes bindings of the system brotli/zstd decoders — the
HTTP ``Content-Encoding`` tokens stdlib zlib cannot serve.

Same posture as :mod:`~openaq_data_pipeline_spark.operators
.webp_native`: the engine decodes what it can in
stdlib/pure-Python (gzip/deflate framings via zlib), and binds the
container's own reference libraries (``libbrotlidec.so.1``,
``libzstd.so.1`` — public, OS-shipped) behind load-try gates for
the rest. When a library is absent, the affected token degrades to
exactly the r13 behavior: an OBSERVABLE discard with the hint
intact, never an import error in an executor.

The bomb cap is structural, not advisory: brotli always streams
(BrotliDecoderDecompressStream, 64 KiB windows, no-progress guard);
zstd one-shots into an exactly-declared buffer when the frame
declares its content size under the cap (the declaration is
UNTRUSTED — the library errors past it) and streams 64 KiB windows
otherwise (ZSTD_decompressStream) — so a decompression bomb can
never allocate past the cap, and a corrupt row costs one window,
matching the zlib hop's ``max_bytes`` contract. The encoder faces
exist for fixture synthesis only.
"""

from __future__ import annotations

import ctypes
import ctypes.util


def _load(names: tuple[str, ...]) -> ctypes.CDLL | None:
    for name in names:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


class _ZstdInBuffer(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


class _ZstdOutBuffer(ctypes.Structure):
    _fields_ = [
        ("dst", ctypes.c_void_p),
        ("size", ctypes.c_size_t),
        ("pos", ctypes.c_size_t),
    ]


_BROTLI_DEC: ctypes.CDLL | None | bool = False  # False = not probed yet
_BROTLI_ENC: ctypes.CDLL | None | bool = False
_ZSTD: ctypes.CDLL | None | bool = False


def _brotli_dec() -> ctypes.CDLL | None:
    global _BROTLI_DEC
    if _BROTLI_DEC is False:
        lib = _load(
            (ctypes.util.find_library("brotlidec") or "libbrotlidec.so.1",
             "libbrotlidec.so.1")
        )
        if lib is not None:
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.BrotliDecoderDestroyInstance.restype = None
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t),
            ]
        _BROTLI_DEC = lib
    return _BROTLI_DEC


def _brotli_enc() -> ctypes.CDLL | None:
    global _BROTLI_ENC
    if _BROTLI_ENC is False:
        lib = _load(
            (ctypes.util.find_library("brotlienc") or "libbrotlienc.so.1",
             "libbrotlienc.so.1")
        )
        if lib is not None:
            lib.BrotliEncoderCompress.restype = ctypes.c_int
            lib.BrotliEncoderCompress.argtypes = [
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_char_p,
            ]
        _BROTLI_ENC = lib
    return _BROTLI_ENC


def _zstd() -> ctypes.CDLL | None:
    global _ZSTD
    if _ZSTD is False:
        lib = _load(
            (ctypes.util.find_library("zstd") or "libzstd.so.1",
             "libzstd.so.1")
        )
        if lib is not None:
            lib.ZSTD_decompress.restype = ctypes.c_size_t
            lib.ZSTD_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.ZSTD_createDStream.restype = ctypes.c_void_p
            lib.ZSTD_createDStream.argtypes = []
            lib.ZSTD_freeDStream.restype = ctypes.c_size_t
            lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
            lib.ZSTD_decompressStream.restype = ctypes.c_size_t
            lib.ZSTD_decompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(_ZstdOutBuffer),
                ctypes.POINTER(_ZstdInBuffer),
            ]
            lib.ZSTD_isError.restype = ctypes.c_uint
            lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compressBound.restype = ctypes.c_size_t
            lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
            lib.ZSTD_compress.restype = ctypes.c_size_t
            lib.ZSTD_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ]
        _ZSTD = lib
    return _ZSTD


def brotli_available() -> bool:
    return _brotli_dec() is not None


def zstd_available() -> bool:
    return _zstd() is not None


_BROTLI_CHUNK = 1 << 16  # 64 KiB streaming output window


def brotli_decompress_capped(blob: bytes, max_bytes: int) -> bytes | None:
    """One bomb-capped brotli decode; None on corrupt stream,
    output-cap overflow, or an unavailable library (the hop's
    observable-discard contract).

    Brotli frames carry no decoded-size field, so the STREAMING API
    drives this (BrotliDecoderDecompressStream): output accumulates
    in 64 KiB windows until SUCCESS, the cap, or an error. Unlike
    the one-shot call — which collapses needs-more-output into the
    same failure as corruption and so forced a cap-sized retry —
    the stream distinguishes them, so a corrupt row fails in
    microseconds with a 64 KiB allocation instead of a 64 MiB one
    (measured 37 ms/row → <0.1 ms on a corrupt-heavy feed: a
    hostile batch can no longer buy CPU with garbage bytes)."""
    lib = _brotli_dec()
    if lib is None or not blob:
        return None
    if not isinstance(blob, bytes):  # Arrow hands bytearray/memoryview
        blob = bytes(blob)
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        return None
    try:
        in_buf = ctypes.create_string_buffer(blob, len(blob))
        avail_in = ctypes.c_size_t(len(blob))
        next_in = ctypes.c_void_p(ctypes.addressof(in_buf))
        chunk = ctypes.create_string_buffer(_BROTLI_CHUNK)
        out_parts: list[bytes] = []
        total = 0
        while True:
            avail_out = ctypes.c_size_t(_BROTLI_CHUNK)
            next_out = ctypes.c_void_p(ctypes.addressof(chunk))
            total_out = ctypes.c_size_t(0)
            res = lib.BrotliDecoderDecompressStream(
                state,
                ctypes.byref(avail_in),
                ctypes.byref(next_in),
                ctypes.byref(avail_out),
                ctypes.byref(next_out),
                ctypes.byref(total_out),
            )
            produced = _BROTLI_CHUNK - avail_out.value
            if produced:
                total += produced
                if total > max_bytes:
                    return None  # bomb: over the cap, stop paying
                out_parts.append(chunk.raw[:produced])
            if res == 1:  # SUCCESS
                return b"".join(out_parts)
            if res == 3:  # NEEDS_MORE_OUTPUT
                if produced == 0:
                    return None  # no progress: refuse, never spin
                continue
            return None  # ERROR, or NEEDS_MORE_INPUT on exhausted input
    finally:
        lib.BrotliDecoderDestroyInstance(state)


def zstd_decompress_capped(blob: bytes, max_bytes: int) -> bytes | None:
    """One bomb-capped zstd decode; None on corrupt/oversized/
    unavailable. The frame's declared content size picks the exact
    one-shot buffer when present and under the cap (the declaration
    is UNTRUSTED — the library errors if actual output exceeds it);
    unknown-size frames take ZSTD_decompressStream with 64 KiB
    windows, mirroring the brotli path (ADVICE r14): a corrupt or
    hostile unknown-size frame fails in microseconds with a 64 KiB
    allocation instead of a cap-sized retry."""
    lib = _zstd()
    if lib is None or not blob:
        return None
    if not isinstance(blob, bytes):  # Arrow hands bytearray/memoryview
        blob = bytes(blob)
    try:
        lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        lib.ZSTD_getFrameContentSize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        declared = int(lib.ZSTD_getFrameContentSize(blob, len(blob)))
        # (2**64-1) = unknown, (2**64-2) = error
        if declared >= (1 << 64) - 2:
            declared = None
    except AttributeError:
        declared = None
    if declared is not None:
        if declared > max_bytes:
            return None  # declared bomb: refuse before allocating
        buf = ctypes.create_string_buffer(declared or 1)
        n = lib.ZSTD_decompress(buf, declared, blob, len(blob))
        if lib.ZSTD_isError(n):
            return None
        return buf.raw[:n]
    # unknown declared size: stream in 64 KiB output windows so the
    # per-corrupt-row cost is a window, never a cap-sized buffer
    zds = lib.ZSTD_createDStream()
    if not zds:
        return None
    try:
        in_buf = ctypes.create_string_buffer(blob, len(blob))
        src = _ZstdInBuffer(
            ctypes.addressof(in_buf), len(blob), 0
        )
        chunk = ctypes.create_string_buffer(_BROTLI_CHUNK)
        out_parts: list[bytes] = []
        total = 0
        while True:
            dst = _ZstdOutBuffer(
                ctypes.addressof(chunk), _BROTLI_CHUNK, 0
            )
            hint = lib.ZSTD_decompressStream(
                zds, ctypes.byref(dst), ctypes.byref(src)
            )
            if lib.ZSTD_isError(hint):
                return None
            if dst.pos:
                total += dst.pos
                if total > max_bytes:
                    return None  # bomb: over the cap, stop paying
                out_parts.append(chunk.raw[: dst.pos])
            if hint == 0:  # frame complete
                return b"".join(out_parts)
            if dst.pos == 0 and src.pos >= src.size:
                return None  # wants more input we don't have
    finally:
        lib.ZSTD_freeDStream(zds)


def brotli_compress(blob: bytes, quality: int = 5) -> bytes:
    """Fixture-synthesis encoder face; ValueError when
    libbrotlienc is unavailable."""
    lib = _brotli_enc()
    if lib is None:
        raise ValueError("libbrotlienc unavailable")
    cap = len(blob) + 1024
    buf = ctypes.create_string_buffer(cap)
    out_size = ctypes.c_size_t(cap)
    ok = lib.BrotliEncoderCompress(
        quality, 22, 0, len(blob), blob, ctypes.byref(out_size), buf
    )
    if ok != 1:
        raise ValueError("brotli encode failed")
    return buf.raw[: out_size.value]


def zstd_compress(blob: bytes, level: int = 3) -> bytes:
    """Fixture-synthesis encoder face; ValueError when libzstd is
    unavailable."""
    lib = _zstd()
    if lib is None:
        raise ValueError("libzstd unavailable")
    cap = int(lib.ZSTD_compressBound(len(blob)))
    buf = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(buf, cap, blob, len(blob), level)
    if lib.ZSTD_isError(n):
        raise ValueError("zstd encode failed")
    return buf.raw[:n]
