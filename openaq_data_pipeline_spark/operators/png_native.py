"""Gated ctypes binding of the system libpng16 — EXTERNAL ground
truth for the engine's pure-NumPy PNG codec (r16, VERDICT r15 next
#2: give PNG the cross-validation JPEG has via libjpeg, VP8L via
libwebp and ``.Z`` via gzip).

Binding posture: libpng's classic API has the same setjmp/longjmp
error contract that makes libjpeg unbindable through ctypes (a
returning error callback is undefined behavior —
``jpeg_native.py:1-30`` documents why that forced a compiled C
shim). libpng, however, ships the SIMPLIFIED API (``png_image_*``,
since 1.6): errors are reported through the return value and the
``warning_or_error``/``message`` struct fields, no jump buffer
anywhere — it was designed exactly for safe FFI use, so a direct
ctypes binding is sound here and no shim is needed.

The gate is EMPIRICAL (the ``avif_native`` posture): ``available()``
round-trips a gradient through the library's own encoder and
decoder AND decodes a hand-built depth-2 palette fixture to known
RGB before the binding is trusted; any mismatch closes the gate.
Absent library = the pure-Python codec stands alone, never an
executor ImportError.

Alpha semantics are matched to the engine's documented posture
(alpha DROPPED, not composited): the simplified API composites onto
a background when asked for a no-alpha format, so this binding
always requests RGBA and strips the channel itself.

16-bit files: the simplified API treats 16-bit PNGs as linear light
and would apply an sRGB transfer when downsampling to 8-bit, which
is NOT the pure codec's documented quantization. The binding
therefore reads 16-bit files through the LINEAR (raw 16-bit sample)
format — verified to return exact file samples — and applies the
same rounded ``(v*255 + 32767) // 65535`` quantization as
``multimodal.decode_png``, so the two paths agree byte-exactly.

Bomb cap: dimensions are known after ``png_image_begin_read`` and
checked against ``max_px`` BEFORE the pixel buffer allocates.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_PNG_IMAGE_VERSION = 1
_FORMAT_FLAG_ALPHA = 0x01
_FORMAT_FLAG_COLOR = 0x02
_FORMAT_FLAG_LINEAR = 0x04
_FORMAT_RGB = _FORMAT_FLAG_COLOR
_FORMAT_RGBA = _FORMAT_FLAG_COLOR | _FORMAT_FLAG_ALPHA
_FORMAT_LINEAR_RGBA = (
    _FORMAT_FLAG_COLOR | _FORMAT_FLAG_ALPHA | _FORMAT_FLAG_LINEAR
)


class _PngImage(ctypes.Structure):
    # png.h png_image — a stable public struct (the simplified API's
    # whole design is that this layout is the ABI); version field is
    # checked by the library itself on every call.
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False


def _bind(lib: ctypes.CDLL) -> None:
    lib.png_image_begin_read_from_memory.restype = ctypes.c_int
    lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.png_image_finish_read.restype = ctypes.c_int
    lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.png_image_free.restype = None
    lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
    lib.png_image_write_to_memory.restype = ctypes.c_int
    lib.png_image_write_to_memory.argtypes = [
        ctypes.POINTER(_PngImage), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]


def _selfcheck(lib: ctypes.CDLL) -> bool:
    """Empirical gate: (a) encode→decode a gradient through the
    library's own simplified API round-trips byte-exactly; (b) a
    hand-built depth-2 palette PNG decodes to its known palette RGB
    (proves the struct layout AND the read path on exactly the
    shapes this binding exists to cross-validate)."""
    import struct
    import zlib

    try:
        arr = (
            np.arange(36, dtype=np.uint32).reshape(3, 4, 3) * 7 % 256
        ).astype(np.uint8)
        blob = _encode(lib, arr)
        if not np.array_equal(_decode(lib, blob, max_px=64), arr):
            return False

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(
                    ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
                )
            )

        plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 200, 210, 220])
        fixture = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 2, 3, 0, 0, 0))
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(bytes([0, 0x1B])))
            + chunk(b"IEND", b"")
        )
        want = np.frombuffer(plte, np.uint8).reshape(1, 4, 3)
        return np.array_equal(_decode(lib, fixture, max_px=16), want)
    except (ValueError, OSError):
        return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        name = ctypes.util.find_library("png16") or "libpng16.so.16"
        lib = ctypes.CDLL(name)
        _bind(lib)
        if not _selfcheck(lib):
            raise OSError("libpng simplified-API self-check failed")
        _LIB = lib
    except OSError:
        _LOAD_FAILED = True
    return _LIB


def available() -> bool:
    """True when libpng16 loaded and passed the empirical self-check
    (absent → the pure-Python codec stands alone)."""
    return _load() is not None


def _begin(lib: ctypes.CDLL, content: bytes) -> _PngImage:
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    if not lib.png_image_begin_read_from_memory(
        ctypes.byref(img), content, len(content)
    ):
        raise ValueError(
            f"libpng read failed: {img.message.decode('latin-1')}"
        )
    return img


def _decode(
    lib: ctypes.CDLL, content: bytes, max_px: int | None
) -> np.ndarray:
    if not isinstance(content, bytes):
        content = bytes(content)
    img = _begin(lib, content)
    w, h = int(img.width), int(img.height)
    if max_px is not None and w * h > max_px:
        lib.png_image_free(ctypes.byref(img))
        raise ValueError(f"PNG dimensions {w}x{h} exceed cap {max_px}")
    linear = bool(img.format & _FORMAT_FLAG_LINEAR)
    if linear:
        img.format = _FORMAT_LINEAR_RGBA
        out = np.zeros((h, w, 4), np.uint16)
    else:
        img.format = _FORMAT_RGBA
        out = np.zeros((h, w, 4), np.uint8)
    if not lib.png_image_finish_read(
        ctypes.byref(img), None,
        out.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng decode failed: {img.message.decode('latin-1')}"
        )
    rgb = out[:, :, :3]
    if linear:
        # same rounded quantization as multimodal.decode_png's
        # 16-bit path — byte-exact agreement by construction
        return (
            (rgb.astype(np.uint32) * 255 + 32767) // 65535
        ).astype(np.uint8)
    return rgb.copy()


def decode_png_rgb8(
    content: bytes, max_px: int = 1 << 24
) -> np.ndarray:
    """PNG → (H, W, 3) uint8 RGB through the system libpng (any
    color type / depth / interlace), alpha dropped to match the pure
    codec's posture. ValueError when the gate is closed, the stream
    is corrupt, or dims exceed ``max_px`` (checked before the pixel
    buffer allocates)."""
    lib = _load()
    if lib is None:
        raise ValueError("libpng16 unavailable")
    return _decode(lib, content, max_px)


def decode_png_linear16(content: bytes, max_px: int = 1 << 24) -> np.ndarray:
    """16-bit ground-truth face: raw (H, W, 4) uint16 RGBA samples
    exactly as stored (LINEAR format — no transfer function), for
    tests that validate the pure codec's 16-bit sample recovery."""
    lib = _load()
    if lib is None:
        raise ValueError("libpng16 unavailable")
    if not isinstance(content, bytes):
        content = bytes(content)
    img = _begin(lib, content)
    w, h = int(img.width), int(img.height)
    if w * h > max_px:
        lib.png_image_free(ctypes.byref(img))
        raise ValueError(f"PNG dimensions {w}x{h} exceed cap {max_px}")
    img.format = _FORMAT_LINEAR_RGBA
    out = np.zeros((h, w, 4), np.uint16)
    if not lib.png_image_finish_read(
        ctypes.byref(img), None,
        out.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng decode failed: {img.message.decode('latin-1')}"
        )
    return out


def _encode(lib: ctypes.CDLL, arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode expects (H, W, 3) uint8")
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.width = w
    img.height = h
    img.format = _FORMAT_RGB
    data = np.ascontiguousarray(arr)
    size = ctypes.c_size_t(0)
    # size probe (NULL buffer), then the real write
    if not lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        data.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng size probe failed: {img.message.decode('latin-1')}"
        )
    buf = ctypes.create_string_buffer(size.value)
    if not lib.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0,
        data.ctypes.data_as(ctypes.c_void_p), 0, None,
    ):
        raise ValueError(
            f"libpng encode failed: {img.message.decode('latin-1')}"
        )
    return buf.raw[: size.value]


def encode_png_native(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → PNG via the system libpng — the
    external-encoder face: libpng picks its own adaptive per-row
    filters, so decoding its output exercises filter paths the
    engine's fixed-filter encoder never emits."""
    lib = _load()
    if lib is None:
        raise ValueError("libpng16 unavailable")
    return _encode(lib, arr)
