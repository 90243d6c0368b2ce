"""Gated ctypes binding of the system libtiff — EXTERNAL ground
truth for the engine's pure-NumPy TIFF codec (r16, VERDICT r15 next
#4: JPEG has libjpeg agreement, VP8L has libwebp, PNG gained libpng
this round; TIFF's LZW/Deflate/PackBits/predictor paths were pinned
only by matched-pair round-trips, the mirrored-bug risk).

Binding posture: libtiff's error hooks are plain callbacks that may
RETURN (no setjmp/longjmp contract — unlike libjpeg), and passing
NULL to ``TIFFSetErrorHandler``/``TIFFSetWarningHandler`` silences
them while errors surface through return codes, so a direct ctypes
binding is sound. ``TIFFGetField`` is varargs — the fixed prefix is
declared in ``argtypes`` and out-params pass as ``byref`` (the
64-bit ABI passes them correctly; a missing declaration truncates
the handle and crashes, which is why the prefix MUST be typed).

Input goes through a private ``mkstemp`` file (0600, O_EXCL —
``TIFFClientOpen``'s six callback thunks buy nothing for a
ground-truth face). Decode uses ``TIFFReadRGBAImageOriented`` with
ORIENTATION_TOPLEFT and ``stopOnError=1`` — the library's own
any-layout path (it applies photometric interpretation, which is
how it caught the engine's fixtures omitting the REQUIRED tag 262
and reading as greyscale; see ``encode_tiff_rgb``'s r16 note).

The gate is EMPIRICAL (the ``avif_native`` posture): an
engine-encoded LZW+predictor fixture must decode to exact known
pixels before the binding is trusted. The pixel cap is checked
against the IFD dimensions BEFORE the RGBA buffer allocates.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

_TAG_IMAGEWIDTH = 256
_TAG_IMAGELENGTH = 257
_ORIENTATION_TOPLEFT = 1

_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False


def _bind(lib: ctypes.CDLL) -> None:
    lib.TIFFSetErrorHandler.restype = ctypes.c_void_p
    lib.TIFFSetErrorHandler.argtypes = [ctypes.c_void_p]
    lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
    lib.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFClose.restype = None
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFGetField.restype = ctypes.c_int
    lib.TIFFGetField.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    # silence stderr chatter; errors still surface via return codes
    lib.TIFFSetErrorHandler(None)
    lib.TIFFSetWarningHandler(None)


def _selfcheck(lib: ctypes.CDLL) -> bool:
    from openaq_data_pipeline_spark.operators.multimodal import (
        encode_tiff_rgb,
    )

    try:
        img = np.arange(36, dtype=np.uint32).reshape(3, 4, 3)
        img = (img * 7 % 256).astype(np.uint8)
        blob = encode_tiff_rgb(img, lzw=True, predictor=True)
        return np.array_equal(_decode(lib, blob, max_px=64), img)
    except (ValueError, OSError):
        return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        name = ctypes.util.find_library("tiff") or "libtiff.so.6"
        lib = ctypes.CDLL(name)
        _bind(lib)
        if not _selfcheck(lib):
            raise OSError("libtiff decode self-check failed")
        _LIB = lib
    except OSError:
        _LOAD_FAILED = True
    return _LIB


def available() -> bool:
    """True when libtiff loaded and round-tripped the empirical
    fixture (absent → the pure codec stands alone, cross-validation
    tests skip)."""
    return _load() is not None


def _decode(lib: ctypes.CDLL, content: bytes, max_px: int) -> np.ndarray:
    if not isinstance(content, bytes):
        content = bytes(content)
    fd, path = tempfile.mkstemp(suffix=".tif")
    try:
        os.write(fd, content)
        os.close(fd)
        tif = lib.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise ValueError("libtiff could not parse the stream")
        try:
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            if not (
                lib.TIFFGetField(tif, _TAG_IMAGEWIDTH, ctypes.byref(w))
                and lib.TIFFGetField(
                    tif, _TAG_IMAGELENGTH, ctypes.byref(h)
                )
            ):
                raise ValueError("libtiff: TIFF lacks dimensions")
            if w.value * h.value > max_px:
                raise ValueError(
                    f"TIFF dimensions {w.value}x{h.value} exceed "
                    f"cap {max_px}"
                )
            buf = np.zeros((h.value, w.value), np.uint32)
            if not lib.TIFFReadRGBAImageOriented(
                tif, w.value, h.value,
                buf.ctypes.data_as(ctypes.c_void_p),
                _ORIENTATION_TOPLEFT, 1,
            ):
                raise ValueError("libtiff decode failed")
        finally:
            lib.TIFFClose(tif)
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
    # packed ABGR words; little-endian byte view = R,G,B,A
    rgba = buf.view(np.uint8).reshape(h.value, w.value, 4)
    return rgba[:, :, :3].copy()


def decode_tiff_rgb_native(
    content: bytes, max_px: int = 1 << 24
) -> np.ndarray:
    """TIFF → (H, W, 3) uint8 RGB through the system libtiff (any
    compression/layout the library supports, alpha dropped).
    ValueError when the gate is closed, the stream is corrupt, or
    dims exceed ``max_px`` (checked before the RGBA buffer
    allocates)."""
    lib = _load()
    if lib is None:
        raise ValueError("libtiff unavailable")
    return _decode(lib, content, max_px)
