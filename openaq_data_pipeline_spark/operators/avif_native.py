"""Gated ctypes binding of the system libavif — AVIF pixel decode
(r15, VERDICT r14 next #2: the fastest-growing web image format
graduates from header-only).

Same posture as :mod:`~openaq_data_pipeline_spark.operators
.webp_native`: the engine's own pure-Python plane covers what a
public-spec NumPy implementation can honestly reach (the r14
AVIF/HEIF box walk in ``multimodal.avif_header_stats``); AV1 OBU
entropy decode cannot (no sane pure-NumPy AV1 exists), so it binds
the container's own reference stack (``libavif.so.15`` over dav1d/
aom — public, OS-shipped) behind a load-try gate. Absent library =
the r14 behavior exactly: header-walk dims, NULL pixel stats, never
an executor ImportError.

libavif's struct ABI is version-fragile (the r14 docstring called
this the plug-in risk), so the gate is EMPIRICAL, not
version-string trust: :func:`available` builds an ``avifRGBImage``
against the loaded library and verifies the field offsets this
module compiled in (width/height/depth/format and the
pixels/rowBytes tail) behave as 0.11.x/1.x lay them out — any
mismatch closes the gate and the engine stays on the header walk.

The bomb cap is structural where the library allows and explicit
where it does not: the decoded dimensions are checked against
``max_px`` BEFORE the RGB buffer allocates, so a 1-byte-per-
gigapixel AVIF cannot allocate past the cap.

The encoder face (:func:`encode_avif`) exists for fixture synthesis
and cross-validation only, exactly like ``webp_native``'s.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_RESULT_OK = 0
_PIXEL_FORMAT_YUV444 = 1
_RGB_FORMAT_RGB = 0


class _AvifRGBImage(ctypes.Structure):
    # libavif 0.11.x layout (1.x keeps the same prefix order and adds
    # maxThreads after format in some minors — which is why
    # available() verifies behavior instead of trusting this blindly)
    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("depth", ctypes.c_uint32),
        ("format", ctypes.c_int),
        ("chromaUpsampling", ctypes.c_int),
        ("chromaDownsampling", ctypes.c_int),
        ("avoidLibYUV", ctypes.c_int),
        ("ignoreAlpha", ctypes.c_int),
        ("alphaPremultiplied", ctypes.c_int),
        ("isFloat", ctypes.c_int),
        ("pixels", ctypes.POINTER(ctypes.c_uint8)),
        ("rowBytes", ctypes.c_uint32),
    ]


class _AvifRWData(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_size_t),
    ]


_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False
_ENCODER_OK = False


def _bind(lib: ctypes.CDLL) -> None:
    lib.avifImageCreate.restype = ctypes.c_void_p
    lib.avifImageCreate.argtypes = [ctypes.c_uint32] * 3 + [ctypes.c_int]
    lib.avifImageCreateEmpty.restype = ctypes.c_void_p
    lib.avifImageCreateEmpty.argtypes = []
    lib.avifImageDestroy.restype = None
    lib.avifImageDestroy.argtypes = [ctypes.c_void_p]
    lib.avifRGBImageSetDefaults.restype = None
    lib.avifRGBImageSetDefaults.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    # NOTE: returns avifResult only since libavif 1.0; in 0.11 it is
    # void. Treated as void (never checked) so both ABIs are safe.
    lib.avifRGBImageAllocatePixels.restype = None
    lib.avifRGBImageAllocatePixels.argtypes = [ctypes.c_void_p]
    lib.avifRGBImageFreePixels.restype = None
    lib.avifRGBImageFreePixels.argtypes = [ctypes.c_void_p]
    lib.avifImageRGBToYUV.restype = ctypes.c_int
    lib.avifImageRGBToYUV.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.avifImageYUVToRGB.restype = ctypes.c_int
    lib.avifImageYUVToRGB.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.avifEncoderCreate.restype = ctypes.c_void_p
    lib.avifEncoderCreate.argtypes = []
    lib.avifEncoderDestroy.restype = None
    lib.avifEncoderDestroy.argtypes = [ctypes.c_void_p]
    lib.avifEncoderWrite.restype = ctypes.c_int
    lib.avifEncoderWrite.argtypes = [ctypes.c_void_p] * 3
    lib.avifRWDataFree.restype = None
    lib.avifRWDataFree.argtypes = [ctypes.c_void_p]
    lib.avifDecoderCreate.restype = ctypes.c_void_p
    lib.avifDecoderCreate.argtypes = []
    lib.avifDecoderDestroy.restype = None
    lib.avifDecoderDestroy.argtypes = [ctypes.c_void_p]
    lib.avifDecoderReadMemory.restype = ctypes.c_int
    lib.avifDecoderReadMemory.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.avifResultToString.restype = ctypes.c_char_p
    lib.avifResultToString.argtypes = [ctypes.c_int]


def _selfcheck(lib: ctypes.CDLL) -> bool:
    """Empirical ABI gate: the compiled-in _AvifRGBImage layout must
    match the loaded library's. SetDefaults must land width/height/
    depth/format where this module expects them, and AllocatePixels
    must fill pixels/rowBytes at the expected tail offsets."""
    img = lib.avifImageCreate(3, 2, 8, _PIXEL_FORMAT_YUV444)
    if not img:
        return False
    try:
        rgb = _AvifRGBImage()
        lib.avifRGBImageSetDefaults(ctypes.byref(rgb), img)
        if (rgb.width, rgb.height, rgb.depth) != (3, 2, 8):
            return False
        if not 0 <= rgb.format <= 5:
            return False
        rgb.format = _RGB_FORMAT_RGB
        lib.avifRGBImageAllocatePixels(ctypes.byref(rgb))
        ok = bool(rgb.pixels) and rgb.rowBytes == 3 * 3
        lib.avifRGBImageFreePixels(ctypes.byref(rgb))
        return ok
    finally:
        lib.avifImageDestroy(img)


def _encoder_fingerprint_ok(lib: ctypes.CDLL) -> bool:
    """The encoder face writes one field (speed, i32 index 2), so it
    additionally requires avifEncoderCreate's default head to read
    (codecChoice=0, maxThreads=1, speed=-1, keyframeInterval=0,
    timescale=1) — the 0.11.x fingerprint this module was verified
    against. A different head closes only the ENCODER face; decode
    stays available."""
    enc = lib.avifEncoderCreate()
    if not enc:
        return False
    try:
        head = ctypes.cast(enc, ctypes.POINTER(ctypes.c_int32))[:5]
        return head == [0, 1, -1, 0, 1]
    finally:
        lib.avifEncoderDestroy(enc)


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_FAILED, _ENCODER_OK
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    try:
        name = ctypes.util.find_library("avif") or "libavif.so.15"
        lib = ctypes.CDLL(name)
        _bind(lib)
        if not _selfcheck(lib):
            raise OSError("libavif ABI self-check failed")
        _ENCODER_OK = _encoder_fingerprint_ok(lib)
        _LIB = lib
    except (OSError, AttributeError):
        _LOAD_FAILED = True
    return _LIB


def available() -> bool:
    """True when the system libavif loaded AND passed the empirical
    ABI self-check (the gate every caller must honor: False →
    header-only behavior, never an error)."""
    return _load() is not None


def encoder_available() -> bool:
    """True when, additionally, the encoder-struct fingerprint
    matched (fixture synthesis and cross-validation face)."""
    return _load() is not None and _ENCODER_OK


def decode_avif_native(
    content: bytes, max_px: int = 1 << 24
) -> np.ndarray:
    """AVIF bytes → (H, W, 3) uint8 RGB through the system libavif
    (dav1d). ValueError when the library is unavailable, the stream
    is not a decodable AVIF, or the decoded dimensions exceed
    ``max_px`` (checked BEFORE the RGB buffer allocates — the bomb
    posture of the other native bindings). For image sequences
    (``avis``) this decodes the first frame. 10/12-bit sources are
    depth-converted to 8 by the library."""
    lib = _load()
    if lib is None:
        raise ValueError("libavif unavailable: AVIF is header-only")
    if not isinstance(content, bytes):  # Arrow hands bytearray
        content = bytes(content)
    dec = lib.avifDecoderCreate()
    if not dec:
        raise ValueError("libavif: decoder allocation failed")
    img = lib.avifImageCreateEmpty()
    try:
        res = lib.avifDecoderReadMemory(dec, img, content, len(content))
        if res != _RESULT_OK:
            msg = lib.avifResultToString(res)
            raise ValueError(
                f"libavif decode failed: {msg.decode(errors='replace')}"
            )
        # width/height/depth are the first three u32s of avifImage in
        # every released layout
        w, h, depth = ctypes.cast(
            img, ctypes.POINTER(ctypes.c_uint32)
        )[:3]
        if w == 0 or h == 0:
            raise ValueError("libavif decoded an empty image")
        if int(w) * int(h) > max_px:
            raise ValueError(
                f"AVIF dimensions {w}x{h} exceed the {max_px}-px cap"
            )
        rgb = _AvifRGBImage()
        lib.avifRGBImageSetDefaults(ctypes.byref(rgb), img)
        rgb.format = _RGB_FORMAT_RGB
        rgb.depth = 8
        lib.avifRGBImageAllocatePixels(ctypes.byref(rgb))
        if not rgb.pixels or rgb.rowBytes < w * 3:
            raise ValueError("libavif RGB buffer allocation failed")
        try:
            res = lib.avifImageYUVToRGB(img, ctypes.byref(rgb))
            if res != _RESULT_OK:
                msg = lib.avifResultToString(res)
                raise ValueError(
                    "libavif YUV->RGB failed: "
                    f"{msg.decode(errors='replace')}"
                )
            flat = np.ctypeslib.as_array(
                rgb.pixels, shape=(int(h), int(rgb.rowBytes))
            )
            return (
                flat[:, : int(w) * 3]
                .reshape(int(h), int(w), 3)
                .copy()
            )
        finally:
            lib.avifRGBImageFreePixels(ctypes.byref(rgb))
    finally:
        lib.avifImageDestroy(img)
        lib.avifDecoderDestroy(dec)


def encode_avif(arr: np.ndarray, speed: int = 8) -> bytes:
    """(H, W, 3) uint8 RGB → a real AVIF through the system libavif
    (aom), YUV444 so small fixtures stay chroma-exact-ish. Fixture
    synthesis and cross-validation face; ValueError when the
    library or the verified encoder ABI is unavailable."""
    lib = _load()
    if lib is None or not _ENCODER_OK:
        raise ValueError("libavif encoder unavailable")
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_avif expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    img = lib.avifImageCreate(w, h, 8, _PIXEL_FORMAT_YUV444)
    if not img:
        raise ValueError("libavif: image allocation failed")
    enc = None
    try:
        rgb = _AvifRGBImage()
        lib.avifRGBImageSetDefaults(ctypes.byref(rgb), img)
        rgb.format = _RGB_FORMAT_RGB
        buf = np.ascontiguousarray(arr)
        rgb.pixels = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rgb.rowBytes = w * 3
        res = lib.avifImageRGBToYUV(img, ctypes.byref(rgb))
        if res != _RESULT_OK:
            raise ValueError("libavif RGB->YUV failed")
        enc = lib.avifEncoderCreate()
        if not enc:
            raise ValueError("libavif: encoder allocation failed")
        # speed is i32 index 2 — guaranteed by _encoder_fingerprint_ok
        ctypes.cast(enc, ctypes.POINTER(ctypes.c_int32))[2] = speed
        out = _AvifRWData()
        res = lib.avifEncoderWrite(enc, img, ctypes.byref(out))
        if res != _RESULT_OK:
            msg = lib.avifResultToString(res)
            raise ValueError(
                f"libavif encode failed: {msg.decode(errors='replace')}"
            )
        try:
            return ctypes.string_at(out.data, out.size)
        finally:
            lib.avifRWDataFree(ctypes.byref(out))
    finally:
        if enc:
            lib.avifEncoderDestroy(enc)
        lib.avifImageDestroy(img)
