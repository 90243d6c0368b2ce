"""VP8L (WebP lossless) pixel codec — pure-Python subset (r13).

Public-knowledge format (RFC 9649 "WebP Image Format", §3 "Lossless
Bitstream Specification"; originally the libwebp VP8L spec). This
module gives the image plane a REAL pixel path for the web's most
common remaining image type beyond the r13 header walk
(``multimodal.webp_header_stats``): a matched encoder/decoder pair
over the spec's core coding layer —

- LSB-first bit I/O; canonical prefix (Huffman) codes read MSB-of-
  code-first (the DEFLATE convention the spec shares);
- both "simple" (1-2 symbol) and normal code-length-coded prefix
  codes, including the 16/17/18 repeat codes and the optional
  max_symbol short-circuit;
- the five-code group (green+length+cache / red / blue / alpha /
  distance), LZ77 backward references with the 120-entry 2D
  distance neighborhood, and the (0x1e35a7bd·c) >> (32-bits) color
  cache;
- the SUBTRACT_GREEN transform (inverse on decode);
- the COLOR_INDEXING transform (r13 second pass): delta-coded
  palette aux image + pixel bundling (≤16-color images pack several
  indices per green byte) — the icon/logo shape real webps use;
- meta prefix codes (r13 third pass): the tile entropy image
  assigns each ``2^bits`` tile its own five-code group via
  ``(red << 8) | green``;
- the PREDICTOR transform (r14, VERDICT r13 missing #3): all 14
  spatial predictor modes of RFC 9649 §4.1 with the spec's edge
  rules — (0,0) predicts opaque black, top row predicts L, left
  column predicts T, the rightmost column's TR-pixel is the current
  row's leftmost reconstructed pixel — per-tile modes via the tile
  entropy image's green channel. This moves most photographic VP8L
  streams from header-only to pixel decode;
- the COLOR_TRANSFORM transform (r14): per-tile signed
  cross-channel multipliers (§4.2 — blue=green_to_red,
  green=green_to_blue, red=red_to_blue packed in the tile pixel;
  delta = (int8 t * int8 c) >> 5 arithmetic), red inverted before
  blue so blue's red-term uses the reconstructed red. ALL FOUR spec
  transforms now decode.

Documented subset boundaries (a wild VP8L may use these; they
degrade to the header-only stats row, never a stage failure,
because the lenient image plane keys on ValueError):

- the encoder emits literals + optional subtract-green / palette
  only (no LZ77 search, no cache) — fixture-grade compression,
  spec-grade bitstream, exercising the decoder's full literal/
  prefix-code path. Decoder-only features (cache, LZ77) are pinned
  by hand-built streams in tests.

The container face (RIFF/WEBP wrapping, VP8/VP8X headers) stays in
``operators.multimodal``; this module is the VP8L payload only.
"""

from __future__ import annotations

import struct

import numpy as np

# spec: order in which code-length-code lengths are stored
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_GREEN_ALPHABET = 256 + 24  # literals + length prefix codes (no cache)
_DIST_ALPHABET = 40
_CACHE_MUL = 0x1E35A7BD

# spec: the first 120 distance codes map to a 2D pixel neighborhood
# (dx in -8..7, dy in 0..7 ordered by (y, |x|) closeness)
_DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _BitReader:
    """LSB-first bit reader over a bytes buffer (spec §3.2)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("VP8L stream truncated")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    """LSB-first bit writer (the encoder face of :class:`_BitReader`)."""

    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are emitted MSB-of-code-first (the walk-from-
        the-root order the decoder consumes)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment: codes ordered by
    (length, symbol), numerically increasing — the DEFLATE/VP8L rule."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixDecoder:
    """Bit-at-a-time canonical prefix decoder (walk from the root).

    Multi-symbol codes are validated for Kraft COMPLETENESS (ADVICE
    r13: over-subscribed or incomplete code-length sets from
    malformed wild streams would otherwise decode silently to wrong
    symbols — e.g. lengths [1,1,1] alias symbol 2 onto symbol 1 —
    and garbage pixels would flow into the lenient image plane's
    stats undetected). libwebp requires a complete tree the same
    way; the single-symbol case is the spec's zero-bit exception."""

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits per symbol
            self.single = nz[0][1]
            self.table = {}
            return
        self.single = None
        if nz and sum(1 << (15 - ln) for ln, _ in nz) != 1 << 15:
            raise ValueError("VP8L: prefix code lengths not Kraft-complete")
        self.table = {
            (code, ln): sym
            for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        if not self.table:
            raise ValueError("VP8L: empty prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while ln <= 15:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((code, ln))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    """One prefix code, simple or code-length-coded (spec §3.5.2)."""
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # decoder treats as zero-bit single
            dec = _PrefixDecoder(lengths)
            dec.single = sym0
            dec.table = {}
            return dec
        sym1 = br.read(8)
        if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
            raise ValueError("VP8L: bad simple prefix code symbols")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixDecoder(lengths)
    # normal: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixDecoder(clc_lengths)
    # optional cap on coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s != 0:
                prev_len = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if i >= alphabet_size:
                    raise ValueError("VP8L: repeat overruns alphabet")
                lengths[i] = prev_len
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("VP8L: code lengths overrun alphabet")
    return _PrefixDecoder(lengths)


def _i8(arr: np.ndarray) -> np.ndarray:
    """Reinterpret a 0..255 channel as int8 (RFC 9649 §4.2: the
    color-transform multipliers AND the channel values they scale
    are signed bytes)."""
    return arr.astype(np.uint8).astype(np.int8).astype(np.int32)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta(int8 t, int8 c) = (t * c) >> 5 — the
    arithmetic (floor) shift the spec's C pseudocode relies on;
    NumPy's >> on signed ints is arithmetic too."""
    return (_i8(t) * _i8(c)) >> 5


def _tile_index_grid(
    h: int, w: int, size_bits: int, tiles_w: int
) -> np.ndarray:
    """Flat (h*w,) array mapping each pixel to its tile's index —
    shared by the color-transform inverse/forward (the predictor
    walks sequentially and indexes inline)."""
    ys = (np.arange(h) >> size_bits)[:, None]
    xs = (np.arange(w) >> size_bits)[None, :]
    return (ys * tiles_w + xs).reshape(-1)


def _avg2(a, b):
    """Per-channel Average2 (RFC 9649 §4.1): (a + b) >> 1."""
    return (a + b) >> 1


def _predict_px(mode: int, L, T, TL, TR):
    """One predicted ARGB pixel (RFC 9649 §4.1 modes 0-13). Inputs
    and output are length-4 int arrays in (a, r, g, b) order."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int64)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        # Select: per-channel estimate p = L + T - TL; return the
        # neighbor with the smaller Manhattan distance to p (L on
        # ties-broken-strictly: pL < pT chooses L, else T)
        p = L + T - TL
        pL = int(np.abs(p - L).sum())
        pT = int(np.abs(p - T).sum())
        return L if pL < pT else T
    if mode == 12:
        # ClampAddSubtractFull: clamp(L + T - TL) per channel
        return np.clip(L + T - TL, 0, 255)
    # mode 13 — ClampAddSubtractHalf: a = Average2(L, T); per channel
    # clamp(a + (a - TL) / 2) with C truncation toward zero
    a = _avg2(L, T)
    d = a - TL
    half = np.sign(d) * (np.abs(d) >> 1)
    return np.clip(a + half, 0, 255)


def _inverse_predictor(
    a: np.ndarray,
    r: np.ndarray,
    g: np.ndarray,
    b: np.ndarray,
    h: int,
    w: int,
    modes: np.ndarray,
    size_bits: int,
    tiles_w: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of the PREDICTOR transform: scan-order reconstruction
    pixel = (residual + predict(neighbors)) mod 256 per channel, with
    the spec's edge rules — (0,0) predicts opaque black, the rest of
    the top row predicts L, the left column predicts T, and the
    rightmost column's TR-pixel is the CURRENT row's leftmost
    (already reconstructed) pixel. Sequential by construction (each
    pixel needs its reconstructed neighbors); images on this path are
    fixture/web-thumbnail sized."""
    res = np.stack([a, r, g, b], axis=-1).astype(np.int64).reshape(h, w, 4)
    out = np.zeros((h, w, 4), dtype=np.int64)
    for y in range(h):
        ty = (y >> size_bits) * tiles_w
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[ty + (x >> size_bits)])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict_px(mode, L, T, TL, TR)
            out[y, x] = (res[y, x] + pred) & 0xFF
    flat = out.reshape(-1, 4).astype(np.uint16)
    return flat[:, 0], flat[:, 1], flat[:, 2], flat[:, 3]


def _forward_predictor(
    px: np.ndarray, h: int, w: int, mode: int
) -> np.ndarray:
    """Forward face of :func:`_inverse_predictor` for the encoder
    (uniform ``mode`` across all tiles): residual = (pixel -
    predict(true neighbors)) mod 256 per channel — prediction from
    the ORIGINAL pixels, which equal the decoder's reconstruction
    exactly because the transform is lossless. ``px`` is (h, w, 4)
    int64 in (a, r, g, b) order."""
    res = np.zeros_like(px)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pred = _predict_px(mode, L, T, TL, TR)
            res[y, x] = (px[y, x] - pred) & 0xFF
    return res


def _prefix_value(br: _BitReader, prefix: int) -> int:
    """LZ77 length/distance prefix decoding (spec §3.6.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _palette_width_bits(n_colors: int) -> int:
    """Pixel-bundling width for COLOR_INDEXING (spec §3.4.4): tiny
    palettes pack several indices into one green byte."""
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """One spatially-coded (entropy) image → flat uint32 ARGB array
    of length w*h. Auxiliary images (palettes, meta-prefix entropy
    images) call this with ``is_level0=False``: per spec they carry
    no meta-prefix bit of their own.

    Meta prefix codes (r13 third pass): with the meta bit set, a
    small entropy sub-image assigns each ``2^bits``-sized tile a
    prefix-code GROUP via ``(red << 8) | green``; the pixel loop
    picks its five codes by the current pixel's tile. One shared
    color cache per image (spec), groups share it."""
    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    # meta prefix codes: level-0 images only
    meta_idx = None
    meta_bits = 0
    meta_w = 1
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, meta_w, meta_h, False)
        meta_idx = (
            ((meta_px >> 16) & 0xFF) << 8 | ((meta_px >> 8) & 0xFF)
        ).astype(np.int64)
        n_groups = int(meta_idx.max()) + 1
    green_alpha = _GREEN_ALPHABET + ((1 << cache_bits) if cache_bits else 0)
    groups = [
        (
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, _DIST_ALPHABET),
        )
        for _ in range(n_groups)
    ]
    n = w * h
    argb = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta_idx is None:
            c_green, c_red, c_blue, c_alpha, c_dist = groups[0]
        else:
            x, y = pos % w, pos // w
            tile = (y >> meta_bits) * meta_w + (x >> meta_bits)
            c_green, c_red, c_blue, c_alpha, c_dist = groups[
                int(meta_idx[tile])
            ]
        s = c_green.read(br)
        if s < 256:
            g = s
            r = c_red.read(br)
            b = c_blue.read(br)
            a = c_alpha.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            argb[pos] = px
            pos += 1
        elif s < _GREEN_ALPHABET:
            length = _prefix_value(br, s - 256)
            dist_code = _prefix_value(br, c_dist.read(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for i in range(length):
                argb[pos + i] = argb[pos + i - dist]
            if cache is not None:
                for i in range(pos, pos + length):
                    cache[
                        (_CACHE_MUL * int(argb[i]) & 0xFFFFFFFF)
                        >> (32 - cache_bits)
                    ] = int(argb[i])
            pos += length
            continue
        else:
            if cache is None:
                raise ValueError("VP8L: cache code without a cache")
            px = cache[s - _GREEN_ALPHABET]
            argb[pos] = px
            pos += 1
        if cache is not None:
            cache[
                (_CACHE_MUL * int(px) & 0xFFFFFFFF) >> (32 - cache_bits)
            ] = int(px)
    return argb


def decode_vp8l_payload(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (H, W, 4) uint8 RGBA (spec subset — see
    module docstring). ValueError on anything outside the subset or
    malformed."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    br = _BitReader(payload)
    br.pos = 8
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")
    # transforms (level-0 stream); inverses apply in REVERSE read
    # order. All four RFC 9649 transforms decode: PREDICTOR (0),
    # COLOR_TRANSFORM (1), SUBTRACT_GREEN (2), COLOR_INDEXING (3,
    # incl. pixel bundling). The spec allows each
    # transform type AT MOST ONCE — a spec-violating duplicate would
    # silently invert with the wrong width assumptions, so it raises
    # instead (ADVICE r13).
    transforms: list[tuple] = []
    seen_ttypes: set[int] = set()
    dec_w = w  # palette bundling shrinks the coded width
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen_ttypes:
            raise ValueError(
                f"VP8L: transform {ttype} appears twice (spec allows "
                "each transform at most once)"
            )
        seen_ttypes.add(ttype)
        if ttype == 0:
            # PREDICTOR (r14, RFC 9649 §4.1): a tile entropy image
            # assigns each 2^bits tile one of 14 spatial predictors
            # via its green channel; the recorded width is the width
            # ACTIVE at read time (a palette read after this one
            # bundles only the transforms that follow it).
            size_bits = br.read(3) + 2
            tiles_w = (dec_w + (1 << size_bits) - 1) >> size_bits
            tiles_h = (h + (1 << size_bits) - 1) >> size_bits
            tile_px = _decode_entropy_image(br, tiles_w, tiles_h, False)
            modes = ((tile_px >> 8) & 0xFF).astype(np.int64)
            if modes.size and int(modes.max()) > 13:
                raise ValueError("VP8L: predictor mode > 13")
            transforms.append(
                ("predictor", modes, size_bits, tiles_w, dec_w)
            )
        elif ttype == 1:
            # COLOR_TRANSFORM (r14, RFC 9649 §4.2 — the last VP8L
            # transform): a tile entropy image carries per-tile
            # signed cross-channel multipliers packed as a pixel
            # (blue=green_to_red, green=green_to_blue,
            # red=red_to_blue)
            size_bits = br.read(3) + 2
            tiles_w = (dec_w + (1 << size_bits) - 1) >> size_bits
            tiles_h = (h + (1 << size_bits) - 1) >> size_bits
            cte_px = _decode_entropy_image(br, tiles_w, tiles_h, False)
            transforms.append(
                ("colortx", cte_px, size_bits, tiles_w, dec_w)
            )
        elif ttype == 2:
            transforms.append(("subgreen",))
        elif ttype == 3:
            n_colors = br.read(8) + 1
            pal_argb = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are component-wise delta-coded
            pal = np.zeros((n_colors, 4), dtype=np.uint16)
            prev = np.zeros(4, dtype=np.uint16)
            for i in range(n_colors):
                v = int(pal_argb[i])
                cur = np.array(
                    [
                        (v >> 24) & 0xFF, (v >> 16) & 0xFF,
                        (v >> 8) & 0xFF, v & 0xFF,
                    ],
                    dtype=np.uint16,
                )
                prev = (prev + cur) & 0xFF
                pal[i] = prev
            wb = _palette_width_bits(n_colors)
            transforms.append(("palette", pal.astype(np.uint8), wb))
            dec_w = (dec_w + (1 << wb) - 1) >> wb
    argb = _decode_entropy_image(br, dec_w, h, True)
    a = ((argb >> 24) & 0xFF).astype(np.uint16)
    r = ((argb >> 16) & 0xFF).astype(np.uint16)
    g = ((argb >> 8) & 0xFF).astype(np.uint16)
    b = (argb & 0xFF).astype(np.uint16)
    cur_w = dec_w
    for t in reversed(transforms):
        if t[0] == "subgreen":
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        elif t[0] == "predictor":
            _, modes, size_bits, tiles_w, pred_w = t
            if pred_w != cur_w:
                # can only happen on a spec-violating stream (the
                # width at read time is the width at inverse time by
                # the reverse-order contract)
                raise ValueError("VP8L: predictor width mismatch")
            a, r, g, b = _inverse_predictor(
                a, r, g, b, h, cur_w, modes, size_bits, tiles_w
            )
        elif t[0] == "colortx":
            _, cte_px, size_bits, tiles_w, ct_w = t
            if ct_w != cur_w:
                raise ValueError("VP8L: color transform width mismatch")
            tile = _tile_index_grid(h, cur_w, size_bits, tiles_w)
            g2r = (cte_px & 0xFF)[tile]
            g2b = ((cte_px >> 8) & 0xFF)[tile]
            r2b = ((cte_px >> 16) & 0xFF)[tile]
            # inverse order matters: red first, then blue uses the
            # RECONSTRUCTED red (spec §4.2 inverse pseudocode)
            r = (r.astype(np.int32) + _ct_delta(g2r, g)) & 0xFF
            b = (
                b.astype(np.int32)
                + _ct_delta(g2b, g)
                + _ct_delta(r2b, r)
            ) & 0xFF
            r = r.astype(np.uint16)
            b = b.astype(np.uint16)
        else:  # palette: unbundle green indices, look up ARGB
            _, pal, wb = t
            packed = g.reshape(h, cur_w)
            full_w = w  # palette is always outermost in our subset
            xs = np.arange(full_w)
            per = 1 << wb
            ibits = 8 >> wb
            idx = (
                packed[:, xs // per] >> ((xs % per) * ibits)
            ) & ((1 << ibits) - 1)
            idx = np.minimum(idx, len(pal) - 1)
            apx = pal[idx]  # (h, full_w, 4) in ARGB order
            a = apx[:, :, 0].astype(np.uint16).reshape(-1)
            r = apx[:, :, 1].astype(np.uint16).reshape(-1)
            g = apx[:, :, 2].astype(np.uint16).reshape(-1)
            b = apx[:, :, 3].astype(np.uint16).reshape(-1)
            cur_w = full_w
    out = np.stack([r, g, b, a], axis=-1).astype(np.uint8)
    return out.reshape(h, w, 4)


def decode_webp_lossless(content: bytes) -> np.ndarray:
    """RIFF/WEBP container with a VP8L chunk → (H, W, 3) uint8 RGB
    (alpha dropped — the image plane's other decoders are RGB; use
    :func:`decode_vp8l_payload` for RGBA). ValueError outside the
    subset."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    if content[12:16] != b"VP8L":
        raise ValueError("not a lossless (VP8L) WebP")
    (size,) = struct.unpack_from("<I", content, 16)
    rgba = decode_vp8l_payload(content[20 : 20 + size])
    return rgba[:, :, :3].copy()


def _write_prefix_code(
    bw: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple when ≤2 symbols, else the full
    code-length-coded path with all 19 CLC slots as plain 3-bit
    fields) and return the symbol->(code, length) map for the data
    pass."""
    nz = [sym for sym, ln in enumerate(lengths) if ln > 0]
    if len(nz) == 0:
        raise ValueError("prefix code needs at least one symbol")
    if len(nz) <= 2 and max(nz) <= 255:  # simple codes cap at 8-bit syms
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        sym0 = nz[0]
        if sym0 > 1:
            bw.write(1, 1)
            bw.write(sym0, 8)
        else:
            bw.write(0, 1)
            bw.write(sym0, 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}  # zero-bit single symbol
    # normal path: CLC lengths for symbols 0..15 only (no repeats
    # used), emitted as all 19 3-bit fields in spec order
    clc_freq = [0] * 19
    for ln in lengths:
        clc_freq[ln] += 1
    clc_lengths = _limited_lengths(clc_freq, 7)
    if sum(1 for ln in clc_lengths if ln > 0) == 1:
        # ADVICE r13 (medium): every alphabet symbol shares ONE code
        # length and none is zero (e.g. a channel using all 256
        # values gives uniform length 8) — the CLC degenerates to a
        # single symbol, which the decoder reads with ZERO bits while
        # a 1-bit code would desync the stream (and an emitted
        # single-length CLC is an incomplete code strict decoders
        # reject). Pad with a dummy length-1 code on CLC symbol 0
        # (the only symbol guaranteed absent here): both sides then
        # agree on one bit per coded length and the CLC is
        # Kraft-complete.
        only = next(s for s, ln in enumerate(clc_lengths) if ln > 0)
        clc_lengths = [0] * 19
        clc_lengths[0] = 1
        clc_lengths[only] = 1
    bw.write(0, 1)  # not simple
    bw.write(19 - 4, 4)
    for sym in _CLC_ORDER:
        bw.write(clc_lengths[sym], 3)
    clc_codes = _canonical_codes(clc_lengths)
    bw.write(0, 1)  # no max_symbol cap
    for ln in lengths:
        code, cl = clc_codes[ln]
        bw.write_code(code, cl)
    return _canonical_codes(lengths)


def _limited_lengths(freq: list[int], max_len: int) -> list[int]:
    """Code lengths for the given frequencies: plain Huffman tree;
    if any code overruns ``max_len``, fall back to the balanced
    complete assignment (see inline note). Either way the result is
    Kraft-COMPLETE — the decoder rejects anything else."""
    import heapq

    items = [(f, sym) for sym, f in enumerate(freq) if f > 0]
    if len(items) == 1:
        lengths = [0] * len(freq)
        lengths[items[0][1]] = 1
        return lengths
    heap = [(f, [sym]) for f, sym in items]
    heapq.heapify(heap)
    depth = {sym: 0 for _, sym in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    lengths = [0] * len(freq)
    if max(depth.values()) > max_len:
        # the clamp-and-repair rebalance can leave an INCOMPLETE code
        # (the decoder now enforces Kraft completeness — ADVICE r13);
        # fall back to the balanced complete assignment instead:
        # with n symbols and L = ceil(log2(n)), giving 2n - 2^L
        # symbols length L and 2^L - n symbols length L-1 sums the
        # Kraft inequality to exactly 1. The shorter codes go to the
        # most frequent symbols. Compression is suboptimal; validity
        # is exact (fixture-grade inputs never hit this branch).
        n = len(items)
        L = max(1, (n - 1).bit_length())
        if L > max_len:
            raise ValueError("alphabet too large for max code length")
        by_freq = sorted(items, key=lambda t: (-t[0], t[1]))
        n_short = (1 << L) - n
        for rank, (_, sym) in enumerate(by_freq):
            lengths[sym] = L - 1 if rank < n_short else L
        return lengths
    for sym, d in depth.items():
        lengths[sym] = d
    return lengths


def _write_entropy_image(
    bw: _BitWriter,
    g: np.ndarray,
    r: np.ndarray,
    b: np.ndarray,
    a: np.ndarray,
    is_level0: bool,
) -> None:
    """Emit one literal-only entropy image (no cache, no LZ77): the
    shared body of the main image and the palette aux image."""
    bw.write(0, 1)  # no color cache
    if is_level0:
        bw.write(0, 1)  # no meta prefix codes

    def chan_lengths(vals: np.ndarray, alphabet: int) -> list[int]:
        freq = [0] * alphabet
        for v, n in zip(*np.unique(vals, return_counts=True)):
            freq[int(v)] = int(n)
        return _limited_lengths(freq, 15)

    green_codes = _write_prefix_code(
        bw, chan_lengths(g, _GREEN_ALPHABET)
    )
    red_codes = _write_prefix_code(bw, chan_lengths(r, 256))
    blue_codes = _write_prefix_code(bw, chan_lengths(b, 256))
    alpha_codes = _write_prefix_code(bw, chan_lengths(a, 256))
    # distance code: never used by a literal-only stream, but a group
    # carries five codes — emit a single-symbol code for slot 0
    _write_prefix_code(bw, [1] + [0] * (_DIST_ALPHABET - 1))
    for gi, ri, bi, ai in zip(g, r, b, a):
        for codes, v in (
            (green_codes, gi), (red_codes, ri),
            (blue_codes, bi), (alpha_codes, ai),
        ):
            code, ln = codes[int(v)]
            if ln:
                bw.write_code(code, ln)


def encode_webp_lossless(
    arr: np.ndarray,
    subtract_green: bool = False,
    palette: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
) -> bytes:
    """(H, W, 3) uint8 RGB → RIFF/WEBP container with a spec-subset
    VP8L payload: literals only (no LZ77 search, no color cache),
    per-channel canonical prefix codes (simple when a channel holds
    ≤2 values, the full code-length-coded path otherwise), optional
    SUBTRACT_GREEN, optional COLOR_INDEXING (``palette=True``, ≤256
    distinct colors: delta-coded palette aux image + pixel bundling
    for ≤16-color images — the icon/logo shape real webps use),
    optional PREDICTOR (``predictor_mode`` 0-13, r14: one uniform
    spatial predictor across all tiles — the photographic shape),
    optional COLOR_TRANSFORM (``color_transform`` = (green_to_red,
    green_to_blue, red_to_blue) signed multipliers, uniform across
    tiles — r14, completing all four spec transforms).
    Fixture-grade compression, real bitstream — the exact inverse of
    :func:`decode_webp_lossless` (pinned in tests channel-exactly)."""
    h, w, c = arr.shape
    if c not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError(
            "encode_webp_lossless expects (H, W, 3|4) uint8"
        )
    if c == 4 and (
        palette
        or subtract_green
        or predictor_mode is not None
        or color_transform is not None
    ):
        raise ValueError(
            "RGBA encoding (r15, the animation/alpha fixture face) "
            "takes the plain-literal path only"
        )
    if w > 16384 or h > 16384:
        raise ValueError("VP8L dims cap at 16384")
    if (
        sum(
            (
                palette,
                subtract_green,
                predictor_mode is not None,
                color_transform is not None,
            )
        )
        > 1
    ):
        raise ValueError(
            "palette / subtract_green / predictor_mode / "
            "color_transform are exclusive"
        )
    if predictor_mode is not None and not 0 <= predictor_mode <= 13:
        raise ValueError("predictor_mode must be 0..13")
    if color_transform is not None and any(
        not -128 <= t <= 127 for t in color_transform
    ):
        raise ValueError("color_transform multipliers must be int8")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if c == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if palette:
        flat = arr.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"palette mode: {len(colors)} colors > 256"
            )
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # palette entries (ARGB, alpha 255) delta-coded component-wise
        pal = np.concatenate(
            [np.full((n_colors, 1), 255, np.uint8), colors], axis=1
        ).astype(np.int16)  # columns: a, r, g, b
        deltas = np.empty_like(pal)
        deltas[0] = pal[0]
        deltas[1:] = (pal[1:] - pal[:-1]) & 0xFF
        _write_entropy_image(
            bw, deltas[:, 2], deltas[:, 1], deltas[:, 3], deltas[:, 0],
            is_level0=False,
        )
        bw.write(0, 1)  # end of transforms
        wb = _palette_width_bits(n_colors)
        per = 1 << wb
        ibits = 8 >> wb
        idx = inverse.reshape(h, w).astype(np.uint32)
        packed_w = (w + per - 1) // per
        padded = np.zeros((h, packed_w * per), dtype=np.uint32)
        padded[:, :w] = idx
        packed = np.zeros((h, packed_w), dtype=np.uint32)
        for k in range(per):
            packed |= padded[:, k::per] << (k * ibits)
        g = packed.reshape(-1)
        zero = np.zeros_like(g)
        _write_entropy_image(
            bw, g, zero, zero, np.full_like(g, 255), is_level0=True
        )
    elif color_transform is not None:
        g2r, g2b, r2b = color_transform
        size_bits = 2
        tiles_w = (w + 3) >> 2
        tiles_h = (h + 3) >> 2
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        bw.write(size_bits - 2, 3)
        n_tiles = tiles_w * tiles_h
        # tile pixel packs (blue=g2r, green=g2b, red=r2b)
        tb = np.full(n_tiles, g2r & 0xFF, dtype=np.int64)
        tg = np.full(n_tiles, g2b & 0xFF, dtype=np.int64)
        tr = np.full(n_tiles, r2b & 0xFF, dtype=np.int64)
        _write_entropy_image(
            bw, tg, tr, tb, np.full(n_tiles, 255, np.int64),
            is_level0=False,
        )
        bw.write(0, 1)  # end of transforms
        rr = arr[:, :, 0].astype(np.int32).reshape(-1)
        gg = arr[:, :, 1].astype(np.int32).reshape(-1)
        bb = arr[:, :, 2].astype(np.int32).reshape(-1)
        # forward: red first from green, blue from green AND the
        # ORIGINAL red (the inverse reconstructs red before blue)
        g2r_a = np.full_like(gg, g2r & 0xFF)
        g2b_a = np.full_like(gg, g2b & 0xFF)
        r2b_a = np.full_like(gg, r2b & 0xFF)
        r_t = (rr - _ct_delta(g2r_a, gg)) & 0xFF
        b_t = (bb - _ct_delta(g2b_a, gg) - _ct_delta(r2b_a, rr)) & 0xFF
        _write_entropy_image(
            bw, gg, r_t, b_t, np.full_like(gg, 255), is_level0=True
        )
    elif predictor_mode is not None:
        size_bits = 2  # 4x4 tiles; any size works for a uniform mode
        tiles_w = (w + 3) >> 2
        tiles_h = (h + 3) >> 2
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(size_bits - 2, 3)
        n_tiles = tiles_w * tiles_h
        tg = np.full(n_tiles, predictor_mode, dtype=np.int64)
        tz = np.zeros(n_tiles, dtype=np.int64)
        _write_entropy_image(
            bw, tg, tz, tz, np.full(n_tiles, 255, np.int64),
            is_level0=False,
        )
        bw.write(0, 1)  # end of transforms
        px = np.stack(
            [
                np.full((h, w), 255, np.int64),
                arr[:, :, 0].astype(np.int64),
                arr[:, :, 1].astype(np.int64),
                arr[:, :, 2].astype(np.int64),
            ],
            axis=-1,
        )  # (a, r, g, b)
        res = _forward_predictor(px, h, w, predictor_mode).reshape(-1, 4)
        _write_entropy_image(
            bw, res[:, 2], res[:, 1], res[:, 3], res[:, 0],
            is_level0=True,
        )
    else:
        r = arr[:, :, 0].astype(np.int32).reshape(-1)
        g = arr[:, :, 1].astype(np.int32).reshape(-1)
        b = arr[:, :, 2].astype(np.int32).reshape(-1)
        if subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
        a = (
            arr[:, :, 3].astype(np.int32).reshape(-1)
            if c == 4
            else np.full_like(g, 255)
        )
        bw.write(0, 1)  # no (more) transforms
        _write_entropy_image(bw, g, r, b, a, is_level0=True)
    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
