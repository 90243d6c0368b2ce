"""FLAC PCM codec — pure-Python subset (r14).

Public-knowledge format (RFC 9639 "Free Lossless Audio Codec"; the
xiph.org FLAC format spec). This module gives the audio plane a REAL
sample path for the web's staple lossless audio container beyond the
r14 STREAMINFO header walk (``multimodal.flac_header_stats``): a
matched encoder/decoder pair over the format's frame layer —

- MSB-first bit I/O; frame sync + header (block size / sample rate /
  channel assignment / bit depth codes, UTF-8-style coded frame
  number, CRC-8 over the header verified — garbage never decodes to
  silent wrong samples);
- all four SUBFRAME types: CONSTANT, VERBATIM, FIXED (orders 0-4,
  the spec's standard difference predictors) and LPC (arbitrary
  order, quantized coefficients + shift);
- Rice-partitioned residuals, both 4-bit (method 0) and 5-bit
  (method 1) parameter widths, including the escape code
  (parameter all-ones → raw n-bit residuals);
- all four channel assignments: independent, left/side, right/side,
  mid/side (the spec's lossless decorrelation);
- wasted-bits-per-sample shifts.

Documented subset boundaries: variable-blocksize streams decode
(the coded number is consumed either way); sample-rate codes that
defer to STREAMINFO use the stream's own header; frame CRC-16 is
verified over each whole frame. The ENCODER (fixture face) emits
fixed-blocksize streams with CONSTANT / VERBATIM / FIXED(order ≤ 2)
/ LPC(order ≤ 4, quantized Levinson-Durbin — r15, VERDICT r14 next
#6) subframes, single-partition Rice residuals, and all four
channel assignments (independent + the three stereo
decorrelations), so the decoder's hardest paths get matched-pair
round-trip coverage at corpus scale, not just hand-built streams;
residuals always use the decoder's exact integer predictor, so the
round-trip is lossless by construction for any coefficient quality.

Per-sample bit work in pure Python runs ~1 µs/sample — fixture and
web-clip grade, not a realtime player; the Arrow plane batches rows
so the cost stays per-row-proportional (the VP8L posture).

The container face (STREAMINFO walk, sniff) stays in
``operators.multimodal``; this module is frames + samples.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_DEPTH_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _make_crc8_table() -> bytes:
    t = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t.append(crc)
    return bytes(t)


_CRC8_TABLE = _make_crc8_table()


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0 — the
    FLAC frame-header CRC. Table-driven (r17): one lookup per byte
    instead of the 8-step bit loop; identical polynomial/init."""
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _make_crc16_table() -> list[int]:
    t = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        t.append(crc)
    return t


_CRC16_TABLE = _make_crc16_table()


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0 — the FLAC frame CRC.
    Table-driven (r17), same polynomial/init as the bitwise form."""
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = (t[((crc >> 8) ^ b) & 0xFF] ^ (crc << 8)) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader (FLAC's bit order — the opposite of
    VP8L's). r17: multi-bit reads slice the byte range once
    (``int.from_bytes``) instead of looping per bit, and unary runs
    skip whole zero bytes — bit-identical outputs and error behavior
    (randomized lockstep-pinned against the bitwise form)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self._nbits_total = len(data) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        end = pos + n
        if end > self._nbits_total:
            raise ValueError("FLAC stream truncated")
        chunk = int.from_bytes(self.data[pos >> 3 : (end + 7) >> 3], "big")
        self.pos = end
        return (chunk >> ((-end) % 8)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        data = self.data
        pos = self.pos
        nd = len(data)
        byte_i = pos >> 3
        bit_i = pos & 7
        q = 0
        if byte_i < nd:
            cur = data[byte_i] & (0xFF >> bit_i)
            if cur:
                stop = 8 - cur.bit_length()
                q = stop - bit_i
                self.pos = pos + q + 1
                return q
            q = 8 - bit_i
            byte_i += 1
        while byte_i < nd and data[byte_i] == 0:
            q += 8
            byte_i += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run overlong")
        if byte_i >= nd:
            raise ValueError("FLAC stream truncated")
        stop = 8 - data[byte_i].bit_length()
        q += stop
        if q > 1 << 24:
            raise ValueError("FLAC unary run overlong")
        self.pos = (byte_i << 3) + stop + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    """MSB-first bit writer (the encoder face). r17: writes
    accumulate into an int and drain whole bytes — identical
    bitstreams to the per-bit form (randomized lockstep-pinned)."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nacc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self._acc = (self._acc << n) | (value & ((1 << n) - 1))
        nacc = self._nacc + n
        self.nbits += n
        out = self.out
        acc = self._acc
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        self._acc = acc & ((1 << nacc) - 1)
        self._nacc = nacc

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits % 8:
            self.write(0, 8 - self.nbits % 8)

    def bytes(self) -> bytes:
        if self._nacc:
            return bytes(self.out) + bytes(
                [(self._acc << (8 - self._nacc)) & 0xFF]
            )
        return bytes(self.out)


def _read_coded_number(br: _BitReader) -> int:
    """The frame header's UTF-8-style coded frame/sample number
    (up to 36 bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_extra = 0
    mask = 0x40
    while b0 & mask:
        n_extra += 1
        mask >>= 1
    if n_extra < 1 or n_extra > 6:
        raise ValueError("FLAC coded number malformed")
    v = b0 & (mask - 1)
    for _ in range(n_extra):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC coded number continuation malformed")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(br: _BitReader, n: int, order: int, depth: int) -> list[int]:
    """Rice-partitioned residual for one subframe: ``n`` block
    samples, the first ``order`` carried as warm-up elsewhere."""
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC residual method reserved")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_parts = 1 << porder
    if n % n_parts:
        raise ValueError("FLAC partition order does not divide block")
    out: list[int] = []
    for p in range(n_parts):
        count = n // n_parts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("FLAC partition shorter than warm-up")
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _predict(warm: list[int], residual: list[int], coefs: list[int], shift: int) -> list[int]:
    """Apply a (fixed or LPC) predictor over warm-up + residuals."""
    samples = list(warm) + [0] * len(residual)
    order = len(coefs)
    k = len(warm)
    idx = range(order)
    for r in residual:
        pred = 0
        for i in idx:
            pred += coefs[i] * samples[k - 1 - i]
        samples[k] = r + (pred >> shift)
        k += 1
    return samples


def _predict_fixed(warm: list[int], residual: list[int], order: int) -> list[int]:
    """FIXED-predictor reconstruction via iterated integer cumsum
    (r17). The order-k fixed predictor makes the residual the k-th
    finite difference of the samples, so reconstruction is k exact
    integer integrations seeded from the warm-up samples' difference
    table — identical values to :func:`_predict` with
    ``_FIXED_COEFS[order]`` / shift 0 (randomized-pinned). int64 is
    exact: |residual| < 2^33 and blocks cap at 32768 samples, so
    every partial sum fits well under 2^63."""
    cur = np.asarray(residual, dtype=np.int64)
    if order:
        bounds = []
        lv = np.asarray(warm, dtype=np.int64)
        for _ in range(order):
            bounds.append(int(lv[-1]))
            lv = np.diff(lv)
        for m in range(order - 1, -1, -1):
            cur = bounds[m] + np.cumsum(cur)
    return list(warm) + cur.tolist()


def _read_subframe(br: _BitReader, n: int, depth: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        depth -= wasted
    if depth <= 0:
        raise ValueError("FLAC wasted bits exhaust the sample depth")
    if stype == 0:  # CONSTANT
        v = br.read_signed(depth)
        out = [v] * n
    elif stype == 1:  # VERBATIM
        out = [br.read_signed(depth) for _ in range(n)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(depth) for _ in range(order)]
        res = _read_residual(br, n, order, depth)
        out = _predict_fixed(warm, res, order)
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [br.read_signed(depth) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code reserved")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, n, order, depth)
        out = _predict(warm, res, coefs, shift)
    else:
        raise ValueError(f"FLAC subframe type {stype} reserved")
    if wasted:
        out = [s << wasted for s in out]
    return out


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream → (samples int32 array of shape (n, channels),
    sample_rate). Decodes EVERY frame; frame-header CRC-8 and frame
    CRC-16 are verified, so corrupt streams raise instead of
    emitting wrong samples. ValueError outside the subset or on any
    malformation (the lenient audio plane keys on it)."""
    from openaq_data_pipeline_spark.operators.multimodal import (
        flac_header_stats,
    )

    rate0, channels0, depth0, total, _ = flac_header_stats(content)
    # skip metadata blocks to the first frame
    off = 4
    while True:
        hdr = content[off : off + 4]
        if len(hdr) < 4:
            raise ValueError("FLAC metadata truncated")
        last = hdr[0] & 0x80
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        off += 4 + blen
        if last:
            break
    chans: list[list[int]] = [[] for _ in range(channels0)]
    while off < len(content):
        br = _BitReader(content, off * 8)
        frame_start = off
        if br.read(14) != 0b11111111111110:
            raise ValueError(f"FLAC frame sync lost at byte {off}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy (both decode)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        depth_code = br.read(3)
        if depth_code == 3:
            # RFC 9639 §9.1.4: code 3 is reserved — falling back to
            # the STREAMINFO depth would decode a desynced stream
            # until the CRC-16 caught it (ADVICE r14).
            raise ValueError("FLAC frame bit-depth code 3 reserved")
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC block size code reserved")
        elif bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code invalid")
        # CRC-8 covers the header bytes up to here
        hdr_end = (br.pos + 7) // 8
        if _crc8(content[frame_start:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            mode = "independent"
        elif ch_code == 8:
            n_ch, mode = 2, "left_side"
        elif ch_code == 9:
            n_ch, mode = 2, "right_side"
        elif ch_code == 10:
            n_ch, mode = 2, "mid_side"
        else:
            raise ValueError("FLAC channel assignment reserved")
        if n_ch != channels0:
            raise ValueError("FLAC frame channel count != STREAMINFO")
        subs = []
        for c in range(n_ch):
            # code 0 = "get depth from STREAMINFO" (RFC 9639 §9.1.4)
            # — the ONLY code that takes depth0; the reserved code 3
            # already raised above, every other code is in the map,
            # so this is not a silent fallback.
            d = (
                depth0
                if depth_code == 0
                else _DEPTH_CODE[depth_code]
            )
            # the side channel carries one extra bit (spec)
            if (mode == "left_side" and c == 1) or (
                mode == "right_side" and c == 0
            ) or (mode == "mid_side" and c == 1):
                d += 1
            subs.append(_read_subframe(br, n, d))
        br.align()
        frame_end = (br.pos // 8) + 2
        if _crc16(content[frame_start : br.pos // 8]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        # stereo decorrelation undone vectorized (r17): plain int64
        # adds/shifts — numpy's arithmetic >> and two's-complement
        # & 1 match Python's semantics exactly for every sign
        if mode == "independent":
            for c in range(n_ch):
                chans[c].extend(subs[c])
        elif mode == "left_side":
            left = np.asarray(subs[0], dtype=np.int64)
            side = np.asarray(subs[1], dtype=np.int64)
            chans[0].extend(left.tolist())
            chans[1].extend((left - side).tolist())
        elif mode == "right_side":
            side = np.asarray(subs[0], dtype=np.int64)
            right = np.asarray(subs[1], dtype=np.int64)
            chans[0].extend((right + side).tolist())
            chans[1].extend(right.tolist())
        else:  # mid_side
            mid = np.asarray(subs[0], dtype=np.int64)
            side = np.asarray(subs[1], dtype=np.int64)
            m = (mid << 1) | (side & 1)
            chans[0].extend(((m + side) >> 1).tolist())
            chans[1].extend(((m - side) >> 1).tolist())
        off = frame_end
    samples = np.array(chans, dtype=np.int64).T
    if total and samples.shape[0] > total:
        samples = samples[:total]
    return samples.astype(np.int32), rate0


def _write_residual(bw: _BitWriter, res: list[int], param: int) -> None:
    """Single-partition Rice residual (method 0, porder 0). r17: the
    zigzag map and quotient/remainder splits are vectorized int64
    numpy (exact — |res| < 2^34); the bit emission itself stays
    sequential through the accumulator writer."""
    bw.write(0, 2)   # method 0 (4-bit params)
    bw.write(0, 4)   # partition order 0
    bw.write(param, 4)
    if not res:
        return
    r = np.asarray(res, dtype=np.int64)
    u = (np.abs(r) << 1) - (r < 0)  # zigzag
    w = bw.write
    if param:
        mask = (1 << param) - 1
        for qi, ri in zip((u >> param).tolist(), (u & mask).tolist()):
            w(1, qi + 1)
            w(ri, param)
    else:
        for qi in u.tolist():
            w(1, qi + 1)


def _rice_param(res: list[int]) -> int:
    mean = max(1, sum(abs(r) for r in res) // max(1, len(res)))
    return min(14, max(0, mean.bit_length()))


def _levinson(ac: list[float], order: int) -> list[float]:
    """Levinson-Durbin: autocorrelation → prediction coefficients a
    with pred[i] = sum(a[j] * x[i-1-j]) (the :func:`_predict`
    convention). Degenerate inputs return the partial solution."""
    err = ac[0]
    a: list[float] = []
    for i in range(order):
        if err <= 0:
            break
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        k = acc / err
        a = [a[j] - k * a[i - 1 - j] for j in range(i)] + [k]
        err *= 1.0 - k * k
    a += [0.0] * (order - len(a))
    return a


def _quantize_lpc(a: list[float], precision: int) -> tuple[list[int], int]:
    """Float predictor → (qlp coefficients, shift) with every
    coefficient in the signed ``precision``-bit range. Round-trip
    exactness never depends on coefficient quality — the encoder
    computes residuals with the decoder's exact integer predictor —
    so clamping only costs compression, never correctness."""
    cmax = max((abs(c) for c in a), default=0.0)
    if cmax <= 0 or not np.isfinite(cmax):
        return [0] * len(a), 0
    shift = (precision - 2) - int(np.floor(np.log2(cmax)) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = [
        max(-lim, min(lim - 1, int(round(c * (1 << shift)))))
        for c in a
    ]
    return q, shift


def _write_subframe(
    bw: _BitWriter,
    ch: list[int],
    depth: int,
    kind: str,
    lpc_order: int = 4,
    lpc_precision: int = 12,
) -> None:
    """One subframe: padding bit + type + no-wasted-bits + body.
    ``kind``: constant / verbatim / fixed2 / lpc (r15, VERDICT r14
    next #6 — quantized Levinson-Durbin coefficients; residuals use
    the decoder's exact integer predictor so the round-trip is
    lossless by construction); lpc falls back to constant/verbatim
    on blocks too short or too flat to predict."""
    n = len(ch)
    bw.write(0, 1)
    if kind == "lpc":
        order = min(lpc_order, n - 1)
        if len(set(ch)) == 1:
            kind = "constant"
        elif order < 1:
            kind = "verbatim"
    if kind == "constant":
        if len(set(ch)) != 1:
            raise ValueError("constant subframe needs equal samples")
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(ch[0], depth)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in ch:
            bw.write_signed(v, depth)
    elif kind == "fixed2":
        order = min(2, n - 1) if n > 1 else 0
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in ch[:order]:
            bw.write_signed(v, depth)
        # the order-k fixed predictor's residual IS the k-th finite
        # difference (r17: vectorized, exact int64)
        res = np.diff(np.asarray(ch, dtype=np.int64), n=order).tolist()
        _write_residual(bw, res, _rice_param(res))
    elif kind == "lpc":
        x = np.asarray(ch, dtype=np.float64)
        ac = [float(np.dot(x, x))]
        for lag in range(1, order + 1):
            ac.append(float(np.dot(x[lag:], x[:-lag])))
        qlp, shift = _quantize_lpc(
            _levinson(ac, order), lpc_precision
        )
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in ch[:order]:
            bw.write_signed(v, depth)
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in qlp:
            bw.write_signed(c, lpc_precision)
        # prediction Σ qlp[j]·ch[i-1-j] is the discrete convolution
        # of ch with qlp evaluated at i-1 (r17: vectorized, exact —
        # int64 products cap near 2^47); numpy's arithmetic >> on
        # negatives matches Python's floor shift
        c64 = np.asarray(ch, dtype=np.int64)
        pred = np.convolve(c64, np.asarray(qlp, dtype=np.int64))[
            order - 1 : n - 1
        ]
        res = (c64[order:] - (pred >> shift)).tolist()
        _write_residual(bw, res, _rice_param(res))
    else:
        raise ValueError(f"unknown subframe kind {kind!r}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    depth: int = 16,
    block_size: int = 4096,
    subframe: str = "auto",
    channel_mode: str = "independent",
) -> bytes:
    """(n, channels) int PCM → a real FLAC stream: STREAMINFO +
    fixed-blocksize frames with verified CRC-8/CRC-16. ``subframe``:
    ``constant`` (all-equal blocks only), ``verbatim``, ``fixed2``
    (order-2 difference predictor), ``lpc`` (r15, VERDICT r14 next
    #6: quantized Levinson-Durbin, order ≤ 4, single-partition
    Rice), or ``auto`` (constant when the block is constant, else
    fixed2). ``channel_mode`` (r15): ``independent``, or — stereo
    only — the spec's three lossless decorrelations ``left_side`` /
    ``right_side`` / ``mid_side`` (the side channel carries one
    extra bit, RFC 9639 §4.2). Fixture-grade compression, spec-grade
    bitstream — the exact inverse of :func:`decode_flac` for every
    combination."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, channels = samples.shape
    if not 1 <= channels <= 8:
        raise ValueError("FLAC supports 1-8 channels")
    if channel_mode not in (
        "independent", "left_side", "right_side", "mid_side"
    ):
        raise ValueError(f"unknown channel mode {channel_mode!r}")
    if channel_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    if sample_rate not in _RATE_CODE.values():
        raise ValueError("use a spec-coded sample rate for fixtures")
    sr_code = {v: k for k, v in _RATE_CODE.items()}[sample_rate]
    if depth not in _DEPTH_CODE.values():
        raise ValueError("use a spec-coded bit depth for fixtures")
    depth_code = {v: k for k, v in _DEPTH_CODE.items()}[depth]
    from openaq_data_pipeline_spark.operators.multimodal import (
        encode_flac_stub,
    )

    head = encode_flac_stub(sample_rate, channels, depth, n_total)
    out = bytearray(head[: len(head) - 8])  # stub minus its filler
    frame_no = 0
    for start in range(0, max(n_total, 1), block_size):
        block = samples[start : start + block_size]
        n = block.shape[0]
        if n == 0:
            break
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(6 if n <= 256 else 7, 4)  # 8/16-bit explicit size
        bw.write(sr_code, 4)
        ch_code = {
            "independent": channels - 1,
            "left_side": 8,
            "right_side": 9,
            "mid_side": 10,
        }[channel_mode]
        bw.write(ch_code, 4)
        bw.write(depth_code, 3)
        bw.write(0, 1)
        # coded frame number (fits 7 bits for fixture-scale streams)
        if frame_no >= 0x80:
            raise ValueError("fixture encoder caps at 128 frames")
        bw.write(frame_no, 8)
        if n <= 256:
            bw.write(n - 1, 8)
        else:
            bw.write(n - 1, 16)
        hdr = bw.bytes()
        bw.write(_crc8(hdr), 8)
        # channel plane(s) + the per-subframe bit depth (the side
        # channel of a decorrelated pair carries one extra bit)
        if channel_mode == "independent":
            planes = [
                (block[:, c].astype(np.int64).tolist(), depth)
                for c in range(channels)
            ]
        else:
            l64 = block[:, 0].astype(np.int64)
            r64 = block[:, 1].astype(np.int64)
            left = l64.tolist()
            right = r64.tolist()
            side = (l64 - r64).tolist()
            if channel_mode == "left_side":
                planes = [(left, depth), (side, depth + 1)]
            elif channel_mode == "right_side":
                planes = [(side, depth + 1), (right, depth)]
            else:  # mid_side
                mid = ((l64 + r64) >> 1).tolist()
                planes = [(mid, depth), (side, depth + 1)]
        for ch, d in planes:
            kind = subframe
            if kind == "auto":
                kind = "constant" if len(set(ch)) == 1 else "fixed2"
            _write_subframe(bw, ch, d, kind)
        bw.align()
        body = bw.bytes()
        bw.write(_crc16(body), 16)
        out += bw.bytes()
        frame_no += 1
    return bytes(out)
