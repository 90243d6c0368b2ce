"""unix ``compress(1)`` ``.Z`` codec — pure Python, externally
ground-truthed (r15 capability wave).

``compress`` is the one REGISTERED HTTP ``Content-Encoding`` token
(RFC 9110 §8.4.1.1) the engine could not serve: stdlib has no LZW,
and the format — LSB-first variable-width LZW with block mode —
carries two famously underdocumented quirks this module reproduces
exactly:

- **group alignment is relative to the last width-change/CLEAR
  point**, not the stream start: the classic implementation writes
  codes in groups of 8 (``n_bits`` bytes) and flushes the partial
  group whenever the width bumps, so the reader must skip to the
  next multiple of ``n_bits*8`` bits COUNTED FROM THE PREVIOUS
  BUMP (gzip ``unlzw``'s ``resetbuf`` behavior);
- **the maxbits=9 init quirk**: ``maxcode`` initializes to 511
  regardless of ``maxbits``, so a 9-bit-capped stream still takes
  one width bump to 10-bit codes after its table freezes — both
  sides of the classic implementation do this, so this codec does
  too.

External ground truth: the container ships gzip, whose ``.Z``
decoder is the reference ``unlzw``. ``tests/test_compress_z.py``
round-trips every encoder shape through ``gzip -dc`` byte-exactly
(all eight maxbits, width-bump boundaries, table freeze, the
maxbits=9 quirk) and pins the decoder's CLEAR path against gzip on
hand-built streams — the VP8L-vs-libwebp posture: matched-pair bugs
cannot hide.

The decode face is bomb-capped (`None` past ``max_bytes``, the
Content-Encoding hop contract); the encoder exists for fixture
synthesis. Not constant-time-fast — LZW decode emits whole table
entries per code, so throughput is fine for the crawl hop's
per-payload use.
"""

from __future__ import annotations

_MAGIC = b"\x1f\x9d"


def _align_up(rel: int, nbits: int) -> int:
    a = nbits * 8
    return ((rel + a - 1) // a) * a


def decompress_z_capped(blob: bytes, max_bytes: int) -> bytes | None:
    """One bomb-capped ``.Z`` decode; ``None`` on corrupt stream,
    reserved header bits, or output past ``max_bytes`` — the same
    observable-discard contract as the gzip/brotli/zstd hops."""
    if not isinstance(blob, bytes):  # Arrow hands bytearray
        blob = bytes(blob)
    if len(blob) < 3 or blob[:2] != _MAGIC:
        return None
    flags = blob[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if flags & 0x60:  # reserved bits must be zero
        return None
    if not 9 <= maxbits <= 16:
        return None
    data = blob[3:]
    total_bits = len(data) * 8
    nbits = 9
    maxmax = 1 << maxbits
    maxcode = (1 << nbits) - 1  # 511 even when maxbits == 9 (quirk)
    pos = 0
    base = 0  # last bump/CLEAR point: the group-alignment origin
    first_free = 257 if block_mode else 256
    table = [bytes([i]) for i in range(256)] + [b""] * (maxmax - 256)
    free = first_free
    out = bytearray()
    prev_entry: bytes | None = None
    while True:
        if free > maxcode:
            pos = base + _align_up(pos - base, nbits)
            base = pos
            nbits += 1
            maxcode = maxmax if nbits == maxbits else (1 << nbits) - 1
        if pos + nbits > total_bits:
            break
        bi = pos >> 3
        chunk = int.from_bytes(data[bi : bi + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << nbits) - 1)
        pos += nbits
        if block_mode and code == 256:
            pos = base + _align_up(pos - base, nbits)
            base = pos
            free = first_free
            nbits = 9
            maxcode = (1 << nbits) - 1
            prev_entry = None
            continue
        if prev_entry is None:
            if code > 255:
                return None
            entry = table[code]
        else:
            if code < free:
                entry = table[code]
            elif code == free and free < maxmax:
                entry = prev_entry + prev_entry[:1]  # KwKwK
            else:
                return None
        out += entry
        if len(out) > max_bytes:
            return None
        if prev_entry is not None and free < maxmax:
            table[free] = prev_entry + entry[:1]
            free += 1
        prev_entry = entry
    return bytes(out)


def compress_z(blob: bytes, maxbits: int = 16) -> bytes:
    """Fixture-synthesis encoder: block-mode ``.Z`` byte-compatible
    with the classic implementation (verified through ``gzip -dc``).
    Emits no CLEAR codes (the table freezes when full, like
    ``compress`` under non-degrading ratios)."""
    if not 9 <= maxbits <= 16:
        raise ValueError("compress_z: maxbits must be 9..16")
    out = bytearray([0x1F, 0x9D, 0x80 | maxbits])
    bitbuf = 0
    bitcnt = 0
    pos = 0
    base = 0
    codes = bytearray()

    def emit(code: int, nbits: int) -> None:
        nonlocal bitbuf, bitcnt, pos
        bitbuf |= code << bitcnt
        bitcnt += nbits
        pos += nbits
        while bitcnt >= 8:
            codes.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    free = 257
    nbits = 9
    maxmax = 1 << maxbits
    maxcode = (1 << nbits) - 1
    w = b""
    for b in blob:
        c = bytes([b])
        if w + c in table:
            w = w + c
            continue
        emit(table[w], nbits)
        # compress.c output() order: pad + widen when free exceeded
        # maxcode BEFORE this step's table add
        if free > maxcode:
            target = base + _align_up(pos - base, nbits)
            while pos < target:
                emit(0, min(8, target - pos))
            base = pos
            nbits += 1
            maxcode = maxmax if nbits == maxbits else (1 << nbits) - 1
        if free < maxmax:
            table[w + c] = free
            free += 1
        w = c
    if w:
        emit(table[w], nbits)
    if bitcnt:
        codes.append(bitbuf & 0xFF)
    return bytes(out + codes)
