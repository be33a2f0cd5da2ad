"""Pure-Python Snappy (raw block format) — compress + decompress.

Implements Google's public Snappy format description
(https://github.com/google/snappy/blob/main/format_description.txt):
a little-endian varint preamble with the uncompressed length, then a
stream of tagged elements — literals (tag ``00``) and back-references
(``01`` 1-byte-offset, ``10`` 2-byte-offset, ``11`` 4-byte-offset),
where copies may self-overlap (run-length semantics).

Why this exists: the Avro ``snappy`` codec (reference BigQuery/file
paths gzip or snappy their payloads; interop partners commonly write
snappy OCF) must be readable/writable without a native library in the
Python workers. When ``cramjam`` or ``python-snappy`` IS importable we
delegate to it — this module is the always-available fallback, not the
preferred path.

The decompressor is format-complete (handles anything a conforming
compressor can emit). The compressor is a greedy single-pass
hash-table matcher emitting 2-byte-offset copies — every output it
produces is spec-valid and readable by any Snappy decoder (including
snappy-java on the Spark JVM); it trades ratio for simplicity exactly
like the format allows.

Scale note: compression runs inside ``mapInArrow`` tasks, one block at
a time (Avro blocks are row-bounded) — O(block) memory, parallel across
executors. Pure-Python throughput is the known cost of the fallback;
``deflate`` (zlib, C-speed) stays the default codec.
"""

from __future__ import annotations

# optional C-speed delegates, feature-gated (no hard dependency)
_FAST_COMPRESS = None
_FAST_DECOMPRESS = None
try:  # pragma: no cover - depends on environment
    import cramjam as _cramjam

    _FAST_COMPRESS = lambda b: bytes(_cramjam.snappy.compress_raw(b))  # noqa: E731
    _FAST_DECOMPRESS = lambda b: bytes(  # noqa: E731
        _cramjam.snappy.decompress_raw(b)
    )
except Exception:  # ImportError or partial install
    try:  # pragma: no cover
        import snappy as _snappy

        _FAST_COMPRESS = _snappy.compress
        _FAST_DECOMPRESS = _snappy.decompress
    except Exception:
        pass

_MAX_COPY2_OFFSET = 65535
_MIN_MATCH = 4


def _put_varint(n: int, out: bytearray) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint preamble")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint too long")


def _emit_literal(src: bytes, start: int, end: int, out: bytearray) -> None:
    length = end - start
    if length <= 0:
        return
    n = length - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < 1 << 24:
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += src[start:end]


def _emit_copy2(offset: int, length: int, out: bytearray) -> None:
    # tag 0b10: 6-bit (length-1), 2-byte little-endian offset
    out.append(((length - 1) << 2) | 0b10)
    out += offset.to_bytes(2, "little")


def _emit_copy(offset: int, length: int, out: bytearray) -> None:
    # chunk long matches; keep every residual >= MIN_MATCH so no piece
    # falls below what a copy element may carry with this offset class
    while length >= 68:
        _emit_copy2(offset, 64, out)
        length -= 64
    if length > 64:
        _emit_copy2(offset, 60, out)
        length -= 60
    _emit_copy2(offset, length, out)


def compress(data: bytes) -> bytes:
    """Raw-format snappy compress (spec-valid greedy matcher)."""
    if _FAST_COMPRESS is not None:
        return _FAST_COMPRESS(data)
    data = bytes(data)
    out = bytearray()
    _put_varint(len(data), out)
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # LZ4-style skip acceleration: incompressible stretches advance
    # faster instead of hashing every byte
    miss_streak = 0
    while i + _MIN_MATCH <= n:
        key = data[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_COPY2_OFFSET:
            m = _MIN_MATCH
            limit = n - i
            while m < limit and data[cand + m] == data[i + m]:
                m += 1
            _emit_literal(data, lit_start, i, out)
            _emit_copy(i - cand, m, out)
            i += m
            lit_start = i
            miss_streak = 0
        else:
            miss_streak += 1
            i += 1 + (miss_streak >> 6)
    _emit_literal(data, lit_start, n, out)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Raw-format snappy decompress (format-complete)."""
    if _FAST_DECOMPRESS is not None:
        return _FAST_DECOMPRESS(data)
    expected, pos = _read_varint(bytes(data), 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            ln = tag >> 2
            if ln < 60:
                ln += 1
            else:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + ln > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 0b01:  # copy, 11-bit offset, length 4-11
            if pos >= n:
                raise ValueError("snappy: truncated copy1")
            ln = ((tag >> 2) & 0b111) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0b10:  # copy, 2-byte offset, length 1-64
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy2")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy4")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:
            # overlapping copy = byte-at-a-time (how snappy encodes runs)
            for k in range(ln):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decompressed {len(out)} bytes, preamble said {expected}"
        )
    return bytes(out)
