"""LZ4 Frame codec (public spec: lz4.org frame format v1.6.x).

The reference ships ``dedup_sites.json.lz4``
(`minmodkg/etl/mineral_site.py:30,357-365` — serde routes ``.lz4`` through
``lz4.frame``).  The lz4 C package is absent from this sandbox, so this
module implements the frame format from the published specification:

- ``compress``: spec-conformant frames using *stored* (uncompressed)
  blocks — every LZ4 tool can read them; when the real ``lz4`` package is
  importable it is used instead (and actually compresses);
- ``decompress``: a full decoder — frame header, stored AND compressed
  blocks (token / literal-run / offset / match-run sequences), so files
  produced by the real library read back too.

XXH32 (for the frame-header checksum) is implemented inline from its
public spec; its empty-input vector is pinned in tests/test_export.py.
"""

from __future__ import annotations

import struct

try:  # the real library wins when present
    import lz4.frame as _lz4frame  # pragma: no cover
except Exception:  # pragma: no cover
    _lz4frame = None

_MAGIC = 0x184D2204
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                v = _rotl32((v + k * _P2) & _M32, 13)
                v = (v * _P1) & _M32
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


_BLOCK_MAX = 4 * 1024 * 1024  # BD byte 0x70 → 4 MB max block size


def compress(data: bytes) -> bytes:
    """LZ4 frame with stored blocks (or the real library when present)."""
    if _lz4frame is not None:  # pragma: no cover
        return _lz4frame.compress(data)
    # FLG: version 01, block-independent, no checksums/size/dict → 0x60
    flg, bd = 0x60, 0x70
    desc = bytes((flg, bd))
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes((hc,)))
    for i in range(0, len(data), _BLOCK_MAX):
        chunk = data[i : i + _BLOCK_MAX]
        # high bit set = stored (uncompressed) block
        out += struct.pack("<I", len(chunk) | 0x80000000)
        out += chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def _decode_block(src: bytes) -> bytes:
    """LZ4 *block* decoder (public block-format spec)."""
    dst = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:  # last sequence has no match part
            break
        offset = struct.unpack_from("<H", src, i)[0]
        i += 2
        if offset == 0:
            raise ValueError("corrupt LZ4 block: zero offset")
        match_len = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        # overlapping copy semantics: byte-at-a-time from dst
        pos = len(dst) - offset
        for _ in range(match_len):
            dst.append(dst[pos])
            pos += 1
    return bytes(dst)


def decompress(data: bytes) -> bytes:
    """Full LZ4 frame decoder (stored and compressed blocks)."""
    if _lz4frame is not None:  # pragma: no cover
        return _lz4frame.decompress(data)
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _MAGIC:
        raise ValueError("not an LZ4 frame")
    flg = data[4]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported LZ4 frame version")
    has_content_size = bool(flg & 0x08)
    has_block_checksum = bool(flg & 0x10)
    has_content_checksum = bool(flg & 0x04)
    has_dict_id = bool(flg & 0x01)
    i = 6  # past FLG + BD
    if has_content_size:
        i += 8
    if has_dict_id:
        i += 4
    i += 1  # header checksum byte
    out = bytearray()
    while True:
        bsz = struct.unpack_from("<I", data, i)[0]
        i += 4
        if bsz == 0:  # EndMark
            break
        stored = bool(bsz & 0x80000000)
        size = bsz & 0x7FFFFFFF
        block = data[i : i + size]
        i += size
        if has_block_checksum:
            i += 4
        out += block if stored else _decode_block(block)
    if has_content_checksum:
        if xxh32(bytes(out)) != struct.unpack_from("<I", data, i)[0]:
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
