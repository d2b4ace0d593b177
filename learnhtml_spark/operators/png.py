"""From-scratch PNG codec (decode + stored-block encode) in pure
python/numpy — closes the round-5 multimodal stub seam for PNG without
any codec library: the DEFLATE inflater (RFC 1951: stored, fixed-Huffman
AND dynamic-Huffman blocks), the zlib wrapper (RFC 1950, adler32
verified), CRC32, and the PNG container + scanline unfiltering
(RFC 2083 filters 0-4 incl. Paeth) are all implemented here.

Scope: 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced — i.e. what PNG encoders emit
by default for photographic/synthetic content.  16-bit and Adam7 raise
with a clear message (they remain the one documented seam).

This is a correctness/seam-closure decoder: the symbol-by-symbol
Huffman walk is Python-speed, fine for the thumbnail-sized media spans
the extraction pipeline carries (and for tests, which cross-check
against stdlib zlib as an oracle); a production deployment would plug
an optimized codec at the same ``decode_media`` seam.

Tests: tests/test_misc_surface.py — inverse-encode (stored blocks),
stdlib-zlib oracle streams (fixed via Z_FIXED, dynamic via default
strategy), filter coverage, and corrupt-stream failure modes.
"""

from __future__ import annotations

import struct

import numpy as np

# --- DEFLATE tables (RFC 1951 §3.2.5-3.2.6) --------------------------------

_LEN_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
             43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
_LEN_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5, 0]
_DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
              257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
              8193, 12289, 16385, 24577]
_DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
_CLEN_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14,
               1, 15]

_FIXED_LIT_LENGTHS = ([8] * 144) + ([9] * 112) + ([7] * 24) + ([8] * 8)
_FIXED_DIST_LENGTHS = [5] * 30


def _huff_table(lengths):
    """Canonical Huffman decode table: (nbits, code) -> symbol."""
    maxlen = max(lengths) if lengths else 0
    bl_count = [0] * (maxlen + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    table = {}
    code = 0
    next_code = [0] * (maxlen + 1)
    for b in range(1, maxlen + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


class _BitReader:
    """LSB-first bit reader over a bytes buffer (DEFLATE bit order)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bits(self, n: int) -> int:
        v = 0
        d, pos = self.data, self.pos
        if (pos + n) > len(d) * 8:
            raise ValueError("inflate: truncated stream")
        for i in range(n):
            v |= ((d[pos >> 3] >> (pos & 7)) & 1) << i
            pos += 1
        self.pos = pos
        return v

    def symbol(self, table) -> int:
        """Huffman codes pack MSB-first while the stream is LSB-first:
        accumulate one bit at a time."""
        d, pos = self.data, self.pos
        nbytes8 = len(d) * 8
        code = 0
        for length in range(1, 16):
            if pos >= nbytes8:
                raise ValueError("inflate: truncated stream")
            code = (code << 1) | ((d[pos >> 3] >> (pos & 7)) & 1)
            pos += 1
            sym = table.get((length, code))
            if sym is not None:
                self.pos = pos
                return sym
        raise ValueError("inflate: invalid Huffman code")

    def align_byte(self):
        self.pos = (self.pos + 7) & ~7


def inflate(data: bytes) -> bytes:
    """Raw DEFLATE decompression (RFC 1951): stored, fixed-Huffman and
    dynamic-Huffman blocks."""
    br = _BitReader(data)
    out = bytearray()
    while True:
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align_byte()
            base = br.pos >> 3
            if base + 4 > len(data):
                raise ValueError("inflate: truncated stored header")
            ln, nln = struct.unpack_from("<HH", data, base)
            if ln ^ nln != 0xFFFF:
                raise ValueError("inflate: stored LEN/NLEN mismatch")
            if base + 4 + ln > len(data):
                raise ValueError("inflate: truncated stored block")
            out += data[base + 4: base + 4 + ln]
            br.pos = (base + 4 + ln) * 8
        elif btype in (1, 2):
            if btype == 1:
                lit_t = _huff_table(_FIXED_LIT_LENGTHS)
                dist_t = _huff_table(_FIXED_DIST_LENGTHS)
            else:
                hlit = br.bits(5) + 257
                hdist = br.bits(5) + 1
                hclen = br.bits(4) + 4
                clens = [0] * 19
                for i in range(hclen):
                    clens[_CLEN_ORDER[i]] = br.bits(3)
                cl_t = _huff_table(clens)
                lengths = []
                while len(lengths) < hlit + hdist:
                    s = br.symbol(cl_t)
                    if s < 16:
                        lengths.append(s)
                    elif s == 16:
                        if not lengths:
                            raise ValueError("inflate: repeat with no prior")
                        lengths += [lengths[-1]] * (3 + br.bits(2))
                    elif s == 17:
                        lengths += [0] * (3 + br.bits(3))
                    else:
                        lengths += [0] * (11 + br.bits(7))
                lit_t = _huff_table(lengths[:hlit])
                dist_t = _huff_table(lengths[hlit:])
            while True:
                sym = br.symbol(lit_t)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError("inflate: bad length symbol")
                    i = sym - 257
                    length = _LEN_BASE[i] + br.bits(_LEN_EXTRA[i])
                    dsym = br.symbol(dist_t)
                    if dsym > 29:
                        raise ValueError("inflate: bad distance symbol")
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("inflate: distance beyond output")
                    start = len(out) - dist
                    for j in range(length):  # overlapping copies are legal
                        out.append(out[start + j])
        else:
            raise ValueError("inflate: reserved block type 3")
        if bfinal:
            return bytes(out)


def adler32(data: bytes) -> int:
    """RFC 1950 checksum, vectorized: per-chunk numpy prefix sums keep
    the int64 partials below overflow before each mod."""
    a, b = 1, 0
    arr = np.frombuffer(data, np.uint8).astype(np.int64)
    # b grows ~ len*255*len/2 per chunk; 2^63 bound => chunk ~ 2^26 safe
    step = 1 << 24
    for i in range(0, len(arr), step):
        chunk = arr[i: i + step]
        csum = np.cumsum(chunk)
        b = (b + len(chunk) * a + int(csum.sum())) % 65521
        a = (a + int(csum[-1]) if len(chunk) else a) % 65521
    return ((b << 16) | a) & 0xFFFFFFFF


def zlib_decompress(data: bytes) -> bytes:
    """RFC 1950 wrapper around ``inflate`` with adler32 verification."""
    if len(data) < 6:
        raise ValueError("zlib: stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib: not deflate")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib: bad header check")
    if flg & 0x20:
        raise ValueError("zlib: preset dictionary unsupported")
    raw = inflate(data[2:-4])
    want = struct.unpack(">I", data[-4:])[0]
    if adler32(raw) != want:
        raise ValueError("zlib: adler32 mismatch")
    return raw


def zlib_compress_stored(data: bytes) -> bytes:
    """Minimal RFC 1950 stream of stored (uncompressed) DEFLATE blocks —
    the exact-inverse encoder used by ``encode_png``."""
    out = bytearray(b"\x78\x01")
    n = len(data)
    i = 0
    while True:
        chunk = data[i: i + 0xFFFF]
        i += len(chunk)
        final = 1 if i >= n else 0
        out.append(final)  # BFINAL + BTYPE=00, byte-aligned by design
        out += struct.pack("<HH", len(chunk), len(chunk) ^ 0xFFFF)
        out += chunk
        if final:
            break
    out += struct.pack(">I", adler32(data))
    return bytes(out)


_CRC_TABLE = None


def crc32(data: bytes, crc: int = 0) -> int:
    # plain-int table loop: python ints are ~30x faster per byte than the
    # numpy-scalar walk this used to do (every numpy index/xor on a 0-d
    # array costs ~1 us of dispatch; media payloads pay crc32 six times
    # per PNG doc, so this was ~25% of the whole media_features kernel)
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0xEDB88320 ^ (c >> 1)) if (c & 1) else (c >> 1)
            tbl.append(c)
        _CRC_TABLE = tbl
    crc ^= 0xFFFFFFFF
    tbl = _CRC_TABLE
    for byte in data:
        crc = tbl[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8 RGB (alpha dropped, gray broadcast,
    palette expanded).  8-bit, non-interlaced; see module docstring."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        size, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if len(body) != size:
            raise ValueError("PNG: truncated chunk")
        want = struct.unpack_from(">I", payload, pos + 8 + size)[0]
        if crc32(payload[pos + 4: pos + 8 + size]) != want:
            raise ValueError("PNG: chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"PNG: only 8-bit supported (depth={depth})")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlacing unsupported")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {ctype_n}")
    ch = _CHANNELS[ctype_n]
    raw = zlib_decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed size mismatch")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    img = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ftype = lines[y, 0]
        cur = lines[y, 1:].astype(np.int64)
        if ftype == 0:
            row = cur
        elif ftype == 1:  # Sub — sequential in pixel units
            row = cur.copy()
            for x in range(ch, stride):
                row[x] = (row[x] + row[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            row = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            row = cur.copy()
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = cur.copy()
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[x] = (row[x] + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        img[y] = row
        prev = row
    px = img.astype(np.uint8).reshape(h, w, ch)
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 2:
        return px
    if ctype_n == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return plte[px[:, :, 0]]
    if ctype_n == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # 6: RGBA -> RGB


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG with filter-0 scanlines and stored
    DEFLATE blocks — byte-exact inverse of ``decode_png`` (tested)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = px.shape[:2]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib_compress_stored(raw))
        + chunk(b"IEND", b"")
    )
