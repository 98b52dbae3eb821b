"""Pure-stdlib baseline JPEG codec: Huffman entropy coding + 8x8 DCT.

The reference stores media as URL + encodingFormat metadata and never
decodes payloads (zenodo/files/zenodo.py:143-149); real decode is the
training-data-pipeline extension this repo adds. PIL cannot be
installed in this container (no network egress, FIXTURES.md), but
baseline JPEG needs no library: the format is standard Huffman tables
over quantized 8x8 DCT blocks, all expressible with ints and
``math.cos`` — the same move functions/png.py (zlib scanlines) and
functions/wav.py (RIFF/PCM) made. This closes the last stubbed IMAGE
format; video stays honestly stubbed (containers + motion compensation
genuinely need ffmpeg).

Scope (raises NotImplementedError outside it): baseline sequential DCT
(SOF0), 8-bit samples, 1-component grayscale or 3-component YCbCr with
4:4:4 / 4:2:2 / 4:2:0 subsampling, restart markers honored.
Progressive (SOF2) and arithmetic coding are out of scope.

The decoder is exact w.r.t. the spec's reference float IDCT; the
encoder (4:4:4, Annex K standard tables with libjpeg-style quality
scaling) exists for fixtures and the synthetic media-fetch stand-in.
JPEG is lossy, so round-trip tests assert bounded per-pixel error, not
bit equality — and the decoder is additionally pinned against an
independent direct-form DCT-III in the tests.
"""

from __future__ import annotations

import math
import struct

SOI = b"\xff\xd8"

# zigzag scan order: index-in-scan -> (row, col) flattened to row*8+col
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 standard quantization tables (luminance, chrominance)
STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
STD_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 standard Huffman tables: (bits[1..16], values)
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT basis: COS[u][x] = cos((2x+1) u pi / 16), C[u] normalization
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:2] == SOI and data[2] == 0xFF


# --------------------------- Huffman machinery ----------------------------

def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per the canonical JPEG code
    assignment (codes of each length are consecutive)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    dec = _build_decode_table(bits, values)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_restart(self) -> None:
        """Skip to just past the next RSTn marker and byte-align."""
        self.buf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("truncated JPEG entropy data")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude v to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------- decoder ----------------------------------

def _idct_block(coef: list[float]) -> list[int]:
    """Reference float IDCT (ITU T.81 A.3.3) + level shift, clamped to
    [0,255]. Separable: rows then columns."""
    tmp = [0.0] * 64
    for r in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[r * 8 + u] * _COS[u][x]
            tmp[r * 8 + x] = s / 2
    out = [0] * 64
    for c in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + c] * _COS[v][y]
            val = int(round(s / 2)) + 128
            out[y * 8 + c] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``
    — pixels row-major, RGB for 3-component YCbCr, single-channel for
    grayscale. Raises ValueError on malformed streams and
    NotImplementedError outside baseline scope."""
    data = bytes(data)
    if not is_jpeg(data):
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = list(body[b + 1:b + 65])
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                nvals = sum(bits)
                vals = list(body[b + 17:b + 17 + nvals])
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                b += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = body[0], struct.unpack(">H", body[1:3])[0], \
                struct.unpack(">H", body[3:5])[0], body[5]
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": huff_dc[tt >> 4], "ac": huff_ac[tt & 0x0F]})
            return _decode_scan(data, pos + seglen, frame, scan, qt,
                                restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component sample planes at full MCU-padded resolution
    planes = []
    for c in scan:
        cw, ch = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(bytearray(cw * ch))
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_past_restart()
                pred = [0] * len(scan)
            try:
                for ci, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(reader, c, qt[c["tq"]], pred, ci)
                            _place_block(planes[ci], mcux * 8 * c["h"], blk,
                                         (mx * c["h"] + bx) * 8,
                                         (my * c["v"] + by) * 8)
            except _RestartMarker as e:
                # a marker may only sit BETWEEN restart intervals; one
                # inside an MCU means the stream lied about DRI
                raise ValueError(f"unexpected RST{e.marker - 0xD0} inside MCU") from e
            mcu_count += 1
    if len(scan) == 1:
        plane, cw = planes[0], mcux * 8
        px = bytearray(w * h)
        for y in range(h):
            px[y * w:(y + 1) * w] = plane[y * cw:y * cw + w]
        return w, h, 1, bytes(px)
    # upsample chroma to luma resolution, YCbCr -> RGB
    out = bytearray(w * h * 3)
    lw = mcux * 8 * scan[0]["h"]
    for y in range(h):
        for x in range(w):
            yy = planes[0][y * lw + x]
            cvals = []
            for ci in (1, 2):
                c = scan[ci]
                sx, sy = x * c["h"] // hmax, y * c["v"] // vmax
                cvals.append(planes[ci][sy * (mcux * 8 * c["h"]) + sx])
            cb, cr = cvals[0] - 128, cvals[1] - 128
            r = yy + 1.402 * cr
            g = yy - 0.344136 * cb - 0.714136 * cr
            b = yy + 1.772 * cb
            base = (y * w + x) * 3
            out[base] = _clamp8(r)
            out[base + 1] = _clamp8(g)
            out[base + 2] = _clamp8(b)
    return w, h, 3, bytes(out)


def _clamp8(v: float) -> int:
    i = int(round(v))
    return 0 if i < 0 else (255 if i > 255 else i)


def _decode_block(reader, comp, quant, pred, ci):
    t = reader.decode_symbol(comp["dc"])
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    zz = [0] * 64
    zz[0] = pred[ci] * quant[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(comp["ac"])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s) * quant[k]
        k += 1
    coef = [0.0] * 64
    for i, z in enumerate(ZIGZAG):
        coef[z] = zz[i]
    return _idct_block(coef)


def _place_block(plane, stride, block, x0, y0):
    for by in range(8):
        row = (y0 + by) * stride + x0
        plane[row:row + 8] = bytes(block[by * 8:(by + 1) * 8])


# ------------------------------- encoder ----------------------------------

def _scale_quant(table: list[int], quality: int) -> list[int]:
    """libjpeg quality scaling: 50 -> table as-is, 100 -> all ones."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (q * scale + 50) // 100)) for q in table]


def _fdct_block(samples: list[int]) -> list[float]:
    """Reference float FDCT (rows then columns), input level-shifted."""
    tmp = [0.0] * 64
    for r in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += (samples[r * 8 + x] - 128) * _COS[u][x]
            tmp[r * 8 + u] = s * _C[u] / 2
    out = [0.0] * 64
    for c in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + c] * _COS[v][y]
            out[v * 8 + c] = s * _C[v] / 2
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit magnitude code)."""
    if v == 0:
        return 0, 0
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t, v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw, plane, pw, ph, bx, by, quant_zz, dc_tab, ac_tab,
                  pred, ci):
    """FDCT + quantize + Huffman-encode one 8x8 block at block coords
    (bx, by) of a (pw x ph) plane, edge-replicated."""
    block = [0] * 64
    for y in range(8):
        for x in range(8):
            sx = min(bx * 8 + x, pw - 1)
            sy = min(by * 8 + y, ph - 1)
            block[y * 8 + x] = plane[sy * pw + sx]
    coef = _fdct_block(block)
    zz = [int(round(coef[ZIGZAG[i]] / quant_zz[i])) for i in range(64)]
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    t, mag = _magnitude(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(mag, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t, mag = _magnitude(zz[k])
        code, length = ac_tab[(run << 4) | t]
        bw.write(code, length)
        bw.write(mag, t)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 3,
                quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode row-major pixels (RGB for channels=3, gray for 1) as a
    baseline JPEG with Annex K standard Huffman tables. ``subsampling``
    is ``"444"`` or ``"420"`` (2x2-mean chroma downsample, ignored for
    gray); DQT payloads are written in canonical zigzag order;
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many MCUs (resynchronization points for parallel or
    error-resilient decode)."""
    if channels not in (1, 3):
        raise NotImplementedError("encoder supports gray or RGB input")
    if subsampling not in ("444", "420"):
        raise NotImplementedError("subsampling must be 444 or 420")
    luma_q = _scale_quant(STD_LUMA_Q, quality)
    chroma_q = _scale_quant(STD_CHROMA_Q, quality)
    luma_qzz = [luma_q[ZIGZAG[i]] for i in range(64)]
    chroma_qzz = [chroma_q[ZIGZAG[i]] for i in range(64)]
    # component planes (Y or Y/Cb/Cr) at their own resolutions
    if channels == 1:
        planes = [(list(pixels), width, height)]
        sampling = [(1, 1)]
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            ys.append(_clamp8(0.299 * r + 0.587 * g + 0.114 * b))
            cbs.append(_clamp8(128 - 0.168736 * r - 0.331264 * g + 0.5 * b))
            crs.append(_clamp8(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
        if subsampling == "420":
            cw, ch2 = (width + 1) // 2, (height + 1) // 2
            def down(p):
                out = []
                for y in range(ch2):
                    for x in range(cw):
                        acc = n = 0
                        for dy in range(2):
                            for dx in range(2):
                                sx, sy = 2 * x + dx, 2 * y + dy
                                if sx < width and sy < height:
                                    acc += p[sy * width + sx]
                                    n += 1
                        out.append(acc // n)
                return out
            planes = [(ys, width, height), (down(cbs), cw, ch2), (down(crs), cw, ch2)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [(ys, width, height), (cbs, width, height), (crs, width, height)]
            sampling = [(1, 1), (1, 1), (1, 1)]
    dc_tabs = [_build_encode_table(*STD_DC_LUMA)] + \
        [_build_encode_table(*STD_DC_CHROMA)] * 2
    ac_tabs = [_build_encode_table(*STD_AC_LUMA)] + \
        [_build_encode_table(*STD_AC_CHROMA)] * 2
    quants_zz = [luma_qzz] + [chroma_qzz] * 2

    bw = _BitWriter()
    pred = [0] * len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(planes)
            for ci, (plane, pw, ph) in enumerate(planes):
                sh, sv = sampling[ci]
                for byy in range(sv):
                    for bxx in range(sh):
                        _encode_block(bw, plane, pw, ph,
                                      mx * sh + bxx, my * sv + byy,
                                      quants_zz[ci], dc_tabs[ci], ac_tabs[ci],
                                      pred, ci)
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(SOI)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(luma_qzz))
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(chroma_qzz))
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for tc_tabs, tc in ((STD_DC_LUMA, 0x00), (STD_AC_LUMA, 0x10)):
        out += seg(0xC4, bytes([tc]) + bytes(tc_tabs[0]) + bytes(tc_tabs[1]))
    if channels == 3:
        for tc_tabs, tc in ((STD_DC_CHROMA, 0x01), (STD_AC_CHROMA, 0x11)):
            out += seg(0xC4, bytes([tc]) + bytes(tc_tabs[0]) + bytes(tc_tabs[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
