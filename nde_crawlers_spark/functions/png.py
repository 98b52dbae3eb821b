"""Pure-stdlib PNG codec: zlib inflate/deflate + per-scanline (un)filter.

The reference stores media as URL + encodingFormat metadata and never
decodes payloads (zenodo/files/zenodo.py:143-149); real decode is the
training-data-pipeline extension this repo adds. PIL/ffmpeg cannot be
installed in this container (no network egress, FIXTURES.md), but PNG
needs neither: the format is zlib (stdlib) over filtered scanlines, so
``decode_media`` can be REAL for PNG payloads with ~100 lines of
stdlib. JPEG (DCT/Huffman) and video stay honestly stubbed.

Scope (raises NotImplementedError outside it): 8-bit samples, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced. That covers the overwhelming majority of real-world
PNGs; Adam7 interlace and 1/2/4/16-bit depths are rare and would only
add bulk here.

The encoder exists for fixtures and the synthetic media-fetch stand-in:
it writes any of the five filter types on every scanline so round-trip
tests exercise every unfilter branch (Sub/Up/Average/Paeth included).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel as stored in the IDAT stream
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string to ``(width, height, channels, pixels)``
    where ``pixels`` is row-major samples, palette already applied
    (color type 3 returns channels=3). Raises ValueError on a malformed
    stream and NotImplementedError outside the supported scope."""
    data = bytes(data)
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, idat = 8, None, b"", bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype, row = raw[off], bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y * stride:(y + 1) * stride] = row
        prev = row
    if color == 3:
        if not plte or len(plte) % 3:
            raise ValueError("palette PNG missing/odd PLTE")
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(out):
            rgb[i * 3:i * 3 + 3] = plte[idx * 3:idx * 3 + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(
        ">I", crc32(ctype + body) & 0xFFFFFFFF)


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2,
               filter_type: int = 0, palette: bytes | None = None) -> bytes:
    """Encode row-major 8-bit samples as a PNG. ``filter_type`` is
    applied to EVERY scanline (0..4) so tests can target each unfilter
    branch; ``palette`` (RGB triples) is required for color type 3."""
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match width*height*channels")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:
            raw += bytes((row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                         for i in range(stride))
        elif filter_type == 2:
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:
            raw += bytes((row[i] - (((row[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
                         for i in range(stride))
        else:
            raw += bytes((row[i] - _paeth(row[i - ch] if i >= ch else 0, prev[i],
                                          prev[i - ch] if i >= ch else 0)) & 0xFF
                         for i in range(stride))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    chunks = [_chunk(b"IHDR", ihdr)]
    if color_type == 3:
        if palette is None:
            raise ValueError("palette required for color type 3")
        chunks.append(_chunk(b"PLTE", palette))
    chunks.append(_chunk(b"IDAT", zlib.compress(bytes(raw), 6)))
    chunks.append(_chunk(b"IEND", b""))
    return SIGNATURE + b"".join(chunks)


def luma_features(width: int, height: int, channels: int, pixels: bytes,
                  feature_dim: int = 8) -> list[float]:
    """Deterministic pooled-luma feature: integer luma per pixel
    ((r+g+b)//3 for >=3 channels, the gray sample otherwise), pixels
    bucketed into ``feature_dim`` contiguous index ranges, bucket means
    normalized to [0,1] and rounded to 6 — pure integer arithmetic up to
    the final division, so bit-stable across platforms."""
    n = width * height
    sums = [0] * feature_dim
    counts = [0] * feature_dim
    for p in range(n):
        base = p * channels
        if channels >= 3:
            luma = (pixels[base] + pixels[base + 1] + pixels[base + 2]) // 3
        else:
            luma = pixels[base]
        b = p * feature_dim // n
        sums[b] += luma
        counts[b] += 1
    return [round(s / c / 255.0, 6) if c else 0.0 for s, c in zip(sums, counts)]
