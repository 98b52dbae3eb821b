"""Pure-stdlib ISO BMFF (MP4) metadata probe: box walk + header parse.

The reference stores media as URL + encodingFormat metadata and never
decodes payloads (zenodo/files/zenodo.py:143-149). Video FRAME decode
genuinely needs a codec (ffmpeg, absent in this container — honest
stub, FIXTURES.md), but the MP4 *container* is a plain
length-prefixed box tree: track geometry, duration, and timescale live
in fixed-layout ``mvhd``/``tkhd``/``mdhd`` headers that struct alone
can parse. That makes the metadata half of the video column REAL —
the part a 100-TB curation pipeline actually filters on (resolution /
duration gates) before ever paying for frame extraction.

Scope: box walk over any ISO BMFF file; parsed headers are version 0
and version 1 ``mvhd``/``tkhd``/``mdhd``. The writer emits a minimal
valid ``ftyp + moov(mvhd, trak(tkhd, mdia(mdhd))) + mdat`` tree for
fixtures and the synthetic media-fetch stand-in.
"""

from __future__ import annotations

import struct


def is_mp4(data: bytes) -> bool:
    """True iff the payload starts with a plausible ftyp box."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) at one nesting level."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def probe_mp4(data: bytes) -> dict:
    """Parse container metadata: ``{duration_ms, timescale, n_tracks,
    width, height, brand}`` — width/height from the first video track's
    ``tkhd`` (16.16 fixed point), duration from ``mvhd``. Raises
    ValueError on malformed boxes / missing moov."""
    data = bytes(data)
    if not is_mp4(data):
        raise ValueError("not an MP4: no ftyp box")
    out = {"duration_ms": None, "timescale": None, "n_tracks": 0,
           "width": None, "height": None, "brand": None}

    def visit(start: int, end: int) -> None:
        for btype, body, nxt in _walk(data, start, end):
            if btype == b"ftyp":
                out["brand"] = data[body:body + 4].decode("ascii", "replace")
            elif btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", data[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(">II", data[body + 12:body + 20])
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
            elif btype == b"tkhd":
                out["n_tracks"] += 1
                ver = data[body]
                w_off = body + (88 if ver == 1 else 76)
                (w_fx,) = struct.unpack(">I", data[w_off:w_off + 4])
                (h_fx,) = struct.unpack(">I", data[w_off + 4:w_off + 8])
                if w_fx and out["width"] is None:
                    out["width"] = w_fx >> 16
                    out["height"] = h_fx >> 16
            if btype in _CONTAINERS:
                visit(body, nxt)

    visit(0, len(data))
    if out["timescale"] is None:
        raise ValueError("MP4 missing moov/mvhd")
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def encode_mp4_stub(width: int, height: int, duration_ms: int,
                    timescale: int = 1000, mdat: bytes = b"") -> bytes:
    """Minimal VALID ISO BMFF file: real ftyp/moov/mvhd/tkhd/mdhd
    headers carrying the given geometry/duration (what ``probe_mp4``
    and any standards-conforming demuxer reads) and an opaque ``mdat``
    payload (no codec data — frame decode is out of scope by design)."""
    dur = duration_ms * timescale // 1000
    matrix = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                         0x40000000)
    if dur > 0xFFFFFFFF:
        # Tick count exceeds 32 bits: real muxers switch to version-1
        # (64-bit creation/modification/duration) headers, and probe_mp4
        # above already parses them. Version 0 would overflow struct 'I'.
        mvhd = _box(b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0, timescale, dur)
                    + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                    + b"\x00" * 10 + matrix
                    + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _box(b"tkhd", struct.pack(">B3xQQII", 1, 0, 0, 1, 0)
                    + struct.pack(">Q", dur) + b"\x00" * 16 + matrix
                    + struct.pack(">II", width << 16, height << 16))
        mdhd = _box(b"mdhd", struct.pack(">B3xQQIQHH", 1, 0, 0, timescale,
                                         dur, 0x55C4, 0))
    else:
        mvhd = _box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
                    + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                    + b"\x00" * 10 + matrix
                    + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _box(b"tkhd", struct.pack(">B3xIIII", 0, 0, 0, 1, 0)
                    + struct.pack(">I", dur) + b"\x00" * 16 + matrix
                    + struct.pack(">II", width << 16, height << 16))
        mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale, dur,
                                         0x55C4, 0))
    mdia = _box(b"mdia", mdhd)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    return ftyp + moov + _box(b"mdat", mdat)
