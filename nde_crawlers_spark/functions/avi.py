"""Pure-stdlib AVI (RIFF) container + MJPEG frame extraction.

Video FRAME decode for modern codecs (H.264 in MP4) genuinely needs
ffmpeg (absent in this container — honest stub, FIXTURES.md). But the
classic MJPEG-in-AVI format needs neither: AVI is the same RIFF chunk
walk as WAV (functions/wav.py), and every frame chunk is a standalone
baseline JPEG the repo's own codec (functions/jpeg.py) already
decodes. That makes ``sample_frames`` REAL end-to-end for one video
format — container demux AND frame pixel decode — with zero external
libraries; the same boundary microscopy/instrument archives sit on
(MJPEG is the standard capture format for scientific cameras).

Scope: single-video-stream AVI, ``00dc`` frame chunks containing
baseline JPEG; the writer emits a minimal valid
``RIFF(AVI )[LIST hdrl(avih, LIST strl(strh, strf)), LIST movi]``
tree for fixtures and the synthetic media-fetch stand-in.
"""

from __future__ import annotations

import struct


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) at one RIFF nesting level
    (word-aligned chunks)."""
    pos = start
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + length > end:
            raise ValueError("truncated AVI chunk")
        yield cid, body, body + length
        pos = body + length + (length & 1)


def decode_avi(data: bytes) -> tuple[int, int, float, list[bytes]]:
    """Demux an MJPEG AVI to ``(width, height, fps, frames)`` where
    ``frames`` is the list of per-frame JPEG byte strings (decodable by
    functions/jpeg.py). Raises ValueError on malformed containers and
    NotImplementedError for non-MJPEG streams."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI: bad RIFF/AVI magic")
    info = {"w": None, "h": None, "us_per_frame": None, "codec": None}
    frames: list[bytes] = []

    def visit(start: int, end: int) -> None:
        for cid, body, nxt in _walk(data, start, end):
            if cid == b"LIST":
                visit(body + 4, nxt)  # skip the list-type fourcc
            elif cid == b"avih":
                (info["us_per_frame"],) = struct.unpack("<I", data[body:body + 4])
                info["w"], info["h"] = struct.unpack("<II", data[body + 32:body + 40])
            elif cid == b"strh" and data[body:body + 4] == b"vids":
                info["codec"] = data[body + 4:body + 8]
            elif cid in (b"00dc", b"00db"):
                # compressed ('dc') and uncompressed-flagged ('db')
                # frame chunks both carry MJPEG data in the wild
                frames.append(data[body:nxt])

    visit(12, len(data))
    if info["w"] is None:
        raise ValueError("AVI missing avih header")
    if info["codec"] not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"non-MJPEG AVI stream ({info['codec']!r}) needs ffmpeg")
    fps = 1e6 / info["us_per_frame"] if info["us_per_frame"] else 0.0
    return int(info["w"]), int(info["h"]), fps, frames


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(width: int, height: int, fps: int,
                     frames: list[bytes]) -> bytes:
    """Minimal VALID single-stream MJPEG AVI around the given JPEG
    frame byte strings (standards-conforming hdrl + movi; no idx1 —
    optional per the spec and unused by the sequential demux)."""
    uspf = 1_000_000 // max(1, fps)
    avih = _chunk(b"avih", struct.pack(
        "<IIIIIIIIII4x4x4x4x",
        uspf, 0, 0, 0x10, len(frames), 0, 1, 0, width, height))
    # body ends at dwSampleSize (offset 48) so the 4H rect lands exactly
    # on rcFrame and the body is the canonical 56 bytes (r8 ADVICE: the
    # earlier pack carried one extra DWORD past dwSampleSize, shifting
    # rcFrame to offset 52 for a spec-strict parser)
    strh = _chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height))  # rcFrame per spec
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)
