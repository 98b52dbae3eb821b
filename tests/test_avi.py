"""MJPEG-in-AVI demux (functions/avi.py) + the END-TO-END real video
path through sample_frames/decode_media/probe_video: container demux
AND frame pixel decode with stdlib alone (H.264/MP4 frame pixels stay
honestly stubbed — those genuinely need ffmpeg)."""

from __future__ import annotations

import hashlib
import struct

import pytest

from nde_crawlers_spark.functions.avi import decode_avi, encode_avi_mjpeg, is_avi
from nde_crawlers_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _frame(w: int, h: int, seed: bytes) -> bytes:
    buf = bytearray()
    s = seed
    while len(buf) < w * h * 3:
        s = hashlib.sha256(s).digest()
        buf += s
    return encode_jpeg(w, h, bytes(buf[: w * h * 3]), channels=3, quality=90)


def test_roundtrip_demux():
    frames = [_frame(16, 16, bytes([i])) for i in range(5)]
    data = encode_avi_mjpeg(16, 16, 4, frames)
    assert is_avi(data)
    w, h, fps, out = decode_avi(data)
    assert (w, h, fps) == (16, 16, 4.0)
    assert out == frames  # byte-identical frame extraction
    # and each extracted frame is decodable by the repo's own codec
    for f in out:
        assert decode_jpeg(f)[:3] == (16, 16, 3)


def test_odd_sized_frames_word_alignment():
    """RIFF chunks are word-aligned: odd-length JPEG frames must demux
    byte-identically (the pad byte never leaks into the payload)."""
    frames = []
    i = 0
    while len(frames) < 2:  # find two odd-length frames
        f = _frame(16, 16, bytes([100 + i]))
        i += 1
        if len(f) & 1:
            frames.append(f)
    data = encode_avi_mjpeg(16, 16, 2, frames)
    assert decode_avi(data)[3] == frames


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        decode_avi(b"RIFFxxxxWAVE")  # wrong RIFF type
    good = encode_avi_mjpeg(16, 16, 4, [_frame(16, 16, b"x")])
    with pytest.raises(ValueError):
        decode_avi(good[:40])
    # non-MJPEG stream is declared, not mangled
    bad = bytearray(good)
    at = bad.find(b"vidsMJPG")
    bad[at + 4:at + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg|MJPEG|H264"):
        decode_avi(bytes(bad))


def test_video_end_to_end_through_spark(spark):
    """The full real video path: synthetic .avi payloads are valid
    MJPEG AVIs; probe_video reads real metadata, sample_frames emits
    the ACTUAL per-frame JPEGs (decodable, correct geometry), and
    decode_media derives a real first-frame luma feature."""
    from pyspark.sql import functions as F

    from nde_crawlers_spark.functions.png import luma_features
    from nde_crawlers_spark.operators.multimodal import (
        _PNG_H,
        _PNG_W,
        decode_media,
        media_table_from_spans,
        probe_video,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "media", "text": "", "media_ref": "http://x/a.avi", "off": 0},
                    {"kind": "media", "text": "", "media_ref": "http://x/b.avi", "off": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,off:int>>",
    )
    media = media_table_from_spans(docs).cache()
    payloads = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
    assert all(is_avi(p) for p in payloads.values())

    probed = {r["media_ref"]: r for r in probe_video(media, fake=False).collect()}
    for ref, raw in payloads.items():
        w, h, fps, fr = decode_avi(raw)
        assert (probed[ref]["width"], probed[ref]["height"]) == (w, h)
        assert probed[ref]["duration_ms"] == int(len(fr) * 1000 / fps)
        assert probed[ref]["brand"] == "AVI "

    # sampled frame payloads ARE the container's JPEG frames
    per: dict = {}
    for r in sample_frames(media, every_ms=250, max_frames=3, fake=False).collect():
        per.setdefault(r["media_ref"], []).append(r)
    for ref, rows in per.items():
        _, _, fps, fr = decode_avi(payloads[ref])
        step = max(1, int(round(250 * fps / 1000.0)))
        expect = fr[::step][:3]
        got = [bytes(r["payload"]) for r in sorted(rows, key=lambda r: r["frame_idx"])]
        assert got == expect
        for g in got:
            assert decode_jpeg(g)[:3] == (_PNG_W, _PNG_H, 3)

    # decode_media: real first-frame pixel feature for AVI rows
    dec = {r["media_ref"]: r for r in decode_media(media, fake=False).collect()}
    for ref, raw in payloads.items():
        _, _, _, fr = decode_avi(raw)
        fw, fh, fch, fpx = decode_jpeg(fr[0])
        assert [round(float(x), 6) for x in dec[ref]["feature"]] == \
            luma_features(fw, fh, fch, fpx, 8)
        assert (dec[ref]["width"], dec[ref]["height"]) == (_PNG_W, _PNG_H)
    media.unpersist()

def test_frameless_avi_is_honest_empty_not_crash(spark):
    """A valid-header MJPEG AVI with zero frame chunks demuxes to
    frames=[] and decode_media degrades to the MP4-style honest row
    (real geometry, empty feature) instead of IndexError-ing the
    whole Arrow batch."""
    from nde_crawlers_spark.operators.multimodal import decode_media

    data = encode_avi_mjpeg(16, 16, 4, [])
    w, h, fps, fr = decode_avi(data)
    assert (w, h, fps, fr) == (16, 16, 4.0, [])

    media = spark.createDataFrame(
        [("http://x/empty.avi", "video", bytearray(data))],
        "media_ref string, media_kind string, payload binary",
    )
    rows = decode_media(media, fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"]) == (16, 16)
    assert list(r["feature"]) == []


def test_00db_frame_chunks_are_collected():
    """Real-world MJPEG AVIs often store frames as '00db' chunks; the
    demux must accept them alongside '00dc'."""
    frames = [_frame(16, 16, bytes([i])) for i in range(3)]
    data = encode_avi_mjpeg(16, 16, 4, frames)
    # rewrite every frame chunk id 00dc -> 00db in place
    swapped = data.replace(b"00dc", b"00db")
    assert b"00dc" not in swapped
    assert decode_avi(swapped)[3] == frames


def test_strh_carries_rcframe_tail():
    """The strh body must be the spec-canonical 56 bytes — fields
    through dwSampleSize end at offset 48, and the 8-byte rcFrame RECT
    (left, top, right, bottom) occupies 48..56 (r9: the r8 body carried
    one extra DWORD past dwSampleSize, so a spec-strict parser read
    rcFrame as zeros with 4 trailing bytes)."""
    data = encode_avi_mjpeg(32, 24, 4, [])
    at = data.find(b"strh")
    (length,) = struct.unpack("<I", data[at + 4:at + 8])
    assert length == 56
    body = data[at + 8:at + 8 + length]
    assert struct.unpack("<4H", body[48:56]) == (0, 0, 32, 24)
