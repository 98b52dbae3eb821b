"""Pure-stdlib ISO BMFF metadata probe (functions/mp4.py) + the real
video-metadata paths through probe_video/sample_frames/decode_media —
the metadata HALF of the video column is real (geometry/duration
gates); frame pixel decode stays honestly stubbed (needs a codec)."""

from __future__ import annotations

import struct

import pytest

from nde_crawlers_spark.functions.mp4 import encode_mp4_stub, is_mp4, probe_mp4


def test_roundtrip_probe():
    data = encode_mp4_stub(640, 360, 5000, timescale=600, mdat=b"opaque")
    assert is_mp4(data)
    m = probe_mp4(data)
    assert (m["width"], m["height"]) == (640, 360)
    assert m["duration_ms"] == 5000
    assert m["timescale"] == 600
    assert m["n_tracks"] == 1
    assert m["brand"] == "isom"


def test_probe_version1_headers():
    """Version-1 mvhd/tkhd (64-bit times) are the long-video form —
    build one by hand and probe it."""
    def box(t, b):
        return struct.pack(">I", len(b) + 8) + t + b

    ts, dur = 1000, 90_000
    mvhd = box(b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0, ts, dur)
               + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
               + b"\x00" * 10 + struct.pack(">9I", *([0x00010000, 0, 0, 0,
                                                      0x00010000, 0, 0, 0,
                                                      0x40000000]))
               + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">B3xQQI4xQ", 1, 0, 0, 1, dur)
               + b"\x00" * 16
               + struct.pack(">9I", *([0x00010000, 0, 0, 0, 0x00010000, 0,
                                       0, 0, 0x40000000]))
               + struct.pack(">II", 1920 << 16, 1080 << 16))
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    data = box(b"ftyp", b"isom\x00\x00\x02\x00isom") + moov
    m = probe_mp4(data)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["duration_ms"] == 90_000


def test_malformed():
    with pytest.raises(ValueError):
        probe_mp4(b"not an mp4 file....")
    # valid ftyp but no moov
    data = encode_mp4_stub(64, 64, 1000)
    no_moov = data[:16]  # just the ftyp box prefix... keep boxes intact:
    ftyp_len = struct.unpack(">I", data[:4])[0]
    with pytest.raises(ValueError):
        probe_mp4(data[:ftyp_len])
    # corrupt box size
    bad = bytearray(data)
    bad[ftyp_len] = 0xFF
    bad[ftyp_len + 1] = 0xFF
    with pytest.raises(ValueError):
        probe_mp4(bytes(bad))


def test_video_metadata_paths_through_spark(spark):
    """End-to-end through Spark: synthetic .mp4 payloads are VALID ISO
    BMFF containers; probe_video parses true geometry/duration,
    decode_media carries the probed geometry with an honestly-empty
    feature, and sample_frames derives its fan-out count from the REAL
    probed duration."""
    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators.multimodal import (
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
                    {"kind": "media", "text": "", "media_ref": "http://x/a.mp4", "off": 0},
                    {"kind": "media", "text": "", "media_ref": "http://x/b.mp4", "off": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,off:int>>",
    )
    media = media_table_from_spans(docs).cache()
    payloads = {r["media_ref"]: bytes(r["payload"]) for r in media.collect()}
    assert all(is_mp4(p) for p in payloads.values())

    probed = {r["media_ref"]: r for r in probe_video(media, fake=False).collect()}
    assert len(probed) == 2
    for ref, raw in payloads.items():
        m = probe_mp4(raw)
        row = probed[ref]
        assert (row["width"], row["height"]) == (m["width"], m["height"])
        assert row["duration_ms"] == m["duration_ms"]
        assert row["brand"] == "isom"

    dec = {r["media_ref"]: r for r in decode_media(media, fake=False).collect()}
    for ref in payloads:
        assert dec[ref]["width"] == probed[ref]["width"]
        assert list(dec[ref]["feature"]) == []  # no codec, no pixel features

    fr = sample_frames(media, every_ms=1000, max_frames=4, fake=False).collect()
    per: dict = {}
    for r in fr:
        per.setdefault(r["media_ref"], []).append(r)
    for ref, rows in per.items():
        dur = probed[ref]["duration_ms"]
        assert len(rows) == min(4, dur // 1000 + 1)  # REAL duration-driven
        assert sorted(r["frame_idx"] for r in rows) == list(range(len(rows)))
    media.unpersist()