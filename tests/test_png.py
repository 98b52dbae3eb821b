"""Pure-stdlib PNG codec (functions/png.py) + the real PNG decode path
through decode_media/resize_images (r6 verdict task 4: multimodal
`fake=False` becomes REAL for one format, without pip)."""

from __future__ import annotations

import hashlib
import struct
import zlib
from binascii import crc32

import pytest

from nde_crawlers_spark.functions.png import (
    SIGNATURE,
    decode_png,
    encode_png,
    luma_features,
)


def _pixels(w: int, h: int, ch: int, seed: bytes = b"px") -> bytes:
    buf = bytearray()
    s = hashlib.sha256(seed).digest()
    while len(buf) < w * h * ch:
        s = hashlib.sha256(s).digest()
        buf += s
    return bytes(buf[: w * h * ch])


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_every_filter_and_color(filter_type, color_type, ch):
    """Every (un)filter branch (None/Sub/Up/Average/Paeth) x every
    non-palette color type round-trips bit-exactly."""
    w, h = 7, 5  # odd dims: stride not a multiple of the digest size
    px = _pixels(w, h, ch, seed=bytes([filter_type, color_type]))
    data = encode_png(w, h, px, color_type=color_type, filter_type=filter_type)
    assert data[:8] == SIGNATURE
    dw, dh, dch, dpx = decode_png(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert dpx == px


def test_palette_roundtrip():
    """Color type 3: indices resolve through PLTE to RGB."""
    w, h = 4, 3
    palette = bytes(range(30))  # 10 RGB entries
    idx = bytes([p % 10 for p in range(w * h)])
    data = encode_png(w, h, idx, color_type=3, filter_type=1, palette=palette)
    dw, dh, dch, dpx = decode_png(data)
    assert (dw, dh, dch) == (w, h, 3)
    expect = b"".join(palette[i * 3 : i * 3 + 3] for i in idx)
    assert dpx == expect


def test_hand_built_png_decodes():
    """A 2x2 RGB PNG assembled chunk-by-chunk in the test (independent
    of the encoder): red, green / blue, white with per-row filters
    None then Up."""

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", crc32(ctype + body) & 0xFFFFFFFF)
        )

    row0 = bytes([255, 0, 0, 0, 255, 0])
    # row1 filtered with Up (2): raw = target - row0 (mod 256)
    target1 = bytes([0, 0, 255, 255, 255, 255])
    row1 = bytes((t - p) & 0xFF for t, p in zip(target1, row0))
    raw = b"\x00" + row0 + b"\x02" + row1
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    data = (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(data)
    assert (w, h, ch) == (2, 2, 3)
    assert px == row0 + target1


def test_decode_rejects_out_of_scope():
    px = _pixels(2, 2, 3)
    good = encode_png(2, 2, px)
    assert decode_png(good)[3] == px
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    # flip IHDR interlace byte (offset: 8 sig + 8 hdr + 12 = last IHDR byte)
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(interlaced))
    depth16 = bytearray(good)
    depth16[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(bytes(depth16))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(good[:20])


def test_luma_features_pooling():
    # 4 pixels gray: 0, 51, 102, 255 -> 2 buckets of 2
    px = bytes([0, 51, 102, 255])
    f = luma_features(4, 1, 1, px, feature_dim=2)
    assert f == [round(25.5 / 255.0, 6), round(178.5 / 255.0, 6)]
    # RGB: integer luma (r+g+b)//3
    rgb = bytes([10, 20, 31, 0, 0, 0])
    f = luma_features(2, 1, 3, rgb, feature_dim=1)
    assert f == [round(10 / 255.0, 6)]  # (20 + 0) // 2 ... mean of 20,0 = 10


def test_decode_media_real_png_path(spark):
    """End-to-end through Spark: synthetic .png payloads are VALID PNGs,
    decode_media(fake=False) on the PNG subset returns their true
    geometry and a feature derived from the actual pixels."""
    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators.multimodal import (
        _PNG_H,
        _PNG_W,
        decode_media,
        media_table_from_spans,
        resize_images,
    )

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "media", "text": "", "media_ref": "http://x/a.png", "off": 0},
                    {"kind": "media", "text": "", "media_ref": "http://x/b.png", "off": 1},
                    {"kind": "media", "text": "", "media_ref": "http://x/c.jpg", "off": 2},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,off:int>>",
    )
    media = media_table_from_spans(docs).cache()
    pngs = media.filter(F.col("media_ref").endswith(".png"))

    # payloads are decodable PNGs with the documented geometry
    for r in pngs.collect():
        w, h, ch, px = decode_png(bytes(r["payload"]))
        assert (w, h, ch) == (_PNG_W, _PNG_H, 3)
        # driver-side reference feature for the same pixels
        ref_feat = luma_features(w, h, ch, px, 8)
        got = {
            x["media_ref"]: x["feature"]
            for x in decode_media(pngs, fake=False).collect()
        }
        assert got[r["media_ref"]] == pytest.approx(ref_feat)

    # the jpg row now decodes FOR REAL too (functions/jpeg.py), so the
    # whole image set passes fake=False with true geometry for both
    allrows = {r["media_ref"]: r for r in decode_media(media, fake=False).collect()}
    assert allrows["http://x/a.png"]["width"] == _PNG_W
    assert allrows["http://x/c.jpg"]["width"] == _PNG_W
    assert len(allrows) == 3

    # real resize: output payload is itself a valid 8x4 PNG
    rs = resize_images(pngs, width=8, height=4, fake=False).collect()
    assert len(rs) == 2
    for r in rs:
        w, h, ch, px = decode_png(bytes(r["payload"]))
        assert (w, h, ch) == (8, 4, 3)
    media.unpersist()
