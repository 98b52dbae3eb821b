"""Pure-stdlib baseline JPEG codec (functions/jpeg.py) + the real JPEG
decode/resize paths through decode_media/resize_images — closes the
last stubbed IMAGE format (video stays honestly stubbed). JPEG is
lossy, so round-trips assert bounded error, not bit equality; the
transform core is additionally pinned against an independent
direct-form 2D DCT."""

from __future__ import annotations

import hashlib
import math
import struct

import pytest

from nde_crawlers_spark.functions.jpeg import (
    ZIGZAG,
    _fdct_block,
    _idct_block,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _smooth(w: int, h: int, ch: int) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                out.append(min(255, 60 + x * 3 + y * 2 + c * 10))
    return bytes(out)


def _noise(w: int, h: int, ch: int, seed: bytes = b"px") -> bytes:
    buf = bytearray()
    s = hashlib.sha256(seed).digest()
    while len(buf) < w * h * ch:
        s = hashlib.sha256(s).digest()
        buf += s
    return bytes(buf[: w * h * ch])


def test_dct_against_independent_direct_form():
    """The codec's separable FDCT/IDCT pair must match a from-scratch
    direct-form 2D DCT-II / DCT-III (different author, different
    formulation) to float precision, and invert each other."""
    samples = [((x * 7 + y * 13) % 256) for y in range(8) for x in range(8)]

    def direct_fdct(s):
        out = [0.0] * 64
        for v in range(8):
            for u in range(8):
                acc = 0.0
                for y in range(8):
                    for x in range(8):
                        acc += (s[y * 8 + x] - 128) \
                            * math.cos((2 * x + 1) * u * math.pi / 16) \
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                out[v * 8 + u] = acc * cu * cv / 4
        return out

    mine = _fdct_block(samples)
    ref = direct_fdct(samples)
    assert max(abs(a - b) for a, b in zip(mine, ref)) < 1e-9
    # inversion: IDCT(FDCT(x)) == x exactly after rounding (energy is
    # preserved, values already integers in [0,255])
    back = _idct_block(mine)
    assert back == samples


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


@pytest.mark.parametrize("ch,sub", [(1, "444"), (3, "444"), (3, "420")])
def test_roundtrip_smooth_bounded_error(ch, sub):
    w, h = 24, 16
    px = _smooth(w, h, ch)
    data = encode_jpeg(w, h, px, channels=ch, quality=95, subsampling=sub)
    assert is_jpeg(data)
    dw, dh, dch, dpx = decode_jpeg(data)
    assert (dw, dh, dch) == (w, h, ch)
    maxerr = max(abs(a - b) for a, b in zip(px, dpx))
    assert maxerr <= 4, f"smooth image maxerr {maxerr} at q95"


def test_roundtrip_noise_dims_and_determinism():
    """Noise is the worst case for a lossy codec — geometry must still
    be exact, error bounded by quantization, and the encoder fully
    deterministic."""
    px = _noise(16, 16, 3)
    d1 = encode_jpeg(16, 16, px, channels=3, quality=90)
    d2 = encode_jpeg(16, 16, px, channels=3, quality=90)
    assert d1 == d2
    dw, dh, dch, dpx = decode_jpeg(d1)
    assert (dw, dh, dch) == (16, 16, 3)
    mean = sum(abs(a - b) for a, b in zip(px, dpx)) / len(px)
    assert mean < 20  # bounded by quant tables, not garbage


def test_non_multiple_of_8_dims():
    """Edge-replicated padding: odd dims decode back at exactly the
    declared geometry (the padded samples never escape)."""
    w, h = 13, 9
    px = _smooth(w, h, 3)
    for sub in ("444", "420"):
        dw, dh, dch, dpx = decode_jpeg(
            encode_jpeg(w, h, px, 3, quality=95, subsampling=sub))
        assert (dw, dh, dch) == (w, h, 3)
        assert len(dpx) == w * h * 3


def test_restart_markers_roundtrip():
    """DRI + RSTn: the restarted stream must decode to EXACTLY the same
    pixels as the plain encoding of the same input (predictor resets and
    byte-alignment handled), for both subsamplings."""
    px = _smooth(40, 24, 3)
    for sub in ("444", "420"):
        plain = decode_jpeg(encode_jpeg(40, 24, px, 3, quality=95, subsampling=sub))
        rst = decode_jpeg(encode_jpeg(40, 24, px, 3, quality=95, subsampling=sub,
                                      restart_interval=2))
        assert plain == rst
    # markers actually present
    d = encode_jpeg(40, 24, px, 3, quality=95, restart_interval=2)
    n_markers = sum(d.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_markers >= 7  # 5x3 MCUs, interval 2


def test_quality_monotonicity():
    """Lower quality -> smaller payload and >= error (sanity of the
    libjpeg-style table scaling)."""
    px = _noise(16, 16, 3, seed=b"q")
    sizes, errs = [], []
    for q in (95, 50, 10):
        d = encode_jpeg(16, 16, px, 3, quality=q)
        _, _, _, dpx = decode_jpeg(d)
        sizes.append(len(d))
        errs.append(sum(abs(a - b) for a, b in zip(px, dpx)) / len(px))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[1] < errs[2]


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    good = encode_jpeg(8, 8, _smooth(8, 8, 1), channels=1)
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated before SOS
    # progressive SOF2 is declared, not silently mangled
    prog = bytearray(good)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive|baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(NotImplementedError):
        encode_jpeg(8, 8, bytes(8 * 8 * 2), channels=2)
    with pytest.raises(NotImplementedError):
        encode_jpeg(8, 8, _smooth(8, 8, 3), channels=3, subsampling="422")


def test_decode_media_real_jpeg_path(spark):
    """End-to-end through Spark: synthetic .jpg payloads are VALID
    baseline 4:2:0 JPEGs; decode_media(fake=False) returns their true
    geometry and a pixel-derived feature, and resize_images re-encodes
    them as real JPEGs of the target size."""
    from pyspark.sql import functions as F

    from nde_crawlers_spark.functions.png import luma_features
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
                    {"kind": "media", "text": "", "media_ref": "http://x/a.jpg", "off": 0},
                    {"kind": "media", "text": "", "media_ref": "http://x/b.jpg", "off": 1},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,off:int>>",
    )
    media = media_table_from_spans(docs).cache()
    rows = media.collect()
    assert len(rows) == 2
    got = {r["media_ref"]: r for r in decode_media(media, fake=False).collect()}
    for r in rows:
        w, h, ch, px = decode_jpeg(bytes(r["payload"]))
        assert (w, h, ch) == (_PNG_W, _PNG_H, 3)
        ref_feat = luma_features(w, h, ch, px, 8)
        assert [round(float(f), 6) for f in got[r["media_ref"]]["feature"]] == ref_feat
        assert (got[r["media_ref"]]["width"], got[r["media_ref"]]["height"]) == (w, h)

    rs = resize_images(media, width=8, height=4, fake=False).collect()
    assert len(rs) == 2
    for r in rs:
        assert decode_jpeg(bytes(r["payload"]))[:3] == (8, 4, 3)
    media.unpersist()

def test_truncated_entropy_stream_raises_valueerror():
    """A stream cut mid-entropy-data — including exactly AT a 0xFF
    byte — must raise ValueError per decode_jpeg's contract, never
    IndexError (ADVICE r7: _BitReader._fill read data[pos+1] without a
    bounds check; align_past_restart scanned without an end guard)."""
    import pytest

    from nde_crawlers_spark.functions.jpeg import decode_jpeg, encode_jpeg

    full = encode_jpeg(16, 16, bytes(range(256)) * 3, channels=3,
                       quality=85, restart_interval=1)
    # entropy data starts right after the SOS header; chop at every
    # prefix ending in 0xFF and a few arbitrary cuts
    sos = full.find(b"\xff\xda")
    start = sos + 2 + int.from_bytes(full[sos + 2:sos + 4], "big")
    cuts = [i + 1 for i in range(start, len(full) - 2) if full[i] == 0xFF]
    for cut in cuts[:8] + [start + 1, start + 3, len(full) - 3]:
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])
