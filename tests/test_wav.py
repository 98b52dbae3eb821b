"""Pure-stdlib WAV codec (functions/wav.py) + the real audio decode /
resample paths through decode_media/resample_audio — the audio analog
of the r7 PNG work: multimodal ``fake=False`` becomes REAL for
canonical RIFF/PCM without pip (compressed audio stays honestly
stubbed)."""

from __future__ import annotations

import struct

import pytest

from nde_crawlers_spark.functions.wav import (
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
    resample_nearest,
)


@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("sampwidth", [1, 2])
def test_roundtrip(channels, sampwidth):
    """Every (channels, sampwidth) combination round-trips bit-exactly."""
    n = 37 * channels  # odd frame count
    if sampwidth == 2:
        samples = [((i * 2731) % 65536) - 32768 for i in range(n)]
    else:
        samples = [(i * 37) % 256 for i in range(n)]
    data = encode_wav(11025, channels, samples, sampwidth=sampwidth)
    assert is_wav(data)
    rate, ch, sw, out = decode_wav(data)
    assert (rate, ch, sw) == (11025, channels, sampwidth)
    assert out == samples


def test_hand_built_wav_with_extra_and_odd_chunks():
    """A WAV assembled by hand — LIST chunk before fmt, an ODD-length
    chunk (word-aligned padding per RIFF) between fmt and data — still
    decodes: the chunk walk must skip unknown chunks and honor the pad
    byte."""
    pcm = struct.pack("<4h", 100, -200, 300, -400)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"junk!"  # length 5 -> 1 pad byte
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"oddc" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, ch, sw, smp = decode_wav(raw)
    assert (rate, ch, sw) == (8000, 1, 2)
    assert smp == [100, -200, 300, -400]


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"nope")
    # truncated data chunk
    good = encode_wav(8000, 1, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        decode_wav(good[:-3])
    # missing data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    nodata = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE" \
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(ValueError):
        decode_wav(nodata)
    # non-PCM format tag
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt \
        + b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    # unsupported width
    with pytest.raises(NotImplementedError):
        encode_wav(8000, 1, [0], sampwidth=3)


def test_audio_features_constant_amplitude():
    """Constant |amplitude| A mono -> every bin exactly A/32767 (pure
    integer arithmetic up to the final division)."""
    samples = [1000, -1000] * 40
    feats = audio_features(8000, 1, 2, samples, feature_dim=8)
    assert feats == [round(1000 / 32767, 6)] * 8


def test_audio_features_8bit_offset_and_stereo_mix():
    # 8-bit is stored unsigned: silence = 128 -> feature 0
    assert audio_features(8000, 1, 1, [128] * 32, 4) == [0.0] * 4
    # stereo frames mono-mix by integer mean: (300 + 100)//2 = 200
    feats = audio_features(8000, 2, 2, [300, 100] * 16, 4)
    assert feats == [round(200 / 32767, 6)] * 4


def test_resample_nearest():
    samples = [0, 10, 20, 30, 40, 50]
    # identity
    assert resample_nearest(samples, 1, 8000, 8000) == samples
    # 2x upsample repeats each frame twice (nearest)
    up = resample_nearest(samples, 1, 4000, 8000)
    assert up == [0, 0, 10, 10, 20, 20, 30, 30, 40, 40, 50, 50]
    # 2x downsample keeps every other frame
    assert resample_nearest(samples, 1, 8000, 4000) == [0, 20, 40]
    # stereo keeps frames interleaved
    st = resample_nearest([1, 2, 3, 4], 2, 4000, 8000)
    assert st == [1, 2, 1, 2, 3, 4, 3, 4]


def test_decode_media_real_wav_path(spark):
    """End-to-end through Spark: synthetic .wav payloads are VALID
    RIFF/PCM files, decode_media(fake=False) on the audio subset
    returns the true (frames, sample_rate) in the (width, height) shape
    columns and a feature derived from the actual PCM."""
    from pyspark.sql import functions as F

    from nde_crawlers_spark.operators.multimodal import (
        _WAV_FRAMES,
        _WAV_RATE,
        decode_media,
        media_table_from_spans,
        resample_audio,
    )

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {"kind": "media", "text": "", "media_ref": "http://x/a.wav", "off": 0},
                    {"kind": "media", "text": "", "media_ref": "http://x/b.wav", "off": 1},
                    {"kind": "media", "text": "", "media_ref": "http://x/c.mp4", "off": 2},
                ],
            )
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,off:int>>",
    )
    media = media_table_from_spans(docs).cache()
    wavs = media.filter(F.col("media_ref").endswith(".wav"))

    # payloads are decodable WAVs with the documented geometry, and the
    # executor-side feature matches a driver-side recompute exactly
    got = {
        x["media_ref"]: x for x in decode_media(wavs, fake=False).collect()
    }
    assert len(got) == 2
    for r in wavs.collect():
        rate, ch, sw, smp = decode_wav(bytes(r["payload"]))
        assert (rate, ch, len(smp)) == (_WAV_RATE, 1, _WAV_FRAMES)
        row = got[r["media_ref"]]
        assert (row["width"], row["height"]) == (_WAV_FRAMES, _WAV_RATE)
        ref_feat = audio_features(rate, ch, sw, smp, 8)
        assert [round(float(f), 6) for f in row["feature"]] == ref_feat

    # real resample: output payloads are themselves valid WAVs at the
    # target rate with the nearest-frame length
    res = {x["media_ref"]: x for x in resample_audio(media, rate=4000).collect()}
    assert set(res) == set(got)  # audio rows only (mp4 filtered out)
    for ref, row in res.items():
        rate, ch, sw, smp = decode_wav(bytes(row["payload"]))
        assert rate == 4000 and row["sample_rate"] == 4000
        assert len(smp) // ch == _WAV_FRAMES * 4000 // _WAV_RATE == row["frames"]

    # non-WAV audio without fake= raises (honest stub), with fake= passes
    fake_audio = spark.createDataFrame(
        [("http://x/d.mp3", "audio", b"\x00\x01\x02")],
        "media_ref string, media_kind string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg|librosa"):
        resample_audio(fake_audio, rate=4000).collect()
    assert resample_audio(fake_audio, rate=4000, fake=True).count() == 1
