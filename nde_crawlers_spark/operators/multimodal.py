"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference stores media as URLs-with-metadata (distribution.contentUrl
+ encodingFormat, zenodo/files/zenodo.py:143-149) and never decodes them.
A training-data pipeline must carry the payloads: this module defines the
Spark-side plumbing — schema, partitioning, Arrow batch shape — for
image/audio/video columns treated as opaque ``binary`` with a typed
metadata struct.

Image and WAV decode are REAL, all pure stdlib: ``functions/png.py``
(zlib inflate + per-scanline unfilter), ``functions/jpeg.py``
(baseline Huffman + 8x8 IDCT + chroma upsample — both image formats
yield actual geometry and a pooled-luma feature), and
``functions/wav.py`` (struct-level RIFF/PCM — actual frame count /
sample rate and a pooled-energy feature). Video container METADATA is
REAL too: ``functions/mp4.py`` walks the ISO BMFF box tree and
``functions/avi.py`` the AVI RIFF tree, so ``probe_video`` reads true
geometry/duration/track-count and ``sample_frames`` derives its
fan-out from the real duration — and for MJPEG AVI the sampled frame
PAYLOADS are the actual per-frame JPEGs, decodable by the repo's own
codec (video end-to-end for one format). Only the codec-bound parts
stay STUBBED — H.264/MP4 frame pixels and compressed audio (motion
compensation / MDCT genuinely need ffmpeg, absent in this container):
those rows raise NotImplementedError unless ``fake=True``, which
produces a deterministic fake from the bytes, keeping the whole
distributed path (mapInPandas signature, batch sizing, schema) real
and testable. On a cluster the stub body swaps for the real decoder;
nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),   # image | audio | video | other
        T.StructField("payload", T.BinaryType()),       # opaque bytes
        T.StructField("meta", T.StructType([
            T.StructField("content_type", T.StringType()),
            T.StructField("bytes", T.LongType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

_EXT_KIND = {
    "jpg": ("image", "image/jpeg"), "png": ("image", "image/png"),
    "mp4": ("video", "video/mp4"), "avi": ("video", "video/x-msvideo"),
    "wav": ("audio", "audio/wav"),
    "pdf": ("other", "application/pdf"),
}


_PNG_W = _PNG_H = 16


@F.pandas_udf(T.BinaryType())
def _synth_png(refs: pd.Series) -> pd.Series:
    """Deterministic 16x16 RGB PNG whose pixels are the sha256 stream of
    the ref — the sandbox stand-in for fetching a real image, except the
    bytes ARE a valid PNG so the real decoder downstream exercises the
    full inflate+unfilter path (Paeth filter on every scanline)."""
    from nde_crawlers_spark.functions.png import encode_png

    def one(ref: str) -> bytes:
        need = _PNG_W * _PNG_H * 3
        seed = hashlib.sha256(ref.encode()).digest()
        buf = bytearray()
        while len(buf) < need:
            seed = hashlib.sha256(seed).digest()
            buf += seed
        return encode_png(_PNG_W, _PNG_H, bytes(buf[:need]), color_type=2, filter_type=4)

    return refs.map(one)


@F.pandas_udf(T.BinaryType())
def _synth_jpeg(refs: pd.Series) -> pd.Series:
    """Deterministic 16x16 RGB baseline JPEG (4:2:0) whose pixels are
    the sha256 stream of the ref — the sandbox stand-in for fetching a
    real photo, except the bytes ARE a valid JPEG so the real decoder
    downstream exercises the full Huffman+IDCT+upsample path."""
    from nde_crawlers_spark.functions.jpeg import encode_jpeg

    def one(ref: str) -> bytes:
        need = _PNG_W * _PNG_H * 3
        seed = hashlib.sha256(ref.encode()).digest()
        buf = bytearray()
        while len(buf) < need:
            seed = hashlib.sha256(seed).digest()
            buf += seed
        return encode_jpeg(_PNG_W, _PNG_H, bytes(buf[:need]), channels=3,
                           quality=90, subsampling="420")

    return refs.map(one)


@F.pandas_udf(T.BinaryType())
def _synth_avi(refs: pd.Series) -> pd.Series:
    """Deterministic MJPEG AVI: 2-6 real 16x16 JPEG frames (pixel
    stream from the ref hash) in a valid RIFF container — the one video
    format whose frames the repo can decode END-TO-END (demux +
    pixels) with stdlib alone."""
    from nde_crawlers_spark.functions.avi import encode_avi_mjpeg
    from nde_crawlers_spark.functions.jpeg import encode_jpeg

    def one(ref: str) -> bytes:
        d = hashlib.sha256(ref.encode()).digest()
        n = 2 + d[0] % 5
        frames = []
        for i in range(n):
            need = _PNG_W * _PNG_H * 3
            seed = hashlib.sha256(d + bytes([i])).digest()
            buf = bytearray()
            while len(buf) < need:
                seed = hashlib.sha256(seed).digest()
                buf += seed
            frames.append(encode_jpeg(_PNG_W, _PNG_H, bytes(buf[:need]),
                                      channels=3, quality=90))
        return encode_avi_mjpeg(_PNG_W, _PNG_H, 4, frames)

    return refs.map(one)


@F.pandas_udf(T.BinaryType())
def _synth_mp4(refs: pd.Series) -> pd.Series:
    """Deterministic minimal-but-VALID ISO BMFF file whose geometry and
    duration derive from the ref hash (duration 1-8 s, even dims in
    [160, 478]) and whose mdat is the sha stream — the container
    headers are real, so the metadata probe downstream parses them for
    real; only frame DECODE stays out of scope (needs a codec)."""
    from nde_crawlers_spark.functions.mp4 import encode_mp4_stub

    def one(ref: str) -> bytes:
        d = hashlib.sha256(ref.encode()).digest()
        w = 160 + (d[0] % 160) * 2
        h = 120 + (d[1] % 120) * 2
        dur_ms = 1000 + (int.from_bytes(d[2:4], "big") % 7000)
        return encode_mp4_stub(w, h, dur_ms, mdat=d * 4)

    return refs.map(one)


_WAV_RATE, _WAV_FRAMES = 8000, 400


@F.pandas_udf(T.BinaryType())
def _synth_wav(refs: pd.Series) -> pd.Series:
    """Deterministic 8 kHz mono 16-bit WAV whose PCM is the sha256
    stream of the ref (byte pairs -> int16) — the sandbox stand-in for
    fetching real audio, except the bytes ARE a valid RIFF/PCM file so
    the real decoder downstream exercises the full chunk-walk path."""
    import struct as _struct

    from nde_crawlers_spark.functions.wav import encode_wav

    def one(ref: str) -> bytes:
        need = _WAV_FRAMES * 2
        seed = hashlib.sha256(ref.encode()).digest()
        buf = bytearray()
        while len(buf) < need:
            seed = hashlib.sha256(seed).digest()
            buf += seed
        samples = list(_struct.unpack(f"<{_WAV_FRAMES}h", bytes(buf[:need])))
        return encode_wav(_WAV_RATE, 1, samples, sampwidth=2)

    return refs.map(one)


def media_table_from_spans(docs: DataFrame) -> DataFrame:
    """Extract media spans from the documents table into the media schema,
    synthesizing a deterministic payload — the sandbox stand-in for the
    media fetch stage. ``.png`` refs get a REAL (valid, decodable) PNG
    payload, ``.jpg`` refs a REAL baseline 4:2:0 JPEG, and ``.wav``
    refs a REAL RIFF/PCM payload via the stdlib encoders; other kinds
    get the sha-stream bytes of the ref (opaque, as before)."""
    media = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    ext = F.element_at(F.split(F.col("media_ref"), r"\."), -1)
    kind = F.coalesce(
        *[F.when(ext == e, F.lit(k)) for e, (k, _) in _EXT_KIND.items()], F.lit("other")
    )
    ctype = F.coalesce(
        *[F.when(ext == e, F.lit(c)) for e, (_, c) in _EXT_KIND.items()],
        F.lit("application/octet-stream"),
    )
    payload = (
        F.when(ext == "png", _synth_png(F.col("media_ref")))
        .when(ext == "jpg", _synth_jpeg(F.col("media_ref")))
        .when(ext == "wav", _synth_wav(F.col("media_ref")))
        .when(ext == "mp4", _synth_mp4(F.col("media_ref")))
        .when(ext == "avi", _synth_avi(F.col("media_ref")))
        .otherwise(F.to_binary(F.sha2(F.col("media_ref"), 256), F.lit("hex")))
    )
    return media.select(
        "media_ref",
        kind.alias("media_kind"),
        payload.alias("payload"),
        F.struct(ctype.alias("content_type"), F.length(payload).cast("long").alias("bytes")).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = False, feature_dim: int = 8) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    PNG payloads (detected by signature) are decoded FOR REAL via the
    stdlib codec (functions/png.py): actual width/height plus a pooled
    integer-luma feature. WAV payloads likewise (functions/wav.py):
    pooled-energy feature, with the (width, height) columns carrying
    the audio shape analog (frames, sample_rate). For every other
    format: ``fake=False`` raises NotImplementedError inside the UDF
    (JPEG/video/compressed-audio decoder libs absent in this
    container); ``fake=True`` emits a deterministic fake feature vector
    derived from the payload bytes, so partitioning/batching/schema are
    exercised end-to-end regardless of format."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nde_crawlers_spark.functions.avi import decode_avi, is_avi
        from nde_crawlers_spark.functions.jpeg import decode_jpeg, is_jpeg
        from nde_crawlers_spark.functions.mp4 import is_mp4, probe_mp4
        from nde_crawlers_spark.functions.png import SIGNATURE, decode_png, luma_features
        from nde_crawlers_spark.functions.wav import audio_features, decode_wav, is_wav

        def _real(ref, kind, raw):
            """Decode one recognized payload, or None if no signature
            matches. Raises on malformed/unsupported streams — the
            caller decides whether that is fatal (fake=False) or falls
            back to the deterministic stub (fake=True)."""
            if raw[:8] == SIGNATURE:
                w, h, ch, px = decode_png(raw)
                return (ref, kind, luma_features(w, h, ch, px, feature_dim), w, h)
            if is_jpeg(raw):
                w, h, ch, px = decode_jpeg(raw)
                return (ref, kind, luma_features(w, h, ch, px, feature_dim), w, h)
            if is_wav(raw):
                rate, ch, sw, smp = decode_wav(raw)
                feat = audio_features(rate, ch, sw, smp, feature_dim)
                return (ref, kind, feat, len(smp) // ch, rate)
            if is_mp4(raw):
                # container metadata is REAL; pixel features need a
                # codec, so the feature is honestly empty
                m = probe_mp4(raw)
                return (ref, kind, [], m["width"] or 0, m["height"] or 0)
            if is_avi(raw):
                # MJPEG: frame pixels decode END-TO-END — real
                # geometry AND a real first-frame luma feature. A
                # valid container with zero frame chunks gets the
                # MP4-style honest empty feature instead of a crash.
                w, h, _fps, fr = decode_avi(raw)
                if not fr:
                    return (ref, kind, [], w, h)
                fw, fh, fch, fpx = decode_jpeg(fr[0])
                feat = luma_features(fw, fh, fch, fpx, feature_dim)
                return (ref, kind, feat, w, h)
            return None

        for pdf in batches:
            rows = []
            for ref, kind, payload in zip(pdf["media_ref"], pdf["media_kind"], pdf["payload"]):
                raw = bytes(payload)
                row = None
                if fake:
                    # fake mode is a TOTAL function: a truncated or
                    # unsupported-profile payload falls back to the
                    # deterministic stub instead of killing the batch.
                    # struct.error included (r8 ADVICE): avi/mp4 fixed-
                    # offset unpacks can raise it on short slices whose
                    # declared chunk length fits the file
                    try:
                        row = _real(ref, kind, raw)
                    except (ValueError, NotImplementedError, struct.error):
                        row = None
                else:
                    row = _real(ref, kind, raw)
                    if row is None:
                        raise NotImplementedError(
                            "frame/compressed-audio decode requires ffmpeg/librosa "
                            "(not in container); run with fake=True for the "
                            "deterministic stub"
                        )
                if row is None:
                    d = hashlib.sha256(raw).digest()
                    feat = [round(b / 255.0, 6) for b in d[:feature_dim]]
                    row = (ref, kind, feat, 16 + d[0] % 64, 16 + d[1] % 64)
                rows.append(row)
            yield pd.DataFrame(rows, columns=["media_ref", "media_kind", "feature", "width", "height"])

    # No repartition here: a shuffle at this point moves the binary
    # payloads themselves, which at production scale costs more than the
    # decode imbalance it fixes. Balance by repartitioning the *refs*
    # upstream (before payload materialization) or rely on input splits.
    cols = media.select("media_ref", "media_kind", "payload")
    return cols.mapInPandas(_decode, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = False) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage (1 row -> 1
    row, image rows only). PNG and JPEG payloads are resized FOR REAL:
    stdlib decode -> nearest-neighbor resample -> stdlib re-encode, so
    the output payload is itself a valid PNG/JPEG of the target
    geometry. Unknown formats are STUBBED behind ``fake``; the fake
    emits a deterministic payload of exactly width*height bytes so
    downstream size invariants stay testable. The Spark-side plumbing —
    filter pushdown to image rows, batch shape, binary output schema —
    is real for both paths."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nde_crawlers_spark.functions.jpeg import decode_jpeg, encode_jpeg, is_jpeg
        from nde_crawlers_spark.functions.png import SIGNATURE, decode_png, encode_png

        def _nearest(px, sw, sh, ch):
            out = bytearray(width * height * ch)
            for y in range(height):
                sy = y * sh // height
                for x in range(width):
                    sx = x * sw // width
                    src = (sy * sw + sx) * ch
                    dst = (y * width + x) * ch
                    out[dst:dst + ch] = px[src:src + ch]
            return bytes(out)

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:8] == SIGNATURE:
                    sw, sh, ch, px = decode_png(raw)
                    out = _nearest(px, sw, sh, ch)
                    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
                    rows.append((ref, encode_png(width, height, out, ctype), width, height))
                    continue
                if is_jpeg(raw):
                    sw, sh, ch, px = decode_jpeg(raw)
                    out = _nearest(px, sw, sh, ch)
                    rows.append((ref, encode_jpeg(width, height, out, channels=ch,
                                                  quality=90), width, height))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "non-PNG/JPEG image resize needs an external decoder "
                        "(not in container); fake=True for the stub"
                    )
                seed = hashlib.sha256(raw).digest()
                out = (seed * (width * height // len(seed) + 1))[: width * height]
                rows.append((ref, out, width, height))
            yield pd.DataFrame(rows, columns=["media_ref", "payload", "width", "height"])

    imgs = media.filter(F.col("media_kind") == "image").select("media_ref", "payload")
    return imgs.mapInPandas(_resize, schema=RESIZED_SCHEMA)


RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("frames", T.IntegerType()),
    ]
)


def resample_audio(media: DataFrame, rate: int = 4000,
                   fake: bool = False) -> DataFrame:
    """Audio resample as an Arrow-batched mapInPandas stage (1 row -> 1
    row, audio rows only) — the audio analog of ``resize_images``. WAV
    payloads are resampled FOR REAL: stdlib decode -> nearest-frame
    rate conversion -> stdlib re-encode, so the output payload is
    itself a valid WAV at the target rate. Compressed formats are
    STUBBED behind ``fake`` (decoder libs absent); the fake emits a
    deterministic payload whose length matches the target frame count
    so downstream size invariants stay testable."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nde_crawlers_spark.functions.wav import (
            decode_wav, encode_wav, is_wav, resample_nearest,
        )

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload)
                if is_wav(raw):
                    src_rate, ch, sw, smp = decode_wav(raw)
                    out = resample_nearest(smp, ch, src_rate, rate)
                    rows.append((ref, encode_wav(rate, ch, out, sw), rate, len(out) // ch))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "non-WAV audio resample requires ffmpeg/librosa (not in "
                        "container); fake=True for the stub"
                    )
                seed = hashlib.sha256(raw).digest()
                n = rate // 20  # deterministic stand-in length
                out = (seed * (n * 2 // len(seed) + 1))[: n * 2]
                rows.append((ref, out, rate, n))
            yield pd.DataFrame(rows, columns=["media_ref", "payload", "sample_rate", "frames"])

    auds = media.filter(F.col("media_kind") == "audio").select("media_ref", "payload")
    return auds.mapInPandas(_resample, schema=RESAMPLED_SCHEMA)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("brand", T.StringType()),
    ]
)


def probe_video(media: DataFrame, fake: bool = False) -> DataFrame:
    """Container-metadata probe for video rows (1->1 mapInPandas):
    geometry / duration / timescale / track count parsed FOR REAL from
    the ISO BMFF box tree (functions/mp4.py) or the AVI RIFF tree
    (functions/avi.py) — the gate a curation pipeline applies
    (resolution/duration filters) before paying for frame extraction.
    Other containers raise unless ``fake=True`` (deterministic
    stand-in metadata from the bytes)."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nde_crawlers_spark.functions.avi import decode_avi, is_avi
        from nde_crawlers_spark.functions.mp4 import is_mp4, probe_mp4

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload)
                if is_mp4(raw):
                    m = probe_mp4(raw)
                    rows.append((ref, m["width"], m["height"], m["duration_ms"],
                                 m["timescale"], m["n_tracks"], m["brand"]))
                    continue
                if is_avi(raw):
                    w, h, fps, fr = decode_avi(raw)
                    dur = int(len(fr) * 1000 / fps) if fps else 0
                    rows.append((ref, w, h, dur, int(fps * 1000), 1, "AVI "))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "non-MP4/AVI container probe not implemented; fake=True for the stub"
                    )
                d = hashlib.sha256(raw).digest()
                rows.append((ref, 160 + d[0], 120 + d[1],
                             1000 + d[2] * 16, 1000, 1, "fake"))
            yield pd.DataFrame(rows, columns=[
                "media_ref", "width", "height", "duration_ms", "timescale",
                "n_tracks", "brand"])

    vids = media.filter(F.col("media_kind") == "video").select("media_ref", "payload")
    return vids.mapInPandas(_probe, schema=PROBE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 4,
                  fake: bool = False) -> DataFrame:
    """Video frame sampling as a 1->N mapInPandas fan-out (one output row
    per sampled frame, video rows only) — the multimodal analog of the
    parse fan-out. MJPEG AVI is REAL end-to-end: the sampled payloads
    are the actual per-frame JPEGs demuxed from the container
    (functions/avi.py), timestamped on the source clock — no ffmpeg.
    For MP4 the fan-out COUNT and timestamps are real (probed container
    duration) while frame payloads are deterministic fakes — H.264
    pixel extraction needs a codec (ffmpeg, env-blocked). Other
    payloads raise unless ``fake=True`` (hash-derived count), keeping
    the fan-out plumbing (row multiplication, index/timestamp columns,
    binary payloads) real and tested in every mode."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nde_crawlers_spark.functions.avi import decode_avi, is_avi
        from nde_crawlers_spark.functions.mp4 import is_mp4, probe_mp4

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload)
                seed = hashlib.sha256(raw).digest()
                if is_avi(raw):
                    # MJPEG: the sampled payloads are the REAL per-frame
                    # JPEGs out of the container, timestamped on the
                    # source clock — demux AND pixels, no ffmpeg
                    w, h, fps, fr = decode_avi(raw)
                    step = max(1, int(round(every_ms * fps / 1000.0))) if fps else 1
                    picks = fr[::step][:max_frames] or fr[:1]
                    for i, fp in enumerate(picks):
                        ts = int(i * step * 1000 / fps) if fps else i * every_ms
                        rows.append((ref, i, ts, fp))
                    continue
                if is_mp4(raw):
                    dur = probe_mp4(raw)["duration_ms"]
                    n = min(max_frames, max(1, dur // every_ms + 1))
                elif fake:
                    n = 1 + seed[0] % max_frames
                else:
                    raise NotImplementedError(
                        "frame sampling of non-MP4 video requires ffmpeg (not "
                        "in container); fake=True for the stub"
                    )
                for i in range(n):
                    fp = hashlib.sha256(seed + bytes([i])).digest()
                    rows.append((ref, i, i * every_ms, fp))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "ts_ms", "payload"])

    vids = media.filter(F.col("media_kind") == "video").select("media_ref", "payload")
    return vids.mapInPandas(_frames, schema=FRAME_SCHEMA)
