"""Pure-stdlib WAV (RIFF/PCM) codec: struct-level chunk parse + encode.

The reference stores media as URL + encodingFormat metadata and never
decodes payloads (zenodo/files/zenodo.py:143-149); real decode is the
training-data-pipeline extension this repo adds. librosa/ffmpeg cannot
be installed in this container (no network egress, FIXTURES.md), but
canonical WAV needs neither: the format is a RIFF container whose
``fmt `` chunk is 16 bytes of little-endian struct and whose ``data``
chunk is raw interleaved PCM — so ``decode_media`` can be REAL for
audio payloads with well under 100 lines of stdlib, the same move
functions/png.py made for images. Compressed audio (MP3/AAC/OGG) stays
honestly stubbed.

Scope (raises NotImplementedError outside it): PCM (format tag 1),
8-bit unsigned and 16-bit signed samples, any channel count and sample
rate. That covers canonical uncompressed WAV; float/24-bit/ADPCM
variants would only add bulk here.

The encoder exists for fixtures and the synthetic media-fetch stand-in:
it writes the canonical 44-byte header so round-trip tests and the
resample stage produce payloads any external tool would accept.
"""

from __future__ import annotations

import struct

SIGNATURE = b"RIFF"  # full check: RIFF....WAVE — see is_wav()


def is_wav(data: bytes) -> bool:
    """True iff the payload carries the RIFF/WAVE magic."""
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV byte string to ``(sample_rate, channels, sampwidth,
    samples)`` where ``samples`` is the interleaved PCM stream as
    Python ints (16-bit: signed; 8-bit: unsigned, as stored). Raises
    ValueError on a malformed stream and NotImplementedError outside
    the supported scope."""
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
    if bits == 16:
        n = len(pcm) // 2
        samples = list(struct.unpack(f"<{n}h", pcm[: n * 2]))
        width = 2
    elif bits == 8:
        samples = list(pcm)
        width = 1
    else:
        raise NotImplementedError(f"{bits}-bit WAV (8/16 supported)")
    return rate, channels, width, samples


def encode_wav(sample_rate: int, channels: int, samples: list[int],
               sampwidth: int = 2) -> bytes:
    """Encode interleaved PCM ints to a canonical 44-byte-header WAV.
    ``sampwidth`` 2 = 16-bit signed, 1 = 8-bit unsigned."""
    if sampwidth == 2:
        pcm = struct.pack(f"<{len(samples)}h", *samples)
    elif sampwidth == 1:
        pcm = bytes(s & 0xFF for s in samples)
    else:
        raise NotImplementedError("sampwidth must be 1 or 2")
    block = channels * sampwidth
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, sampwidth * 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(sample_rate: int, channels: int, sampwidth: int,
                   samples: list[int], feature_dim: int = 8) -> list[float]:
    """Deterministic pooled-energy feature (the audio analog of
    png.luma_features): mono-mix each frame by integer mean of its
    channels (8-bit first re-centered to signed), bucket frames into
    ``feature_dim`` contiguous time ranges, bucket mean |amplitude|
    normalized to [0,1] and rounded to 6 — pure integer arithmetic up
    to the final division, so bit-stable across platforms."""
    full = (1 << (sampwidth * 8 - 1)) - 1  # 127 / 32767
    offset = 128 if sampwidth == 1 else 0
    n = len(samples) // channels
    sums = [0] * feature_dim
    counts = [0] * feature_dim
    for f in range(n):
        base = f * channels
        mono = sum(samples[base + c] - offset for c in range(channels)) // channels
        b = f * feature_dim // n
        sums[b] += abs(mono)
        counts[b] += 1
    return [round(s / c / full, 6) if c else 0.0 for s, c in zip(sums, counts)]


def resample_nearest(samples: list[int], channels: int,
                     src_rate: int, dst_rate: int) -> list[int]:
    """Nearest-frame sample-rate conversion (the audio analog of the
    PNG nearest-neighbor resize): output frame t reads input frame
    ``t * src // dst``. Integer index math only — deterministic, no
    filtering (fidelity matches the image path's resampler; a windowed
    sinc would be the quality upgrade, not needed for plumbing)."""
    n_src = len(samples) // channels
    n_dst = n_src * dst_rate // src_rate
    out: list[int] = []
    for t in range(n_dst):
        src = t * src_rate // dst_rate
        base = src * channels
        out.extend(samples[base:base + channels])
    return out
