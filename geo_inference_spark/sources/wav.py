"""Minimal RIFF/WAVE codec — from scratch, stdlib struct only.

Makes the multimodal AUDIO leg real (it was an md5 stub): PCM WAV is
the archival/audio-dataset interchange format and its public spec is
a three-chunk container. Supported:

* ``decode_wav`` — RIFF/WAVE with ``fmt `` + ``data`` chunks
  (unknown chunks skipped): PCM 8/16/24/32-bit int and 32-bit float,
  any channel count -> (samples (n, ch) float64 in [-1, 1), meta).
  8-bit is unsigned per spec; 24-bit is sign-extended little-endian.
* ``encode_wav`` — int16 (n, ch) -> canonical 44-byte-header PCM WAV
  (used by tests and the synthetic media forge).

Compressed formats (MP3/AAC/OGG) remain the documented ffmpeg seam.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 (n,) or (n, ch) -> PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav wants int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = ch * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                sample_rate * block, block, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(b: bytes):
    """WAV bytes -> (samples (n, ch) float64 in [-1, 1), meta dict
    with sample_rate, channels, bits, n_samples)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    n = len(b)
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("corrupt WAV: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_format, ch, rate, _brate, _block, bits = fmt
    if ch == 0:
        raise ValueError("corrupt WAV: zero channels")
    if rate <= 0:
        # ADVICE r5: a declared sample_rate of 0 must degrade to the
        # corrupt-stream stub (duration math divides by it), never
        # raise ZeroDivisionError inside an Arrow batch
        raise ValueError("corrupt WAV: non-positive sample rate")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3],
                                dtype=np.uint8).reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"{bits}-bit PCM")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format {audio_format} / {bits}-bit (compressed audio "
            "is the ffmpeg seam)"
        )
    x = x[: len(x) - len(x) % ch]
    samples = x.reshape(-1, ch)
    meta = {
        "sample_rate": int(rate),
        "channels": int(ch),
        "bits": int(bits),
        "n_samples": int(samples.shape[0]),
    }
    return samples, meta
