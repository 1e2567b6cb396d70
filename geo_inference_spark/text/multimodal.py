"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; the Spark-side plumbing (schemas, Arrow batching,
mapInPandas signatures, partition behavior) is real and tested.

The image codecs are REAL for PNG and JPEG: PNG payloads decode
through the from-scratch stdlib codec (sources/png.py — zlib inflate +
all five row unfilters); JPEG payloads through the from-scratch
baseline-DCT codec (sources/jpeg.py — full marker/Huffman/IDCT path,
gray + YCbCr 4:4:4/4:2:0, restart markers), yielding true
width/height/channels and the mean over decoded PIXELS — JPEG covers
baseline AND progressive (SOF2). Payloads in any other format
(video/audio containers) fall back to a deterministic md5-derived
stub (clearly marked below; md5 so the
DuckDB oracle can reproduce every field) — the seam where an ffmpeg
install drops in without touching the Spark plumbing.
"""

from __future__ import annotations

import hashlib
import zlib
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.jpeg import decode_jpeg, encode_jpeg
from ..sources.png import decode_png

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8\xff"

MEDIA_SCHEMA = (
    "id long, media_type string, n_bytes long, width int, height int, "
    "channels int, mean_byte double, md5 string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE decoder (stub for non-PNG codecs): derives a
    plausible (width, height, channels, mean_byte) purely from the
    bytes, so the pipeline shape is exercised end-to-end and results
    are reproducible. Replace with PIL/ffmpeg in production."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    arr = np.frombuffer(payload, dtype=np.uint8)
    mean = float(arr.mean()) if arr.size else 0.0
    # SQL ROUND half-up so the DuckDB oracle reproduces the value
    return width, height, channels, float(np.floor(mean * 1e6 + 0.5) / 1e6)


# a corrupt stream must degrade to the stub, never fail the Arrow
# batch: at 100 TB of crawl data truncated/bit-rotted images are a
# statistical certainty per partition
_DECODE_ERRORS = (
    ValueError, NotImplementedError, IndexError, KeyError, EOFError,
    struct_error, zlib.error,
)


def _decode_one(payload: bytes) -> tuple[int, int, int, float]:
    """Real PNG/JPEG decode when the signature matches; md5 stub for
    anything else (video/audio container seam) and for malformed or
    truncated streams (see _DECODE_ERRORS)."""
    if payload[:8] == PNG_SIG:
        try:
            pix = decode_png(payload)
        except _DECODE_ERRORS:
            return _fake_decode(payload)
        h, w, c = pix.shape
        mean = float(pix.astype(np.float64).mean())
        return w, h, c, float(np.floor(mean * 1e6 + 0.5) / 1e6)
    if payload[:3] == JPEG_SIG:
        try:
            pix = decode_jpeg(payload)
        except _DECODE_ERRORS:
            return _fake_decode(payload)
        h, w = pix.shape[:2]
        c = 1 if pix.ndim == 2 else pix.shape[2]
        mean = float(pix.astype(np.float64).mean())
        return w, h, c, float(np.floor(mean * 1e6 + 0.5) / 1e6)
    return _fake_decode(payload)


def decode_media(
    df: DataFrame, id_col: str = "page_id", payload_col: str = "html",
    media_type: str = "image",
) -> DataFrame:
    """Binary payloads -> typed media metadata via Arrow-batched
    mapInPandas (the production shape for 100 TB of images: one scan,
    no shuffle, codec work in vectorized batches)."""

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                w, h, c, m = _decode_one(b)
                rows.append(
                    (int(pid), media_type, len(b), w, h, c, m,
                     hashlib.md5(b).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "media_type", "n_bytes", "width", "height",
                         "channels", "mean_byte", "md5"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_SCHEMA)


def _forge_jpeg_pix(doc_id: int):
    """Deterministic synthetic image + encode params for ``doc_id`` —
    shared by the gate query's executor-side forge and the driver-side
    oracle expectation, so both sides build the identical image."""
    doc_id = int(doc_id)
    h = 16 + (doc_id * 7) % 33
    w = 16 + (doc_id * 13) % 41
    mode = doc_id % 3  # 0 gray, 1 rgb 4:4:4, 2 rgb 4:2:0
    quality = (35, 60, 80)[(doc_id // 3) % 3]
    rst = (0, 0, 2, 5)[doc_id % 4]
    rng = np.random.RandomState(doc_id % (2**31 - 1))
    shape = (h, w) if mode == 0 else (h, w, 3)
    pix = rng.randint(0, 256, shape, dtype=np.uint8)
    sub = "420" if mode == 2 else "444"
    return pix, quality, sub, rst


def forge_jpeg(doc_id: int) -> bytes:
    """doc_id -> deterministic JPEG payload (varied size,
    gray/4:4:4/4:2:0, quality, restart interval; every 5th document is
    PROGRESSIVE — same quantized coefficients, so expected_jpeg_stats
    is transport-agnostic and the oracle needs no special case)."""
    from ..sources.jpeg import encode_jpeg_progressive

    pix, quality, sub, rst = _forge_jpeg_pix(doc_id)
    if int(doc_id) % 5 == 0:
        return encode_jpeg_progressive(pix, quality=quality, subsample=sub)
    return encode_jpeg(pix, quality=quality, subsample=sub,
                       restart_interval=rst)


def expected_jpeg_stats(doc_id: int) -> tuple[int, int, int, float]:
    """(width, height, channels, mean_byte) that decode_media must
    report for forge_jpeg(doc_id) — via jpeg.expected_decode, the
    analytic path that never touches the decoder's marker/Huffman/
    bitstream layers."""
    from ..sources.jpeg import expected_decode

    pix, quality, sub, _ = _forge_jpeg_pix(doc_id)
    exp = expected_decode(pix, quality=quality, subsample=sub)
    h, w = exp.shape[:2]
    c = 1 if exp.ndim == 2 else exp.shape[2]
    mean = float(exp.astype(np.float64).mean())
    return w, h, c, float(np.floor(mean * 1e6 + 0.5) / 1e6)


RESIZE_SCHEMA = (
    "id long, decoded boolean, width int, height int, payload binary"
)


def resize_media(
    df: DataFrame, out_w: int, out_h: int,
    id_col: str = "page_id", payload_col: str = "html",
) -> DataFrame:
    """REAL image resize for PNG and JPEG payloads: decode through the
    stdlib codecs, nearest-neighbor index-map to (out_h, out_w) (the
    exact floor mapping yi = i*h//out_h — deterministic, no float
    resampling kernel), re-encode in the source format (JPEG thumbs at
    quality 90). Other payloads pass through with decoded=false — the
    ffmpeg seam. Arrow-batched mapInPandas: one scan, no shuffle, the
    100 TB thumbnailing shape."""
    from ..sources.png import encode_png

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                is_png = b[:8] == PNG_SIG
                is_jpg = b[:3] == JPEG_SIG
                if is_png or is_jpg:
                    try:
                        pix = decode_png(b) if is_png else decode_jpeg(b)
                    except _DECODE_ERRORS:
                        # corrupt stream: pass through undecoded
                        # instead of failing the Arrow batch
                        rows.append((int(pid), False, None, None, b))
                        continue
                    h, w = pix.shape[:2]
                    yi = (np.arange(out_h) * h) // out_h
                    xi = (np.arange(out_w) * w) // out_w
                    small = pix[yi][:, xi]
                    out = (
                        encode_png(small) if is_png
                        else encode_jpeg(small, quality=90, subsample="444")
                    )
                    rows.append((int(pid), True, out_w, out_h, out))
                else:
                    rows.append((int(pid), False, None, None, b))
            yield pd.DataFrame(
                rows,
                columns=["id", "decoded", "width", "height", "payload"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"


def split_png_frames(b: bytes) -> list[bytes]:
    """Split a concatenated-PNG 'video' payload into its frames by
    signature scan (each frame is a complete PNG stream)."""
    offs = []
    pos = b.find(PNG_SIG)
    while pos != -1:
        offs.append(pos)
        pos = b.find(PNG_SIG, pos + 8)
    return [
        b[offs[i] : offs[i + 1] if i + 1 < len(offs) else len(b)]
        for i in range(len(offs))
    ]


def sample_frames(
    df: DataFrame, every: int = 4, n_frames: int = 3,
    id_col: str = "page_id", payload_col: str = "html",
) -> DataFrame:
    """Frame sampling for video payloads (1 row in -> N rows out, the
    UDTF shape). REAL for two containers: concatenated PNG (frames
    split on signatures) and concatenated JPEG — the Motion-JPEG
    shape — split by an EXACT structural walk of each frame
    (jpeg_stream_end: segment lengths + entropy-scan skips, immune to
    SOI-looking bytes inside entropy data). Every ``every``-th frame
    is emitted as a complete decodable image. Other containers fall
    back to deterministic byte-slice stubs — the ffmpeg seam; either
    way the schema and Arrow batching are identical."""
    from ..sources.jpeg import split_jpeg_frames

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:8] == PNG_SIG:
                    frames = split_png_frames(b)
                elif b[:3] == JPEG_SIG:
                    try:
                        frames = split_jpeg_frames(b)
                    except _DECODE_ERRORS:
                        frames = None
                else:
                    frames = None
                if frames and len(frames) > 1:
                    for i, fi in enumerate(range(0, len(frames), every)):
                        if i >= n_frames:
                            break
                        rows.append((int(pid), i, frames[fi]))
                else:
                    step = max(1, len(b) // (every * n_frames))
                    for i in range(n_frames):
                        lo = i * every * step
                        rows.append((int(pid), i, b[lo : lo + step]))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "frame_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "id long, sample_rate int, channels int, n_samples long, "
    "duration_ms double, rms double"
)

WAV_SIG = b"RIFF"


def decode_audio(
    df: DataFrame, id_col: str = "page_id", payload_col: str = "html",
) -> DataFrame:
    """REAL audio decode for PCM WAV payloads (sources/wav.py:
    8/16/24/32-bit int + float32, any channel count): true sample
    rate, channels, sample count, duration and RMS over decoded
    samples. Non-WAV or corrupt payloads report sample_rate = -1 with
    md5-derived stub stats — the ffmpeg seam for compressed audio.
    Arrow-batched mapInPandas: one scan, no shuffle."""
    from ..sources.wav import decode_wav

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if b[:4] == WAV_SIG and b[8:12] == b"WAVE":
                    try:
                        samples, meta = decode_wav(b)
                    except _DECODE_ERRORS:
                        samples = None
                    if samples is not None:
                        rms = float(np.sqrt(np.mean(np.square(samples)))) \
                            if samples.size else 0.0
                        rows.append((
                            int(pid), meta["sample_rate"],
                            meta["channels"], meta["n_samples"],
                            1000.0 * meta["n_samples"]
                            / meta["sample_rate"],
                            rms,
                        ))
                        continue
                h = hashlib.md5(b).digest()
                rows.append((
                    int(pid), -1, 1 + h[0] % 2, len(b),
                    float(len(b)), float(h[1]) / 255.0,
                ))
            yield pd.DataFrame(
                rows,
                columns=["id", "sample_rate", "channels", "n_samples",
                         "duration_ms", "rms"],
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_SCHEMA)


def _forge_wav_samples(doc_id: int):
    doc_id = int(doc_id)
    rate = (8000, 16000, 44100)[doc_id % 3]
    ch = 1 + (doc_id // 3) % 2
    n = 500 + (doc_id * 37) % 2500
    rng = np.random.RandomState((doc_id * 7 + 1) % (2**31 - 1))
    samples = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    return samples, rate


def forge_wav(doc_id: int) -> bytes:
    """doc_id -> deterministic PCM16 WAV payload."""
    from ..sources.wav import encode_wav

    samples, rate = _forge_wav_samples(doc_id)
    return encode_wav(samples, rate)


def expected_wav_stats(doc_id: int):
    """(sample_rate, channels, n_samples, duration_ms, rms) that
    decode_audio must report for forge_wav(doc_id) — computed from
    the pre-encode samples (PCM16 roundtrips exactly), never through
    decode_wav."""
    samples, rate = _forge_wav_samples(doc_id)
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(np.square(x))))
    n, ch = samples.shape
    return rate, ch, n, 1000.0 * n / rate, rms
