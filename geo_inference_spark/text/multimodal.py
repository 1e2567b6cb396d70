"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; the Spark-side plumbing (schemas, Arrow batching,
mapInPandas signatures, partition behavior) is real and tested.

The image codec is REAL for PNG: payloads carrying the PNG signature
decode through the from-scratch stdlib codec (sources/png.py — zlib
inflate + all five row unfilters), yielding true width/height/channels
and the mean over decoded PIXELS. Payloads in any other format fall
back to a deterministic md5-derived stub (clearly marked below; md5 so
the DuckDB oracle can reproduce every field) — the seam where a
Pillow/ffmpeg install drops in for JPEG/video without touching the
Spark plumbing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.png import decode_png

PNG_SIG = b"\x89PNG\r\n\x1a\n"

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


def _decode_one(payload: bytes) -> tuple[int, int, int, float]:
    """Real PNG decode when the signature matches; md5 stub otherwise."""
    if payload[:8] == PNG_SIG:
        pix = decode_png(payload)
        h, w, c = pix.shape
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


FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"


def sample_frames(
    df: DataFrame, every: int = 4, n_frames: int = 3,
    id_col: str = "page_id", payload_col: str = "html",
) -> DataFrame:
    """Frame sampling plumbing for video payloads: emits n_frames
    byte-slices per payload (1 row in -> N rows out, the UDTF shape).
    The slicing IS the stub; a real ffmpeg reader keeps the same
    schema and batching."""

    def run(batches):
        for pdf in batches:
            rows = []
            for pid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                step = max(1, len(b) // (every * n_frames))
                for i in range(n_frames):
                    lo = i * every * step
                    rows.append((int(pid), i, b[lo : lo + step]))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "frame_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
