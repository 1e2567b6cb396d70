"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; the Spark-side plumbing (schemas, Arrow batching,
mapInPandas signatures, partition behavior) is real and tested. The
codec step itself is STUBBED: the container has no image/audio
libraries, so decode is a deterministic fake derived from the
md5 of the bytes (clearly marked below; md5 so the DuckDB oracle can
reproduce every field), gated behind an import-try so a real
Pillow/torchaudio path drops in unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "id long, media_type string, n_bytes long, width int, height int, "
    "channels int, mean_byte double, md5 string"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE decoder (stub for the real codec): derives a
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
                if _HAS_PIL and media_type == "image":
                    raise NotImplementedError(
                        "real image decode path not wired in this sandbox"
                    )
                w, h, c, m = _fake_decode(b)
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
