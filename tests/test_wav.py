"""RIFF/WAVE codec (sources/wav.py) + the decode_audio operator."""

import struct

import numpy as np
import pytest

from geo_inference_spark.sources.wav import decode_wav, encode_wav


def test_pcm16_roundtrip_exact():
    rng = np.random.RandomState(2)
    for ch in (1, 2, 4):
        s = rng.randint(-32768, 32768, (777, ch)).astype(np.int16)
        x, meta = decode_wav(encode_wav(s, 16000))
        assert meta == {
            "sample_rate": 16000, "channels": ch, "bits": 16,
            "n_samples": 777,
        }
        np.testing.assert_array_equal(
            np.round(x * 32768.0).astype(np.int16), s
        )


def test_pcm_8_24_32_and_float32():
    """Hand-assembled fmt/data chunks for the non-16-bit widths."""
    def wav(audio_format, ch, rate, bits, data):
        block = ch * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, audio_format, ch,
                                    rate, rate * block, block, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # 8-bit unsigned: 128 -> 0.0, 0 -> -1.0, 255 -> ~0.992
    x, m = decode_wav(wav(1, 1, 8000, 8, bytes([128, 0, 255])))
    assert m["bits"] == 8 and m["n_samples"] == 3
    np.testing.assert_allclose(
        x[:, 0], [0.0, -1.0, 127 / 128.0], atol=1e-12
    )
    # 24-bit signed little-endian: 1<<22 -> 0.5; -(1<<22) -> -0.5
    pos = struct.pack("<i", 1 << 22)[:3]
    neg = struct.pack("<i", -(1 << 22))[:3]
    x, m = decode_wav(wav(1, 1, 8000, 24, pos + neg))
    assert m["bits"] == 24
    np.testing.assert_allclose(x[:, 0], [0.5, -0.5], atol=1e-12)
    # 32-bit int
    x, _ = decode_wav(wav(1, 1, 8000, 32, struct.pack("<i", 1 << 30)))
    np.testing.assert_allclose(x[:, 0], [0.5], atol=1e-12)
    # float32
    x, m = decode_wav(wav(3, 2, 44100, 32,
                          struct.pack("<4f", 0.25, -0.5, 1.0, 0.0)))
    assert m["channels"] == 2 and m["n_samples"] == 2
    np.testing.assert_allclose(x, [[0.25, -0.5], [1.0, 0.0]], atol=1e-7)


def test_unknown_chunks_skipped():
    rng = np.random.RandomState(3)
    s = rng.randint(-100, 100, (64, 1)).astype(np.int16)
    b = encode_wav(s, 8000)
    # splice a LIST chunk (odd length -> word-aligned skip) before data
    hdr, data = b[:36], b[36:]
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    x, meta = decode_wav(hdr + junk + data)
    assert meta["n_samples"] == 64
    np.testing.assert_array_equal(np.round(x * 32768).astype(np.int16), s)


def test_corrupt_and_unsupported_raise_handled_types():
    from geo_inference_spark.text.multimodal import _DECODE_ERRORS

    with pytest.raises(_DECODE_ERRORS):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(_DECODE_ERRORS):
        decode_wav(b"OggS" + b"\x00" * 40)  # not RIFF
    # MP3-style compressed format id -> NotImplementedError (seam)
    b = encode_wav(np.zeros((4, 1), np.int16), 8000)
    bad = bytearray(b)
    bad[20] = 85  # fmt code 0x55 = MP3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_decode_audio_operator(spark):
    """Spark-side: real WAV stats + stub fallback in one batch."""
    from geo_inference_spark.text.multimodal import (
        decode_audio,
        expected_wav_stats,
        forge_wav,
    )

    rows = [(i, forge_wav(i)) for i in (0, 5, 11)]
    rows.append((99, b"ID3\x03compressed-audio-junk" * 10))
    df = spark.createDataFrame(rows, schema="page_id long, html binary")
    got = {r["id"]: r for r in decode_audio(df).collect()}
    for i in (0, 5, 11):
        rate, ch, n, dur, rms = expected_wav_stats(i)
        r = got[i]
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == (
            rate, ch, n
        )
        assert r["duration_ms"] == dur and r["rms"] == rms
    assert got[99]["sample_rate"] == -1  # stub path flagged


def test_zero_sample_rate_degrades_to_stub():
    """ADVICE r5: sample_rate=0 in the fmt chunk is corrupt — decode_wav
    raises ValueError (caught by decode_audio's stub fallback), never
    ZeroDivisionError inside the Arrow batch."""
    import struct

    import numpy as np
    import pytest

    from geo_inference_spark.sources.wav import decode_wav, encode_wav

    good = bytearray(encode_wav(np.zeros((10, 1), dtype=np.int16), 8000))
    # fmt chunk sample_rate field: RIFF(12) + 'fmt '+len(8) + fmt(2)+ch(2)
    off = 12 + 8 + 2 + 2
    good[off:off + 4] = struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_wav(bytes(good))
