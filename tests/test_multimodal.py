"""Multimodal decode: the from-scratch PNG codec (golden pixels, all
five row filters, palette) and the Spark decode_media plumbing."""

import struct
import zlib

import numpy as np

from geo_inference_spark.sources.png import decode_png, encode_png


def test_png_roundtrip_all_color_types():
    rng = np.random.RandomState(21)
    for c in (1, 2, 3, 4):
        a = rng.randint(0, 256, size=(13, 9, c)).astype(np.uint8)
        pix = decode_png(encode_png(a))
        np.testing.assert_array_equal(pix, a)


def test_png_golden_pixels():
    """A hand-built 2x3 RGB image decodes to exactly those pixels."""
    a = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )
    pix = decode_png(encode_png(a))
    np.testing.assert_array_equal(pix, a)
    assert pix.shape == (2, 3, 3)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + typ + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _forge_png(a: np.ndarray, filters: list[int]) -> bytes:
    """Encode (h, w, c) uint8 applying a CHOSEN filter per row, so the
    decoder's Sub/Up/Average/Paeth paths are exercised (the library
    encoder only emits filter 0)."""
    h, w, c = a.shape
    ai = a.astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        row = ai[y].reshape(-1)
        prev = ai[y - 1].reshape(-1) if y else np.zeros(w * c, np.int32)
        out = np.zeros(w * c, np.int32)
        for x in range(w * c):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                out[x] = row[x]
            elif f == 1:
                out[x] = row[x] - left
            elif f == 2:
                out[x] = row[x] - up
            elif f == 3:
                out[x] = row[x] - ((left + up) >> 1)
            else:
                out[x] = row[x] - _paeth(int(left), int(up), int(ul))
        raw += bytes([f]) + bytes((out & 0xFF).astype(np.uint8))
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_decodes_every_filter_type():
    rng = np.random.RandomState(22)
    a = rng.randint(0, 256, size=(10, 7, 3)).astype(np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        pix = decode_png(_forge_png(a, filters))
        np.testing.assert_array_equal(pix, a, err_msg=f"filters={filters}")


def test_png_wavefront_matches_serial_forge():
    """The vectorized anti-diagonal unfilter must agree byte-for-byte
    with this file's independent SERIAL forge encoder on a mixed
    adaptive-filter image (the r3 per-byte loop is gone — this pins
    its replacement against an implementation that never changed)."""
    rng = np.random.RandomState(91)
    a = rng.randint(0, 256, size=(96, 64, 4)).astype(np.uint8)
    filters = list(rng.randint(0, 5, size=96))
    pix = decode_png(_forge_png(a, filters))
    np.testing.assert_array_equal(pix, a)


def test_png_large_paeth_decodes_fast():
    """A 512x512 RGBA all-Paeth PNG (worst case for the old per-byte
    loop, ~7 s) decodes through the wavefront in well under a second."""
    import time

    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, size=(512, 512, 4)).astype(np.uint8)
    data = encode_png(a, row_filters=4)
    t0 = time.perf_counter()
    pix = decode_png(data)
    dt = time.perf_counter() - t0
    np.testing.assert_array_equal(pix, a)
    assert dt < 2.0, f"wavefront unfilter too slow: {dt:.2f}s"


def test_png_palette():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\0" + idx[0].tobytes() + b"\0" + idx[1].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    pix = decode_png(png)
    np.testing.assert_array_equal(pix, plte[idx])


def test_decode_media_real_png_end_to_end(spark):
    """decode_media on real PNG payloads returns TRUE dimensions and
    the pixel mean — the codec runs inside the Arrow mapInPandas; a
    non-PNG payload in the same batch falls back to the marked stub."""
    import hashlib

    from geo_inference_spark.text.multimodal import decode_media

    rng = np.random.RandomState(23)
    imgs = {
        1: rng.randint(0, 256, size=(24, 17, 3)).astype(np.uint8),
        2: rng.randint(0, 256, size=(8, 31, 1)).astype(np.uint8),
    }
    rows = [(i, encode_png(a)) for i, a in imgs.items()]
    rows.append((3, b"not a png payload"))
    df = spark.createDataFrame(rows, schema="page_id long, html binary")
    got = {r["id"]: r for r in decode_media(df).collect()}
    for i, a in imgs.items():
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == a.shape
        exp_mean = float(np.floor(a.astype(np.float64).mean() * 1e6 + 0.5) / 1e6)
        assert r["mean_byte"] == exp_mean
        assert r["md5"] == hashlib.md5(encode_png(a)).hexdigest()
    # the stub path still works for non-PNG bytes
    assert got[3]["n_bytes"] == len(b"not a png payload")
    assert 64 <= got[3]["width"] < 256


def test_resize_media_real_png(spark):
    """resize_media really resizes PNG payloads: decoded output PNG has
    the target dims and pixels equal the exact floor index-map of the
    source (independent numpy computation)."""
    from geo_inference_spark.text.multimodal import resize_media

    rng = np.random.RandomState(44)
    imgs = {i: rng.randint(0, 256, size=(12, 9, 3)).astype(np.uint8)
            for i in range(3)}
    rows = [(i, encode_png(a)) for i, a in imgs.items()]
    rows.append((9, b"not an image"))
    df = spark.createDataFrame(rows, schema="page_id long, html binary")
    got = {r["id"]: r for r in resize_media(df, 4, 6).collect()}
    for i, a in imgs.items():
        r = got[i]
        assert r["decoded"] and (r["width"], r["height"]) == (4, 6)
        pix = decode_png(bytes(r["payload"]))
        yi = (np.arange(6) * 12) // 6
        xi = (np.arange(4) * 9) // 4
        np.testing.assert_array_equal(pix, a[yi][:, xi])
    # non-PNG passes through untouched with decoded=false
    assert not got[9]["decoded"] and bytes(got[9]["payload"]) == b"not an image"


def test_sample_frames_real_png_container(spark):
    """Concatenated-PNG 'video': sample_frames splits on signatures and
    emits every-Nth COMPLETE decodable frame; non-container payloads
    keep the byte-slice stub."""
    from geo_inference_spark.text.multimodal import (
        sample_frames,
        split_png_frames,
    )

    rng = np.random.RandomState(45)
    frames = [rng.randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
              for _ in range(6)]
    video = b"".join(encode_png(f) for f in frames)
    assert len(split_png_frames(video)) == 6
    df = spark.createDataFrame(
        [(1, video), (2, b"raw stub payload" * 10)],
        schema="page_id long, html binary",
    )
    got = sample_frames(df, every=2, n_frames=3).collect()
    vid = sorted((r for r in got if r["id"] == 1), key=lambda r: r["frame_idx"])
    assert len(vid) == 3
    for i, r in enumerate(vid):  # frames 0, 2, 4
        np.testing.assert_array_equal(
            decode_png(bytes(r["frame_bytes"])), frames[2 * i]
        )
    stub = [r for r in got if r["id"] == 2]
    assert len(stub) == 3  # stub path unchanged


def test_decode_media_real_jpeg_end_to_end(spark):
    """JPEG payloads through decode_media: true width/height/channels
    and the mean over decoded pixels (== the analytic expectation);
    a truncated JPEG falls to the md5 stub instead of failing the
    Arrow batch (VERDICT r4 #1)."""
    from geo_inference_spark.sources.jpeg import encode_jpeg, expected_decode
    from geo_inference_spark.text.multimodal import decode_media

    rng = np.random.RandomState(46)
    gray = rng.randint(0, 256, (20, 30), dtype=np.uint8)
    rgb = rng.randint(0, 256, (25, 17, 3), dtype=np.uint8)
    good_g = encode_jpeg(gray, quality=60, subsample="444")
    good_c = encode_jpeg(rgb, quality=80, subsample="420")
    df = spark.createDataFrame(
        [(1, good_g), (2, good_c), (3, good_c[:40])],
        schema="page_id long, html binary",
    )
    got = {r["id"]: r for r in decode_media(df).collect()}
    eg = expected_decode(gray, quality=60, subsample="444")
    ec = expected_decode(rgb, quality=80, subsample="420")
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (30, 20, 1)
    assert got[1]["mean_byte"] == float(
        np.floor(eg.astype(np.float64).mean() * 1e6 + 0.5) / 1e6
    )
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (17, 25, 3)
    assert got[2]["mean_byte"] == float(
        np.floor(ec.astype(np.float64).mean() * 1e6 + 0.5) / 1e6
    )
    # truncated stream -> deterministic stub, not an exception
    assert got[3]["n_bytes"] == 40


def test_resize_media_real_jpeg(spark):
    """JPEG thumbnailing: decode -> floor-index NN resize -> re-encode
    as JPEG; the emitted payload is a decodable JPEG of the target
    size whose pixels equal the analytic expectation of re-encoding
    the resized pixels."""
    from geo_inference_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
        expected_decode,
    )
    from geo_inference_spark.text.multimodal import resize_media

    rng = np.random.RandomState(47)
    rgb = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)
    payload = encode_jpeg(rgb, quality=85, subsample="444")
    df = spark.createDataFrame(
        [(5, payload)], schema="page_id long, html binary"
    )
    got = resize_media(df, out_w=16, out_h=12).collect()[0]
    assert got["decoded"] and (got["width"], got["height"]) == (16, 12)
    out = decode_jpeg(bytes(got["payload"]))
    assert out.shape == (12, 16, 3)
    # reproduce the expected thumb: decode source, NN index-map, then
    # the analytic decode expectation of the quality-90 re-encode
    src = decode_jpeg(payload)
    yi = (np.arange(12) * 40) // 12
    xi = (np.arange(16) * 60) // 16
    np.testing.assert_array_equal(
        out, expected_decode(src[yi][:, xi], quality=90, subsample="444")
    )


def test_corrupt_streams_degrade_to_stub_never_crash(spark):
    """Crawl-grade robustness: random truncations and byte flips of
    valid PNG/JPEG payloads must flow through decode_media (stub
    fallback) and resize_media (decoded=false pass-through) without
    failing the Arrow batch — and decode_jpeg/decode_png themselves
    must only ever raise the handled error types."""
    from geo_inference_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from geo_inference_spark.text.multimodal import (
        _DECODE_ERRORS,
        decode_media,
        resize_media,
    )

    rng = np.random.RandomState(99)
    base = [
        encode_jpeg(rng.randint(0, 256, (24, 31, 3), np.uint8), quality=60),
        encode_jpeg_progressive(
            rng.randint(0, 256, (20, 20), np.uint8), quality=70,
            subsample="444",
        ),
        encode_png(rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)),
    ]
    corrupt = []
    for b in base:
        for cut in (10, len(b) // 3, len(b) - 3):
            corrupt.append(b[:cut])
        for _ in range(12):
            bb = bytearray(b)
            for _ in range(4):
                bb[rng.randint(8, len(bb))] = rng.randint(0, 256)
            corrupt.append(bytes(bb))
    # direct codec calls: only handled error types, never a hang
    for b in corrupt:
        try:
            if b[:3] == b"\xff\xd8\xff":
                decode_jpeg(b)
            else:
                decode_png(b)
        except _DECODE_ERRORS:
            pass
    rows = [(i, b) for i, b in enumerate(corrupt)]
    df = spark.createDataFrame(rows, schema="page_id long, html binary")
    got = decode_media(df).collect()
    assert len(got) == len(corrupt)  # every row survived
    rs = resize_media(df, out_w=8, out_h=8).collect()
    assert len(rs) == len(corrupt)


def test_sample_frames_mjpeg_container(spark):
    """Concatenated-JPEG 'video' (the Motion-JPEG shape): frames split
    by the exact structural walk and every-Nth frame decodes to the
    expected pixels — including frames whose entropy data contains
    SOI-looking bytes (stuffing makes real \\xff\\xd8 inside scans
    impossible, and the walk never scans for signatures anyway)."""
    from geo_inference_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
        expected_decode,
        split_jpeg_frames,
    )
    from geo_inference_spark.text.multimodal import sample_frames

    rng = np.random.RandomState(77)
    pix = [rng.randint(0, 256, (16 + 2 * i, 20, 3), np.uint8)
           for i in range(6)]
    frames = [encode_jpeg(p, quality=70, subsample="444") for p in pix]
    video = b"".join(frames)
    assert split_jpeg_frames(video) == frames
    df = spark.createDataFrame(
        [(1, video)], schema="page_id long, html binary"
    )
    got = sorted(sample_frames(df, every=2, n_frames=3).collect(),
                 key=lambda r: r["frame_idx"])
    assert len(got) == 3
    for i, r in enumerate(got):  # frames 0, 2, 4
        np.testing.assert_array_equal(
            decode_jpeg(bytes(r["frame_bytes"])),
            expected_decode(pix[2 * i], quality=70, subsample="444"),
        )
