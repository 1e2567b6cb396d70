"""WARC source (sources/warc.py): distributed splittable scan of
Common-Crawl-style archives, gzip (member-per-record) and plain."""

from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pytest

from geo_inference_spark.sources.warc import read_warc, write_warc


def _rows(n, seed=0, big_every=0):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        size = 200 + int(rng.randint(0, 300))
        if big_every and i % big_every == 1:
            size = 300_000  # spans multiple split ranges
        payload = bytes(rng.randint(0, 256, size, dtype=np.uint8))
        # embed the gzip magic + fake WARC magic INSIDE a payload to
        # tempt the boundary scanner into a false positive
        if i == 2:
            payload = b"\x1f\x8b\x08xx" + b"WARC/1.0\r\nfake\r\n\r\n" + payload
        ts = datetime(2024, 1, 1, i % 24, 0, 0, tzinfo=timezone.utc)
        rows.append((f"https://example.org/p/{i}", ts, payload))
    return rows


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_all_split_counts(spark, tmp_path, compress):
    rows = _rows(40, seed=3, big_every=7)
    path = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    assert write_warc(rows, path, compress=compress) == 40
    exp = {
        u: (ts, p) for u, ts, p in rows
    }
    for n_splits in (1, 3, 8):
        got = read_warc(spark, path, n_splits=n_splits).collect()
        assert len(got) == 40, (compress, n_splits)
        for r in got:
            ts, p = exp[r["url"]]
            assert bytes(r["html"]) == p, r["url"]
            assert r["warc_ts"].replace(tzinfo=timezone.utc) == ts
        # each record owned by exactly one range (offsets unique)
        assert len({r["offset"] for r in got}) == 40


def test_each_range_owns_disjoint_records(spark, tmp_path):
    """Ownership is by boundary position: the union over ranges is a
    partition of the record set (no dup, no loss) even when a record
    body crosses multiple ranges."""
    rows = _rows(25, seed=9, big_every=4)
    path = str(tmp_path / "b.warc.gz")
    write_warc(rows, path, compress=True)
    import os

    from geo_inference_spark.sources.warc import _scan_range_gz

    size = os.path.getsize(path)
    bounds = np.linspace(0, size, 7, dtype=np.int64)
    seen = []
    for i in range(6):
        seen += [
            r[0] for r in _scan_range_gz(path, int(bounds[i]),
                                         int(bounds[i + 1]))
        ]
    assert sorted(seen) == sorted(u for u, _, _ in rows)


def test_pages_table_from_warc(spark, tmp_path):
    """The ingest edge: synthetic pages -> WARC -> read_warc ->
    byte-identical html per url (the north rule's per-row invariant
    at the ingest step)."""
    from geo_inference_spark.sources.pages import pages_pdf

    pdf = pages_pdf(np.arange(60, dtype=np.uint64))
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).dt.tz_localize("UTC")
    path = str(tmp_path / "pages.warc.gz")
    write_warc(pdf[["url", "warc_ts", "html"]], path)
    got = read_warc(spark, path, n_splits=5).toPandas()
    assert len(got) == 60
    merged = got.merge(pdf, on="url", suffixes=("_got", ""))
    assert len(merged) == 60
    assert all(
        bytes(a) == bytes(b)
        for a, b in zip(merged["html_got"], merged["html"])
    )


@pytest.mark.parametrize("compress", [True, False])
def test_indexed_random_access_fetch(spark, tmp_path, compress):
    """CDX-index pattern: fetch ONLY the indexed records by
    (offset, length) ranged reads — results equal the filtered full
    scan, byte for byte."""
    from geo_inference_spark.sources.warc import (
        fetch_warc_records,
        write_warc_with_index,
    )

    rows = _rows(30, seed=11)
    path = str(tmp_path / ("i.warc.gz" if compress else "i.warc"))
    idx = write_warc_with_index(rows, path, compress=compress)
    assert len(idx) == 30
    want = idx[idx.index % 7 == 0]  # every 7th record
    got = fetch_warc_records(
        spark, path, spark.createDataFrame(want)
    ).collect()
    assert len(got) == len(want)
    exp = {u: p for u, _, p in rows}
    for r in got:
        assert bytes(r["html"]) == exp[r["url"]]
    # offsets agree with the full distributed scan's record offsets
    from geo_inference_spark.sources.warc import read_warc

    scan_offs = {
        r["url"]: r["offset"]
        for r in read_warc(spark, path, n_splits=4).collect()
    }
    for _, row in want.iterrows():
        assert scan_offs[row["url"]] == row["offset"]


def test_read_warc_chunked_yield_identical_rows(spark, tmp_path):
    """Memory-bounded scan (r6): forcing a tiny per-yield row budget
    must produce exactly the same rows as one big frame — proves the
    multi-yield path flushes and resumes correctly mid-range."""
    from datetime import datetime, timezone

    from geo_inference_spark.sources.warc import read_warc, write_warc

    path = str(tmp_path / "chunky.warc.gz")
    rows = [
        (f"https://x.org/{i}", datetime(2024, 2, 2, tzinfo=timezone.utc),
         (f"payload-{i}-" + "z" * (i % 37)).encode())
        for i in range(53)
    ]
    write_warc(rows, path, compress=True)
    big = sorted(
        (r["url"], bytes(r["html"])) for r in read_warc(spark, path).collect()
    )
    small = sorted(
        (r["url"], bytes(r["html"]))
        for r in read_warc(spark, path, yield_rows=7, yield_bytes=1).collect()
    )
    assert big == small and len(big) == 53


def test_warc_date_fractional_seconds_tolerated(tmp_path):
    """ADVICE r5: a WARC 1.1 fractional-second date must not kill the
    scan — the fraction is trimmed, the record survives."""
    import gzip

    from geo_inference_spark.sources.warc import _parse_record

    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"WARC-Date: 2017-03-06T04:03:53.917Z\r\n"
        b"WARC-Target-URI: https://x.org/f\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"hi\r\n\r\n"
    )
    out = _parse_record(rec)
    assert out is not None
    url, ts, payload, rid, consumed = out
    assert payload == b"hi" and ts.year == 2017 and ts.second == 53
