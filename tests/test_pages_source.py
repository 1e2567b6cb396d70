"""Synthetic pages source: determinism + the byte-identity invariant."""

import numpy as np

from geo_inference_spark.sources import pages as P


def test_text_html_extraction_byte_identical():
    ids = np.arange(0, 500, dtype=np.uint64)
    texts = P.build_text(ids)
    htmls = P.build_html(ids, texts)
    for t, h in zip(texts, htmls):
        assert P.extract_text_bytes(h) == t  # per-url invariant
        assert P.extract_text_bytes(h).encode("utf-8") == t.encode("utf-8")


def test_determinism_and_duplicates():
    ids = np.arange(0, 2000, dtype=np.uint64)
    t1 = P.build_text(ids)
    t2 = P.build_text(ids)
    assert (t1 == t2).all()
    # dup families exist: some distinct ids share identical text
    uniq = len(set(t1.tolist()))
    assert uniq < len(ids)
    # different seed -> different corpus
    t3 = P.build_text(ids, seed=43)
    assert (t1 != t3).any()


def test_latlon_clustered_and_bounded():
    ids = np.arange(0, 20000, dtype=np.uint64)
    lat, lon = P.build_latlon(ids)
    assert (np.abs(lat) <= 85).all() and (np.abs(lon) <= 180).all()
    # hot-cell skew: >10% of points within 0.5 deg of the top city
    near_nyc = (np.abs(lat - 40.71) < 0.5) & (np.abs(lon + 74.0) < 0.5)
    assert near_nyc.mean() > 0.08


def test_pages_df_partition_invariance(spark):
    a = P.pages_df(spark, 300, partitions=1).orderBy("page_id").collect()
    b = P.pages_df(spark, 300, partitions=7).orderBy("page_id").collect()
    assert a == b
    assert a[5]["text"] == P.build_text(np.array([5], dtype=np.uint64))[0]
