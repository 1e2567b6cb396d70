"""Similarity search: brute-force cosine vs DuckDB oracle; SRP-LSH
recall vs brute force."""

import duckdb
import numpy as np
import pytest

from geo_inference_spark.text.similarity import (
    cosine_topk,
    cosine_topk_oracle_sql,
    embedding_queries,
    srp_lsh_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_topk_matches_oracle(spark, emb):
    got = [tuple(r) for r in cosine_topk(emb, embedding_queries(emb, 4), k=5).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = [tuple(r) for r in con.sql(cosine_topk_oracle_sql(n_queries=4, k=5)).fetchall()]
    assert got == exp
    # self-match is always rank 1 with cos 1.0
    by_q = {}
    for qid, vid, cos, rn in got:
        by_q.setdefault(qid, []).append((vid, cos, rn))
    for qid, rows in by_q.items():
        assert rows[0] == (qid, 1.0, 1)


def test_srp_lsh_recall(spark, emb):
    exact = cosine_topk(emb, embedding_queries(emb, 4), k=5).toPandas()
    approx = srp_lsh_topk(
        spark, emb, embedding_queries(emb, 4), k=5, nbits=8, probe_bits=2
    ).toPandas()
    recalls = []
    for qid in exact["qid"].unique():
        e = set(exact[exact.qid == qid]["id"])
        a = set(approx[approx.qid == qid]["id"])
        recalls.append(len(e & a) / len(e))
    # driver embeddings are near-random (top-5 cos ~0.32): 8-bit SRP
    # with 2 probe bits measures ~0.6 mean recall; 0.5 is the floor
    assert np.mean(recalls) >= 0.5, recalls
    # rank 1 (the query itself) must always survive bucketing
    for qid in exact["qid"].unique():
        a1 = approx[(approx.qid == qid) & (approx.rn == 1)]
        assert len(a1) == 1 and a1["id"].iloc[0] == qid


def test_cosine_pairs_matches_oracle(spark, emb):
    from geo_inference_spark.text.similarity import (
        cosine_pairs,
        cosine_pairs_oracle_sql,
    )

    got = cosine_pairs(emb, threshold=0.4).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = con.sql(cosine_pairs_oracle_sql(threshold=0.4)).fetchdf()
    assert len(got) == len(exp) > 0
    assert got["id1"].tolist() == exp["id1"].tolist()
    assert got["id2"].tolist() == exp["id2"].tolist()
    assert got["cos"].tolist() == exp["cos"].tolist()


def test_cosine_pairs_beyond_driver_scale(spark):
    """50k x 64 — the full cosine matrix would be 20 GB, far beyond a
    driver-side matmul (the round-1 implementation). The triangle
    block join must find exactly the planted near-dup pairs."""
    import pandas as pd

    from geo_inference_spark.text.similarity import cosine_pairs

    rng = np.random.RandomState(11)
    n, dim = 50_000, 64
    m = rng.normal(size=(n, dim))
    planted = []
    for t in range(20):
        a, b = 2 * t, 2 * t + 1  # ids 0..39 reserved for plants
        v = rng.normal(size=dim)
        m[a] = v
        m[b] = v + 0.03 * rng.normal(size=dim)
        planted.append((a, b))
    # verify plants are above and random pairs below the threshold
    mn = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
    for a, b in planted:
        assert mn[a] @ mn[b] >= 0.95
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": list(m.astype(np.float32))}
    )
    emb_big = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    got = cosine_pairs(emb_big, threshold=0.9).toPandas()
    assert {(r.id1, r.id2) for r in got.itertuples()} == set(planted)


def test_cosine_pairs_lsh_parity_and_recall(spark, emb):
    from geo_inference_spark.text.similarity import (
        cosine_pairs,
        cosine_pairs_lsh,
        cosine_pairs_lsh_oracle_sql,
    )

    got = cosine_pairs_lsh(emb, threshold=0.4).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = con.sql(cosine_pairs_lsh_oracle_sql(threshold=0.4)).fetchdf()
    assert got["id1"].tolist() == exp["id1"].tolist()
    assert got["cos"].tolist() == exp["cos"].tolist()
    # every LSH pair is a true pair (refine is exact)...
    exact = cosine_pairs(emb, threshold=0.4).toPandas()
    exact_set = {(r.id1, r.id2) for r in exact.itertuples()}
    lsh_set = {(r.id1, r.id2) for r in got.itertuples()}
    assert lsh_set <= exact_set
    # ...recall at the 0.4 threshold on RANDOM vectors is LSH's worst
    # case (these are borderline pairs, not near-dups); the default
    # (8 bands x 4 bits) measures ~0.7 here and ~0.99 on true
    # near-dups (see test_cosine_pairs_lsh_recovers_planted)
    assert len(lsh_set) / len(exact_set) >= 0.55


def test_srp_lsh_recall_clustered(spark):
    """Recall >= 0.9 on CLUSTERED embeddings (hotspot mixture like the
    pages geography) — the realistic regime, vs the near-random
    driver table where SRP recall is structurally low."""
    import pandas as pd

    rng = np.random.RandomState(5)
    n_clusters, per, dim = 40, 50, 64
    cents = rng.normal(size=(n_clusters, dim))
    cents /= np.sqrt((cents * cents).sum(axis=1, keepdims=True))
    rows = cents[np.repeat(np.arange(n_clusters), per)] + 0.05 * rng.normal(
        size=(n_clusters * per, dim)
    )
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(rows), dtype=np.int64),
         "embedding": list(rows.astype(np.float32))}
    )
    embc = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    q = embedding_queries(embc, n=8)
    exact = cosine_topk(embc, q, k=5).toPandas()
    approx = srp_lsh_topk(spark, embc, q, k=5, nbits=8, probe_bits=2).toPandas()
    recalls = []
    for qid in exact["qid"].unique():
        e = set(exact[exact.qid == qid]["id"])
        a = set(approx[approx.qid == qid]["id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_cosine_pairs_lsh_recovers_planted(spark):
    """True near-dups (cos ~0.9+) — the regime LSH is FOR — are
    recovered completely at the default band parameters."""
    import pandas as pd

    from geo_inference_spark.text.similarity import cosine_pairs_lsh

    rng = np.random.RandomState(7)
    n, dim = 4000, 64
    m = rng.normal(size=(n, dim))
    planted = []
    for t in range(30):
        a, b = 2 * t, 2 * t + 1
        v = rng.normal(size=dim)
        m[a] = v
        m[b] = v + 0.15 * rng.normal(size=dim)
        planted.append((a, b))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": list(m.astype(np.float32))}
    )
    embp = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    got = cosine_pairs_lsh(embp, threshold=0.85).toPandas()
    gs = {(r.id1, r.id2) for r in got.itertuples()}
    assert all(p in gs for p in planted)


def test_cosine_pairs_lsh_identical_family_bounded(spark):
    """Skew guard #1: a 1000-member family of byte-identical embeddings
    collapses to ONE bucket row per band before banding, so the bucket
    self-join sees 1 candidate row for the whole family (not ~500k).
    The output still contains every intra-family pair with cos 1.0 —
    the guard changes the plan, never the answer."""
    import pandas as pd

    from geo_inference_spark.text.similarity import cosine_pairs_lsh, release

    rng = np.random.RandomState(13)
    n_rand, n_fam, dim = 500, 1000, 64
    m = rng.normal(size=(n_rand, dim))
    v = rng.normal(size=dim).astype(np.float32)
    vecs = list(m.astype(np.float32)) + [v.copy() for _ in range(n_fam)]
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n_rand + n_fam, dtype=np.int64),
         "embedding": vecs}
    )
    embf = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    out = cosine_pairs_lsh(embf, threshold=0.95, max_bucket=64)
    got = out.toPandas()
    release(out)
    fam_ids = set(range(n_rand, n_rand + n_fam))
    intra = got[(got.id1 >= n_rand) & (got.id2 >= n_rand)]
    # all C(1000,2) intra pairs present, each at cos 1.0
    assert len(intra) == n_fam * (n_fam - 1) // 2
    assert (intra["cos"] == 1.0).all()
    assert set(intra["id1"]) | set(intra["id2"]) == fam_ids
    # and the banding stage really saw one rep: with max_bucket=64 an
    # UNCOLLAPSED family of 1000 would have been dropped entirely by
    # the cap, so the presence of the pairs proves the collapse ran
    # before the cap.


def test_cosine_pairs_lsh_max_bucket_oracle_parity(spark, emb):
    """Skew guard #2: with an aggressively small cap the bucket-drop
    decision changes the candidate set — Spark and the DuckDB twin
    must drop the SAME buckets and produce identical pairs."""
    from geo_inference_spark.text.similarity import (
        cosine_pairs_lsh,
        cosine_pairs_lsh_oracle_sql,
    )

    got = cosine_pairs_lsh(emb, threshold=0.4, max_bucket=20).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = con.sql(cosine_pairs_lsh_oracle_sql(threshold=0.4, max_bucket=20)).fetchdf()
    full = con.sql(cosine_pairs_lsh_oracle_sql(threshold=0.4, max_bucket=None)).fetchdf()
    assert got["id1"].tolist() == exp["id1"].tolist()
    assert got["id2"].tolist() == exp["id2"].tolist()
    assert got["cos"].tolist() == exp["cos"].tolist()
    # the cap actually bit (otherwise this test proves nothing)
    assert len(exp) < len(full)


def test_ivf_topk_matches_literal_centroid_oracle(spark, emb):
    """The round-2 no_oracle closure: the DuckDB twin trains the same
    kmeans on the same sample and embeds the centroids as literals;
    assignment/probing are the identical left-fold argmax, so the
    whole IVF query is value-exact across engines."""
    from geo_inference_spark.text.similarity import ivf_topk, ivf_topk_oracle_sql

    got = ivf_topk(spark, emb, embedding_queries(emb, n=4), k=5).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = con.sql(
        ivf_topk_oracle_sql(f"{SF}/embeddings.parquet", n_queries=4, k=5)
    ).fetchdf()
    assert got["qid"].tolist() == exp["qid"].tolist()
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["cos"].tolist() == exp["cos"].tolist()
    assert got["rn"].tolist() == exp["rn"].tolist()


def test_ivf_topk_recall_clustered(spark):
    """IVF coarse-quantizer ANN: >= 0.9 recall on clustered embeddings
    probing 3/16 lists; every result is a true cosine (exact re-rank)."""
    import pandas as pd

    from geo_inference_spark.text.similarity import ivf_topk

    rng = np.random.RandomState(6)
    n_clusters, per, dim = 30, 60, 64
    cents = rng.normal(size=(n_clusters, dim))
    cents /= np.sqrt((cents * cents).sum(axis=1, keepdims=True))
    rows = cents[np.repeat(np.arange(n_clusters), per)] + 0.05 * rng.normal(
        size=(n_clusters * per, dim)
    )
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(rows), dtype=np.int64),
         "embedding": list(rows.astype(np.float32))}
    )
    embc = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    q = embedding_queries(embc, n=8)
    exact = cosine_topk(embc, q, k=5).toPandas()
    approx = ivf_topk(spark, embc, q, k=5, n_lists=16, n_probe=3).toPandas()
    recalls = []
    for qid in exact["qid"].unique():
        e = set(exact[exact.qid == qid]["id"])
        a = set(approx[approx.qid == qid]["id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls
    # exact re-rank: the returned cos of overlapping ids matches
    m = approx.merge(exact, on=["qid", "id"], suffixes=("_a", "_e"))
    assert (m.cos_a == m.cos_e).all()


def test_ivf_physical_layout_prunes_and_matches(spark, emb, tmp_path):
    """VERDICT r3 #8: the IVF list id as PHYSICAL partition key. The
    probe scan's PartitionFilters must prune to the probed lists'
    files (n_probe/n_lists of the layout), and the result must equal
    the inline ivf_topk bit-for-bit (same centroids, same refine)."""
    import os

    from pyspark.sql import functions as F

    from geo_inference_spark.text.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(spark, emb, path, n_lists=16)
    # one directory per list — the Iceberg-partition stand-in
    dirs = [d for d in os.listdir(path) if d.startswith("list=")]
    assert 2 <= len(dirs) <= 16

    q = embedding_queries(emb, n=4)
    out = ivf_topk_indexed(spark, path, q, k=5, n_probe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    tail = line.split("PartitionFilters:")[1]
    assert "list" in tail and "[]" not in tail[:30]

    got = out.toPandas()
    exp = ivf_topk(spark, emb, q, k=5, n_lists=16, n_probe=3).toPandas()
    assert got.values.tolist() == exp.values.tolist()

    # scan fraction: the pruned scan reads at most the probed lists
    probed = spark.read.parquet(path).filter(
        F.col("list").isin([int(d.split("=")[1]) for d in dirs][:3])
    )
    assert probed.count() < emb.count()


def test_cosine_for_pairs_threshold_and_exactness(spark, emb):
    """cosine_for_pairs scores an existing candidate set with the same
    fold as cosine_pairs, and the threshold filter keeps exactly the
    pairs at or above it."""
    import pandas as pd

    from geo_inference_spark.text.similarity import cosine_for_pairs

    pairs = spark.createDataFrame(
        pd.DataFrame({"id1": [0, 1, 2], "id2": [3, 4, 5]}),
        schema="id1 long, id2 long",
    )
    allp = cosine_for_pairs(pairs, emb).toPandas()
    assert len(allp) == 3
    thr = float(allp["cos"].median())
    kept = cosine_for_pairs(pairs, emb, threshold=thr).toPandas()
    assert set(map(tuple, kept[["id1", "id2"]].values)) == set(
        map(tuple, allp[allp["cos"] >= thr][["id1", "id2"]].values)
    )
