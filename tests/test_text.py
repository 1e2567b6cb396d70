"""Text ops: dedup / analysis operators vs DuckDB oracles on the
driver's documents table, plus near-dup recall on the synthetic pages
table (which has dup structure by construction)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geo_inference_spark.text import analysis as TA
from geo_inference_spark.text import dedup as DD
from geo_inference_spark.text import portable as P
from geo_inference_spark.sources.pages import pages_df

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return c


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_lsh_pairs_match_oracle(spark, docs, con):
    got = _rows(DD.lsh_candidate_pairs(docs))
    exp = sorted(tuple(r) for r in con.sql(DD.lsh_pairs_oracle_sql()).fetchall())
    assert got == exp and len(got) > 0


def test_jaccard_pairs_match_oracle(spark, docs, con):
    got = _rows(DD.jaccard_verified_pairs(docs, 0.5))
    exp = sorted(
        tuple(r) for r in con.sql(DD.jaccard_pairs_oracle_sql(threshold=0.5)).fetchall()
    )
    assert got == exp and len(got) > 0


def test_simhash_matches_oracle(spark, docs, con):
    got = _rows(DD.with_simhash(docs).select("doc_id", "simhash"))
    exp = sorted(tuple(r) for r in con.sql(DD.simhash_oracle_sql()).fetchall())
    assert got == exp


def test_langid_matches_oracle(spark, docs, con):
    e = TA.langid_exprs(P.DUCK)
    cols = ", ".join(f"{v} AS {k}" for k, v in e.items())
    got = _rows(
        TA.with_langid(docs).select(
            "doc_id", *[k for k in e]
        )
    )
    exp = sorted(
        tuple(r) for r in con.sql(f"SELECT doc_id, {cols} FROM documents").fetchall()
    )
    assert got == exp


def test_fingerprints_match_oracle(spark, docs, con):
    got = _rows(TA.with_fingerprint_count(docs).select("doc_id", "n_fingerprints"))
    exp = sorted(
        tuple(r)
        for r in con.sql(
            f"SELECT doc_id, {TA.fingerprint_expr(P.DUCK)} FROM documents"
        ).fetchall()
    )
    assert got == exp


def test_exact_dedup_finds_synthetic_dup_families(spark):
    """The synthetic pages table has ~8% exact dups by construction
    (sources/pages.py); md5 groupBy must recover them."""
    pages = pages_df(spark, 3000, partitions=8)
    fam = (
        pages.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c > 1")
    )
    n_dup_groups = fam.count()
    assert n_dup_groups > 20  # plenty of families at n=3000
    # families share canonical text across ids in the same _DUP_MOD block
    total_dups = fam.agg(F.sum("c")).collect()[0][0]
    assert total_dups >= 2 * n_dup_groups


def test_lsh_recovers_near_dups_on_pages(spark):
    """Near dups (canonical text + tiny suffix) must collide in LSH."""
    pages = pages_df(spark, 1500, partitions=8).select("page_id", "text")
    pairs = DD.lsh_candidate_pairs(pages, id_col="page_id", k=3)
    verified = DD.jaccard_verified_pairs(
        pages, threshold=0.8, id_col="page_id", k=3
    )
    assert pairs.count() > 0
    v = verified.toPandas()
    assert len(v) > 0
    assert (v["jaccard"] >= 0.8).all()


def test_lsh_collapsed_matches_oracle(spark, docs, con):
    got = _rows(DD.lsh_collapsed_pairs(docs))
    exp = con.sql(DD.lsh_collapsed_oracle_sql()).fetchall()
    assert got == [tuple(r) for r in exp]
    assert len(got) > 0


def test_lsh_identical_family_bounded(spark):
    """A 1k-identical-doc family: plain LSH would emit ~500k pairs in
    one bucket; the collapsed variant emits exactly N-1 family edges
    (+ rep-level pairs), and max_bucket drops the hot bucket."""
    import pandas as pd

    n_fam, n_other = 1000, 200
    rows = [(i, "the same exact duplicated text body repeated") for i in range(n_fam)]
    rows += [
        (n_fam + i, " ".join(f"tok{i}x{j}" for j in range(8)))
        for i in range(n_other)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )
    out = DD.lsh_collapsed_pairs(df).toPandas()
    fam = out[out.id2 < n_fam]
    assert len(fam) == n_fam - 1  # N-1 edges, not N^2/2 pairs
    assert (fam.id1 == 0).all()
    assert len(out) < 5 * n_fam  # nowhere near quadratic

    # max_bucket cap: the identical family's buckets exceed the cap
    # and are dropped whole; distinct-doc collisions survive
    capped = DD.lsh_candidate_pairs(df, max_bucket=16).toPandas()
    assert not ((capped.id1 < n_fam) & (capped.id2 < n_fam)).any()
    # and the capped oracle reproduces it exactly
    con2 = duckdb.connect()
    con2.register("family_docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = con2.sql(
        DD.lsh_pairs_oracle_sql(table="family_docs", max_bucket=16)
    ).fetchdf()
    got = capped.sort_values(["id1", "id2"]).reset_index(drop=True)
    exp = exp.sort_values(["id1", "id2"]).reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))


def test_lsh_mutated_family_bounded_by_cap(spark):
    """VERDICT r3 #1: a 1k-member NEAR-identical family (shared
    boilerplate + per-doc mutation, so NOT byte-identical) survives
    the exact-dup collapse — every member bands as its own rep into
    one hot bucket. The default-on max_bucket cap must bound the
    candidate count through the whole decision chain
    (collapsed pairs -> clusters), and the capped oracle must agree."""
    import pandas as pd

    n_fam, n_other = 1000, 100
    boiler = "shared boilerplate navigation header footer copyright terms"
    rows = [(i, f"{boiler} stamp{i}") for i in range(n_fam)]
    rows += [
        (n_fam + i, " ".join(f"uniq{i}w{j}" for j in range(8)))
        for i in range(n_other)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")

    # the collapse alone does NOT absorb this family (distinct md5s)
    assert df.select(F.md5("text")).distinct().count() == n_fam + n_other

    out = DD.lsh_collapsed_pairs(df).toPandas()  # default cap active
    # bounded: nowhere near the ~500k pairs an uncapped bucket emits
    assert len(out) <= DD.DEFAULT_MAX_BUCKET ** 2
    clusters = DD.dedup_clusters(df)
    assert clusters.count() == n_fam + n_other  # completes, all docs labeled

    # capped collapsed oracle reproduces the capped Spark result exactly
    con2 = duckdb.connect()
    con2.register("fam_docs", pdf)
    exp = con2.sql(DD.lsh_collapsed_oracle_sql(table="fam_docs")).fetchdf()
    got = out.sort_values(["id1", "id2"]).reset_index(drop=True)
    exp = exp.sort_values(["id1", "id2"]).reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))

    # uncapped contrast on a small slice: the cap is what bounds it
    small = spark.createDataFrame(
        pdf.head(200), schema="doc_id long, text string"
    )
    uncapped = DD.lsh_collapsed_pairs(small, max_bucket=None).count()
    capped = DD.lsh_collapsed_pairs(small, max_bucket=64).count()
    assert uncapped > 190 * 189 / 2 * 0.5  # quadratic blow-up is real
    assert capped < uncapped / 4


def test_release_unpersists_attached_deps(spark, docs):
    """ADVICE r2: library callers can release the persisted signature
    after acting on an LSH result — no cached-storage leak in
    long-lived sessions."""
    from geo_inference_spark.text.cache import release

    out = DD.lsh_candidate_pairs(docs)
    out.count()
    deps = out._cached_deps
    assert deps and all(
        d.storageLevel.useMemory or d.storageLevel.useDisk for d in deps
    )
    release(out)
    assert all(
        not d.storageLevel.useMemory and not d.storageLevel.useDisk
        for d in deps
    )
    assert out._cached_deps == []


def test_percentile_approx_within_1pct_of_exact(spark, docs):
    """The 100 TB quantile path (t-digest percentile_approx) tracks
    the exact percentile the oracle certifies to within 1%."""
    row = docs.agg(
        F.expr("percentile(length(text), 0.9)").alias("exact"),
        F.expr("percentile_approx(length(text), 0.9, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * row["exact"]


def test_cache_released_context_and_derived_frame_survival(spark):
    """Persisted deps are freed by the context manager / release().

    r6: the round-4/5 GC finalizer is GONE — it fired mid-query for
    the common shape ``op(df).orderBy(...).count()`` (the intermediate
    wrapper dies at the end of the expression) and silently unpersisted
    caches the running plan still needed, making the dedup queries
    2-3x slower through __spark_entry__ than inline. This test pins
    the new contract: a derived frame keeps the dep cached until an
    explicit release."""
    import gc

    from geo_inference_spark.text.cache import attach, release, released

    def is_cached(df):
        return df.storageLevel.useMemory or df.storageLevel.useDisk

    # context manager frees on exit
    dep = spark.range(100).persist()
    dep.count()
    assert is_cached(dep)
    out = attach(spark.range(10), dep)
    with released(out) as o:
        assert o.count() == 10
        assert is_cached(dep)
    assert not is_cached(dep)

    # dropping the wrapper does NOT unpersist: a derived frame built
    # from it (the orderBy-then-count shape) must still see the cache
    dep2 = spark.range(100).persist()
    dep2.count()
    derived = attach(spark.range(10), dep2).orderBy("id")
    gc.collect()
    assert is_cached(dep2)
    assert derived.count() == 10
    assert is_cached(dep2)
    spark.catalog.clearCache()

    # explicit release is idempotent
    dep3 = spark.range(100).persist()
    out3 = attach(spark.range(10), dep3)
    release(out3)
    assert not is_cached(dep3)
    release(out3)  # second release: safe no-op
    assert not is_cached(dep3)


def test_py_band_keys_parity_with_sql_exprs(spark, docs):
    """The pandas-UDF band keys (r6 optimization) must be bit-identical
    to the legacy SQL expression tree on real docs AND edge texts."""
    edge = spark.createDataFrame(
        [(100, ""), (101, " "), (102, "  double  space "), (103, "one"),
         (104, "two words"), (105, "a b c d e"),
         (106, "unicode café näï ve"), (107, "a  b"),
         (108, "trailing space "), (109, " leading")],
        "doc_id long, text string",
    )
    for df in (docs, edge):
        sig = DD.with_minhash_signature(df, DD.DEFAULT_H, DD.DEFAULT_K)
        band_cols = [
            F.md5(F.concat(F.col(f"mh{b*2}"), F.col(f"mh{b*2+1}")))
            .alias(f"k{b}")
            for b in range(DD.DEFAULT_H // DD.DEFAULT_R)
        ]
        old = sig.select("doc_id", *band_cols)
        kudf = DD._band_keys_udf(DD.DEFAULT_H, DD.DEFAULT_R, DD.DEFAULT_K)
        new = df.select(
            "doc_id",
            *[F.element_at(kudf(F.col("text")), b + 1).alias(f"k{b}")
              for b in range(DD.DEFAULT_H // DD.DEFAULT_R)],
        )
        assert old.exceptAll(new).count() == 0
        assert new.exceptAll(old).count() == 0


def test_dedup_clusters_identity_seeds_big_regime_parity(spark):
    """dedup_clusters declares identity seeds to CC (r6 optimization:
    skips the nodes-join collect in the driver regime, the labels
    init join in the RDD regime). Forcing driver_threshold=0 runs the
    distributed regime on the same graph — both must agree exactly."""
    import geo_inference_spark.operators.vectorize as V

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = [tuple(r) for r in DD.dedup_clusters(docs).collect()]
    orig = V.connected_components

    def forced(nodes, edges, max_iters=64, driver_threshold=5_000_000,
               identity_seeds=False):
        return orig(nodes, edges, max_iters, driver_threshold=0,
                    identity_seeds=identity_seeds)

    V.connected_components = forced
    try:
        big = [tuple(r) for r in DD.dedup_clusters(docs).collect()]
    finally:
        V.connected_components = orig
    assert small == big
