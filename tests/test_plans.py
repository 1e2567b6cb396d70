"""Physical-plan shape assertions — the scale properties the engine
relies on must be visible in `explain`, not just hoped for:

* the PIP join broadcasts the cover (never shuffles the pages side),
* the parquet scan is pruned to (lat, lon) for the count-per-area
  pipeline,
* the LSH bucket join is a real equi-join (hashable keys),
* the overlap stitch has exactly two exchanges.
"""

import numpy as np

from geo_inference_spark.operators.overlap import overlap_stitch, raster_to_chunks
from geo_inference_spark.operators.pip_join import pages_per_area
from geo_inference_spark.raster.kernels import make_linear_model
from geo_inference_spark.sources.pages import pages_df, synth_admin_polygons
from geo_inference_spark.text.dedup import lsh_candidate_pairs


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_broadcasts_cover_and_prunes_scan(spark, tmp_path):
    path = str(tmp_path / "pages")
    pages_df(spark, 2000, partitions=4).write.parquet(path)
    pq = spark.read.parquet(path)
    out = pages_per_area(spark, pq, synth_admin_polygons(16), res=8)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # column pruning: the parquet scan must read only lat/lon
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "lat" in ln and "lon" in ln
        assert "html" not in ln and "text" not in ln and "url" not in ln


def test_overlap_stitch_has_exactly_two_exchanges(spark):
    arr = np.random.RandomState(0).uniform(0, 255, size=(1, 16, 16))
    chunks, ny, nx = raster_to_chunks(spark, arr, 8)
    tiles = overlap_stitch(chunks, make_linear_model(2), 1, 8, ny, nx, 2)
    plan = plan_of(tiles)
    # two FlatMapGroupsInPandas, each fed by one Exchange
    assert plan.count("FlatMapGroupsInPandas") == 2
    assert plan.count("Exchange") == 2


def test_lsh_pairs_plan_is_hash_join(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = lsh_candidate_pairs(docs)
    plan = plan_of(pairs)
    assert "Join" in plan  # equi-join on (band, key), never a nested loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_pairs_triangle_plan(spark):
    """Exact distributed pairs: ONE exchange feeding one grouped-map
    (the triangle block join), no cartesian/nested-loop anywhere,
    no collect-based stage."""
    from geo_inference_spark.text.similarity import cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cosine_pairs(emb, threshold=0.4, n_blocks=4)
    plan = plan_of(out)
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_pairs_lsh_plan(spark):
    """Bucketed pair join: equi-join on (band, key), not a cross join;
    refine joins are hash joins."""
    from geo_inference_spark.text.similarity import cosine_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cosine_pairs_lsh(emb, threshold=0.4)
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
    # the bucket/rep projections are persisted: the band-key UDF must
    # run ONCE, not once per self-join side (VERDICT r2 #1)
    assert "InMemoryTableScan" in plan
    from geo_inference_spark.text.similarity import release

    release(out)


def test_interval_join_plan_no_nested_loop(spark):
    """The bucketized range join must plan as a hash equi-join."""
    from pyspark.sql import functions as F

    from geo_inference_spark.operators.interval_join import interval_join

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    iv = orders.limit(10).select(
        "o_orderkey",
        F.col("o_orderdate").alias("start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("end"),
    )
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_shipdate").alias("ts")
    )
    plan = plan_of(interval_join(li, iv, bucket_seconds=7 * 86400))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q6_pushes_filters_to_scan(spark):
    """TPC-H Q6 shape: the discount/quantity predicates must reach the
    parquet scan as PushedFilters."""
    from geo_inference_spark.operators.relational import q6_revenue_by_year

    plan = plan_of(q6_revenue_by_year(spark, "/root/testdata/sf0.001"))
    lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert lines, plan
    assert "l_discount" in lines[0] and "l_quantity" in lines[0]


def test_top_tokens_partial_agg_before_shuffle(spark):
    """The wordcount shape: explode feeds a PARTIAL HashAggregate in
    the same stage (map-side combine), so the shuffle carries one row
    per (lang, word) — never the exploded token stream."""
    import __spark_entry__ as e

    out = e.q_top_tokens(spark, "/root/testdata/sf0.001")
    plan = plan_of(out)
    assert "Generate" in plan  # the explode
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "CartesianProduct" not in plan
    # the plan string prints top-down, so the operator that CONSUMES
    # the explode is the nearest HashAggregate/Exchange line ABOVE the
    # Generate line: it must be the partial HashAggregate, not an
    # Exchange (no shuffle of the exploded token stream)
    lines = plan.splitlines()
    ig = next(i for i, ln in enumerate(lines) if "Generate" in ln)
    above = [ln for ln in lines[:ig]
             if "HashAggregate" in ln or "Exchange" in ln]
    assert above and "HashAggregate" in above[-1], plan


def test_jaccard_intersect_not_in_join_condition(spark):
    """The verify intersect must be evaluated ONCE, in a Project above
    the joins — never collapsed by the threshold filter into the
    broadcast join condition, where it was evaluated 3x per probed
    pair inside a generated method big enough that HotSpot
    intermittently refused to JIT it (the measured 5 s vs 20-56 s
    bimodality, r6). The rand() fence makes the projection
    nondeterministic so the filter cannot be pushed through it; the
    intersect stays a single JVM expression (no Arrow ship of the
    per-pair array columns)."""
    from geo_inference_spark.text.dedup import jaccard_verified_pairs, release

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = jaccard_verified_pairs(docs, threshold=0.5)
    plan = plan_of(out)
    # exactly one evaluation site, and it is not a join condition
    assert plan.count("array_intersect") == 1, plan
    for ln in plan.splitlines():
        if "Join" in ln:
            assert "array_intersect" not in ln, ln
    release(out)


def test_srp_signature_runs_once(spark):
    """The probe equi-join's inferred isnotnull(bucket) must not
    materialize a second ArrowEvalPython running the signature UDF
    over every row (the coalesce(udf, 0) non-nullable key fence)."""
    from geo_inference_spark.text.similarity import (
        embedding_queries,
        srp_lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = srp_lsh_topk(spark, emb, embedding_queries(emb, n=4), k=5)
    plan = plan_of(out)
    # exactly two python stages: the signature over base rows and the
    # fused cosine over candidates
    assert plan.count("ArrowEvalPython") == 2, plan
