"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: geocode documents -> broadcast PIP join vs
                 the 45-degree admin grid -> counts per area (sf0.001).
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query (same column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_inference_spark.functions.derive import GRID_AREA_SQL, LAT_SQL, LON_SQL
from geo_inference_spark.operators.pip_join import pages_per_area
from geo_inference_spark.sources.pages import admin_grid_polygons

SF0001 = "/root/testdata/sf0.001"


def _docs_with_latlon(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.withColumn("lon", F.expr(LON_SQL)).withColumn("lat", F.expr(LAT_SQL))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = _docs_with_latlon(spark, SF0001)
    return pages_per_area(spark, docs, admin_grid_polygons(), res=6)


# --------------------------------------------------------------- queries

def q_pip_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocode -> cell cover broadcast join -> exact PIP -> count/area."""
    docs = _docs_with_latlon(spark, sf_dir)
    return pages_per_area(spark, docs, admin_grid_polygons(), res=6).orderBy(
        "area_id"
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 hash-groupBy, keep min doc_id per group."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
        .orderBy("keep_id")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language (whitespace tokenizer)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks.cast("long")).alias("total_tokens"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pip_count_per_area": q_pip_count,
        "dedup_exact": q_exact_dedup,
        "text_token_stats": q_token_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pip_count_per_area": f"""
            SELECT {GRID_AREA_SQL} AS area_id, count(*) AS cnt
            FROM documents GROUP BY 1 ORDER BY area_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
                   count(*) AS dup_cnt
            FROM documents GROUP BY 1 ORDER BY keep_id
        """,
        "text_token_stats": """
            SELECT lang, count(*) AS n_docs,
                   cast(sum(len(regexp_split_to_array(trim(text), '\\s+'))) as bigint) AS total_tokens,
                   round(avg(length(text)), 2) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
    }
