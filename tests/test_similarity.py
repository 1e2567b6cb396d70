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
