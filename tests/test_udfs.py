"""UDF-surface tests: the Arrow-vectorized paths agree with the JVM paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_proxy_spark.functions import similarity, udfs
from delta_lake_proxy_spark.io import load_table
from tests.conftest import SF_DIR


def test_pandas_cosine_matches_jvm(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    jvm = similarity.cosine_topk(emb, q, k=10).collect()
    arrow = udfs.cosine_topk_pandas(emb, q, k=10).collect()
    assert [(r["vec_id"], r["score"]) for r in jvm] == [
        (r["vec_id"], r["score"]) for r in arrow
    ]


def test_grouped_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 4, 5.0)],
        "k string, id long, v double",
    )
    out = {r["id"]: r["v"] for r in udfs.grouped_zscore(df, "k", "v").collect()}
    assert abs(out[2]) < 1e-12  # group mean maps to 0
    assert abs(out[1] + out[3]) < 1e-12  # symmetric
    assert out[4] == 0.0  # single-element group (std=0) -> 0
