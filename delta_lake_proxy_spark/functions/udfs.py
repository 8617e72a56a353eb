"""The engine's user-extensible function surface (SURVEY §2.10).

The reference has no UDF surface (all compiled Rust); the engine exposes
Spark's native one with a strict policy: built-in JVM expressions first,
Arrow-vectorized pandas UDFs where Python is unavoidable, never row-at-a-time
Python UDFs. These are the canonical examples of each sanctioned tier, used
by tests to pin that the vectorized path agrees with the JVM path bit-for-bit
after rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_cosine_udf(query_vec: list[float]):
    """Scalar pandas UDF: Arrow-batched cosine vs a closed-over query vector.

    NumPy does the per-batch math (one BLAS dot per row set), so the Python
    boundary is crossed once per Arrow batch, not once per row.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def cosine_udf(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        dots = mat @ q
        norms = np.linalg.norm(mat, axis=1)
        return pd.Series(np.round(dots / (norms * qn), 6))

    return cosine_udf


def cosine_topk_pandas(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The pandas-UDF twin of ``similarity.cosine_topk`` (same contract)."""
    udf = make_cosine_udf(query_vec)
    scored = embeddings.select(F.col(id_col), udf(F.col(vec_col)).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def grouped_zscore(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-group z-score normalization — the
    template for per-entity feature normalization in training pipelines.
    Output: key, id columns preserved, value replaced by its group z-score."""
    schema = df.schema

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value]
        std = v.std(ddof=0)
        pdf[value] = 0.0 if std == 0 else (v - v.mean()) / std
        return pdf

    return df.groupBy(key).applyInPandas(normalize, schema=schema)
