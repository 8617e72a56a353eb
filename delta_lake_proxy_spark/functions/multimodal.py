"""Multimodal column plumbing (charter X5).

Images/audio/video are opaque ``binary`` columns travelling next to a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the actual
media decode is STUBBED (``decode_stub=True`` produces a deterministic fake
feature vector; ``decode_stub=False`` raises ``NotImplementedError``) because
image/audio codec libraries are not available in this environment.

Scale notes: binary payloads ride the normal columnar path (Parquet binary),
and feature extraction is an Arrow-batched ``mapInPandas`` — one Python worker
pass per partition, no per-row UDF calls. Partition sizing for ~MB-scale blobs
should come from ``spark.sql.files.maxPartitionBytes``, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic opaque binary payload + typed metadata struct
    from each document (the fixture has no real media; payload bytes are the
    utf-8 text — an opaque stand-in exercising the binary column path).
    Modality is ``id % 3``-derived so an external SQL oracle can reproduce
    the per-modality rollup."""
    payload = F.encode(F.col(text_col), "utf-8")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.pmod(F.col(id_col), F.lit(len(MODALITIES))) + 1).cast("int"),
    )
    meta = F.struct(
        modality.alias("modality"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.when(modality == "image", (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(1920)) + 1).cast("int")).alias("width"),
        F.when(modality == "image", (F.pmod(F.xxhash64(F.col(id_col), F.lit(2)), F.lit(1080)) + 1).cast("int")).alias("height"),
        F.when(modality == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col(id_col),
        payload.alias("media_bytes"),
        meta.alias("media_meta"),
    )


def extract_features(
    media: DataFrame, n_features: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over (media_bytes, media_meta).

    With ``decode_stub=True`` the "decoder" computes a deterministic fake
    feature vector (byte-histogram moments) so the full pipeline — schema,
    batching, partitioning — is exercised and testable. A real deployment
    replaces ``_decode`` with an actual image/audio decoder.
    """

    def _decode(payload: bytes, modality: str) -> list[float]:
        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires codec libraries not present in this "
                "environment; run with decode_stub=True"
            )
        if not payload:
            return [0.0] * n_features
        # deterministic fake features: strided byte-value means, vectorized
        # (np.frombuffer is zero-copy; uint8 sums are exact in float64, so
        # values are identical to the scalar formulation)
        arr = np.frombuffer(payload, dtype=np.uint8)
        return [
            round(float(arr[j::n_features].mean()), 6) if arr[j::n_features].size else 0.0
            for j in range(n_features)
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "feature": [
                        _decode(b, m["modality"])
                        for b, m in zip(pdf["media_bytes"], pdf["media_meta"])
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_summary(features: DataFrame) -> DataFrame:
    """Per-modality rollup of the extracted features (exercises the full
    attach -> extract -> aggregate pipeline)."""
    f0 = F.element_at("feature", 1)
    return (
        features.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            # decimal accumulation: bit-stable under any partitioning, so the
            # rollup hash-compares clean against an external oracle
            F.round(
                F.sum(f0.cast("decimal(27,9)")).cast("double") / F.count(f0), 6
            ).alias("avg_f0"),
        )
        .orderBy("modality")
    )
