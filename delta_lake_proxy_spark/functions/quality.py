"""Corpus-quality filters beyond per-document stats (charter X4 depth):
intra-document repetition metrics in the style of the published
Gopher/RefinedWeb rules, and cross-corpus contamination scoring against a
benchmark set. All declarative DataFrame ops — explode + per-doc
aggregation, broadcast semi-joins — no Python in the hot path, and every
metric is reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WORD_RE


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition metrics (the Gopher-rule family):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (empty lines ignored);
    - ``dup_line_char_frac``: fraction of non-empty-line characters living
      in duplicated lines;
    - ``top_bigram_frac``: fraction of word-characters covered by the most
      frequent word bigram (boilerplate/templating signal).

    One explode + per-doc aggregation per metric family (two shuffles on
    ``id_col``); joins are per-document metadata-sized. Documents with no
    lines/bigrams score 0.
    """
    t = F.col(text_col)
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(t, "\n")).alias("line"),
    ).filter(F.length(F.trim(F.col("line"))) > 0)
    per_line = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("n"))
    line_stats = per_line.groupBy(id_col).agg(
        F.round(
            (F.sum("n") - F.count(F.lit(1))).cast("double")
            / F.greatest(F.sum("n"), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n") * F.length("line")).otherwise(0))
            .cast("double")
            / F.greatest(F.sum(F.col("n") * F.length("line")), F.lit(1)),
            6,
        ).alias("dup_line_char_frac"),
    )
    words = docs.select(
        F.col(id_col),
        F.length(t).alias("_n_chars"),
        F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0).alias("_w"),
    )
    bigrams = words.select(
        F.col(id_col),
        F.col("_n_chars"),
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - 2),
                    lambda i: F.concat_ws(" ", F.element_at("_w", i + 1), F.element_at("_w", i + 2)),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    top_bigram = (
        bigrams.groupBy(id_col, "_n_chars", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col, "_n_chars")
        .agg(F.max(F.struct(F.col("n"), F.length("bg").alias("l"))).alias("m"))
        .select(
            F.col(id_col),
            F.round(
                (F.col("m.n") * F.col("m.l")).cast("double")
                / F.greatest(F.col("_n_chars"), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    base = docs.select(F.col(id_col))
    out = (
        base.join(line_stats, id_col, "left")
        .join(top_bigram, id_col, "left")
        .fillna(
            {"dup_line_frac": 0.0, "dup_line_char_frac": 0.0, "top_bigram_frac": 0.0}
        )
    )
    return out


def contamination_scores(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination score per training document: the fraction of
    its distinct ``n``-word shingle hashes that also occur anywhere in the
    benchmark corpus (the standard n-gram-overlap decontamination check).

    The benchmark's distinct shingle-hash set is usually tiny relative to
    the corpus and BROADCASTS; the train side is one explode + distinct +
    semi-probe + per-doc aggregation — the corpus is scanned once, the
    shuffle carries (doc, hash) pairs. Documents shorter than ``n`` words
    score 0 (no shingles to leak). Companion to
    ``text.ngram_contamination``, which attributes the overlap to
    specific eval documents as (train_id, eval_id, shared_ngrams) pairs."""

    def shingle_hashes(df: DataFrame, keep_id: bool):
        words = df.select(
            *([F.col(id_col)] if keep_id else []),
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0).alias("_w"),
        )
        sh = words.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode(
                F.when(
                    F.size("_w") >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size("_w") - n),
                        lambda i: F.xxhash64(
                            F.concat_ws(
                                " ",
                                F.slice(F.col("_w"), i + 1, n),
                            )
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("h"),
        )
        return sh.dropDuplicates(([id_col] if keep_id else []) + ["h"])

    train_sh = shingle_hashes(train, keep_id=True)
    bench_sh = F.broadcast(shingle_hashes(benchmark, keep_id=False))
    hits = train_sh.join(bench_sh, "h", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_hit")
    )
    totals = train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_tot"))
    return (
        train.select(F.col(id_col))
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.round(
                F.coalesce(F.col("_hit"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("_tot"), F.lit(0)), F.lit(1)),
                6,
            ).alias("contamination"),
        )
    )
