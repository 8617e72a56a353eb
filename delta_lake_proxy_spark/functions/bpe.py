"""Distributed BPE tokenizer training and encoding (charter X4).

Byte-pair encoding a la Sennrich et al. 2016: iteratively merge the most
frequent adjacent symbol pair. The classic trainer never iterates over the
CORPUS — it iterates over the WORD-FREQUENCY table (vocab-sized), which is
what makes it distributable:

- ONE corpus scan builds ``(word, freq)`` (tokenize + hash agg);
- each merge round is a pair-count aggregation over the word table
  (explode adjacent pairs weighted by freq, partial+final agg), a 1-row
  driver argmax (metadata-sized, deterministic lexicographic tie-break),
  and an Arrow-batched merge application (``mapInPandas`` over the word
  table — per-word work is a local list scan);
- lineage is cut with ``localCheckpoint`` every few rounds (the
  connected-components pattern) so plan depth never grows with merges.

Encoding applies the learned merge ranks to the full corpus in one
Arrow-batched pass (the standard rank-priority BPE encode), with a
per-batch word cache — corpus-scale cost is one scan, no shuffle.

At 100 TB: the corpus scan dominates and parallelizes; the word table is
vocab-sized (10^6-10^7 rows for web-scale corpora), so merge rounds are
small distributed jobs; driver state is just the merge list.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_proxy_spark.functions.text import WORD_RE

END = "</w>"  # end-of-word marker, per the original BPE formulation


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge_pandas(a: str, b: str):
    """mapInPandas stage merging every adjacent (a, b) into a+b."""
    merged = a + b

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                i, res = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return apply


def bpe_train(
    docs: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the ordered
    merge list (rank = position). Deterministic: pair-count ties break on
    the lexicographically smallest pair, so any cluster geometry learns the
    same tokenizer. Stops early when the best pair's weighted count falls
    below ``min_pair_count`` (merging hapax pairs memorizes noise)."""
    spark = docs.sparkSession
    words = _word_freqs(docs, text_col).select(
        F.concat(
            F.split(F.col("word"), "(?!$)"),  # chars
            F.array(F.lit(END)),
        ).alias("syms"),
        "freq",
    )
    words = words.persist()
    words.count()  # materialize the single corpus scan
    merges: list[tuple[str, str]] = []
    for r in range(num_merges):
        pairs = (
            words.select(
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias("i", "a"),
                F.col("syms"),
                F.col("freq"),
            )
            .select(
                F.col("a"),
                F.element_at("syms", F.col("i") + 2).alias("b"),
                F.col("freq"),
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("n"))
        )
        best = pairs.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc()).limit(1).collect()
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        prev = words
        words = words.mapInPandas(
            _apply_merge_pandas(a, b), schema="syms array<string>, freq long"
        )
        if (r + 1) % checkpoint_every == 0:
            # cut lineage (the CC pattern): plan depth must not grow with
            # merge count, or round N replans rounds 0..N-1
            words = words.localCheckpoint(eager=True)
            prev.unpersist()
            words.persist()
        else:
            words = words.persist()
            words.count()
            prev.unpersist()
    words.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: rank-priority BPE
    (always apply the lowest-rank applicable merge first — the canonical
    encode, so train-then-encode of the training corpus reproduces the
    trainer's final symbol sequences). One Arrow-batched corpus pass with a
    per-batch word cache; the merge table is broadcast with the closure.

    Output: ``(id, tokens array<string>, n_tokens)``."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import re as _re

    word_re = _re.compile(WORD_RE)

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_rank is None:
                break
            a, b = merges[best_rank]
            merged = a + b
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        cache[word] = syms
        return syms

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks = []
            for txt in pdf["_text"]:
                out: list[str] = []
                for w in word_re.findall((txt or "").lower()):
                    out.extend(encode_word(w, cache))
                toks.append(out)
            yield pd.DataFrame(
                {"_id": pdf["_id"], "tokens": toks, "n_tokens": [len(t) for t in toks]}
            )

    out_schema = T.StructType(
        [
            T.StructField("_id", docs.schema[id_col].dataType),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    return (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .mapInPandas(encode, schema=out_schema)
        .withColumnRenamed("_id", id_col)
    )
