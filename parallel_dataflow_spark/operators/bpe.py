"""Distributed byte-pair-encoding (BPE) tokenizer training + encoding
(Sennrich et al., "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016 — public; the merge-table construction every modern LLM
tokenizer family descends from).

Scale shape — the whole point of doing this on Spark:

- The ONLY corpus-scale operation is the word-frequency aggregation (one
  explode + partial-agg shuffle, output bounded by |vocab|). Every merge
  iteration after that runs on the vocab-bounded (word, cnt, syms) table:
  pair counting is a zip_with/explode + one partial-agg shuffle whose
  output is bounded by |distinct symbol pairs|, and picking the best pair
  moves exactly ONE row to the driver.
- Applying a merge is a pure-JVM ``F.aggregate`` fold over each word's
  symbol array — ZERO extra exchanges, zero Python. The fold
  (merge-with-last-when-pair-matches) is provably equivalent to the
  textbook greedy left-to-right merge: after a merge the new last symbol
  is ``left||right``, which can never re-match ``left`` (it is strictly
  longer), so overlapping candidates in a same-symbol run collapse
  exactly like the sequential scan.
- Encoding a corpus = broadcast-join words against the trained
  word→symbols table (the training table already IS the encoding of
  every in-vocabulary word); OOV words (streaming use) fall back to
  their character split, the standard cold-path.

Determinism contract: the best pair is (max count, then lexicographic
smallest (left, right)) — total order, replayed by the DuckDB oracle in
plans/registry.py which derives the SAME merge table through an
INDEPENDENT algorithm (match positions + run-alternation window instead
of the fold; see `_bpe_oracle`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace-split lowercased text — the one
    corpus-scale shuffle; output is vocab-bounded."""
    words = F.explode(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        )
    ).alias("word")
    return (
        documents.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _merge_fold(sym_col, left: str, right: str):
    """Greedy left-to-right application of merge (left, right) as a
    pure-JVM fold (see module docstring for the equivalence argument)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    documents: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges. Returns (merges, syms) where merges
    is [(rank, left, right, merged)] and syms is the vocab-bounded
    (word, cnt, syms) table holding every corpus word's final symbol
    sequence — i.e. the trained encoder for in-vocabulary words."""
    syms = word_freq(documents, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    )
    syms = syms.persist()
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("syms")
        pair = F.explode(
            F.zip_with(
                F.slice("syms", 1, n - 1),
                F.slice("syms", 2, n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p")
        best = (
            syms.select("cnt", pair)
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((rank, left, right, left + right))
        nxt = syms.withColumn(
            "syms", _merge_fold(F.col("syms"), left, right)
        ).persist()
        nxt.count()  # materialize before dropping the parent
        syms.unpersist()
        syms = nxt
    return merges, syms


def bpe_encode(
    documents: DataFrame,
    syms: DataFrame,
    text_col: str = "text",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Encode a corpus with a trained word→symbols table: explode words,
    broadcast-join the vocab table (the scale path — the vocab table is
    merge-bounded while the corpus is not), fall back to the character
    split for OOV words. Output: one row per word occurrence with its
    symbol array."""
    words = documents.select(
        *extra_cols,
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
                " ",
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    return words.join(
        F.broadcast(syms.select("word", "syms")), "word", "left"
    ).withColumn(
        "syms",
        F.coalesce(F.col("syms"), F.split(F.col("word"), "")),
    )
