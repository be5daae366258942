"""CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020 —
public). A language model trained on a target-domain corpus scores every
document; per language, documents are split into head/middle/tail
perplexity terciles — the standard web-corpus quality partition (low
perplexity under the clean-domain LM = head).

The paper's 5-gram KenLM is replaced by a bigram LM with add-one
smoothing — the distributed shape is identical (model tables keyed by
n-gram) and a bigram table is vocab²-bounded in principle,
seen-bigram-bounded in practice.

Scale shape:
- Model training touches only TARGET-source documents: one bigram-count
  aggregation and one context-count aggregation, both vocab-bounded
  outputs. The global vocab size is a single driver-side scalar.
- Scoring is corpus-volume but join-light: doc bigrams are derived
  scan-side, the two model tables broadcast (vocab-bounded), and the only
  corpus-volume shuffle is the per-document score partial-agg carrying
  (doc_id, lang, bigram-count, micro-nat partial) rows — raw text dies at
  the scan.
- Bucketing is ntile(3) over a lang-partitioned window: one exchange on
  lang; the full per-language sort is the same device CCNet itself uses
  to find tercile cutoffs. (At extreme per-language scale the cutoffs
  would come from a quantile pass instead of a full ntile — the bucket
  RULE is unchanged, only its physical derivation.)

Determinism contract (the DSIR micro-nat pattern, operators/dsir.py):
log-probabilities are converted ONCE, on the vocab-bounded model tables,
to integer micro-nats; per-document scores are exact BIGINT sums —
partition- and fold-order-independent. The per-document average used for
ordering is one IEEE double division of two exact integers (deterministic
bit-for-bit), tie-broken by doc_id, so the tercile boundaries replay
exactly. The only float->int conversions are one ln per model row and the
single unseen-context floor ln(1/V) — the DuckDB oracle recomputes each on
identical rationals (the DSIR 1-ulp-class precedent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_bigrams(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, lang, source, w1, w2) — consecutive-word pairs, derived
    scan-side from the whitespace tokenization shared with the other text
    operators."""
    ws = documents.select(
        "doc_id",
        "lang",
        "source",
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("ws"),
    ).filter(F.size("ws") >= 2)
    return ws.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i.cast("int")).alias("w1"),
                    F.element_at(F.col("ws"), (i + 1).cast("int")).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "lang", "source", "bg.w1", "bg.w2")


def perplexity_buckets(
    documents: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
) -> tuple[DataFrame, int]:
    """Per-document LM score + per-language head/middle/tail bucket.

    Returns (result, vocab_size). Result columns: doc_id, lang,
    n_bigrams, score_micro (BIGINT sum of bigram log-prob micro-nats —
    higher = more target-like), ppl_bucket in {'head','middle','tail'}
    (ntile(3) per lang on (avg log-prob DESC, doc_id)). Documents with
    fewer than two words carry no bigrams and are excluded, mirroring
    CCNet's paragraph-level minimum-length gate."""
    bg = _doc_bigrams(documents, text_col)
    target = bg.filter(F.col("source") == target_source)

    c1 = target.groupBy("w1").agg(F.count("*").alias("c1"))
    # vocab = distinct word types in the target corpus (w1 ∪ w2 covers the
    # final token of each doc); exact distinct over a vocab-bounded set —
    # ONE scalar reaches the driver
    vocab = int(
        target.select(F.col("w1").alias("w"))
        .unionAll(target.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
        or 0
    )
    # seen-bigram log-prob and per-context unseen floor, micro-rounded on
    # the vocab-bounded model tables (the one float->int step per row)
    b12 = (
        target.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .join(c1, "w1")
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.lit(float(vocab))))
                * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    ctx_floor = c1.select(
        "w1",
        F.round(F.log(1.0 / (F.col("c1") + F.lit(float(vocab)))) * 1e6)
        .cast("long")
        .alias("floor_micro"),
    )
    global_floor = int(round(math.log(1.0 / max(vocab, 1)) * 1e6))

    scored = (
        bg.join(F.broadcast(b12), ["w1", "w2"], "left")
        .join(F.broadcast(ctx_floor), "w1", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lp_micro", "floor_micro", F.lit(global_floor)).alias(
                "lp"
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lp").cast("long").alias("score_micro"),
        )
    )
    avg = F.col("score_micro").cast("double") / F.col("n_bigrams").cast("double")
    w = Window.partitionBy("lang").orderBy(avg.desc(), F.col("doc_id").asc())
    return (
        scored.select(
            "doc_id",
            "lang",
            "n_bigrams",
            "score_micro",
            F.when(F.ntile(3).over(w) == 1, F.lit("head"))
            .when(F.ntile(3).over(w) == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        ),
        vocab,
    )
