"""DSIR-style data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling", NeurIPS
2023 — public). Documents from a raw pool are scored by how much more
likely they are under a TARGET-domain bag-of-hashed-features unigram
model than under the raw-pool model; positive log-weight documents are
the ones importance resampling would up-weight toward the target
distribution.

Scale shape:

- The corpus touches exactly TWO aggregations: the bucket-count pass
  (explode words map-side, hash to ``buckets`` feature buckets scan-side,
  partial-agg shuffle whose output is bucket-bounded — DSIR's hashed
  n-gram trick is precisely what makes the model table bounded while the
  corpus is not) and the per-document weight sum (doc-keyed partial agg).
- The log-ratio model table is at most ``buckets`` rows and broadcast
  joins onto the exploded words — raw text dies at the scan; the only
  corpus-volume shuffle carries (doc_id, count, weight-partial) rows.
- Driver materialization: two scalar totals (target/raw word counts).

Determinism contract (cross-engine, mirrored by the DuckDB oracle in
plans/registry.py:dsir_select_docs): features are md5_60bit(word) mod
``buckets`` (the verification-grade hash family); each bucket's
add-one-smoothed log probability ratio is converted ONCE to integer
micro-nats (round(lr * 1e6) as bigint); per-document weights are BIGINT
sums of those micro-nats — exact integer arithmetic, independent of
partitioning and fold order, so the top-k kept boundary can never wobble
on float summation order. The only float step is the two
`ln` calls per bucket, shared by both engines on identical rationals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_dataflow_spark.functions.text import md5_60bit


def dsir_select(
    documents: DataFrame,
    target_source: str = "src0",
    buckets: int = 1024,
    select_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Score every raw-pool document (source != target_source) by its
    DSIR importance log-weight under hashed-unigram models of the target
    vs the raw pool. Returns (doc_id, n_words, logw_micro, kept) where
    logw_micro is the weight in integer micro-nats and kept marks the
    ``select_k`` most target-like documents (rank on (logw_micro DESC,
    doc_id)) — the paper's top-k resampling step made deterministic."""
    b_ct = int(buckets)
    words = documents.select(
        "doc_id",
        "source",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
                " ",
            )
        ).alias("word"),
    ).filter(F.col("word") != "")
    feats = words.select(
        "doc_id",
        "source",
        F.pmod(md5_60bit(F.col("word")), F.lit(b_ct)).alias("b"),
    )
    is_target = F.col("source") == target_source
    counts = (
        feats.groupBy("b")
        .agg(
            F.sum(F.when(is_target, 1).otherwise(0)).alias("c_t"),
            F.sum(F.when(~is_target, 1).otherwise(0)).alias("c_r"),
        )
    )
    totals = counts.agg(
        F.sum("c_t").alias("t"), F.sum("c_r").alias("r")
    ).collect()[0]
    tot_t, tot_r = int(totals["t"] or 0), int(totals["r"] or 0)
    lr = counts.select(
        "b",
        F.round(
            (
                F.log((F.col("c_t") + 1.0) / F.lit(float(tot_t + b_ct)))
                - F.log((F.col("c_r") + 1.0) / F.lit(float(tot_r + b_ct)))
            )
            * 1e6
        )
        .cast("long")
        .alias("lr_micro"),
    )
    scored = (
        feats.filter(~is_target)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("lr_micro").cast("long").alias("logw_micro"),
        )
    )
    # DSIR selects the top-k documents by importance weight (the paper's
    # resampling step, made deterministic: rank ties break on doc_id).
    # The global rank runs on the doc-bounded (doc_id, score) table —
    # 16 B/row whatever the document sizes (the token_zipf_slope
    # precedent for bounded single-partition sorts; emitting kept as a
    # flag keeps every score in the output, so no top-k pushdown).
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("logw_micro"), F.asc("doc_id"))
    return scored.withColumn("rk", F.row_number().over(w)).select(
        "doc_id",
        "n_words",
        "logw_micro",
        (F.col("rk") <= F.lit(int(select_k))).alias("kept"),
    )
