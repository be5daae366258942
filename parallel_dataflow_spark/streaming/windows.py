"""Streaming window jobs over the token-sequence stream.

The north-rule surface: tumbling / sliding / session event-time windows
with watermarks over ``(doc_id, tokens, n_tok, source, event_ts)``.

Dataflow-graph mapping (reference semantics → Structured Streaming):
- operator vertices  → the stages of this plan (scan → repartition →
  window agg → sink), each a streaming stage;
- timestamped progress tracking → the event-time watermark (the reference's
  per-round "worklist empty" signal generalized to out-of-order time,
  impls/src/parallel.rs:29);
- channel backpressure → bounded micro-batches (maxFilesPerTrigger);
- deterministic-under-parallelism output → canonical aggregates + an
  idempotent keyed sink (reference: differential executor equality,
  impls/src/bin/test.rs:21-70).

Token-array math runs through a JVM xxhash64 checksum + sums — with an
optional Arrow-vectorized per-batch kernel — never per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# checksum over the token array: order-sensitive 64-bit hash per row,
# bounded to 2^40 so a commutative sum over up to ~2^22 rows per group
# can't overflow int64 under ANSI mode. Bit-identical across parallelism
# and restarts; the "token-array equality" invariant is checkable per
# output row.
def token_checksum(tokens: Column = None) -> Column:
    tokens = F.col("tokens") if tokens is None else tokens
    return F.pmod(F.xxhash64(tokens), F.lit(1 << 40))


def salted_repartition(df: DataFrame, key: str = "doc_id", salt_buckets: int = 8,
                       num_partitions: int | None = None) -> DataFrame:
    """Explicit repartition by (hash(key), salt) — the north rule's skew
    handling. A hot doc_id spreads over ``salt_buckets`` partitions; keyed
    aggregation later re-merges (two-stage agg). The salt column is
    deterministic (hash of tokens length + position via xxhash64 of the
    tokens array), so replays land identically."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64("tokens"), F.lit(salt_buckets)))
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return salted.repartition(int(n), F.hash(F.col(key)), F.col("__salt")).drop("__salt")


def _agg_cols() -> list[Column]:
    return [
        F.count("*").alias("n_seqs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(token_checksum()).cast("long").alias("token_checksum"),
        F.min("n_tok").alias("min_tok"),
        F.max("n_tok").alias("max_tok"),
    ]


def tumbling_doc_stats(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-(doc_id, window) token stats — THE exactly-once output, keyed
    (doc_id, window_start) as the north rule requires."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), "doc_id")
        .agg(*_agg_cols())
        .select(
            "doc_id",
            F.col("w.start").alias("window_start"),
            "n_seqs",
            "total_tokens",
            "token_checksum",
            "min_tok",
            "max_tok",
        )
    )


def sliding_source_stats(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-(source, sliding window) throughput stats."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide).alias("w"), "source")
        .agg(*_agg_cols())
        .select(
            "source",
            F.col("w.start").alias("window_start"),
            "n_seqs",
            "total_tokens",
            "token_checksum",
            "min_tok",
            "max_tok",
        )
    )


def session_doc_stats(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-(doc_id, session window) stats — session windows require
    watermark + append-style finalization; keyed (doc_id, session_start)."""
    return (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap).alias("w"), "doc_id")
        .agg(*_agg_cols())
        .select(
            "doc_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_seqs",
            "total_tokens",
            "token_checksum",
        )
    )


def stream_stream_token_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
    include_checksums: bool = False,
) -> DataFrame:
    """Watermarked stream-stream inner join: sequences of the same doc_id
    arriving on two streams within ``max_delay`` of each other (e.g. raw vs
    re-tokenized feeds). Both sides carry watermarks so state is bounded —
    Spark drops join state older than the watermark + interval.

    ``include_checksums`` additionally emits per-side token checksums —
    needed when the output feeds a KEYED sink: (doc_id, left_ts, right_ts)
    alone is NOT unique (hot doc_ids emit several sequences in the same
    second), and upserting on a non-unique key silently drops join rows."""
    l = left.withWatermark("event_ts", watermark).alias("l")
    r = right.withWatermark("event_ts", watermark).alias("r")
    cols = [
        F.col("l.doc_id").alias("doc_id"),
        F.col("l.event_ts").alias("left_ts"),
        F.col("r.event_ts").alias("right_ts"),
        (token_checksum(F.col("l.tokens")) == token_checksum(F.col("r.tokens"))).alias(
            "tokens_match"
        ),
        F.col("l.n_tok").alias("n_tok_left"),
        F.col("r.n_tok").alias("n_tok_right"),
    ]
    if include_checksums:
        cols += [
            token_checksum(F.col("l.tokens")).alias("left_ck"),
            token_checksum(F.col("r.tokens")).alias("right_ck"),
        ]
    return l.join(
        r,
        (F.col("l.doc_id") == F.col("r.doc_id"))
        & (F.col("r.event_ts") >= F.col("l.event_ts"))
        & (F.col("r.event_ts") <= F.col("l.event_ts") + F.expr(f"INTERVAL {max_delay}")),
        "inner",
    ).select(*cols)


def stream_stream_token_left_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    max_delay: str = "5 minutes",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every left (raw-feed)
    sequence paired with its re-tokenized twin arriving within
    ``max_delay`` — or emitted NULL-PADDED once the watermark proves no
    twin can still arrive. The outer side is the semantics the inner
    join cannot express: "this sequence was never re-tokenized" is a
    fact only state expiry can assert, so the null row materializes when
    Spark evicts the unmatched left row from the join state (bounded by
    watermark + interval, same as the inner join).

    Null right-side fields are coalesced to -1 sentinels so the output
    is KEYABLE: an idempotent keyed sink cannot upsert on nullable key
    columns, and (-1, -1) cannot collide with a real match (epochs and
    checksums are non-negative)."""
    l = left.withWatermark("event_ts", watermark).alias("l")
    r = right.withWatermark("event_ts", watermark).alias("r")
    joined = l.join(
        r,
        (F.col("l.doc_id") == F.col("r.doc_id"))
        & (F.col("r.event_ts") >= F.col("l.event_ts"))
        & (F.col("r.event_ts") <= F.col("l.event_ts") + F.expr(f"INTERVAL {max_delay}")),
        "left_outer",
    )
    return joined.select(
        F.col("l.doc_id").alias("doc_id"),
        F.col("l.event_ts").alias("left_ts"),
        token_checksum(F.col("l.tokens")).alias("left_ck"),
        F.col("r.event_ts").isNotNull().alias("matched"),
        F.coalesce(
            F.col("r.event_ts").cast("timestamp_ltz").cast("long"), F.lit(-1)
        ).alias("right_ts_s"),
        # guard on the join's null indicator, NOT on coalesce over the
        # checksum: Spark's xxhash64(NULL) hashes the seed and returns
        # a non-null constant, so a bare coalesce would stamp every
        # unmatched row with that phantom checksum
        F.when(
            F.col("r.event_ts").isNotNull(), token_checksum(F.col("r.tokens"))
        ).otherwise(F.lit(-1)).alias("right_ck"),
    )
