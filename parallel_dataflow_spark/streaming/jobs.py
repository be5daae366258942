"""End-to-end streaming jobs: source → salted repartition → windowed agg /
CEP → idempotent exactly-once sink, with checkpointing and metrics.

These are the deployable units (spark-submit --py-files); tests and bench
drive them over the deterministic generated sequence table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from parallel_dataflow_spark.sources.sequences import read_sequence_stream
from parallel_dataflow_spark.streaming.sink import IdempotentKeyedSink
from parallel_dataflow_spark.streaming import windows as W
from parallel_dataflow_spark.streaming.cep import Pattern, match_pattern_stream


def run_tumbling_job(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 2,
    salt_buckets: int = 8,
) -> tuple[StreamingQuery, IdempotentKeyedSink]:
    """The flagship exactly-once job: per-(doc_id, window) token stats,
    update-mode upserts into the keyed idempotent sink."""
    sink = IdempotentKeyedSink(
        os.path.join(work_dir, "sink"), key_cols=["doc_id", "window_start"]
    )
    stream = read_sequence_stream(spark, input_dir, max_files_per_trigger)
    stream = W.salted_repartition(stream, "doc_id", salt_buckets)
    agg = W.tumbling_doc_stats(stream, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .start()
    )
    return q, sink


def run_session_job(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    gap: str = "5 minutes",
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 2,
) -> tuple[StreamingQuery, IdempotentKeyedSink]:
    """Session windows must finalize → append mode; sink keyed by
    (doc_id, session_start)."""
    sink = IdempotentKeyedSink(
        os.path.join(work_dir, "sink"), key_cols=["doc_id", "session_start"]
    )
    stream = read_sequence_stream(spark, input_dir, max_files_per_trigger)
    agg = W.session_doc_stats(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .start()
    )
    return q, sink


def run_cep_job(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    pattern: Pattern,
    watermark: str = "5 minutes",
    max_files_per_trigger: int = 2,
) -> tuple[StreamingQuery, IdempotentKeyedSink]:
    sink = IdempotentKeyedSink(
        os.path.join(work_dir, "sink"),
        key_cols=["doc_id", "match_start_ts", "match_end_ts"],
    )
    stream = read_sequence_stream(spark, input_dir, max_files_per_trigger)
    matches = match_pattern_stream(stream, pattern, watermark=watermark)
    q = (
        matches.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .start()
    )
    return q, sink


def batch_tumbling_golden(spark: SparkSession, input_dir: str, window: str = "10 minutes") -> DataFrame:
    """Batch twin of run_tumbling_job's aggregation (the differential
    golden; withWatermark is a no-op on batch DataFrames)."""
    from parallel_dataflow_spark.sources.sequences import read_sequence_table

    return W.tumbling_doc_stats(read_sequence_table(spark, input_dir), window=window)
