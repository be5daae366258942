"""run_quota_job (13th deployable): stream-vs-batch differential on the
per-(source, window) admission table, exactly-once kill/resume.

Quota admission is buffered-release (rows fold in strict global
(event_ts, ck) order once the watermark passes them), so after the real
data a far-future SENTINEL row advances the watermark and drains every
buffer — the batch golden excludes the sentinel's source, whose own
window never closes."""

import datetime
import time

from parallel_dataflow_spark.sources.sequences import (
    SEQUENCE_SCHEMA,
    read_sequence_table,
    write_sequence_table,
)
from parallel_dataflow_spark.streaming.jobs import run_quota_job
from parallel_dataflow_spark.streaming.stateful import token_quota_batch


def canon(df):
    return sorted(tuple(r) for r in df.select(
        "source", "window_start", "admitted_tok", "rejected_tok",
        "admitted_rows", "rejected_rows",
    ).filter("source <> '__sentinel__'").collect())


def _flush_sentinel(spark, src):
    far = datetime.datetime(2026, 6, 1, 0, 0, 0)
    row = [("__sentinel__", list(range(10)), 10, "__sentinel__", far)]
    spark.createDataFrame(row, SEQUENCE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src + "/sentinel")


def test_quota_job_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    write_sequence_table(spark, src, 2000, seed=31, n_files=8, rows_per_sec=2)

    q, sink = run_quota_job(spark, src, str(tmp_path / "full"))
    q.processAllAvailable()
    _flush_sentinel(spark, src)
    q.processAllAvailable()
    q.stop()
    got = canon(sink.read(spark))

    want = canon(token_quota_batch(read_sequence_table(spark, src), 2_000, 600))
    assert got == want
    assert any(r[3] > 0 for r in want), "the cap must actually bind"

    # kill mid-stream, resume from checkpoint, DIFFERENT batching than the
    # full run — buffered release makes the admission order (and thus the
    # final table) batching-invariant, and the latest-wins keyed sink plus
    # running emissions make the replay idempotent
    work = str(tmp_path / "resume")
    q2, _ = run_quota_job(spark, src, work, max_files_per_trigger=2)
    deadline = time.time() + 120
    while time.time() < deadline:
        lp = q2.lastProgress
        if lp is not None and lp["batchId"] >= 2:
            break
        time.sleep(0.2)
    q2.stop()

    q3, sink3 = run_quota_job(spark, src, work, max_files_per_trigger=2)
    q3.processAllAvailable()
    q3.stop()
    assert canon(sink3.read(spark)) == want
