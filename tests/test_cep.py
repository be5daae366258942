"""CEP NFA tests (FIXTURES.md B3): planted patterns + negative controls;
streaming result must equal the batch reference (confluence under
micro-batching), and a pure-Python golden validates both."""

import os

import numpy as np
import pandas as pd
import pytest

from parallel_dataflow_spark.sources.sequences import SEQUENCE_SCHEMA
from parallel_dataflow_spark.streaming.cep import (
    Pattern,
    advance_nfa,
    match_pattern_batch,
    match_pattern_stream,
    row_step_mask,
)

BASE = np.datetime64("2026-01-01T00:00:00")
PATTERN = Pattern.of([[101], [102], [103]], gap_seconds=300)


def _rows():
    """Three docs: full match, gap-broken match, negative control — plus a
    doc with two overlapping matches."""
    rows = []

    def add(doc, minute, tokens):
        rows.append(
            {
                "doc_id": doc,
                "tokens": tokens,
                "n_tok": len(tokens),
                "source": "web",
                "event_ts": BASE + np.timedelta64(minute * 60 + len(rows), "s"),
            }
        )

    # doc match: 101 → 102 → 103 within gaps
    add("match", 0, [1, 101, 2])
    add("match", 2, [102])
    add("match", 4, [5, 103])
    # doc gapbreak: same steps but 102→103 gap > 5 min
    add("gapbreak", 0, [101])
    add("gapbreak", 2, [102])
    add("gapbreak", 20, [103])
    # doc negative: never contains 102
    add("negative", 0, [101, 103])
    add("negative", 1, [103, 104])
    # doc double: two complete sequential matches
    add("double", 0, [101])
    add("double", 1, [102])
    add("double", 2, [103])
    add("double", 3, [101, 102])  # satisfies steps 0 and 1 — starts fresh
    add("double", 4, [102])
    add("double", 5, [103])
    # tail sentinel far in the future so the watermark passes everything
    add("sentinel", 120, [0])
    return rows


@pytest.fixture(scope="module")
def cep_df(spark):
    pdf = pd.DataFrame(_rows())
    pdf["event_ts"] = pdf["event_ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf, schema=SEQUENCE_SCHEMA)


def golden_matches(rows, pattern):
    """Pure-Python reference matcher (generation-time golden)."""
    out = []
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r["event_ts"])
        ts = np.array(
            [int(pd.Timestamp(r["event_ts"]).value // 1000) for r in rs], dtype=np.int64
        )
        mask = row_step_mask(pd.Series([r["tokens"] for r in rs]), pattern)
        st, sa, sl = [], [], []
        for m in advance_nfa(pattern, ts, mask, st, sa, sl):
            out.append((doc, m[0], m[1], m[2]))
    return sorted(out)


def test_nfa_semantics(cep_df):
    rows = _rows()
    golden = golden_matches(rows, PATTERN)
    docs = {g[0] for g in golden}
    assert docs == {"match", "double"}
    assert len([g for g in golden if g[0] == "double"]) == 2


def test_batch_matcher_equals_golden(spark, cep_df):
    got = sorted(tuple(r) for r in match_pattern_batch(cep_df, PATTERN).collect())
    assert got == golden_matches(_rows(), PATTERN)


def test_stream_matcher_equals_batch(spark, cep_df, tmp_path):
    src = str(tmp_path / "cep_src")
    os.makedirs(src)
    pdf = pd.DataFrame(_rows())
    pdf["event_ts"] = pdf["event_ts"].astype("datetime64[us]")
    # write in 4 files split by time so matches span micro-batches
    pdf = pdf.sort_values("event_ts")
    for i, part in enumerate(np.array_split(pdf, 4)):
        spark.createDataFrame(part, schema=SEQUENCE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk={i:04d}"))

    from parallel_dataflow_spark.sources.sequences import read_sequence_stream

    stream = read_sequence_stream(spark, src, max_files_per_trigger=1)
    matches = match_pattern_stream(stream, PATTERN, watermark="1 minute")
    q = (
        matches.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from cep_out").collect())
    want = golden_matches(_rows(), PATTERN)
    # the sentinel pushes the watermark past every buffered row, so all
    # matches must have been released and emitted
    assert got == want


def test_stream_matcher_out_of_order_arrival(spark, cep_df, tmp_path):
    """Batching-independence: rows arrive SHUFFLED across micro-batches
    (files split randomly, not by time; the far-future sentinel arrives
    last). The buffer-until-watermark release must still feed the NFA in
    (event_ts, checksum) order, so the match set equals the batch twin —
    the streaming analogue of the reference's any-schedule-same-fixpoint
    differential (test.rs:21-70). The 30-minute watermark exceeds the
    non-sentinel span (~20 min), so no shuffled row is ever late."""
    src = str(tmp_path / "cep_src_ooo")
    os.makedirs(src)
    rows = _rows()
    body = [r for r in rows if r["doc_id"] != "sentinel"]
    rng = np.random.default_rng(11)
    order = rng.permutation(len(body))
    shuffled = [body[i] for i in order]
    chunks = np.array_split(np.arange(len(shuffled)), 3)
    for i, idxs in enumerate(chunks):
        pdf = pd.DataFrame([shuffled[j] for j in idxs])
        pdf["event_ts"] = pdf["event_ts"].astype("datetime64[us]")
        spark.createDataFrame(pdf, schema=SEQUENCE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk={i:04d}"))
    sent = pd.DataFrame([r for r in rows if r["doc_id"] == "sentinel"])
    sent["event_ts"] = sent["event_ts"].astype("datetime64[us]")
    spark.createDataFrame(sent, schema=SEQUENCE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "chunk=0003"))

    from parallel_dataflow_spark.sources.sequences import read_sequence_stream

    stream = read_sequence_stream(spark, src, max_files_per_trigger=1)
    matches = match_pattern_stream(stream, PATTERN, watermark="30 minutes")
    q = (
        matches.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_ooo_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from cep_ooo_out").collect())
    assert got == golden_matches(_rows(), PATTERN)


def test_stream_matcher_bounded_buffer(spark, cep_df, tmp_path):
    """max_buffer_rows caps per-key state by releasing the OLDEST overflow
    rows through the NFA early. With in-order arrival (files split by
    time) the early release preserves the match set exactly."""
    src = str(tmp_path / "cep_src_cap")
    os.makedirs(src)
    pdf = pd.DataFrame(_rows())
    pdf["event_ts"] = pdf["event_ts"].astype("datetime64[us]")
    pdf = pdf.sort_values("event_ts")
    for i, part in enumerate(np.array_split(pdf, 4)):
        spark.createDataFrame(part, schema=SEQUENCE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"chunk={i:04d}"))

    from parallel_dataflow_spark.sources.sequences import read_sequence_stream

    stream = read_sequence_stream(spark, src, max_files_per_trigger=1)
    # normal watermark, cap=1: between batches the lagging watermark keeps
    # >1 row buffered, so the overflow path releases the oldest rows early;
    # the sentinel still watermark-flushes the tail, and with in-order
    # arrival the final match set is unchanged
    overflow = spark.sparkContext.accumulator(0)
    matches = match_pattern_stream(
        stream, PATTERN, watermark="1 minute", max_buffer_rows=1,
        overflow_acc=overflow,
    )
    q = (
        matches.writeStream.outputMode("append")
        .format("memory")
        .queryName("cep_cap_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_cap"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(tuple(r) for r in spark.sql("select * from cep_cap_out").collect())
    assert got == golden_matches(_rows(), PATTERN)
    # the documented determinism degradation must be OBSERVABLE: the
    # overflow accumulator counts rows released ahead of the watermark
    assert overflow.value > 0


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream join vs its batch twin."""
    from parallel_dataflow_spark.sources.sequences import read_sequence_stream, write_sequence_table
    from parallel_dataflow_spark.streaming.windows import stream_stream_token_join

    src = str(tmp_path / "join_src")
    write_sequence_table(spark, src, 400, seed=7, n_files=4)

    left_s = read_sequence_stream(spark, src, 2)
    right_s = read_sequence_stream(spark, src, 2)
    joined = stream_stream_token_join(left_s, right_s)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("select * from ssj")

    from parallel_dataflow_spark.sources.sequences import read_sequence_table

    batch = read_sequence_table(spark, src)
    want = stream_stream_token_join(batch, batch)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert len(g) > 0
    assert g == w
    # self-join: every row pairs with itself → tokens_match true there
    assert all(r for r in got.filter("left_ts = right_ts").select("tokens_match").collect())
