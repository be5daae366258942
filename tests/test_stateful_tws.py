"""Exercises the transformWithStateInPandas PROCESSOR code path directly.

The sandbox image lacks google.protobuf, so Spark's TWS state protocol
(pyspark/sql/streaming/proto/StateMessage_pb2) cannot run end-to-end and
running_doc_stats_stream(api='auto') always takes the
applyInPandasWithState fallback (covered by test_streaming.py). This file
closes the gap for the TWS branch itself: RunningDocStats —
init / getValueState / handleInputRows / state round-trip across
micro-batches — runs against a contract-faithful in-memory
StatefulProcessorHandle double, and its final emissions are checked
against the batch-twin fold. The processor under test is the REAL class
the tws branch hands to transformWithStateInPandas; only the state
transport is substituted.
"""

import numpy as np
import pandas as pd
import pytest

from parallel_dataflow_spark.streaming.stateful import (
    _CHECKSUM_MOD,
    RunningDocStats,
    running_doc_stats_stream,
    tws_available,
)


class FakeValueState:
    """pyspark.sql.streaming.value_state_client contract: exists() /
    get() -> tuple / update(tuple) / clear()."""

    def __init__(self):
        self._v = None

    def exists(self) -> bool:
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v) -> None:
        assert isinstance(v, (tuple, list))
        self._v = tuple(v)

    def clear(self) -> None:
        self._v = None


class FakeHandle:
    """StatefulProcessorHandle double: hands out named ValueStates and
    records the schema the processor registered."""

    def __init__(self):
        self.states = {}
        self.schemas = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        self.schemas[name] = schema
        return self.states.setdefault(name, FakeValueState())


def _batches(seed: int = 3, n_batches: int = 4, rows_per_batch: int = 16):
    """Keyed micro-batches of (n_tok, token_sum) rows for a handful of
    docs — the post-featurization shape the stateful stage consumes."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        docs = rng.integers(0, 5, size=rows_per_batch)
        out.append(
            pd.DataFrame(
                {
                    "doc_id": [f"doc-{d}" for d in docs],
                    "n_tok": rng.integers(1, 64, size=rows_per_batch),
                    "token_sum": rng.integers(0, _CHECKSUM_MOD, size=rows_per_batch),
                }
            )
        )
    return out


def test_tws_processor_round_trip_matches_batch_fold():
    """TWS scopes each named state to the current grouping key in the
    transport layer; the double emulates that with one handle (and one
    initialized processor) per key, persistent across micro-batches."""
    handles: dict[str, FakeHandle] = {}
    procs: dict[str, RunningDocStats] = {}

    def proc_for(doc: str) -> RunningDocStats:
        if doc not in procs:
            handles[doc] = FakeHandle()
            procs[doc] = RunningDocStats()
            procs[doc].init(handles[doc])
            assert "doc_stats" in handles[doc].states  # registered via handle
        return procs[doc]

    batches = _batches()
    last_emit: dict[str, tuple] = {}
    for pdf in batches:
        for doc, grp in pdf.groupby("doc_id"):
            # TWS feeds an iterator of pandas frames per key per batch
            (emit,) = list(proc_for(doc).handleInputRows((doc,), iter([grp]), None))
            assert list(emit.columns) == [
                "doc_id",
                "n_seqs",
                "total_tokens",
                "token_checksum",
            ]
            last_emit[doc] = tuple(emit.iloc[0][1:])

    allrows = pd.concat(batches)
    for doc, grp in allrows.groupby("doc_id"):
        want = (
            len(grp),
            int(grp["n_tok"].sum()),
            int(grp["token_sum"].sum()) % _CHECKSUM_MOD,
        )
        assert last_emit[f"{doc}"] == want, doc
        # the ValueState itself holds the running totals (round-trip)
        assert handles[f"{doc}"].states["doc_stats"]._v == want

    for p in procs.values():
        p.close()


def test_tws_state_persists_across_batches():
    """The second batch must START from the first batch's state — the
    'mutable in/out values across rounds' semantics
    (impls/src/sequential.rs:23-24)."""
    proc = RunningDocStats()
    handle = FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame({"doc_id": ["d"], "n_tok": [10], "token_sum": [7]})
    b2 = pd.DataFrame({"doc_id": ["d"], "n_tok": [5], "token_sum": [_CHECKSUM_MOD - 3]})
    (e1,) = list(proc.handleInputRows(("d",), iter([b1]), None))
    assert tuple(e1.iloc[0][1:]) == (1, 10, 7)
    (e2,) = list(proc.handleInputRows(("d",), iter([b2]), None))
    # checksum wraps mod 2^40
    assert tuple(e2.iloc[0][1:]) == (2, 15, (7 + _CHECKSUM_MOD - 3) % _CHECKSUM_MOD)


@pytest.mark.skipif(
    not tws_available(), reason="google.protobuf absent: TWS transport unavailable"
)
def test_tws_end_to_end_when_protobuf_present(spark, tmp_path):
    """Runs the REAL transformWithStateInPandas path when the environment
    has protobuf (skipped in this sandbox; green on a full cluster image)."""
    from parallel_dataflow_spark.sources.sequences import (
        read_sequence_stream,
        write_sequence_table,
    )

    src = str(tmp_path / "tws_src")
    write_sequence_table(spark, src, 400, seed=5, n_files=4)
    stream = read_sequence_stream(spark, src, 2)
    out = running_doc_stats_stream(stream, api="tws")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("select count(*) from tws_out").collect()[0][0] > 0
