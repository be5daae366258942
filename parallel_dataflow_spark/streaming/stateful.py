"""Custom keyed stateful operators on Spark 4.x transformWithStateInPandas
(the successor API to applyInPandasWithState; SURVEY.md §2.2 'stateful
ops'). The CEP engine (cep.py) uses applyInPandasWithState — this module
covers the modern API surface with a running per-doc accumulator: the
'mutable in/out values across rounds' shape of the reference's worklist
state (impls/src/sequential.rs:23-24), re-expressed as a ValueState.

The per-row token work (sum/checksum) is done JVM-side BEFORE the
stateful stage, so the state kernel only folds small numeric rows —
token arrays never enter the state store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "doc_id string, n_seqs bigint, total_tokens bigint, token_checksum bigint"
)
_STATE_SCHEMA = "n_seqs bigint, total_tokens bigint, token_checksum bigint"
_CHECKSUM_MOD = 1 << 40


class RunningDocStats(StatefulProcessor):
    """ValueState accumulator: per doc_id, fold (count, Σ n_tok,
    Σ token_sum mod 2^40) across micro-batches; emits the RUNNING totals
    once per batch in which the key received rows."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("doc_stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, tok, ck = 0, 0, 0
        if self._state.exists():
            n, tok, ck = self._state.get()
        for pdf in rows:
            if pdf.empty:
                continue
            n += len(pdf)
            tok += int(pdf["n_tok"].astype("int64").sum())
            ck = (ck + int(pdf["token_sum"].astype("int64").sum())) % _CHECKSUM_MOD
        self._state.update((n, tok, ck))
        yield pd.DataFrame(
            {
                "doc_id": [key[0]],
                "n_seqs": [n],
                "total_tokens": [tok],
                "token_checksum": [ck],
            }
        )

    def close(self) -> None:
        pass


def _with_token_sum(df: DataFrame) -> DataFrame:
    token_sum = F.aggregate(
        F.col("tokens"), F.lit(0).cast("long"), lambda acc, t: acc + t.cast("long")
    )
    return df.select(
        "doc_id", "n_tok", F.pmod(token_sum, F.lit(_CHECKSUM_MOD)).alias("token_sum")
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    protocol (pyspark/sql/streaming/proto/StateMessage_pb2.py); this
    sandbox image lacks it, so the engine auto-falls-back to
    applyInPandasWithState (same semantics, prior-generation API)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_doc_stats_stream(stream: DataFrame, api: str = "auto") -> DataFrame:
    """Streaming: emits the running totals per key per batch (take the
    final emission per key for end-of-stream totals). ``api``: 'tws'
    (transformWithStateInPandas), 'apws' (applyInPandasWithState), or
    'auto' (tws when its protobuf dependency is importable)."""
    if api == "auto":
        api = "tws" if tws_available() else "apws"
    src = _with_token_sum(stream)
    if api == "tws":
        return src.groupBy("doc_id").transformWithStateInPandas(
            statefulProcessor=RunningDocStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )

    import pandas as pd  # noqa: F811 (worker-side import)

    def kernel(key, pdf_iter, state):
        n, tok, ck = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            n += len(pdf)
            tok += int(pdf["n_tok"].astype("int64").sum())
            ck = (ck + int(pdf["token_sum"].astype("int64").sum())) % _CHECKSUM_MOD
        state.update((int(n), int(tok), int(ck)))
        yield pd.DataFrame(
            {
                "doc_id": [key[0]],
                "n_seqs": [n],
                "total_tokens": [tok],
                "token_checksum": [ck],
            }
        )

    return src.groupBy("doc_id").applyInPandasWithState(
        kernel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def running_doc_stats_batch(df: DataFrame) -> DataFrame:
    """Batch twin: one-shot groupBy fold — the differential golden."""
    return (
        _with_token_sum(df)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.pmod(F.sum("token_sum"), F.lit(_CHECKSUM_MOD)).alias("token_checksum"),
        )
    )
