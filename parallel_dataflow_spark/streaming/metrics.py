"""Lineage + throughput/latency metrics (SURVEY.md §2.1 #23; reference:
PassTiming in utils/src/dataflow_executor.rs:10-13).

A StreamingQueryListener that appends one JSON line per micro-batch to a
JSONL file: batch id, input rows, rows/sec, batch duration breakdown, state
operator rows, watermark, and per-source offsets (the lineage: which files/
offsets produced which epoch — exactly the provenance needed to replay a
batch)."""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _write(self, rec: dict) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def onQueryStarted(self, event):
        self._write({"kind": "start", "id": str(event.id), "name": event.name, "ts": time.time()})

    def onQueryProgress(self, event):
        p = event.progress
        self._write(
            {
                "kind": "progress",
                "id": str(p.id),
                "name": p.name,
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "eventTime": dict(p.eventTime) if p.eventTime else {},
                "stateOperators": [
                    {
                        "operatorName": getattr(s, "operatorName", ""),
                        "numRowsTotal": s.numRowsTotal,
                        "numRowsUpdated": s.numRowsUpdated,
                    }
                    for s in (p.stateOperators or [])
                ],
                # lineage: per-source start/end offsets of this micro-batch
                "sources": [
                    {
                        "description": s.description,
                        "startOffset": s.startOffset,
                        "endOffset": s.endOffset,
                        "numInputRows": s.numInputRows,
                    }
                    for s in (p.sources or [])
                ],
            }
        )

    def onQueryTerminated(self, event):
        self._write({"kind": "terminated", "id": str(event.id), "ts": time.time()})

    def onQueryIdle(self, event):
        pass


def read_metrics(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
