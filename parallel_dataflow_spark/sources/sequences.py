"""Deterministic generator for the north-rule token-sequence table.

Shape (authoritative, BASELINE.json input_hint):
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string
plus ``event_ts:timestamp`` so the table can drive event-time streaming
(watermarks / windows / late data).

Properties engineered in (FIXTURES.md B1):
- seeded numpy PCG64 — bit-identical across runs, machines, parallelism;
- zipf-ish token-length distribution, vocab [0, 50257);
- a hot-key subset (~1% of doc_ids carry ~30% of rows) to exercise
  skew salting;
- event_ts monotone per file with bounded disorder (±2 min) to exercise
  watermark/late-data semantics;
- written as MANY small parquet files so a file-based stream with
  maxFilesPerTrigger yields bounded micro-batches (channel backpressure,
  mirroring the reference's bounded worklist rounds,
  impls/src/parallel.rs:29-73).

In production this is an Iceberg table of 10^12 sequences; the generator is
the sandbox stand-in (no external data allowed).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB = 50257
SOURCES = ("web", "books", "code", "wiki")

SEQUENCE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)

BASE_TS = np.datetime64("2026-01-01T00:00:00")


def generate_sequences_pandas(
    n_rows: int,
    seed: int = 42,
    n_docs: int | None = None,
    max_len: int = 512,
    hot_fraction: float = 0.01,
    hot_mass: float = 0.30,
    rows_per_sec: int = 50,
) -> pd.DataFrame:
    """Generate ``n_rows`` sequence rows deterministically.

    ``hot_fraction`` of doc_ids receive ``hot_mass`` of the rows (skew).
    Event time advances ``rows_per_sec`` rows per second of event time
    with +/-120s jitter (bounded disorder) — a dense stream, so windowed
    state stays bounded (keys ~ docs-per-window, not ~rows) and watermark
    eviction keeps up, as with a real firehose.
    """
    arrays = generate_sequences_arrays(
        n_rows,
        seed=seed,
        n_docs=n_docs,
        max_len=max_len,
        hot_fraction=hot_fraction,
        hot_mass=hot_mass,
        rows_per_sec=rows_per_sec,
    )
    flat, row_off = arrays["flat"], arrays["row_off"]
    tokens = [flat[row_off[i] : row_off[i + 1]] for i in range(n_rows)]
    return pd.DataFrame(
        {
            "doc_id": arrays["doc_id"],
            "tokens": tokens,
            "n_tok": arrays["lens"],
            "source": arrays["source"],
            "event_ts": arrays["event_ts"],
        }
    )


def generate_sequences_arrays(
    n_rows: int,
    seed: int = 42,
    n_docs: int | None = None,
    max_len: int = 512,
    hot_fraction: float = 0.01,
    hot_mass: float = 0.30,
    rows_per_sec: int = 50,
) -> dict:
    """Columnar form of the generator: flat token buffer + row offsets
    (what the parquet writer needs — no per-row objects)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    n_docs = n_docs or max(10, n_rows // 40)
    n_hot = max(1, int(n_docs * hot_fraction))

    hot_rows = int(n_rows * hot_mass)
    cold_rows = n_rows - hot_rows
    doc_idx = np.concatenate(
        [
            rng.integers(0, n_hot, size=hot_rows),
            rng.integers(n_hot, n_docs, size=cold_rows),
        ]
    )
    rng.shuffle(doc_idx)
    doc_strs = np.asarray([f"doc-{i:08d}" for i in range(n_docs)])
    doc_ids = doc_strs[doc_idx]

    # zipf-ish lengths in [1, max_len]
    lens = np.minimum(rng.zipf(1.3, size=n_rows), max_len).astype(np.int32)
    lens = np.maximum(lens, 1)
    flat = rng.integers(0, VOCAB, size=int(lens.sum()), dtype=np.int32)
    row_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=row_off[1:])

    jitter = rng.integers(-120, 121, size=n_rows)
    ts = BASE_TS + (np.arange(n_rows) // rows_per_sec + jitter).astype("timedelta64[s]")

    src = np.asarray(SOURCES)[rng.integers(0, len(SOURCES), size=n_rows)]

    return {
        "doc_id": doc_ids,
        "lens": lens,
        "flat": flat,
        "row_off": row_off,
        "source": src,
        "event_ts": ts.astype("datetime64[us]"),
    }


def write_sequence_table(
    spark: SparkSession | None,
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_files: int = 16,
    **gen_kwargs,
) -> str:
    """Write the sequence table as ``n_files`` parquet files (one per chunk,
    contiguous time ranges) so a file stream replays it in event-time order
    with bounded disorder. Deterministic for a given (n_rows, seed).

    Writes through pyarrow directly (ListArray built from the flat token
    buffer — no per-row object conversion; ~50x faster than driver-side
    createDataFrame for big tables). ``spark`` is accepted for API
    stability but unused."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    arrays = generate_sequences_arrays(n_rows, seed=seed, **gen_kwargs)
    lens, flat, row_off = arrays["lens"], arrays["flat"], arrays["row_off"]

    ts_utc = pd.DatetimeIndex(arrays["event_ts"]).tz_localize("UTC")
    chunk = (n_rows + n_files - 1) // n_files
    for i in range(n_files):
        lo, hi = i * chunk, min((i + 1) * chunk, n_rows)
        if lo >= hi:
            continue
        offsets = (row_off[lo : hi + 1] - row_off[lo]).astype(np.int64)
        tok_arr = pa.LargeListArray.from_arrays(
            pa.array(offsets),
            pa.array(flat[row_off[lo] : row_off[hi]], type=pa.int32()),
        ).cast(pa.list_(pa.int32()))
        table = pa.table(
            {
                "doc_id": pa.array(arrays["doc_id"][lo:hi]),
                "tokens": tok_arr,
                "n_tok": pa.array(lens[lo:hi].astype(np.int32)),
                "source": pa.array(arrays["source"][lo:hi]),
                "event_ts": pa.array(ts_utc[lo:hi], type=pa.timestamp("us", tz="UTC")),
            }
        )
        cdir = os.path.join(out_dir, f"chunk={i:04d}")
        os.makedirs(cdir, exist_ok=True)
        pq.write_table(table, os.path.join(cdir, "part-0.parquet"))
    return out_dir


def read_sequence_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SEQUENCE_SCHEMA).option("recursiveFileLookup", "true").parquet(path)


def read_sequence_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """Bounded-micro-batch file stream over the sequence table.

    ``maxFilesPerTrigger`` is the backpressure knob: it bounds the rows in
    flight per micro-batch, the Structured-Streaming analogue of the
    reference's bounded per-round worklist batches (impls/src/parallel.rs:32-58).
    """
    return (
        spark.readStream.schema(SEQUENCE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
