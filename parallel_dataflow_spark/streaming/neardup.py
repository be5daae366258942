"""Streaming MinHash-LSH near-duplicate detection.

The batch dedup family (operators/dedup.py) answers "which PAIRS are
near-dups" over a static corpus; an ingestion stream needs the online
question: "is THIS sequence a near-dup of anything admitted before it?"
This module answers it with bounded keyed state:

  map-side (stateless, before any shuffle):
      token 3-gram shingle hashes (JVM) → minhash signature (Arrow UDF)
      → banded bucket keys — the token payload never reaches the state
      store, only the 8-byte shingle-hash set rides the exchange;
  stateful (applyInPandasWithState keyed by (band, bhash)):
      each bucket remembers its OWNER — the first sequence to touch it —
      and its shingle-hash set; every later arrival is verified with
      exact Jaccard against the owner and emits a per-bucket verdict;
  fold (batch-local):
      a sequence's band rows all travel in its own micro-batch, so the
      per-doc verdict (is_dup = best bucket Jaccard ≥ t) is a plain
      groupBy inside foreachBatch — no second stateful operator.

Semantics: arrival-order flagging. A sequence is a duplicate iff some
bucket it hashes into is owned by an earlier arrival with verified
Jaccard ≥ threshold. Owners are never replaced (first-wins, like
dropDuplicatesWithinWatermark), and a flagged duplicate still claims
any EMPTY buckets it touches — later matches against it are transitive
duplicates, which the batch connected-components stage collapses the
same way (operators/graph.py).

Bounded state: one (owner doc_id, owner ck, shingle set) per TOUCHED
bucket, evicted by event-time timeout ``rep_ttl`` past the watermark —
the same within-horizon guarantee as dropDuplicatesWithinWatermark: a
near-dup arriving later than rep_ttl after its bucket's owner is
re-admitted. At 10^12 sequences state is (buckets touched within the
horizon) × ~1 KB, spilled via the RocksDB provider.

Recall is the banding recall of the batch operator (P(candidate) =
1-(1-t^r)^b ≈ 0.9998 at t=0.7, b=32, r=4) — verified-exact on
candidates, so false POSITIVES are impossible, misses bounded by the
banding probability.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parallel_dataflow_spark.functions.tokens import minhash_signature_udf

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("ck", T.LongType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("owner", T.StringType()),
        T.StructField("owner_ck", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("owner", T.StringType()),
        T.StructField("owner_ck", T.LongType()),
        T.StructField("shash", T.ArrayType(T.LongType())),
    ]
)


def token_shingle_hashes(tokens_col, n: int = 3):
    """xxhash64 of token n-grams, distinct, JVM-side. Sequences shorter
    than ``n`` tokens produce an empty set (they can never match)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(tokens_col) - (n - 1), F.lit(1)))
    gram = F.transform(
        idx,
        lambda i: F.xxhash64(
            F.concat_ws(
                ",",
                *[
                    F.element_at(tokens_col, (i + j).cast("int")).cast("string")
                    for j in range(n)
                ],
            )
        ),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<bigint>")
    )


def neardup_prestage(
    stream: DataFrame,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map-side stage: (doc_id, event_ts, ck, n_tok, shash, band, bhash)
    — one row per (sequence, band). Everything here is stateless and runs
    before the keyed exchange; the token arrays die in this projection.
    ``extra_cols`` pass through untouched (tests thread the source file
    name for the batch-order golden)."""
    rows_per_band = num_hashes // bands
    d = stream.select(
        "doc_id",
        "event_ts",
        "n_tok",
        *extra_cols,
        F.xxhash64(F.concat_ws(",", F.col("tokens").cast("array<string>"))).alias("ck"),
        token_shingle_hashes(F.col("tokens"), shingle_n).alias("shash"),
    ).withColumn("sig", minhash_signature_udf(num_hashes)(F.col("shash")))
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return (
        d.select(
            "doc_id",
            "event_ts",
            "ck",
            "n_tok",
            *extra_cols,
            "shash",
            F.explode(
                F.transform(
                    band_idx,
                    lambda bi: F.struct(
                        bi.cast("int").alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.slice(
                                    F.col("sig"), bi * rows_per_band + 1, rows_per_band
                                ).cast("array<string>"),
                            )
                        ).alias("bhash"),
                    ),
                )
            ).alias("bk"),
        )
        .select(
            "doc_id",
            "event_ts",
            "ck",
            "n_tok",
            *extra_cols,
            "shash",
            F.col("bk.band").alias("band"),
            F.col("bk.bhash").alias("bhash"),
        )
        .drop("sig")
    )


def _jaccard(a: list, b: list) -> float:
    sa, sb = set(a), set(b)
    u = len(sa | sb)
    return (len(sa & sb) / u) if u else 0.0


def neardup_verdicts_stream(
    stream: DataFrame,
    watermark: str = "10 minutes",
    rep_ttl_ms: int = 3_600_000,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-(sequence, band) verdict stream: Jaccard vs the bucket owner
    (NULL owner = this sequence claimed the bucket). Deterministic given
    batch boundaries: within a bucket and batch, rows are processed in
    (event_ts, doc_id, ck) order; across batches, state is sequential."""
    pre = neardup_prestage(stream, num_hashes, bands, shingle_n)
    # sequences too short to shingle can never match anything — verdict
    # them STATELESSLY (band -1). Without this split every short row in
    # the stream funnels into the SAME 32 bucket keys (the empty shingle
    # set has one constant minhash signature): a permanent hot key in the
    # state store processing pure can-never-match traffic.
    long_rows = pre.filter(F.size("shash") > 0)
    short_verdicts = (
        pre.filter((F.size("shash") == 0) & (F.col("band") == 0))
        .select(
            "doc_id",
            "event_ts",
            "ck",
            "n_tok",
            F.lit(-1).cast("int").alias("band"),
            F.lit(None).cast("string").alias("owner"),
            F.lit(None).cast("long").alias("owner_ck"),
            F.lit(0.0).alias("jaccard"),
        )
    )

    def kernel(key, pdf_iter, state):
        band, bhash = int(key[0]), int(key[1])
        rows = [
            pdf[["doc_id", "event_ts", "ck", "n_tok", "shash"]]
            for pdf in pdf_iter
            if not pdf.empty
        ]
        if not rows:
            if state.hasTimedOut:
                state.remove()
            return
        batch = pd.concat(rows).sort_values(
            ["event_ts", "doc_id", "ck"], kind="mergesort"
        )
        if state.exists:
            owner, owner_ck, owner_sh = state.get
            owner_sh = list(owner_sh)
        else:
            owner, owner_ck, owner_sh = None, None, None
        out = []
        max_ts = None
        # column-wise zip instead of iterrows: same verdicts, no per-row
        # pandas Series materialization on the hot path (round-4 verdict
        # nit — iterrows is ~10x slower than iterating numpy views)
        for doc_id, event_ts, ck, n_tok, shash in zip(
            batch["doc_id"].to_numpy(),
            batch["event_ts"].to_numpy(),
            batch["ck"].to_numpy(),
            batch["n_tok"].to_numpy(),
            batch["shash"].to_numpy(),
        ):
            # pure-Python ints: the state row is pickled to the JVM, which
            # rejects numpy scalars
            sh = [int(x) for x in shash]
            if owner is None:
                owner, owner_ck, owner_sh = str(doc_id), int(ck), sh
                out.append((doc_id, event_ts, int(ck), int(n_tok), band, None, None, 0.0))
            elif owner == str(doc_id) and owner_ck == int(ck):
                # byte-identical REPLAY of the owner itself (at-least-once
                # upstream): re-emit the claim verdict — without this the
                # replay matches its own bucket at Jaccard 1.0 and the
                # keyed sink upsert flips the original's is_dup=false row
                # to "dup of itself"
                out.append((doc_id, event_ts, int(ck), int(n_tok), band, None, None, 0.0))
            else:
                jac = _jaccard(sh, owner_sh)
                out.append(
                    (doc_id, event_ts, int(ck), int(n_tok), band, owner, owner_ck, round(jac, 6))
                )
            max_ts = event_ts if max_ts is None or event_ts > max_ts else max_ts
        state.update((owner, owner_ck, owner_sh))
        # representative lives rep_ttl past the newest event seen in this
        # bucket; eviction re-opens the bucket (documented recall bound)
        ts_ms = int(pd.Timestamp(max_ts).value // 1_000_000)
        state.setTimeoutTimestamp(ts_ms + rep_ttl_ms)
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "event_ts", "ck", "n_tok", "band", "owner", "owner_ck", "jaccard",
            ],
        )

    stateful = (
        long_rows.withWatermark("event_ts", watermark)
        .groupBy("band", "bhash")
        .applyInPandasWithState(
            kernel,
            outputStructType=VERDICT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
    return stateful.unionByName(short_verdicts)


def fold_verdicts(verdicts: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Per-sequence verdict from per-bucket verdicts (batch-local: a
    sequence's band rows share its micro-batch). dup_of = owner of the
    best-Jaccard bucket (ties: max owner id — deterministic)."""
    best = F.max(F.struct(F.col("jaccard"), F.col("owner"), F.col("owner_ck")))
    return (
        verdicts.groupBy("doc_id", "event_ts", "ck", "n_tok")
        .agg(best.alias("best"))
        .select(
            "doc_id",
            "event_ts",
            "ck",
            "n_tok",
            (F.col("best.jaccard") >= threshold).alias("is_dup"),
            F.when(F.col("best.jaccard") >= threshold, F.col("best.owner")).alias(
                "dup_of"
            ),
            F.round(F.col("best.jaccard"), 6).alias("best_jaccard"),
        )
    )
