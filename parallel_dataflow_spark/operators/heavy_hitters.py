"""Frequency heavy hitters with bounded memory: Misra-Gries candidates +
exact recount.

The scale problem: "every n-gram with corpus share >= theta" over 10^12
documents. A single ``groupBy(ngram).count()`` is correct but shuffles the
ENTIRE long tail — at web scale the distinct-key space (5-gram space is
vocab^5) dwarfs both memory and the useful output, and almost all of that
shuffle is wasted on keys that can never pass the threshold.

Two-phase plan that never shuffles the tail:

1. **Candidates (map-side, bounded memory).** Per input partition, a
   batched Misra-Gries summary with K counters (pandas ``value_counts`` per
   Arrow batch — the per-key work stays in vectorized C, the Python loop is
   per-batch). MG guarantees any key whose *partition* count exceeds
   n_p/(K+1) survives the summary; a key with global share >= theta has
   partition share >= theta in at least one partition (pigeonhole), so with
   K >= ceil(1/theta) the union of partition summaries is a SUPERSET of the
   true heavy hitters. No false negatives, <= K keys emitted per partition.
2. **Exact recount (candidates only).** Broadcast the deduped candidate
   set, inner-join it against the exploded keys, and run the exact count +
   threshold filter on that tiny slice. The final output is therefore
   EXACT and independent of partitioning — which is what makes a plain SQL
   oracle possible for a partition-aware algorithm.

This mirrors the engine's LSH-family design (approximate candidate
generation, exact verification on candidates) applied to frequency instead
of similarity. Reference analogue: the worklist's change-propagation
pruning (only *changed* blocks re-evaluated, impls/src/parallel.rs:48-56) —
spend full effort only where the cheap signal says it can matter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_capacity(theta: float, slack: float = 1.2) -> int:
    """Counters needed for no-false-negatives at share threshold theta
    (K >= ceil(1/theta)); slack>1 also tightens the undercount bound."""
    import math

    return max(8, int(math.ceil(slack / theta)))


def mg_candidates(items: DataFrame, col: str, theta: float) -> DataFrame:
    """Per-partition batched Misra-Gries over an ARRAY column ``col``;
    returns the deduped union of partition summaries as one string column
    ``key`` — a guaranteed superset of all keys with global share >= theta.

    Batched MG decrement: after merging a batch's value_counts, if the
    summary exceeds K keys, subtract the (K+1)-th largest residual from all
    and drop the non-positive ones. Each decrement round subtracts its d
    from >= K+1 keys and total subtracted mass is bounded by the items seen,
    so any key's cumulative undercount is <= n_p/(K+1) — the classic MG
    bound, preserved under batching.
    """
    k = _mg_capacity(theta)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = mg_fold((pdf[col] for pdf in batches), k)
        yield pd.DataFrame({"key": [] if acc is None else acc.index.astype(str)})

    return items.select(col).mapInPandas(part, schema="key string").distinct()


def mg_fold(array_series_iter, k: int) -> pd.Series | None:
    """The batched Misra-Gries fold over an iterator of pandas Series of
    key-arrays; returns the residual-count summary (<= k keys) or None for
    empty input. Pure pandas — property-tested directly in
    tests/test_heavy_hitters.py without a Spark round-trip per example."""
    acc = None  # pd.Series: key -> residual count
    for s in array_series_iter:
        if not len(s):
            continue
        vc = s.explode().dropna().value_counts()
        if not len(vc):
            continue
        acc = vc if acc is None else acc.add(vc, fill_value=0)
        if len(acc) > k:
            # (K+1)-th largest residual; subtracting it keeps <= K keys
            d = acc.nlargest(k + 1).iloc[-1]
            acc = acc - d
            acc = acc[acc > 0]
    return acc


def heavy_hitters_exact(
    items: DataFrame, col: str, theta: float, key_alias: str = "key"
) -> DataFrame:
    """All keys with global share >= theta, with exact counts and shares.

    ``items[col]`` is an array<string> column (one array per row). Output:
    (key_alias, cnt bigint, share double rounded to 6). Exact: the MG
    stage only prunes keys that provably cannot pass the threshold.

    materialize-once (r6): ``items`` feeds THREE consumers (MG summary,
    total-count agg, recount explode). Without the persist each consumer
    re-derives the key arrays — and the recount's Generate additionally
    inlines the array-building expression through its child projections
    (the optimizer substitutes generator inputs regardless of reference
    counts, re-running the underlying split per element — measured 10+
    copies of the split chain in the plan and 60-140 s at sf1.0 vs ~3 s
    cached). At 100 TB this intermediate is a written table, per the
    LSH-signature convention in operators/dedup.py.
    """
    items = items.persist()
    cand = mg_candidates(items, col, theta)
    total = items.agg(
        F.sum(F.coalesce(F.size(F.col(col)), F.lit(0))).cast("long").alias("total")
    )
    exploded = items.select(F.explode(col).alias("key"))
    counts = (
        exploded.join(F.broadcast(cand), "key")  # tail dies here, map-side
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(theta) * F.col("total"))
        .select(
            F.col("key").alias(key_alias),
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        )
    )
