"""Deterministic corpus mixture resampling — rebalance per-source token
share toward a target distribution (the data-mixing step of LLM corpus
construction; cf. DoReMi, Xie et al. 2023, and the hand-tuned mixture
weights of public corpus reports — both public).

Given observed per-source token totals T_s and target shares f_s, the
largest total achievable WITHOUT upsampling any source is
cap = min_s(T_s / f_s); each source then keeps f_s * cap tokens, i.e. a
Bernoulli acceptance rate r_s = f_s * cap / T_s (= 1 for the binding
source). Acceptance is the house seedless content hash — keep iff
md5_60(doc_id) mod 1e6 < floor(round(r_s, 9) * 1e6) — so the decision is
replayable cross-engine and independent of partitioning/cluster size
(unlike df.sample).

Scale shape: pass 1 is a map-side-combined (source, Σ n_tok) aggregate —
the shuffle carries one row per source; rates are a source-count-sized
table broadcast back; pass 2 re-scans with the scan-side hash decision
and aggregates the kept counts (again one row per source). Nothing
doc-sized ever shuffles, both aggregates are K-row, and the two scans
read only (doc_id, source, text-length) columns.

Determinism contract (mirrored by the DuckDB oracle in plans/registry):
T_s exact int64; r_s = round(f_s * cap / T_s, 9) in IEEE double (both
engines compute the identical expression tree); threshold =
floor(r_s * 1e6) compared against the 60-bit md5 hash mod 1e6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parallel_dataflow_spark.functions.text import md5_60bit

_U_MOD = 1_000_000


def resample_to_mix(
    documents: DataFrame,
    target: dict[str, float] | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Resample documents so per-source token shares approach ``target``
    (source -> share; None = uniform across the sources present). Never
    upsamples: the binding source keeps rate 1.0 and every other source
    is thinned to match. Returns the per-source audit table
    (source, tokens_total, rate, docs_kept, tokens_kept, achieved_share)
    — the kept doc_ids are a deterministic function of the same rate
    table, recoverable by re-applying the hash predicate."""
    n_tok = F.size(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        )
    ).cast("long")
    u = F.pmod(md5_60bit(F.col(id_col).cast("string")), F.lit(_U_MOD))
    d = documents.select(
        F.col(source_col).alias("source"),
        n_tok.alias("n_tok"),
        u.alias("u"),
    )
    totals = d.groupBy("source").agg(F.sum("n_tok").alias("tokens_total"))
    if target is None:
        k = F.count("*").over(
            Window.partitionBy()
        )
        share = (F.lit(1.0) / k.cast("double")).alias("share")
        shares = totals.select("source", "tokens_total", share)
    else:
        # explicit targets must cover every observed source with a
        # positive share — a missing source would otherwise get a NULL
        # share, be silently excluded from the cap min, and have ALL its
        # documents dropped by `u < thresh` with no error
        if any(s <= 0 for s in target.values()):
            raise ValueError(
                f"target shares must be > 0, got {target!r}"
            )
        observed = {r["source"] for r in totals.select("source").collect()}
        missing = observed - set(target)
        if missing:
            raise ValueError(
                "target is missing shares for observed sources "
                f"{sorted(missing)} — every source present in the data "
                "must be listed (use an explicit small share to thin a "
                "source, not omission)"
            )
        m = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        shares = totals.select(
            "source", "tokens_total", m[F.col("source")].cast("double").alias("share")
        )
    cap = F.min(F.col("tokens_total").cast("double") / F.col("share"))
    shares = shares.withColumn("cap", cap.over(
        Window.partitionBy()
    ))
    rates = shares.select(
        "source",
        "tokens_total",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("share") * F.col("cap") / F.col("tokens_total").cast("double"),
            ),
            9,
        ).alias("rate"),
    )
    thresh = F.floor(F.col("rate") * _U_MOD).cast("long")
    kept = (
        d.join(F.broadcast(rates), "source")
        .filter(F.col("u") < thresh)
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_kept"),
            F.sum("n_tok").alias("tokens_kept"),
        )
    )
    out = rates.join(kept, "source", "left").select(
        "source",
        "tokens_total",
        "rate",
        F.coalesce("docs_kept", F.lit(0)).cast("long").alias("docs_kept"),
        F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
    )
    total_kept = F.sum("tokens_kept").over(
        Window.partitionBy()
    )
    return out.withColumn(
        "achieved_share",
        F.round(F.col("tokens_kept").cast("double") / total_kept, 6),
    )
