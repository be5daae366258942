"""Greedy sequence packing: fill fixed-capacity token bins per group.

The training-data op: concatenating short sequences into full context
windows ("packing") raises accelerator utilization; the packing decision
is a deterministic greedy fold over a defined order (here: doc_id within
source). Like the CEP NFA and the reference's FIFO worklist
(impls/src/sequential.rs:26-48), the fold is *inherently sequential per
group* — bin boundaries depend on every prior length — so it runs as a
per-group kernel (``applyInPandas``; numpy scalars inside one Arrow
batch), parallel ACROSS groups. At 100 TB the group key is whatever the
packing domain is (shard, source, curriculum bucket); groups pack
independently, so the stage scales with the number of groups and nothing
shuffles except (group, doc_id, n_tok) triples — token arrays stay where
they are and are only concatenated by a later map-side gather.

Greedy rule (must match the DuckDB recursive-CTE oracle exactly): visit
docs in ascending doc_id; if the current bin's fill + n_tok <= capacity,
append; else open a new bin starting at n_tok (a doc longer than the
capacity gets a bin of its own, overfilled — the caller gates lengths
upstream, cf. run_pipeline_job's [min_tok, max_tok] admission gate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def pack_greedy(df: DataFrame, capacity: int, group_col: str = "source") -> DataFrame:
    """(group, doc_id, n_tok) -> (group, doc_id, n_tok, bin_id, bin_fill).

    ``bin_fill`` is the bin's fill AFTER this doc (the oracle's running
    state) — exposing it makes the differential check strict: two
    implementations can agree on bin_id yet disagree on the fold.
    """

    def part(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n = pdf["n_tok"].to_numpy(dtype=np.int64)
        bin_id = np.empty(len(n), dtype=np.int64)
        fill = np.empty(len(n), dtype=np.int64)
        b, f = 0, 0
        for i, t in enumerate(n):
            if i > 0 and f + t > capacity:
                b += 1
                f = 0
            f += int(t)
            bin_id[i] = b
            fill[i] = f
        pdf["bin_id"] = bin_id
        pdf["bin_fill"] = fill
        return pdf

    return df.select(group_col, "doc_id", "n_tok").groupBy(group_col).applyInPandas(
        part, schema=f"{group_col} string, doc_id long, n_tok long, "
                     "bin_id long, bin_fill long"
    )


def chunk_fixed_blocks(
    df: DataFrame, block: int, group_col: str = "source"
) -> DataFrame:
    """GPT-style fixed-length block chunking: concatenate documents in
    ascending doc_id order per group and cut the token stream into
    ``block``-token chunks, documents straddling block boundaries.

    Where pack_greedy is an inherently sequential fold (bin boundaries
    depend on every prior decision), chunking is CLOSED-FORM from the
    token prefix sum: doc i occupies stream range [off_i, off_i + n_i),
    so it intersects exactly blocks floor(off/L) .. floor((off+n-1)/L).
    That closed form is what keeps the operator pure-DataFrame — one
    running-sum window for the offsets, one bounded explode over the
    spanned block ids (each doc spans at most n/L + 1 blocks), one
    (group, block) aggregation. Token ARRAYS never move: the shuffle
    carries (group, doc_id, n_tok, offset) quadruples, and the actual
    gather of token slices is a later map-side operation against the
    plan this table defines — the same raw-text-stays-put discipline as
    the dedup/packing operators.

    Output per (group, block_id): n_slices (documents contributing),
    n_tokens (= block except for the final partial block), first_doc /
    last_doc, and boundary_doc — whether the block starts mid-document
    (an attention-mask-relevant fact for training).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = df.select(group_col, "doc_id", "n_tok").withColumn(
        "off", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    )
    spans = offs.select(
        group_col,
        "doc_id",
        "n_tok",
        "off",
        F.explode(
            F.sequence(
                (F.col("off") / block).cast("long"),
                ((F.col("off") + F.col("n_tok") - 1) / block).cast("long"),
            )
        ).alias("block_id"),
    ).select(
        group_col,
        "block_id",
        "doc_id",
        F.greatest(F.lit(0), F.col("block_id") * block - F.col("off")).alias("s"),
        (
            F.least(
                F.col("n_tok"), (F.col("block_id") + 1) * block - F.col("off")
            )
        ).alias("e"),
        (F.col("off") < F.col("block_id") * block).alias("straddles_in"),
    )
    return spans.groupBy(group_col, "block_id").agg(
        F.count("*").cast("long").alias("n_slices"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.max(F.col("straddles_in").cast("int")).cast("boolean").alias("boundary_doc"),
    )
