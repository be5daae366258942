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
