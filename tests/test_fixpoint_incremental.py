"""Incremental BSP re-solve (run_bsp with prev_state + dirty): after a
program edit, resetting exactly the dirty-reachable region (in the
analysis' effective direction) and re-running from the previous solution
must reproduce the from-scratch fixpoint byte-for-byte — forward-union
(RD), backward-union (LV), and forward-intersection (AE) all pinned,
plus fact RETRACTION (a deleted definition must disappear downstream,
the case a naive warm-start from the old solution gets wrong)."""

import pytest
from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.fixpoint import SPECS, run_bsp
from parallel_dataflow_spark.sources.cfg_fixtures import (
    BLOCKS_SCHEMA,
    fixture_dataframes,
    fixture_program,
)


def canon(df):
    return sorted(tuple(r) for r in df.select(
        "func_id", "block_id", "in_val", "out_val").collect())


def _pick_block(bl):
    """A deterministic mid-function block that HAS instructions: the
    first (func_id, block_id) in sorted order with a non-empty instr
    list and block_id > 0 (not the entry). ``bl`` is the fixture's
    pandas frame."""
    rows = bl.sort_values(["func_id", "block_id"]).to_dict("records")
    for row in rows:
        if row["block_id"] > 0 and row["instrs"]:
            return row["func_id"], int(row["block_id"])
    raise AssertionError("no mutable block in fixture")


def _mutate(spark, seed, func_id, block_id):
    """Fixture program with one block's instruction list emptied
    (definition deletion — the retraction case)."""
    bl, _ = fixture_program(seed)
    bl = bl.copy()
    mask = (bl["func_id"] == func_id) & (bl["block_id"] == block_id)
    assert mask.sum() == 1
    bl.loc[mask, "instrs"] = bl.loc[mask, "instrs"].map(lambda _: [])
    return spark.createDataFrame(bl.to_dict("records"), schema=BLOCKS_SCHEMA)


@pytest.mark.parametrize("pass_name", ["reaching_defs", "live_vars", "available_exprs"])
def test_incremental_matches_scratch_after_deletion(spark, pass_name):
    spec = SPECS[pass_name]
    blocks, edges = fixture_dataframes(spark, seed=42)
    full_old = run_bsp(blocks, edges, spec)

    # delete every instruction of one deterministic mid-function block
    bl, _ = fixture_program(42)
    fid, bid = _pick_block(bl)
    mut_blocks = _mutate(spark, 42, fid, bid)

    dirty = spark.createDataFrame([(fid, bid)], "func_id string, block_id int")
    inc = run_bsp(mut_blocks, edges, spec, prev_state=full_old, dirty=dirty)
    scratch = run_bsp(mut_blocks, edges, spec)
    assert canon(inc) == canon(scratch)


def test_incremental_noop_edit_returns_previous_solution(spark):
    spec = SPECS["reaching_defs"]
    blocks, edges = fixture_dataframes(spark, seed=43)
    full_old = run_bsp(blocks, edges, spec)
    bl, _ = fixture_program(43)
    fid, bid = _pick_block(bl)
    dirty = spark.createDataFrame([(fid, bid)], "func_id string, block_id int")
    inc = run_bsp(blocks, edges, spec, prev_state=full_old, dirty=dirty)
    assert canon(inc) == canon(full_old)


def test_incremental_retracts_deleted_definition(spark):
    """The fact-retraction property: emptying a defining block must
    actually CHANGE downstream facts (the edit is not a no-op), and the
    incremental result must equal from-scratch — a naive warm-start
    without the region reset keeps the deleted definitions alive under
    a union meet and would differ from scratch here."""
    spec = SPECS["reaching_defs"]
    blocks, edges = fixture_dataframes(spark, seed=42)
    full_old = run_bsp(blocks, edges, spec)
    bl, _ = fixture_program(42)
    fid, bid = _pick_block(bl)
    mut_blocks = _mutate(spark, 42, fid, bid)
    dirty = spark.createDataFrame([(fid, bid)], "func_id string, block_id int")
    inc = run_bsp(mut_blocks, edges, spec, prev_state=full_old, dirty=dirty)
    scratch = run_bsp(mut_blocks, edges, spec)
    assert canon(inc) == canon(scratch)
    assert canon(inc) != canon(full_old)  # the deletion really retracted facts


def test_incremental_after_edge_removal(spark):
    """CFG EDGE edits reuse the same mechanism with no new code: when an
    edge (a -> b) is removed, b's meet inputs changed, so b is the dirty
    seed (in the effective direction of the pass) and the dirty-reachable
    region reset converges to the from-scratch fixpoint of the edited
    graph."""
    from parallel_dataflow_spark.sources.cfg_fixtures import EDGES_SCHEMA

    spec = SPECS["reaching_defs"]
    blocks, edges = fixture_dataframes(spark, seed=42)
    full_old = run_bsp(blocks, edges, spec)

    # remove one deterministic edge with alternatives (keep the graph
    # connected enough that the pass still converges): the first edge of
    # the first func whose dst has >= 2 incoming edges
    ed = sorted(
        ((r["func_id"], r["src"], r["dst"]) for r in edges.collect())
    )
    indeg: dict = {}
    for f, s, d in ed:
        indeg[(f, d)] = indeg.get((f, d), 0) + 1
    fid, src, dst = next(
        (f, s, d) for f, s, d in ed if indeg[(f, d)] >= 2
    )
    kept = [(f, s, d) for f, s, d in ed if (f, s, d) != (fid, src, dst)]
    edges2 = spark.createDataFrame(kept, schema=EDGES_SCHEMA)

    # forward pass: the removed edge changes dst's meet -> dirty = dst
    dirty = spark.createDataFrame([(fid, dst)], "func_id string, block_id int")
    inc = run_bsp(blocks, edges2, spec, prev_state=full_old, dirty=dirty)
    scratch = run_bsp(blocks, edges2, spec)
    assert canon(inc) == canon(scratch)
