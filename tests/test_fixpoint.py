"""Differential fixpoint tests — the reference's whole test strategy
(impls/src/bin/test.rs:21-70) reproduced: the pure-Python sequential
kernel is the runtime-golden; every distributed executor must string-match
it on every (fixture × pass). Canonical JSON values make equality exact.
"""

import pandas as pd
import pytest

from parallel_dataflow_spark.operators.fixpoint import (
    SPECS,
    exit_values,
    run_across_functions,
    run_bsp,
    run_mixed,
    sequential_kernel,
)
from parallel_dataflow_spark.sources.cfg_fixtures import (
    fixture_dataframes,
    fixture_program,
)

PASSES = sorted(SPECS)


FIXTURE_KW = dict(n_random=2, random_size=(10, 25), multi_func_skew=True)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    blocks, edges = fixture_dataframes(spark, seed=42, **FIXTURE_KW)
    blocks.cache().count()
    edges.cache().count()
    return blocks, edges


@pytest.fixture(scope="module")
def golden():
    """Pure-Python golden for every function × pass."""
    bl, ed = fixture_program(seed=42, **FIXTURE_KW)
    out = {}
    for name, spec in SPECS.items():
        rows = []
        for fid, fb in bl.groupby("func_id"):
            blocks = fb.drop(columns="func_id").to_dict("records")
            edges = [
                (int(r.src), int(r.dst))
                for r in ed[ed.func_id == fid].itertuples()
            ]
            for r in sequential_kernel(spec, blocks, edges):
                rows.append((fid, r["block_id"], r["in_val"], r["out_val"]))
        out[name] = sorted(rows)
    return out


@pytest.mark.parametrize("pass_name", PASSES)
def test_across_functions_matches_golden(spark, fixture_dfs, golden, pass_name):
    blocks, edges = fixture_dfs
    got = sorted(
        tuple(r) for r in run_across_functions(blocks, edges, SPECS[pass_name]).collect()
    )
    assert got == golden[pass_name]


# BSP pays one Spark superstep per worklist round (~5s fixed overhead per
# round on this box), so its differential test runs on the handwritten
# CFGs (diamond/loop/self-loop/unreachable/straight — loops included, so
# fixpoint iteration is exercised) rather than the big random fixture.
# Two passes — one forward, one backward — cover the direction plumbing;
# across-functions covers all four semantics on the full fixture.
@pytest.mark.parametrize("pass_name", ["reaching_defs", "live_vars"])
def test_bsp_matches_golden(spark, pass_name):
    blocks, edges = fixture_dataframes(
        spark, seed=42, n_random=0, multi_func_skew=False
    )
    got = sorted(tuple(r) for r in run_bsp(blocks, edges, SPECS[pass_name]).collect())

    bl, ed = fixture_program(seed=42, n_random=0, multi_func_skew=False)
    spec = SPECS[pass_name]
    want = []
    for fid, fb in bl.groupby("func_id"):
        rows = sequential_kernel(
            spec,
            fb.drop(columns="func_id").to_dict("records"),
            [(int(r.src), int(r.dst)) for r in ed[ed.func_id == fid].itertuples()],
        )
        want += [(fid, r["block_id"], r["in_val"], r["out_val"]) for r in rows]
    assert got == sorted(want)


def test_mixed_matches_golden(spark, fixture_dfs, golden):
    blocks, edges = fixture_dfs
    got = sorted(
        tuple(r) for r in run_mixed(blocks, edges, SPECS["live_vars"], threshold=20).collect()
    )
    assert got == golden["live_vars"]


def test_exit_values(spark, fixture_dfs):
    blocks, edges = fixture_dfs
    spec = SPECS["reaching_defs"]
    res = run_across_functions(blocks, edges, spec)
    ev = exit_values(res, blocks, spec)
    rows = {r["func_id"]: r["exit_val"] for r in ev.collect()}
    assert set(rows) == {r["func_id"] for r in blocks.select("func_id").distinct().collect()}
    # diamond exit: defs of a (redefed in block 1), b, c, d reach the end
    assert rows["diamond"] != "[]"


def test_const_prop_diamond_semantics():
    """Hand-checked lattice behavior on the diamond: 'a' is 1 on one path,
    5 on the other → ⊤ at the join; 'b' stays 2."""
    import json

    bl, ed = fixture_program(seed=42, n_random=0, multi_func_skew=False)
    fb = bl[bl.func_id == "diamond"]
    blocks = fb.drop(columns="func_id").to_dict("records")
    edges = [(int(r.src), int(r.dst)) for r in ed[ed.func_id == "diamond"].itertuples()]
    res = sequential_kernel(SPECS["const_prop"], blocks, edges)
    join_in = json.loads([r for r in res if r["block_id"] == 3][0]["in_val"])
    assert join_in["a"] == "⊤" or join_in["a"] == "⊤"
    assert join_in["b"] == "2"
    assert join_in["c"] == "⊤" or join_in["c"] == "⊤"  # 3 vs 25


def test_live_vars_loop_semantics():
    """In the loop fixture, 'i' and 'n' are live around the loop."""
    import json

    bl, ed = fixture_program(seed=42, n_random=0, multi_func_skew=False)
    fb = bl[bl.func_id == "loop"]
    blocks = fb.drop(columns="func_id").to_dict("records")
    edges = [(int(r.src), int(r.dst)) for r in ed[ed.func_id == "loop"].itertuples()]
    res = sequential_kernel(SPECS["live_vars"], blocks, edges)
    # live-in of block 1 (loop header) must contain i and n
    b1 = [r for r in res if r["block_id"] == 1][0]
    live_in = set(json.loads(b1["in_val"]))
    assert {"i", "n"} <= live_in
