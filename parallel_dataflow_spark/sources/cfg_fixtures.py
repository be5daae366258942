"""Deterministic CFG fixtures (FIXTURES.md B2), mirroring the shapes of the
reference corpora: handwritten small CFGs (like core/*.bril), seeded random
CFGs (like rand/*.bril), and multi-function programs with skewed sizes
(like rand_multi_func/*.bril — the across-function parallelism + skew
ceiling experiment, blog/blog.md:84).

Schema:
  blocks: func_id, block_id, is_entry, is_exit,
          instrs array<struct<op,dest,args,value,type>>,
          fargs array<string>   (function arguments — ReachingDefs seeds
                                 them as definitions at block 0)
  edges:  func_id, src, dst
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

OPS_VALUE = ["add", "sub", "mul", "div", "eq", "lt", "gt", "le", "ge", "and", "or"]
VARS = [f"v{i}" for i in range(8)]

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("func_id", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("is_entry", T.BooleanType(), False),
        T.StructField("is_exit", T.BooleanType(), False),
        T.StructField(
            "instrs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("dest", T.StringType()),
                        T.StructField("args", T.ArrayType(T.StringType())),
                        # literal text ("5", "-82", "true") — a string, NOT
                        # a long: pandas coerces nullable int64 struct
                        # fields to float64, which corrupts i64 constants
                        # beyond 2^53 (the fuzzed corpus has them)
                        T.StructField("value", T.StringType()),
                        T.StructField("type", T.StringType()),
                    ]
                )
            ),
            False,
        ),
        T.StructField("fargs", T.ArrayType(T.StringType()), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("func_id", T.StringType(), False),
        T.StructField("src", T.IntegerType(), False),
        T.StructField("dst", T.IntegerType(), False),
    ]
)


def _instr(op, dest=None, args=None, value=None, type=None):
    return {
        "op": op,
        "dest": dest,
        "args": args or [],
        "value": None if value is None else str(value),
        "type": type,
    }


def handwritten_cfgs() -> tuple[list[dict], list[dict]]:
    """diamond, single loop, self-loop, unreachable block, straight line."""
    blocks, edges = [], []

    def add_func(fid, blks, eds, fargs=()):
        for bid, (entry, exit_, instrs) in enumerate(blks):
            blocks.append(
                {
                    "func_id": fid,
                    "block_id": bid,
                    "is_entry": entry,
                    "is_exit": exit_,
                    "instrs": instrs,
                    "fargs": list(fargs),
                }
            )
        for s, d in eds:
            edges.append({"func_id": fid, "src": s, "dst": d})

    # diamond: 0 -> {1,2} -> 3
    add_func(
        "diamond",
        [
            (True, False, [_instr("const", "a", value=1), _instr("const", "b", value=2)]),
            (False, False, [_instr("add", "c", ["a", "b"]), _instr("const", "a", value=5)]),
            (False, False, [_instr("mul", "c", ["a", "a"])]),
            (False, True, [_instr("add", "d", ["a", "c"]), _instr("print", None, ["d"])]),
        ],
        [(0, 1), (0, 2), (1, 3), (2, 3)],
    )
    # loop: 0 -> 1 -> 2 -> 1, 2 -> 3
    add_func(
        "loop",
        [
            (True, False, [_instr("const", "i", value=0), _instr("const", "n", value=10)]),
            (False, False, [_instr("lt", "cond", ["i", "n"])]),
            (False, False, [_instr("const", "one", value=1), _instr("add", "i", ["i", "one"])]),
            (False, True, [_instr("print", None, ["i"])]),
        ],
        [(0, 1), (1, 2), (2, 1), (1, 3)],
    )
    # self-loop: 0 -> 1 -> 1, 1 -> 2
    add_func(
        "selfloop",
        [
            (True, False, [_instr("const", "x", value=3)]),
            (False, False, [_instr("add", "x", ["x", "x"])]),
            (False, True, [_instr("print", None, ["x"])]),
        ],
        [(0, 1), (1, 1), (1, 2)],
    )
    # unreachable block 2
    add_func(
        "unreachable",
        [
            (True, False, [_instr("const", "a", value=7)]),
            (False, True, [_instr("id", "b", ["a"])]),
            (False, False, [_instr("const", "z", value=9)]),
        ],
        [(0, 1), (2, 1)],
    )
    # straight line
    add_func(
        "straight",
        [
            (True, False, [_instr("const", "a", value=4), _instr("id", "b", ["a"])]),
            (False, False, [_instr("add", "c", ["a", "b"])]),
            (False, True, [_instr("mul", "d", ["c", "c"]), _instr("print", None, ["d"])]),
        ],
        [(0, 1), (1, 2)],
    )
    # function with arguments: RD must seed p/q as defs @ block 0
    # (passes/src/reaching_defs.rs:23-31); q is redefined in block 1 so its
    # arg-def is killed on that path, p's survives to the exit. Also
    # exercises negative truncating division (56 div -65 = 0 in Rust i64)
    # and intra-block fold-against-IN (id b a sees IN, not const a 4).
    add_func(
        "withargs",
        [
            (True, False, [_instr("const", "a", value=4), _instr("id", "b", ["a"])]),
            (
                False,
                False,
                [
                    _instr("const", "n", value=56),
                    _instr("const", "m", value=-65),
                    _instr("div", "q", ["n", "m"]),
                ],
            ),
            (False, True, [_instr("add", "r", ["p", "q"]), _instr("print", None, ["r"])]),
        ],
        [(0, 1), (0, 2), (1, 2)],
        fargs=("p", "q"),
    )
    return blocks, edges


def random_cfg(fid: str, n_blocks: int, seed: int) -> tuple[list[dict], list[dict]]:
    """Seeded random reducible-ish CFG: forward edges + a few back edges,
    2-6 instrs per block over an 8-variable pool (op mix mirrors the
    corpus tally, SURVEY.md §1.1)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    blocks, edges = [], []
    for bid in range(n_blocks):
        n_ins = int(rng.integers(2, 7))
        instrs = []
        for _ in range(n_ins):
            r = rng.random()
            if r < 0.35:
                instrs.append(
                    _instr("const", VARS[int(rng.integers(8))], value=int(rng.integers(100)))
                )
            elif r < 0.45:
                instrs.append(
                    _instr("id", VARS[int(rng.integers(8))], [VARS[int(rng.integers(8))]])
                )
            elif r < 0.9:
                op = OPS_VALUE[int(rng.integers(len(OPS_VALUE)))]
                instrs.append(
                    _instr(
                        op,
                        VARS[int(rng.integers(8))],
                        [VARS[int(rng.integers(8))], VARS[int(rng.integers(8))]],
                    )
                )
            else:
                instrs.append(_instr("print", None, [VARS[int(rng.integers(8))]]))
        blocks.append(
            {
                "func_id": fid,
                "block_id": bid,
                "is_entry": bid == 0,
                "is_exit": bid == n_blocks - 1,
                "instrs": instrs,
                "fargs": [],
            }
        )
    edge_set = set()
    for bid in range(n_blocks - 1):
        edge_set.add((bid, bid + 1))  # spine
        if rng.random() < 0.5 and n_blocks > 2:
            tgt = int(rng.integers(bid + 1, n_blocks))
            edge_set.add((bid, tgt))  # forward jump
        if rng.random() < 0.2 and bid > 0:
            back = int(rng.integers(0, bid + 1))
            edge_set.add((bid, back))  # back edge (loop)
    edges = [{"func_id": fid, "src": s, "dst": d} for s, d in sorted(edge_set)]
    return blocks, edges


def fixture_program(
    seed: int = 42, n_random: int = 6, random_size: tuple[int, int] = (20, 60),
    multi_func_skew: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """The full fixture program: handwritten + random + skewed multi-func
    (one big function dominating, like the reference's skew ceiling)."""
    blocks, edges = handwritten_cfgs()
    rng = np.random.default_rng(np.random.PCG64(seed))
    for i in range(n_random):
        nb = int(rng.integers(random_size[0], random_size[1]))
        b, e = random_cfg(f"rand{i:02d}", nb, seed * 1000 + i)
        blocks += b
        edges += e
    if multi_func_skew:
        sizes = [80, 10, 10, 10]  # one hot function (blog/blog.md:84)
        for i, nb in enumerate(sizes):
            b, e = random_cfg(f"skew{i}", nb, seed * 7777 + i)
            blocks += b
            edges += e
    return pd.DataFrame(blocks), pd.DataFrame(edges)


def fixture_dataframes(
    spark: SparkSession, seed: int = 42, **kwargs
) -> tuple[DataFrame, DataFrame]:
    bl, ed = fixture_program(seed, **kwargs)
    return (
        spark.createDataFrame(bl, schema=BLOCKS_SCHEMA),
        spark.createDataFrame(ed, schema=EDGES_SCHEMA),
    )
