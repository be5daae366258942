"""Iterative worklist dataflow-analysis engine (the reference's core).

Re-expresses gabizon103/parallel-dataflow's four executors and four
analyses (SURVEY.md §2.1 #6-#21) Spark-first:

- ``Spec`` protocol = the reference's ``DataflowSpec`` trait
  (utils/src/dataflow_spec.rs:5-31): init / meet / transfer / finish /
  reversed, over canonical JSON-string lattice values (canonicalization
  makes value equality well-defined — the reference gets this from
  canonical Debug formatting, impls/src/bin/test.rs:29-35).
- ``sequential_kernel`` = the FIFO worklist of impls/src/sequential.rs:13-66;
  pure Python, runs per function. It is both the runtime-golden for
  differential tests and the in-task kernel of the across-functions
  executor.
- ``run_across_functions`` = rayon-over-functions
  (utils/src/dataflow_executor.rs:60-63) as
  ``groupBy(func_id).applyInPandas(sequential_kernel)`` — embarrassingly
  parallel per key.
- ``run_bsp`` = the batched parallel worklist of impls/src/parallel.rs:14-91:
  each round joins the frontier's predecessors' state (meet), applies
  transfer, and seeds the next frontier with successors of changed blocks
  (change-propagation pruning, impls/src/parallel.rs:48-56; frontier
  dedup, :27,69). Rounds are DataFrame stages with localCheckpoint to cut
  lineage.
- ``run_mixed`` = MixedExecutor's size-threshold dispatch
  (impls/src/mixed.rs:32-38): small functions go through the in-task
  kernel, large ones through BSP.

Backward analyses run forward on the reversed edge relation
(``DataflowSpec::reversed``, utils/src/dataflow_spec.rs:8-11;
edge reversal = a column swap).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Cached canonical-JSON parse. Canonical value strings are re-parsed at
# every meet/transfer; identical strings recur across visits, so a parse
# cache cuts the hot-loop cost. Callers must treat results as FROZEN
# (every spec either reads or copies before mutating).
_loads = lru_cache(maxsize=1 << 16)(json.loads)

RESULT_SCHEMA = "func_id string, block_id int, in_val string, out_val string"


# ---------------------------------------------------------------------------
# Value helpers: canonical JSON strings
# ---------------------------------------------------------------------------

def canon_set(items) -> str:
    return json.dumps(sorted(set(items)), separators=(",", ":"))


def canon_map(d: dict) -> str:
    return json.dumps(d, sort_keys=True, separators=(",", ":"))


# ---------------------------------------------------------------------------
# i64 arithmetic (the reference folds Rust i64s: release-mode wrapping
# add/sub/mul, division truncates toward zero — passes/src/const_prop.rs:51-64)
# ---------------------------------------------------------------------------

_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1


def wrap_i64(n: int) -> int:
    n &= _U64 - 1
    return n - _U64 if n > _I64_MAX else n


def trunc_div_i64(a: int, b: int) -> int | None:
    """Rust i64 `/`: truncates toward zero (Python `//` floors — e.g.
    56 / -65 is 0 in Rust but -1 under floor division). None on b == 0."""
    if b == 0:
        return None
    q = abs(a) // abs(b)
    return wrap_i64(q if (a < 0) == (b < 0) else -q)


# ---------------------------------------------------------------------------
# Spec protocol + the four reference analyses
# ---------------------------------------------------------------------------

class Spec:
    """init/meet/transfer/finish over canonical JSON values — the
    DataflowSpec trait (utils/src/dataflow_spec.rs:5-31). Semantics traced
    from impls/src/sequential.rs:21-48:

    - in/out of every block initialize to ``init_val``;
    - in[entry] is pinned to ``entry_val`` (preds of the entry ignored);
    - in[other] = meet(out[preds]) — meet over [] is the spec's top
      (= init for all four passes);
    - ``transfer`` receives the block's instruction list in ORIGINAL
      order; backward specs iterate it in reverse themselves
      (passes/src/live_vars.rs:27).
    """

    name: str = "spec"
    reversed: bool = False

    def init_val(self, fargs: tuple = ()) -> str:
        raise NotImplementedError

    def entry_val(self, fargs: tuple = ()) -> str:
        # default: entry == init (dataflow_spec.rs:14-16)
        return self.init_val(fargs)

    def meet(self, vals: list[str]) -> str:
        raise NotImplementedError

    def transfer(self, block_id: int, instrs: list[dict], in_val: str) -> str:
        raise NotImplementedError

    def finish(self, val: str) -> str:
        return val


class ReachingDefs(Spec):
    """Forward; powerset lattice, meet = union; gen/kill per block
    (passes/src/reaching_defs.rs)."""

    name = "reaching_defs"
    reversed = False

    def init_val(self, fargs: tuple = ()) -> str:
        # function args are definitions at block 0 (reaching_defs.rs:23-31)
        return json.dumps(sorted([a, 0] for a in fargs), separators=(",", ":"))

    def meet(self, vals: list[str]) -> str:
        if vals and all(v == vals[0] for v in vals):
            return vals[0]  # inputs are canonical; identical ⇒ union is too
        out = set()
        for v in vals:
            out.update(tuple(x) for x in _loads(v))
        return json.dumps(sorted(list(x) for x in out), separators=(",", ":"))

    def transfer(self, block_id: int, instrs: list[dict], in_val: str) -> str:
        defs = {i["dest"] for i in instrs if i.get("dest")}
        live = [tuple(x) for x in _loads(in_val) if x[0] not in defs]
        live += [(d, block_id) for d in sorted(defs)]
        return json.dumps(sorted([list(x) for x in set(live)]), separators=(",", ":"))


class LiveVars(Spec):
    """Backward; powerset, meet = union; use/def in reverse instruction
    order (passes/src/live_vars.rs:24-42)."""

    name = "live_vars"
    reversed = True

    def init_val(self, fargs: tuple = ()) -> str:
        return canon_set([])

    def meet(self, vals: list[str]) -> str:
        if vals and all(v == vals[0] for v in vals):
            return vals[0]
        out = set()
        for v in vals:
            out.update(_loads(v))
        return canon_set(out)

    def transfer(self, block_id: int, instrs: list[dict], in_val: str) -> str:
        live = set(_loads(in_val))
        for ins in reversed(instrs):
            if ins.get("dest"):
                live.discard(ins["dest"])
            for a in ins.get("args") or []:
                live.add(a)
        return canon_set(live)


class ConstProp(Spec):
    """Forward; flat lattice per var (Const | Any), pointwise meet
    (passes/src/const_prop.rs). Values: {"x": "5"}, {"x": "true"} or
    {"x": "⊤"} (⊤ = the reference's Value::Any, displayed "T").

    Transfer mirrors const_prop.rs:47-68 exactly: each instruction is
    folded (``insn.fold``) with argument lookups against the block's **IN**
    environment — NOT a running intra-block env — and the result written
    into a separate out env. So ``const a = 4; id b a`` with an empty IN
    leaves b = ⊤ (a is not const in IN), matching the Rust. Int literals
    are i64 (wrapping arithmetic = release-mode Rust; division truncates
    toward zero); bool literals fold through and/or/not; comparisons
    produce bools. Division by zero (which would panic in Rust) is mapped
    to ⊤ defensively — the corpus never constant-folds a zero divisor.
    """

    name = "const_prop"
    reversed = False
    TOP = "⊤"

    _INT_OPS = {"add", "sub", "mul", "div", "eq", "lt", "gt", "le", "ge"}
    _BOOL_OPS = {"and", "or", "not"}

    def init_val(self, fargs: tuple = ()) -> str:
        return canon_map({})

    def meet(self, vals: list[str]) -> str:
        if vals and all(v == vals[0] for v in vals):
            return vals[0]
        merged: dict = {}
        for v in vals:
            for var, c in _loads(v).items():
                if var in merged and merged[var] != c:
                    merged[var] = self.TOP
                else:
                    merged.setdefault(var, c)
        return canon_map(merged)

    @staticmethod
    def _parse(s: str):
        if s == "true":
            return True
        if s == "false":
            return False
        return int(s)

    @staticmethod
    def _render(v) -> str:
        if v is True:
            return "true"
        if v is False:
            return "false"
        return str(v)

    def _fold(self, ins: dict, in_env: dict) -> str:
        """insn.fold(|arg| in_val.get(arg)) — returns the folded constant's
        canonical string, or TOP (= fold returned None → Value::Any)."""
        op = ins["op"]
        if op == "const":
            v = ins.get("value")
            if v in ("true", "false"):
                return v
            if ins.get("type") == "bool":
                return "true" if int(v or 0) else "false"
            return str(wrap_i64(int(v or 0)))
        vals = []
        for a in ins.get("args") or []:
            s = in_env.get(a)
            if s is None or s == self.TOP:
                return self.TOP
            vals.append(self._parse(s))
        if op == "id" and len(vals) == 1:
            return self._render(vals[0])
        if op in self._INT_OPS and len(vals) == 2:
            a, b = vals
            if not (isinstance(a, int) and isinstance(b, int)) or isinstance(
                a, bool
            ) or isinstance(b, bool):
                return self.TOP  # ill-typed (never in a type-checked program)
            if op == "add":
                return str(wrap_i64(a + b))
            if op == "sub":
                return str(wrap_i64(a - b))
            if op == "mul":
                return str(wrap_i64(a * b))
            if op == "div":
                q = trunc_div_i64(a, b)
                return self.TOP if q is None else str(q)
            cmp = {"eq": a == b, "lt": a < b, "gt": a > b, "le": a <= b, "ge": a >= b}
            return self._render(cmp[op])
        if op in self._BOOL_OPS:
            if not all(isinstance(v, bool) for v in vals):
                return self.TOP
            if op == "not" and len(vals) == 1:
                return self._render(not vals[0])
            if len(vals) == 2:
                return self._render(vals[0] and vals[1] if op == "and" else vals[0] or vals[1])
        return self.TOP  # call / unknown op with a dest → Any

    def transfer(self, block_id: int, instrs: list[dict], in_val: str) -> str:
        in_env = _loads(in_val)
        out = dict(in_env)
        for ins in instrs:
            dest = ins.get("dest")
            if not dest:
                continue
            out[dest] = self._fold(ins, in_env)
        return canon_map(out)


class AvailableExprs(Spec):
    """Forward; powerset with ⊤ = Full, meet = intersection
    (passes/src/available_expr.rs). ⊤ encoded as the JSON string "FULL"
    (the reference's Set::Full sentinel, :13-18)."""

    name = "available_exprs"
    reversed = False
    FULL = '"FULL"'
    # bril_rs is_pure: core value ops + id; call is impure. Constants are
    # pure and enter the set keyed by their LITERAL (Expr::Const(value),
    # available_expr.rs:30-40) — not by dest.
    PURE = {"add", "sub", "mul", "div", "eq", "lt", "gt", "le", "ge", "and", "or", "not", "id"}

    def init_val(self, fargs: tuple = ()) -> str:
        return self.FULL  # Set::full() (available_expr.rs:108-110)

    def entry_val(self, fargs: tuple = ()) -> str:
        return canon_set([])  # Set::empty() (available_expr.rs:104-107)

    def meet(self, vals: list[str]) -> str:
        # fold from Full; Full absorbs (available_expr.rs:69-75,112-117)
        if vals and all(v == vals[0] for v in vals):
            return vals[0]
        sets = [set(_loads(v)) for v in vals if v != self.FULL]
        if not sets:
            return self.FULL
        out = sets[0]
        for s in sets[1:]:
            out &= s
        return canon_set(out)

    def _expr_key(self, ins: dict) -> str | None:
        """Expr::new + Display (available_expr.rs:30-51): Op displays as
        "op arg1 arg2", Const displays as the literal itself."""
        op = ins["op"]
        if op == "const":
            v = ins.get("value")
            if v is None:
                return "0"
            if ins.get("type") == "bool" and v not in ("true", "false"):
                return "true" if int(v) else "false"
            return str(v)
        if op in self.PURE:
            return " ".join([op] + list(ins.get("args") or []))
        return None

    def transfer(self, block_id: int, instrs: list[dict], in_val: str) -> str:
        # insert into Full and kill on Full are both no-ops
        # (available_expr.rs:77-84 Set::insert, :127-132 retain on Finite)
        if in_val == self.FULL:
            return self.FULL
        avail = set(_loads(in_val))
        for ins in instrs:
            key = self._expr_key(ins)
            if key is not None:  # any pure expr inserts (Expr::new)
                avail.add(key)
            dest = ins.get("dest")
            if dest:
                # kill exprs whose args contain the redefined variable;
                # Const exprs (no spaces → no args) are never killed
                # (Expr::contains, available_expr.rs:20-26)
                avail = {e for e in avail if dest not in e.split(" ")[1:]}
        return canon_set(avail)


SPECS: dict[str, Spec] = {
    s.name: s for s in (ReachingDefs(), LiveVars(), ConstProp(), AvailableExprs())
}


# ---------------------------------------------------------------------------
# Sequential kernel (the runtime golden; impls/src/sequential.rs:13-66)
# ---------------------------------------------------------------------------

def sequential_kernel(
    spec: Spec,
    blocks: list[dict],
    edges: list[tuple[int, int]],
    fargs: tuple = (),
    max_visits: int = 5_000_000,
) -> list[dict]:
    """FIFO-worklist fixpoint for ONE function. ``blocks``: dicts with
    block_id, is_entry, is_exit, instrs. Returns rows
    (block_id, in_val, out_val).

    ``max_visits`` guards against non-termination: ConstProp's transfer is
    non-monotone (an absent arg folds to Any; when the arg later becomes
    a constant the dest flips Any→const), and on two fuzzed reference
    programs (rand/rand16, rand/rand48) the reference's own worklist
    algorithm oscillates forever between two lattice states — see
    sources/bril.py:NON_TERMINATING_CONST_PROP. The reference acknowledges
    the open termination question at blog/blog.md:94."""
    from collections import deque

    by_id = {b["block_id"]: b for b in blocks}
    if spec.reversed:
        # run backward analyses forward on the reversed CFG
        # (impls/src/sequential.rs:15-19): entries <-> exits
        edges = [(d, s) for (s, d) in edges]
        entry_flag = "is_exit"
    else:
        entry_flag = "is_entry"
    preds: dict[int, list[int]] = {b: [] for b in by_id}
    succs: dict[int, list[int]] = {b: [] for b in by_id}
    for s, d in edges:
        succs[s].append(d)
        preds[d].append(s)

    init = spec.init_val(fargs)
    entry = spec.entry_val(fargs)
    in_vals = {b: init for b in by_id}
    out_vals = {b: init for b in by_id}

    # EXACT LinkedList schedule of sequential.rs:26-48: seed 0..n, pop
    # front, push_back all successors of a changed block WITHOUT dedup.
    # The schedule matters: ConstProp's fold maps an absent (never-seen)
    # arg to Any, which makes its transfer non-monotone in the seeded
    # lattice — in CFG regions unreachable from the entry (plentiful in
    # the fuzzed corpus) different fair schedules reach DIFFERENT
    # fixpoints (verified empirically: an RPO-priority worklist diverges
    # from FIFO on rand/rand{20,25,27,35,40} for const_prop). The only
    # sound speedups are schedule-preserving: skip the transfer when a
    # block's freshly-met IN equals the IN of its previous transfer
    # (deterministic transfer ⇒ identical OUT ⇒ no requeue either way),
    # plus the cached parses / early-out meets above.
    wl = deque(sorted(by_id))
    prev_in: dict[int, str] = {}
    visits = 0
    while wl:
        visits += 1
        if visits > max_visits:
            raise RuntimeError(
                f"worklist fixpoint exceeded {max_visits} visits "
                f"(pass={spec.name}) — non-terminating oscillation "
                "(non-monotone transfer, see sequential_kernel docstring)"
            )
        b = wl.popleft()
        # in[entry] pinned to entry(); others meet their preds
        # (impls/src/sequential.rs:29-38)
        if by_id[b].get(entry_flag):
            in_vals[b] = entry
        else:
            in_vals[b] = spec.meet([out_vals[p] for p in sorted(preds[b])])
        if prev_in.get(b) == in_vals[b]:
            continue  # same IN as last transfer → OUT already current
        prev_in[b] = in_vals[b]
        new_out = spec.transfer(b, by_id[b]["instrs"], in_vals[b])
        if new_out != out_vals[b]:
            out_vals[b] = new_out
            wl.extend(sorted(succs[b]))

    return [
        {"block_id": b, "in_val": in_vals[b], "out_val": out_vals[b]}
        for b in sorted(by_id)
    ]


# ---------------------------------------------------------------------------
# Executor 1: across-functions (dataflow_executor.rs:39-77)
# ---------------------------------------------------------------------------

def _norm_instr(i) -> dict:
    # `value` is a literal STRING in the schema (pandas coerces nullable
    # int64 struct fields to float64, corrupting i64 constants > 2^53 —
    # the fuzzed corpus has such constants); args may arrive as ndarray
    return {
        "op": i["op"],
        "dest": i["dest"],
        "args": list(i["args"]) if i["args"] is not None else [],
        "value": i["value"],
        "type": i["type"] if "type" in i else None,
    }


def _with_fargs(blocks: DataFrame) -> DataFrame:
    """Ensure a per-function ``fargs array<string>`` column exists (function
    arguments — ReachingDefs seeds them as definitions at block 0,
    passes/src/reaching_defs.rs:23-31)."""
    if "fargs" in blocks.columns:
        return blocks
    return blocks.withColumn("fargs", F.array().cast("array<string>"))


def _fargs_of(cell) -> tuple:
    return tuple(cell) if cell is not None else ()


def _blocks_pdf_to_rows(pdf: pd.DataFrame) -> list[dict]:
    # column-wise zip, not iterrows (per-function frames are small, but
    # the repo convention is no row-at-a-time pandas anywhere)
    return [
        {
            "block_id": int(bid),
            "is_entry": bool(ent),
            "is_exit": bool(ext),
            "instrs": [_norm_instr(i) for i in (instrs if instrs is not None else [])],
        }
        for bid, ent, ext, instrs in zip(
            pdf["block_id"].to_numpy(),
            pdf["is_entry"].to_numpy(),
            pdf["is_exit"].to_numpy(),
            pdf["instrs"].tolist(),
        )
    ]


def run_across_functions(
    blocks: DataFrame, edges: DataFrame, spec: Spec, num_partitions: int | None = None
) -> DataFrame:
    """One pandas task per function — per-key parallelism exactly like the
    reference's rayon-over-functions. The edges of each function ride
    along via a pre-join (edge lists are tiny relative to blocks)."""
    edge_lists = edges.groupBy("func_id").agg(
        F.collect_list(F.struct("src", "dst")).alias("edge_list")
    )
    joined = _with_fargs(blocks).join(edge_lists, "func_id", "left")

    def per_func(pdf: pd.DataFrame) -> pd.DataFrame:
        func_id = pdf["func_id"].iloc[0]
        el = pdf["edge_list"].iloc[0]
        edge_rows = (
            [(int(e["src"]), int(e["dst"])) for e in el] if el is not None and len(el) else []
        )
        block_rows = _blocks_pdf_to_rows(pdf)
        res = sequential_kernel(spec, block_rows, edge_rows, _fargs_of(pdf["fargs"].iloc[0]))
        return pd.DataFrame(
            {
                "func_id": func_id,
                "block_id": [r["block_id"] for r in res],
                "in_val": [r["in_val"] for r in res],
                "out_val": [r["out_val"] for r in res],
            }
        )

    grouped = joined.groupBy("func_id")
    return grouped.applyInPandas(per_func, schema=RESULT_SCHEMA)


# ---------------------------------------------------------------------------
# Executor 2: BSP rounds (impls/src/parallel.rs:14-91)
# ---------------------------------------------------------------------------

def _checkpoint_fresh_stats(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that does NOT carry the child plan's
    estimated statistics forward.

    Dataset.localCheckpoint copies the child's ESTIMATED stats into the
    new LogicalRDD (originStats). In an iterative checkpoint chain that
    compounds: round N's sizeInBytes is a ~6-join PRODUCT of round N-1's
    (size-only join estimation multiplies children), so the BigInt bit
    length grows ~6x per ROUND and by round ~10 the optimizer spends
    minutes in BigInteger Toom-Cook multiplies inside
    SizeInBytesOnlyStatsPlanVisitor — an exponential driver-side hang
    with a constant-shape plan. Rebuilding the DataFrame from the
    checkpointed RDD[InternalRow] (zero data movement, classic-mode
    internal API) resets the leaf to default stats each round."""
    ck = df.localCheckpoint()
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return type(ck)(fresh, spark)
    except Exception:
        # non-classic session (no _jdf) or any internal-API mismatch
        # (Py4JError on a Spark where the private signature moved):
        # degrade to the un-optimized plain checkpoint rather than fail
        return ck


def run_bsp(
    blocks: DataFrame,
    edges: DataFrame,
    spec: Spec,
    max_rounds: int = 200,
    bsp_partitions: int = 8,
    prev_state: DataFrame | None = None,
    dirty: DataFrame | None = None,
) -> DataFrame:
    """Distributed batched worklist. Per round (one BSP superstep):

    frontier ⋈ edges → predecessor set → ⋈ state (out_vals) →
    groupBy(block) meet+transfer (pandas kernel with the block's instrs)
    → changed? → frontier' = successors of changed blocks (dedup).

    State and frontier are DataFrames; localCheckpoint truncates lineage.
    The meet of a block with no predecessors is the init value (entry
    blocks of the effective direction)."""
    spark = blocks.sparkSession
    blocks = _with_fargs(blocks)
    if spec.reversed:
        edges = edges.select("func_id", F.col("dst").alias("src"), F.col("src").alias("dst"))
        entry_flag = "is_exit"
    else:
        entry_flag = "is_entry"

    @F.pandas_udf("string")
    def init_udf(fargs: pd.Series) -> pd.Series:
        return fargs.map(lambda a: spec.init_val(_fargs_of(a)))

    # localCheckpoint (not cache): corpus blocks/edges arrive as a driver
    # LocalRelation whose rows (instrs ≈ MiBs) would otherwise be embedded
    # in EVERY superstep's task binary (InMemoryRelation keeps the child
    # plan for recompute; checkpoint truncates lineage to the materialized
    # blocks) — this was ~5 s/round of broadcast overhead on the Bril corpus
    binst = blocks.select(
        "func_id",
        "block_id",
        "instrs",
        "fargs",
        F.col(entry_flag).alias("is_eff_entry"),
    ).localCheckpoint()
    edges = edges.select("func_id", "src", "dst").localCheckpoint()

    # in/out of every block start at init(fargs) (sequential.rs:23-24);
    # init is per-function (ReachingDefs seeds the function's args)
    state = blocks.select(
        "func_id",
        "block_id",
        init_udf("fargs").alias("in_val"),
        init_udf("fargs").alias("out_val"),
    ).localCheckpoint()

    frontier = blocks.select("func_id", "block_id")

    if prev_state is not None and dirty is not None:
        # Incremental re-solve after a program edit: only blocks
        # REACHABLE from a dirty block (in the analysis' effective
        # direction) can have different facts — nothing else has a path
        # from the edit, so its meet inputs are untouched. Reset exactly
        # that region to init (a stale fact inside it must be able to
        # RETRACT, which seeding from the old solution would prevent for
        # union meets), keep the previous solution outside it, and seed
        # the worklist with the region. The same superstep loop then
        # converges to the identical fixpoint a from-scratch run
        # produces (pinned by tests/test_fixpoint_incremental.py),
        # after rounds proportional to the REGION's diameter, not the
        # program's. Ghost rows for deleted blocks are dropped by the
        # semi-join against the current block table.
        # seed = dirty ∪ blocks ABSENT from prev_state (r6, ADVICE): a
        # newly added block the caller forgot to list in `dirty` would
        # otherwise fall outside keep∪reset and silently vanish from the
        # solution (its successors' meets would ignore it)
        region = (
            dirty.select("func_id", "block_id")
            .unionByName(
                blocks.select("func_id", "block_id").join(
                    prev_state.select("func_id", "block_id"),
                    ["func_id", "block_id"],
                    "left_anti",
                )
            )
            .dropDuplicates(["func_id", "block_id"])
            .localCheckpoint()
        )
        stabilized = False
        for _ in range(max_rounds):
            nxt = edges.join(
                region.withColumnRenamed("block_id", "src"), ["func_id", "src"]
            ).select("func_id", F.col("dst").alias("block_id"))
            grown = (
                region.unionByName(nxt)
                .dropDuplicates(["func_id", "block_id"])
                .localCheckpoint()
            )
            if grown.count() == region.count():
                region = grown
                stabilized = True
                break
            region = grown
        if not stabilized:
            # r6 (ADVICE): a reachable set that did not stabilize within
            # max_rounds would silently truncate the reset region and
            # converge to a WRONG incremental fixpoint — degrade to a
            # full re-solve (reset everything) instead
            region = blocks.select("func_id", "block_id").localCheckpoint()
        keep = (
            prev_state.join(
                blocks.select("func_id", "block_id"), ["func_id", "block_id"], "left_semi"
            )
            .join(region, ["func_id", "block_id"], "left_anti")
        )
        reset = state.join(region, ["func_id", "block_id"], "left_semi")
        state = keep.unionByName(reset).localCheckpoint()
        frontier = region

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for (func_id, block_id), grp in pdf.groupby(["func_id", "block_id"], sort=False):
            if bool(grp["is_eff_entry"].iloc[0]):
                # pinned (sequential.rs:29-30)
                in_val = spec.entry_val(_fargs_of(grp["fargs"].iloc[0]))
            else:
                pred_outs = [v for v in grp["pred_out"] if v is not None]
                in_val = spec.meet(sorted(pred_outs))
            instrs_raw = grp["instrs"].iloc[0]
            instrs = [
                _norm_instr(i) for i in (instrs_raw if instrs_raw is not None else [])
            ]
            out_val = spec.transfer(int(block_id), instrs, in_val)
            out_rows.append((func_id, int(block_id), in_val, out_val))
        return pd.DataFrame(out_rows, columns=["func_id", "block_id", "in_val", "out_val"])

    # The per-round state is tiny (one row per block), so schedule each
    # superstep over a handful of partitions instead of the session's
    # shuffle default — at cluster scale the caller sizes this up; rounds
    # are latency-bound, not throughput-bound. Restored on exit.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(bsp_partitions))
    converged = False
    # None until the first round; afterwards: the previous round's merged
    # checkpoint, whose `chg` column drives the cheap convergence scan
    merged = None
    try:
        for rnd in range(max_rounds):
            # convergence: scan the checkpointed chg flags (no shuffle) —
            # round 0 always runs (frontier = all blocks)
            if merged is not None and merged.filter("chg").isEmpty():
                converged = True
                break
            # meet inputs: predecessors' out_vals of every frontier block
            pred_edges = edges.join(
                frontier.withColumnRenamed("block_id", "dst"), ["func_id", "dst"]
            )
            pred_state = pred_edges.join(
                state.select(
                    "func_id",
                    F.col("block_id").alias("src"),
                    F.col("out_val").alias("pred_out"),
                ),
                ["func_id", "src"],
                "left",
            ).select("func_id", F.col("dst").alias("block_id"), "pred_out")
            # blocks with no predecessors still need a row (meet over ∅)
            all_frontier = frontier.join(pred_state, ["func_id", "block_id"], "left")
            work = all_frontier.join(binst, ["func_id", "block_id"])

            new_vals = work.groupBy("func_id", "block_id").applyInPandas(
                kernel, schema=RESULT_SCHEMA
            )

            # merge + change detection in ONE pass (requeue only successors
            # of changed blocks — impls/src/parallel.rs:48-56); the single
            # EAGER localCheckpoint per round is the BSP superstep barrier
            # (same role as the reference's per-round collect,
            # impls/src/parallel.rs:58) and keeps lineage O(1) per round.
            merged = (
                state.join(
                    new_vals.select(
                        "func_id",
                        "block_id",
                        F.col("in_val").alias("n_in"),
                        F.col("out_val").alias("n_out"),
                    ),
                    ["func_id", "block_id"],
                    "left",
                )
                .select(
                    "func_id",
                    "block_id",
                    F.coalesce("n_in", "in_val").alias("in_val"),
                    F.coalesce("n_out", "out_val").alias("out_val"),
                    (
                        F.col("n_out").isNotNull()
                        & (F.col("n_out") != F.col("out_val"))
                    ).alias("chg"),
                )
            )
            merged = _checkpoint_fresh_stats(merged)
            state = merged.select("func_id", "block_id", "in_val", "out_val")
            # next frontier: a lazy plan over the checkpointed merged —
            # consumed exactly once (by the next round's joins inside the
            # single checkpoint action), so it needs no materialization of
            # its own; convergence is read off merged.chg instead. Two
            # driver actions per superstep total (checkpoint + chg scan).
            # Note: a changed block with NO successors yields chg rows but
            # an empty frontier — the loop then runs one no-op round whose
            # merged has chg all-false and stops; same fixpoint.
            frontier = (
                edges.join(
                    merged.filter("chg").select(
                        "func_id", F.col("block_id").alias("src")
                    ),
                    ["func_id", "src"],
                )
                .select("func_id", F.col("dst").alias("block_id"))
                .dropDuplicates(["func_id", "block_id"])
            )
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        # NOTE: binst/edges/state/merged are localCheckpoint'ed, which the
        # cache manager does not track — DataFrame.unpersist() would be a
        # no-op. Their backing RDDs are released by ContextCleaner GC once
        # the Python wrappers drop out of scope (each round's merged
        # replaces the previous reference, so at most O(1) checkpoints are
        # live per run).
    if not converged and merged is not None:
        # the final allowed round may have changed only successor-less
        # blocks: chg rows exist but the computed frontier is empty and
        # the fixpoint IS reached — don't raise spuriously
        converged = merged.filter("chg").isEmpty() or frontier.isEmpty()
    if not converged:
        raise RuntimeError(
            f"BSP fixpoint did not converge within {max_rounds} rounds "
            f"(pass={spec.name}) — raise max_rounds"
        )
    return state


# ---------------------------------------------------------------------------
# Executor 3: mixed size-threshold dispatch (impls/src/mixed.rs:32-38)
# ---------------------------------------------------------------------------

def run_mixed(
    blocks: DataFrame, edges: DataFrame, spec: Spec, threshold: int = 20
) -> DataFrame:
    """Functions with <= threshold blocks run in-task (sequential kernel);
    bigger ones run through the distributed BSP executor. Thresholds
    {10,15,20,25,30} in the reference (impls/src/passes.rs:74-78)."""
    sizes = blocks.groupBy("func_id").agg(F.count("*").alias("n_blocks"))
    small_ids = sizes.filter(F.col("n_blocks") <= threshold).select("func_id")
    big_ids = sizes.filter(F.col("n_blocks") > threshold).select("func_id")

    small = run_across_functions(
        blocks.join(small_ids, "func_id", "left_semi"),
        edges.join(small_ids, "func_id", "left_semi"),
        spec,
    )
    big_blocks = blocks.join(big_ids, "func_id", "left_semi")
    if big_blocks.isEmpty():
        return small
    big = run_bsp(big_blocks, edges.join(big_ids, "func_id", "left_semi"), spec)
    return small.unionByName(big)


# ---------------------------------------------------------------------------
# Exit values (impls/src/sequential.rs:51-58)
# ---------------------------------------------------------------------------

def exit_values(result: DataFrame, blocks: DataFrame, spec: Spec) -> DataFrame:
    """exit_val = finish(meet(out_val of exit blocks)) per function. For
    backward passes the 'exits' of the effective direction are the entry
    blocks (cfg.reverse() swaps them)."""
    flag = "is_entry" if spec.reversed else "is_exit"
    exits = blocks.filter(F.col(flag)).select("func_id", "block_id")
    outs = result.join(exits, ["func_id", "block_id"])

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        val = spec.finish(spec.meet(sorted(pdf["out_val"].tolist())))
        return pd.DataFrame({"func_id": [pdf["func_id"].iloc[0]], "exit_val": [val]})

    ev = outs.groupBy("func_id").applyInPandas(
        agg, schema="func_id string, exit_val string"
    )
    # a function with no exit blocks (e.g. an infinite loop) still gets an
    # exit_val = finish(meet(∅)) — the reference meets an empty vec there
    empty = spec.finish(spec.meet([]))
    funcs = blocks.select("func_id").distinct()
    return funcs.join(ev, "func_id", "left").select(
        "func_id", F.coalesce("exit_val", F.lit(empty)).alias("exit_val")
    )


# ---------------------------------------------------------------------------
# Pure-Python golden over a pandas program (the differential expectation —
# the role of the sequential output in impls/src/bin/test.rs:29-31)
# ---------------------------------------------------------------------------

def golden_rows(bl: pd.DataFrame, ed: pd.DataFrame, spec: Spec) -> list[tuple]:
    """Run the sequential kernel per function over pandas blocks/edges
    frames; returns sorted (func_id, block_id, in_val, out_val) tuples."""
    rows = []
    for fid, fb in bl.groupby("func_id"):
        fargs = ()
        if "fargs" in fb.columns:
            fargs = _fargs_of(fb["fargs"].iloc[0])
        blocks = fb.drop(columns=[c for c in ("func_id", "fargs") if c in fb.columns]).to_dict(
            "records"
        )
        fe = ed[ed.func_id == fid]
        edges = [(int(r.src), int(r.dst)) for r in fe.itertuples()]
        for r in sequential_kernel(spec, blocks, edges, fargs):
            rows.append((fid, r["block_id"], r["in_val"], r["out_val"]))
    return sorted(rows)
