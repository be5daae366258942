"""Independent DuckDB oracles for the Bril-corpus dataflow fixpoints.

ReachingDefs and LiveVars are UNION-powerset analyses, so their least
fixpoints are expressible as recursive CTEs — a genuinely independent
implementation path: the Python/Spark engine iterates a worklist, the
oracle solves the same dataflow equations declaratively in SQL. Only the
*front end* (the Bril parser's block/edge/def/use relations) is shared;
the fixpoint computation under test is not.

Scope: the reference's ``core/`` corpus (53 programs). Validity argument:
a recursive CTE computes the LEAST fixpoint of the flow equations. For LV
the worklist starts at ∅ (= bottom), so lfp = worklist result
unconditionally. For RD the reference seeds out[*] of EVERY block with
init = {arg@0} (sequential.rs:23-24 + reaching_defs.rs:23-31), and a
seeded arg-def PERSISTS around any cycle none of whose blocks redefine
the arg (each cycle block's first visit reads a still-seeded or
already-retaining predecessor — schedule-independent). The converged
state therefore equals lfp(equations + seed facts), where a seed fact
puts (arg, 0) in out(b) for every block b lying on a cycle that never
kills the arg: any converged fact unwinds backward through the equations
to either the pinned entry (standard lfp) or an infinite path = such a
cycle. The generator computes those seed blocks per arg by SCC on the
kill-restricted subgraph (static graph reachability — the dataflow
fixpoint itself stays SQL-side) and validates the characterization
against the golden in tests.

Canonical output format matches operators/fixpoint.py exactly:
RD values '[["name",block],...]' sorted by (name, block); LV values
'["name",...]' sorted — both empty as '[]'.

ConstProp / AvailableExprs use non-union lattices (pointwise flat map;
intersection-with-⊤) that plain recursive CTEs cannot express — their
oracles are instead a SECOND independently-written Python evaluation
(see the bottom of this module) emitted as a VALUES relation: an
executor+spec differential in the reference's own style
(impls/src/bin/test.rs:21-70), honestly labeled as such rather than a
SQL derivation.
"""

from __future__ import annotations

import re

from parallel_dataflow_spark.sources.bril import corpus_frames

_NAME_RE = re.compile(r"^[A-Za-z0-9_./:-]+$")  # var names + func_ids; no quotes


def _sql_rows(rows: list[tuple]) -> str:
    def lit(v):
        if isinstance(v, str):
            assert _NAME_RE.match(v), f"unexpected identifier {v!r}"
            return f"'{v}'"
        return str(int(v))

    return ",".join("(" + ",".join(lit(v) for v in r) + ")" for r in rows)


def _block_use_defs(instrs: list[dict]) -> tuple[set[str], set[str]]:
    """LiveVars block summary: use = vars read before any in-block write
    (an instruction's args are read before its own dest is written);
    defs = all dests. Equivalent to live_vars.rs:24-42's reverse scan."""
    written: set[str] = set()
    use: set[str] = set()
    defs: set[str] = set()
    for ins in instrs:
        for a in ins.get("args") or []:
            if a not in written:
                use.add(a)
        d = ins.get("dest")
        if d:
            written.add(d)
            defs.add(d)
    return use, defs


def _relations(
    root: str,
    subdirs: tuple[str, ...],
    func_prefixes: tuple[str, ...] | None = None,
):
    bl, ed = corpus_frames(root, subdirs)
    if func_prefixes:
        keep = bl["func_id"].map(lambda f: f.startswith(func_prefixes))
        bl = bl[keep]
        ed = ed[ed["func_id"].map(lambda f: f.startswith(func_prefixes))]
    blocks, defs, uses, args = [], [], [], []
    for r in bl.itertuples():
        blocks.append((r.func_id, int(r.block_id)))
        use, dset = _block_use_defs(r.instrs)
        defs += [(r.func_id, int(r.block_id), n) for n in sorted(dset)]
        uses += [(r.func_id, int(r.block_id), n) for n in sorted(use)]
        if r.block_id == 0:
            args += [(r.func_id, a) for a in r.fargs]
    edges = [(r.func_id, int(r.src), int(r.dst)) for r in ed.itertuples()]
    return blocks, edges, defs, uses, args


def _arg_cycle_seeds(
    blocks: list[tuple], edges: list[tuple], defs: list[tuple], args: list[tuple]
) -> list[tuple]:
    """(func_id, block_id, arg) for every block on a cycle none of whose
    blocks define the arg — the reference's init-seeding survives there
    (see module docstring). Per-arg DFS on the kill-restricted subgraph."""
    from collections import defaultdict

    by_func_blocks = defaultdict(set)
    for f, b in blocks:
        by_func_blocks[f].add(b)
    succs = defaultdict(list)
    for f, s, d in edges:
        succs[(f, s)].append(d)
    kills = {(f, b, n) for f, b, n in defs}
    arg_by_func = defaultdict(list)
    for f, a in args:
        arg_by_func[f].append(a)

    seeds = []
    for f, anames in arg_by_func.items():
        for a in anames:
            nodes = {b for b in by_func_blocks[f] if (f, b, a) not in kills}
            # block is on a cycle iff it can reach itself within `nodes`
            on_cycle = set()
            for b in nodes:
                if b in on_cycle:
                    continue
                stack = [n for n in succs[(f, b)] if n in nodes]
                seen = set()
                while stack:
                    u = stack.pop()
                    if u == b:
                        on_cycle.add(b)
                        break
                    if u in seen:
                        continue
                    seen.add(u)
                    stack.extend(n for n in succs[(f, u)] if n in nodes)
            seeds += [(f, b, a) for b in sorted(on_cycle)]
    return seeds


def reaching_defs_oracle_sql(
    root: str = "/root/reference",
    subdirs: tuple[str, ...] = ("core",),
    func_prefixes: tuple[str, ...] | None = None,
) -> str:
    """out(b) = gen(b) ∪ (in(b) − kill(b)); in(0) = args@0 (pinned);
    in(b≠0) = ∪ out(preds) — as a recursive CTE over (block, name, def@),
    plus the init-seeding facts for no-kill cycles (module docstring).
    ``func_prefixes`` restricts the corpus to matching func_ids (used by
    the BSP / mixed-executor driver entries, which run bounded subsets)."""
    blocks, edges, defs, _uses, args = _relations(root, subdirs, func_prefixes)
    return _rd_ctes(blocks, edges, defs, args) + """
SELECT b.func_id, b.block_id,
       COALESCE(i.v, '[]') AS in_val,
       COALESCE(o.v, '[]') AS out_val
FROM blk b
LEFT JOIN inagg i ON i.func_id = b.func_id AND i.block_id = b.block_id
LEFT JOIN outagg o ON o.func_id = b.func_id AND o.block_id = b.block_id
ORDER BY b.func_id, b.block_id
"""


def reaching_defs_exit_oracle_sql(
    root: str = "/root/reference",
    subdirs: tuple[str, ...] = ("core",),
    func_prefixes: tuple[str, ...] | None = None,
) -> str:
    """exit_val = meet(out[exit blocks]) per function (RD meet = union,
    finish = identity — impls/src/sequential.rs:51-58). Exit blocks are
    those with no successors; a function with none (infinite loop) gets
    meet(∅) = '[]'. Reuses the recursive-CTE least-fixpoint for out()."""
    blocks, edges, defs, _uses, args = _relations(root, subdirs, func_prefixes)
    return _rd_ctes(blocks, edges, defs, args) + """
, exitblk AS (
    SELECT b.func_id, b.block_id FROM blk b
    WHERE NOT EXISTS (
      SELECT 1 FROM edge e
      WHERE e.func_id = b.func_id AND e.src = b.block_id)
  ),
  exitfacts AS (
    SELECT DISTINCT o.func_id, o.name, o.def_block
    FROM outv o JOIN exitblk x
      ON x.func_id = o.func_id AND x.block_id = o.block_id
  ),
  exitagg AS (
    SELECT func_id,
           '[' || string_agg('["' || name || '",' || def_block || ']', ','
                             ORDER BY name, def_block) || ']' AS v
    FROM exitfacts GROUP BY func_id
  )
SELECT f.func_id, COALESCE(x.v, '[]') AS exit_val
FROM (SELECT DISTINCT func_id FROM blk) f
LEFT JOIN exitagg x ON x.func_id = f.func_id
ORDER BY f.func_id
"""


def _rd_ctes(blocks, edges, defs, args) -> str:
    arg_rows = _sql_rows(args) if args else "('__none__','__none__')"
    seeds = _arg_cycle_seeds(blocks, edges, defs, args)
    seed_rows = _sql_rows(seeds) if seeds else "('__none__',-1,'__none__')"
    return f"""
WITH RECURSIVE
  blk(func_id, block_id) AS (VALUES {_sql_rows(blocks)}),
  edge(func_id, src, dst) AS (VALUES {_sql_rows(edges)}),
  defs(func_id, block_id, name) AS (VALUES {_sql_rows(defs)}),
  argrel(func_id, name) AS (VALUES {arg_rows}),
  seedcyc(func_id, block_id, name) AS (VALUES {seed_rows}),
  outv(func_id, block_id, name, def_block) AS (
    (
      SELECT func_id, block_id, name, block_id FROM defs
      UNION
      SELECT a.func_id, 0, a.name, 0 FROM argrel a
      WHERE a.name <> '__none__' AND NOT EXISTS (
        SELECT 1 FROM defs d
        WHERE d.func_id = a.func_id AND d.block_id = 0 AND d.name = a.name)
      UNION
      -- init-seeding retained around no-kill cycles (reference seeds
      -- out[*] with the arg-defs; see module docstring)
      SELECT func_id, block_id, name, 0 FROM seedcyc WHERE name <> '__none__'
    )
    UNION
    SELECT e.func_id, e.dst, o.name, o.def_block
    FROM outv o
    JOIN edge e ON e.func_id = o.func_id AND e.src = o.block_id
    WHERE e.dst <> 0
      AND NOT EXISTS (
        SELECT 1 FROM defs d
        WHERE d.func_id = e.func_id AND d.block_id = e.dst AND d.name = o.name)
  ),
  inv(func_id, block_id, name, def_block) AS (
    SELECT DISTINCT e.func_id, e.dst, o.name, o.def_block
    FROM outv o
    JOIN edge e ON e.func_id = o.func_id AND e.src = o.block_id
    WHERE e.dst <> 0
    UNION
    SELECT func_id, 0, name, 0 FROM argrel WHERE name <> '__none__'
  ),
  inagg AS (
    SELECT func_id, block_id,
           '[' || string_agg('["' || name || '",' || def_block || ']', ','
                             ORDER BY name, def_block) || ']' AS v
    FROM inv GROUP BY func_id, block_id
  ),
  outagg AS (
    SELECT func_id, block_id,
           '[' || string_agg('["' || name || '",' || def_block || ']', ','
                             ORDER BY name, def_block) || ']' AS v
    FROM outv GROUP BY func_id, block_id
  )"""


def live_vars_oracle_sql(
    root: str = "/root/reference",
    subdirs: tuple[str, ...] = ("core",),
    func_prefixes: tuple[str, ...] | None = None,
) -> str:
    """live-in(b) = use(b) ∪ (live-out(b) − def(b)); live-out(b) =
    ∪ live-in(succs). The engine reports the EFFECTIVE (reversed)
    orientation: in_val = live-out, out_val = live-in."""
    blocks, edges, defs, uses, _args = _relations(root, subdirs, func_prefixes)
    return f"""
WITH RECURSIVE
  blk(func_id, block_id) AS (VALUES {_sql_rows(blocks)}),
  edge(func_id, src, dst) AS (VALUES {_sql_rows(edges)}),
  defrel(func_id, block_id, name) AS (VALUES {_sql_rows(defs)}),
  userel(func_id, block_id, name) AS (VALUES {_sql_rows(uses)}),
  livein(func_id, block_id, name) AS (
    SELECT func_id, block_id, name FROM userel
    UNION
    SELECT e.func_id, e.src, l.name
    FROM livein l
    JOIN edge e ON e.func_id = l.func_id AND e.dst = l.block_id
    WHERE NOT EXISTS (
      SELECT 1 FROM defrel d
      WHERE d.func_id = e.func_id AND d.block_id = e.src AND d.name = l.name)
  ),
  liveout(func_id, block_id, name) AS (
    SELECT DISTINCT e.func_id, e.src, l.name
    FROM livein l
    JOIN edge e ON e.func_id = l.func_id AND e.dst = l.block_id
  ),
  inagg AS (
    SELECT func_id, block_id,
           '[' || string_agg('"' || name || '"', ',' ORDER BY name) || ']' AS v
    FROM liveout GROUP BY func_id, block_id
  ),
  outagg AS (
    SELECT func_id, block_id,
           '[' || string_agg('"' || name || '"', ',' ORDER BY name) || ']' AS v
    FROM livein GROUP BY func_id, block_id
  )
SELECT b.func_id, b.block_id,
       COALESCE(i.v, '[]') AS in_val,
       COALESCE(o.v, '[]') AS out_val
FROM blk b
LEFT JOIN inagg i ON i.func_id = b.func_id AND i.block_id = b.block_id
LEFT JOIN outagg o ON o.func_id = b.func_id AND o.block_id = b.block_id
ORDER BY b.func_id, b.block_id
"""


# ---------------------------------------------------------------------------
# ConstProp / AvailableExprs: non-union lattices (pointwise flat map;
# intersection-with-⊤) are NOT recursive-CTE-expressible, so their
# oracles are a SECOND, independently-written Python evaluation of the
# reference's semantics (re-derived from passes/src/const_prop.rs and
# passes/src/available_expr.rs — deliberately NOT importing
# operators/fixpoint.py's Spec classes), run over the shared parser
# output and emitted as a VALUES relation. The driver's hash check then
# differentials the Spark executors AND the engine's Spec transcription
# against this fresh transcription — the reference's own differential
# standard (impls/src/bin/test.rs:21-70) — rather than a SQL derivation.
# The FIFO schedule is replicated exactly (sequential.rs:26-48) because
# ConstProp's transfer is non-monotone and the fixpoint is
# schedule-dependent.
# ---------------------------------------------------------------------------

import json as _json

_I64_MIN, _I64_MOD = -(1 << 63), 1 << 64


def _wrap(v: int) -> int:
    return (v - _I64_MIN) % _I64_MOD + _I64_MIN


_TOP = "⊤"
_INT_BIN = {"add", "sub", "mul", "div", "eq", "lt", "gt", "le", "ge"}


def _cp_lit(ins: dict) -> str:
    v = ins.get("value")
    if ins.get("type") == "bool":
        if v in ("true", "false"):
            return v
        return "true" if int(v or 0) else "false"
    if v in ("true", "false"):
        return v
    return str(_wrap(int(v or 0)))


def _cp_fold(ins: dict, env: dict) -> str:
    """const_prop.rs:47-68 insn.fold against the block's IN env."""
    op = ins["op"]
    if op == "const":
        return _cp_lit(ins)
    args = []
    for a in ins.get("args") or []:
        c = env.get(a)
        if c is None or c == _TOP:
            return _TOP
        args.append(c)
    if op == "id" and len(args) == 1:
        return args[0]
    if op in _INT_BIN and len(args) == 2:
        if any(x in ("true", "false") for x in args):
            return _TOP
        a, b = int(args[0]), int(args[1])
        if op == "add":
            return str(_wrap(a + b))
        if op == "sub":
            return str(_wrap(a - b))
        if op == "mul":
            return str(_wrap(a * b))
        if op == "div":
            if b == 0:
                return _TOP
            q = abs(a) // abs(b)
            return str(_wrap(-q if (a < 0) != (b < 0) else q))
        r = {"eq": a == b, "lt": a < b, "gt": a > b, "le": a <= b, "ge": a >= b}[op]
        return "true" if r else "false"
    if op in ("and", "or", "not"):
        if any(x not in ("true", "false") for x in args):
            return _TOP
        bs = [x == "true" for x in args]
        if op == "not" and len(bs) == 1:
            return "true" if not bs[0] else "false"
        if len(bs) == 2:
            r = (bs[0] and bs[1]) if op == "and" else (bs[0] or bs[1])
            return "true" if r else "false"
    return _TOP


def _cp_spec():
    empty = _json.dumps({}, sort_keys=True, separators=(",", ":"))

    def init(fargs):
        return empty

    def meet(vals):
        out: dict = {}
        for v in vals:
            for k, c in _json.loads(v).items():
                if k in out and out[k] != c:
                    out[k] = _TOP
                else:
                    out.setdefault(k, c)
        return _json.dumps(out, sort_keys=True, separators=(",", ":"))

    def transfer(instrs, in_val):
        env = _json.loads(in_val)
        out = dict(env)
        for ins in instrs:
            if ins.get("dest"):
                out[ins["dest"]] = _cp_fold(ins, env)
        return _json.dumps(out, sort_keys=True, separators=(",", ":"))

    return init, init, meet, transfer  # entry == init


_AE_FULL = '"FULL"'
_AE_PURE = {"add", "sub", "mul", "div", "eq", "lt", "gt", "le", "ge", "and", "or", "not", "id"}


def _ae_spec():
    """available_expr.rs: ⊤ = Set::Full; entry = empty; meet = ∩ with
    Full absorbing; transfer inserts every pure expr ("op a1 a2"; consts
    keyed by literal) then kills exprs referencing the written dest."""

    def init(fargs):
        return _AE_FULL

    def entry(fargs):
        return _json.dumps([], separators=(",", ":"))

    def meet(vals):
        sets = [set(_json.loads(v)) for v in vals if v != _AE_FULL]
        if not sets:
            return _AE_FULL
        out = set.intersection(*sets)
        return _json.dumps(sorted(out), separators=(",", ":"))

    def key_of(ins):
        op = ins["op"]
        if op == "const":
            v = ins.get("value")
            if v is None:
                return "0"
            if ins.get("type") == "bool" and v not in ("true", "false"):
                return "true" if int(v) else "false"
            return str(v)
        if op in _AE_PURE:
            return " ".join([op] + list(ins.get("args") or []))
        return None

    def transfer(instrs, in_val):
        if in_val == _AE_FULL:
            return _AE_FULL
        avail = set(_json.loads(in_val))
        for ins in instrs:
            k = key_of(ins)
            if k is not None:
                avail.add(k)
            d = ins.get("dest")
            if d:
                avail = {e for e in avail if d not in e.split(" ")[1:]}
        return _json.dumps(sorted(avail), separators=(",", ":"))

    return init, entry, meet, transfer


def _fifo_rows(root: str, subdirs: tuple[str, ...], spec_fn) -> list[tuple]:
    """Exact sequential.rs:26-48 FIFO schedule per function: seed 0..n,
    pop front, meet(sorted preds), skip-transfer-on-unchanged-IN
    (schedule-preserving), push_back sorted successors on OUT change."""
    from collections import deque

    init, entry, meet, transfer = spec_fn()
    bl, ed = corpus_frames(root, subdirs)
    rows = []
    edges_by_func: dict = {}
    for r in ed.itertuples():
        edges_by_func.setdefault(r.func_id, []).append((int(r.src), int(r.dst)))
    for fid, fb in bl.groupby("func_id"):
        fargs = tuple(fb["fargs"].iloc[0] or ())
        instrs = {
            int(r.block_id): [dict(i) for i in r.instrs] for r in fb.itertuples()
        }
        ids = sorted(instrs)
        preds: dict = {b: [] for b in ids}
        succs: dict = {b: [] for b in ids}
        for s, d in edges_by_func.get(fid, []):
            succs[s].append(d)
            preds[d].append(s)
        in_vals = {b: init(fargs) for b in ids}
        out_vals = {b: init(fargs) for b in ids}
        wl = deque(ids)
        prev_in: dict = {}
        guard = 0
        while wl:
            guard += 1
            assert guard < 5_000_000, f"{fid}: oracle fixpoint did not terminate"
            b = wl.popleft()
            if b == 0:
                in_vals[b] = entry(fargs)
            else:
                in_vals[b] = meet([out_vals[p] for p in sorted(preds[b])])
            if prev_in.get(b) == in_vals[b]:
                continue
            prev_in[b] = in_vals[b]
            new_out = transfer(instrs[b], in_vals[b])
            if new_out != out_vals[b]:
                out_vals[b] = new_out
                wl.extend(sorted(succs[b]))
        rows += [(fid, b, in_vals[b], out_vals[b]) for b in ids]
    return sorted(rows)


def _values_oracle(rows: list[tuple]) -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ",\n  ".join(
        f"({q(f)}, {b}, {q(i)}, {q(o)})" for f, b, i, o in rows
    )
    return f"""
SELECT func_id, block_id, in_val, out_val
FROM (VALUES
  {vals}
) t(func_id, block_id, in_val, out_val)
ORDER BY func_id, block_id
"""


def const_prop_oracle_sql(
    root: str = "/root/reference", subdirs: tuple[str, ...] = ("core",)
) -> str:
    """Independent ConstProp evaluation (fresh transcription of
    const_prop.rs — _cp_fold/_cp_spec above, no fixpoint.py imports)
    emitted as VALUES. An executor+spec differential, not a SQL
    derivation: the pointwise flat-map lattice has no recursive-CTE
    encoding (set-semantics union only)."""
    return _values_oracle(_fifo_rows(root, subdirs, _cp_spec))


def available_exprs_oracle_sql(
    root: str = "/root/reference", subdirs: tuple[str, ...] = ("core",)
) -> str:
    """Independent AvailableExprs evaluation (fresh transcription of
    available_expr.rs — _ae_spec above) emitted as VALUES; see
    const_prop_oracle_sql for the framing."""
    return _values_oracle(_fifo_rows(root, subdirs, _ae_spec))
