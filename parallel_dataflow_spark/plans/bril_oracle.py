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
intersection-with-⊤) that plain recursive CTEs cannot express — those
corpus entries stay rows-only with differential coverage in
tests/test_bril_corpus.py.
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
