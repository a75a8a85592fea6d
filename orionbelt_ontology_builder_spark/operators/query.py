"""Basic-graph-pattern (BGP) matching — the SPARQL-shaped query core.

The reference exposes fixed views (classes, properties, search,
relations — ``ontology_manager.py`` read API); a KG at web scale needs
ad-hoc conjunctive queries.  :func:`match_bgp` evaluates a list of
triple patterns with ``?var`` slots as a chain of DataFrame joins —
each pattern is a filtered projection of the triples scan, shared
variables become equi-join keys, and Catalyst/AQE pick the physical
join strategy and runtime reorder.  This is exactly how SPARQL engines
on relational backends compile BGPs (public literature: SPARQL-to-SQL
semantics-preserving translation), expressed Spark-first.

Scale shape: constant slots are pushed into the parquet scan as
filters (one pass per pattern, predicate pushdown visible in
``explain``); every join is an equi-join on binding columns.  Highly
selective patterns (rdf:type on a rare class) shrink early; AQE
converts small sides to broadcasts at runtime.  No driver-side
evaluation, no cartesian unless two patterns genuinely share no
variable (allowed, flagged in the docstring contract).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["match_bgp", "match_bgp_sql", "select_agg", "select_agg_sql"]

_SLOTS = ("subj", "pred", "obj")


def _is_var(slot: str) -> bool:
    return slot.startswith("?")


def _pattern_df(triples: DataFrame, pattern) -> DataFrame:
    """One pattern -> distinct bindings DataFrame (a column per var)."""
    df = triples
    out_cols: dict[str, str] = {}  # var name -> first slot bound
    for slot_val, col in zip(pattern, _SLOTS):
        if _is_var(slot_val):
            var = slot_val[1:]
            if var in out_cols:
                # repeated var inside one pattern: equality constraint
                df = df.filter(F.col(col) == F.col(out_cols[var]))
            else:
                out_cols[var] = col
        else:
            df = df.filter(F.col(col) == slot_val)
    if not out_cols:
        raise ValueError("pattern binds no variables")
    return df.select(
        *[F.col(c).alias(v) for v, c in out_cols.items()]
    ).distinct()


def _bgp_df(triples: DataFrame, patterns) -> DataFrame:
    """Inner join chain over the patterns (no final projection)."""
    result = _pattern_df(triples, patterns[0])
    for pat in patterns[1:]:
        part = _pattern_df(triples, pat)
        shared = sorted(set(result.columns) & set(part.columns))
        result = (
            result.join(part, shared) if shared else result.crossJoin(part)
        )
    return result


def _bindings_df(
    triples: DataFrame, patterns, optional=None, minus=None, filters=None,
    exists=None,
) -> DataFrame:
    """Required BGP -> OPTIONAL left joins -> MINUS anti joins ->
    EXISTS semi joins -> FILTERs, in SPARQL algebra order.  Shared
    helper for the SELECT and aggregate entry points.

    ``exists``: pattern groups that must have at least one compatible
    solution (SPARQL FILTER EXISTS) — the positive dual of ``minus``,
    compiled to a ``left_semi`` join against the group's distinct
    shared-variable projection (broadcast-able when selective, and the
    probe side never widens — a semi join emits each binding at most
    once, so no fan-out however many witnesses exist)."""
    if not patterns:
        raise ValueError("empty BGP")
    result = _bgp_df(triples, patterns)
    for group in optional or []:
        part = _bgp_df(triples, group)
        shared = sorted(set(result.columns) & set(part.columns))
        if not shared:
            raise ValueError("OPTIONAL group shares no variable")
        result = result.join(part, shared, "left")
    for group in minus or []:
        part = _bgp_df(triples, group)
        shared = sorted(set(result.columns) & set(part.columns))
        if not shared:
            raise ValueError("MINUS group shares no variable")
        result = result.join(
            part.select(*shared).distinct(), shared, "left_anti"
        )
    for group in exists or []:
        part = _bgp_df(triples, group)
        shared = sorted(set(result.columns) & set(part.columns))
        if not shared:
            raise ValueError("EXISTS group shares no variable")
        result = result.join(
            part.select(*shared).distinct(), shared, "left_semi"
        )
    for f in filters or []:
        result = result.filter(F.expr(f))
    return result


def _values_df(triples: DataFrame, values) -> DataFrame:
    """(vars, rows) inline binding table -> small DataFrame (SPARQL
    VALUES; no UNDEF support — every row binds every listed var)."""
    vars_, rows = values
    return triples.sparkSession.createDataFrame(
        [tuple(r) for r in rows], list(vars_)
    ).distinct()


def _order_exprs(cols, order_by):
    """Sort columns for an ``order_by`` spec (["-var", "var", ...];
    leading '-' = DESC).  Unnamed columns are appended ascending so the
    order stays TOTAL — pagination (OFFSET/LIMIT) would otherwise be
    nondeterministic under ties."""
    if not order_by:
        return [F.col(c) for c in cols], set()
    keyed, named = [], set()
    for o in order_by:
        if o.startswith("-"):
            keyed.append(F.col(o[1:]).desc())
            named.add(o[1:])
        else:
            keyed.append(F.col(o).asc())
            named.add(o)
    keyed += [F.col(c) for c in cols if c not in named]
    return keyed, named


def match_bgp(
    triples: DataFrame,
    patterns,
    optional=None,
    filters=None,
    minus=None,
    values=None,
    limit=None,
    exists=None,
    bind=None,
    order_by=None,
    offset=None,
) -> DataFrame:
    """Evaluate a conjunction of (s, p, o) patterns; ``?name`` slots
    are variables, everything else matches exactly.  Returns the
    distinct variable bindings, one column per variable, ordered by
    the sorted variable names (deterministic).

    ``optional``: a list of pattern *groups*; each group is evaluated
    as its own BGP and LEFT-joined on the shared variables (SPARQL
    OPTIONAL — unmatched rows keep the required bindings with nulls).
    ``minus``: pattern groups whose solutions REMOVE compatible
    bindings (SPARQL MINUS / FILTER NOT EXISTS on the shared-variable
    subset) — compiled to a ``left_anti`` join against the group's
    distinct shared-variable projection, so the negation side shrinks
    to its key set before the probe (broadcast-able when selective).
    ``filters``: SQL boolean expressions over the variable columns,
    applied after all joins (SPARQL FILTER); written in the common
    Spark/ANSI subset they run identically on the DuckDB twin.

    ``values``: a ``(vars, rows)`` inline binding table (SPARQL
    VALUES) inner-joined on its variables — compiled to a broadcast
    hash join, i.e. the constant table *restricts the scan* instead of
    filtering post-hoc.  ``limit``: top-k bindings under the total
    variable-name order (SPARQL LIMIT; deterministic because the sort
    covers every column).

    ``exists``: pattern groups kept only when at least one compatible
    solution exists (SPARQL FILTER EXISTS — compiled to ``left_semi``,
    the positive dual of ``minus``).  ``bind``: an ``{alias: SQL
    expression}`` map of computed columns over the variable bindings
    (SPARQL BIND), written in the common Spark/ANSI subset; bind
    columns join the output projection and the total order.

    ``order_by``: SPARQL ORDER BY — a list of variable names, leading
    ``-`` for DESC; remaining variables are appended ascending so the
    order is total and OFFSET pagination deterministic.  ``offset``:
    SPARQL OFFSET — skip the first n solutions (apply with ``limit``
    for pages; Catalyst folds sort+offset+limit into one global
    top-(offset+limit), no full sort materialization).

    Patterns sharing no variable with the accumulated bindings produce
    a cross join (the SPARQL product semantics) — intentional, but at
    scale order your patterns so each one connects."""
    result = _bindings_df(
        triples, patterns, optional, minus, filters, exists
    )
    if values is not None:
        v = _values_df(triples, values)
        shared = sorted(set(result.columns) & set(v.columns))
        if not shared:
            raise ValueError("VALUES shares no variable")
        result = result.join(F.broadcast(v), shared)
    for alias, expr in (bind or {}).items():
        result = result.withColumn(alias, F.expr(expr))
    cols = sorted(result.columns)
    keyed, _ = _order_exprs(cols, order_by)
    out = result.select(*cols).distinct().orderBy(*keyed)
    # SPARQL ORDER BY / OFFSET / LIMIT pagination: OFFSET skips first.
    # Catalyst plans orderBy+offset+limit as ONE TakeOrdered-style
    # global top-(offset+limit) — no full sort materialization.
    if offset:
        out = out.offset(offset)
    return out.limit(limit) if limit is not None else out


def match_union(triples: DataFrame, groups, limit=None) -> DataFrame:
    """SPARQL UNION: each group is an independent BGP; solution sets
    concatenate with variables unbound in an arm left NULL
    (``unionByName(allowMissingColumns=True)``).  Set semantics like
    :func:`match_bgp` (DISTINCT), deterministic total order.

    Scale shape: every arm keeps its own join tree — no arm pays for
    another's patterns — and the union itself is a zero-shuffle
    concatenation of the arm outputs; the only shuffle after the arms
    is the final distinct over the (projected, narrow) binding set."""
    if not groups:
        raise ValueError("empty UNION")
    out = None
    for g in groups:
        arm = _bindings_df(triples, g, None, None, None, None)
        out = arm if out is None else out.unionByName(
            arm, allowMissingColumns=True
        )
    cols = sorted(out.columns)
    res = out.select(*cols).distinct().orderBy(*cols)
    return res.limit(limit) if limit is not None else res


def select_agg(
    triples: DataFrame,
    patterns,
    group_by,
    aggs,
    having=None,
    optional=None,
    filters=None,
    minus=None,
    exists=None,
) -> DataFrame:
    """SPARQL ``SELECT ... GROUP BY ... HAVING`` over the binding set:
    evaluate the group pattern (required + OPTIONAL + MINUS + FILTER),
    then one hash aggregation keyed on ``group_by`` with each
    ``aggs[alias]`` expression (count/sum/min/max/avg over variable
    columns, common Spark/ANSI subset).  Aggregates are computed over
    the *distinct* binding set (each pattern projection is distinct,
    so the join result is already a set — documented semantics shared
    with the DuckDB twin).

    Scale shape: the aggregation shuffles only (group keys, partials) —
    map-side combine applies; ``having`` filters the (small) grouped
    result, never the binding stream."""
    if not group_by:
        raise ValueError("empty GROUP BY")
    b = _bindings_df(triples, patterns, optional, minus, filters, exists)
    out = b.groupBy(*group_by).agg(
        *[F.expr(e).alias(a) for a, e in aggs.items()]
    )
    if having:
        out = out.filter(F.expr(having))
    return out.orderBy(*group_by)


def _bgp_parts(patterns, prefix: str):
    parts = []
    for i, pattern in enumerate(patterns):
        wheres, sels = [], {}
        for slot_val, col in zip(pattern, _SLOTS):
            if _is_var(slot_val):
                var = slot_val[1:]
                if var in sels:
                    wheres.append(f"{col} = {sels[var]}")
                else:
                    sels[var] = col
            else:
                wheres.append(f"{col} = '{slot_val}'")
        sel = ", ".join(f"{c} AS {v}" for v, c in sels.items())
        cond = (" WHERE " + " AND ".join(wheres)) if wheres else ""
        parts.append(
            (f"(SELECT DISTINCT {sel} FROM triples{cond}) {prefix}{i}",
             set(sels))
        )
    return parts


def _bgp_join_sql(patterns, prefix: str):
    """FROM-clause join chain + the variable set it binds."""
    parts = _bgp_parts(patterns, prefix)
    joins = [parts[0][0]]
    seen = set(parts[0][1])
    for i in range(1, len(parts)):
        sub, vs = parts[i]
        shared = sorted(seen & vs)
        if shared:
            joins.append(f"JOIN {sub} USING ({', '.join(shared)})")
        else:
            joins.append(f"CROSS JOIN {sub}")
        seen |= vs
    return "\n".join(joins), seen


def _bindings_sql(
    patterns, optional=None, minus=None, filters=None, exists=None
):
    """(FROM-chain, WHERE-clause, bound-vars) for the binding set —
    shared by the SELECT and aggregate DuckDB twins."""
    frm, seen = _bgp_join_sql(patterns, "p")
    for gi, group in enumerate(optional or []):
        gfrm, gvars = _bgp_join_sql(group, f"o{gi}_")
        shared = sorted(seen & gvars)
        gsel = ", ".join(sorted(gvars))
        frm += (
            f"\nLEFT JOIN (SELECT DISTINCT {gsel} FROM {gfrm}) g{gi}"
            f" USING ({', '.join(shared)})"
        )
        seen |= gvars
    conds = [f"({f})" for f in (filters or [])]
    where = ("WHERE " + " AND ".join(conds) + "\n") if conds else ""
    # MINUS / EXISTS conditions must correlate with the *outer* binding
    # row, so they are emitted against an explicit ``__bind`` CTE alias
    # (inside the [NOT] EXISTS subquery an unqualified var would resolve
    # to the subquery's own FROM and short-circuit the correlation).
    mconds = []
    for mi, group in enumerate(minus or []):
        mfrm, mvars = _bgp_join_sql(group, f"m{mi}_")
        shared = sorted(seen & mvars)
        if not shared:
            raise ValueError("MINUS group shares no variable")
        msel = ", ".join(shared)
        on = " AND ".join(f"mm{mi}.{v} = __bind.{v}" for v in shared)
        mconds.append(
            f"NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT {msel}"
            f" FROM {mfrm}) mm{mi} WHERE {on})"
        )
    for ei, group in enumerate(exists or []):
        efrm, evars = _bgp_join_sql(group, f"e{ei}_")
        shared = sorted(seen & evars)
        if not shared:
            raise ValueError("EXISTS group shares no variable")
        esel = ", ".join(shared)
        on = " AND ".join(f"ee{ei}.{v} = __bind.{v}" for v in shared)
        mconds.append(
            f"EXISTS (SELECT 1 FROM (SELECT DISTINCT {esel}"
            f" FROM {efrm}) ee{ei} WHERE {on})"
        )
    return frm, where, mconds, seen


def _values_sql(values) -> tuple[str, set]:
    vars_, rows = values
    def q(x):
        return "'" + str(x).replace("'", "''") + "'"
    body = ", ".join("(" + ", ".join(q(c) for c in r) + ")" for r in rows)
    return (
        f"(SELECT DISTINCT * FROM (VALUES {body})"
        f" __v({', '.join(vars_)})) v",
        set(vars_),
    )


def match_bgp_sql(
    triples_cte: str,
    patterns,
    optional=None,
    filters=None,
    minus=None,
    values=None,
    limit=None,
    exists=None,
    bind=None,
    order_by=None,
    offset=None,
) -> str:
    """DuckDB twin: the mechanical SPARQL-to-SQL translation — one
    subquery per pattern, JOIN USING on shared vars, OPTIONAL groups
    as LEFT JOIN sub-selects, MINUS / EXISTS groups as correlated
    NOT EXISTS / EXISTS on the shared variables, VALUES as an
    inline-table join, FILTERs in the outer WHERE, BIND expressions
    as computed projection columns, LIMIT after the total ORDER BY."""
    frm, where, mconds, seen = _bindings_sql(
        patterns, optional, minus, filters, exists
    )
    if values is not None:
        vsql, vvars = _values_sql(values)
        shared = sorted(seen & vvars)
        if not shared:
            raise ValueError("VALUES shares no variable")
        frm += f"\nJOIN {vsql} USING ({', '.join(shared)})"
        seen |= vvars
    allvars = sorted(seen)
    outcols = sorted(set(allvars) | set((bind or {}).keys()))

    def _sel(cols):
        b = bind or {}
        return ", ".join(f"{b[c]} AS {c}" if c in b else c for c in cols)

    lim = f"\nLIMIT {limit}" if limit is not None else ""
    if offset:
        lim += f"\nOFFSET {offset}"
    if order_by:
        keyed = [
            (f"{o[1:]} DESC" if o.startswith("-") else o) for o in order_by
        ]
        named = {o.lstrip("-") for o in order_by}
        order = ", ".join(keyed + [c for c in outcols if c not in named])
    else:
        order = ", ".join(outcols)
    if not mconds:
        return f"""{triples_cte}
SELECT DISTINCT {_sel(outcols)}
FROM {frm}
{where}ORDER BY {order}{lim}
"""
    return f"""{triples_cte},
__bind AS (
SELECT DISTINCT {", ".join(allvars)}
FROM {frm}
{where})
SELECT DISTINCT {_sel(outcols)}
FROM __bind
WHERE {" AND ".join(mconds)}
ORDER BY {order}{lim}
"""


def match_union_sql(triples_cte: str, groups, limit=None) -> str:
    """DuckDB twin of :func:`match_union`: one sub-select per arm with
    NULL-padded unbound variables, combined with SQL UNION (distinct)."""
    arms = []
    for gi, g in enumerate(groups):
        frm, where, mconds, seen = _bindings_sql(g)
        assert not mconds
        arms.append((frm, where, seen))
    allvars = sorted(set().union(*(s for _, _, s in arms)))
    sels = []
    for frm, where, seen in arms:
        proj = ", ".join(
            v if v in seen else f"CAST(NULL AS VARCHAR) AS {v}"
            for v in allvars
        )
        sels.append(f"SELECT DISTINCT {proj}\nFROM {frm}\n{where}")
    body = "\nUNION\n".join(sels)
    lim = f"\nLIMIT {limit}" if limit is not None else ""
    return f"""{triples_cte}
SELECT * FROM (
{body}
) __u
ORDER BY {", ".join(allvars)}{lim}
"""


def select_agg_sql(
    triples_cte: str,
    patterns,
    group_by,
    aggs,
    having=None,
    optional=None,
    filters=None,
    minus=None,
    exists=None,
) -> str:
    """DuckDB twin of :func:`select_agg` — aggregate over the distinct
    binding set (identical semantics: the binding CTE is DISTINCT)."""
    frm, where, mconds, seen = _bindings_sql(
        patterns, optional, minus, filters, exists
    )
    allvars = sorted(seen)
    sels = ", ".join(
        list(group_by) + [f"{e} AS {a}" for a, e in aggs.items()]
    )
    hav = f"HAVING {having}\n" if having else ""
    keys = ", ".join(group_by)
    src = "__bind"
    if mconds:
        src = (
            f"(SELECT * FROM __bind WHERE "
            f"{' AND '.join(mconds)}) __kept"
        )
    return f"""{triples_cte},
__bind AS (
SELECT DISTINCT {", ".join(allvars)}
FROM {frm}
{where})
SELECT {sels}
FROM {src}
GROUP BY {keys}
{hav}ORDER BY {keys}
"""


# --------------------------------------------------------------------------
# property paths
# --------------------------------------------------------------------------


def _step_edges(triples: DataFrame, step) -> DataFrame:
    """One path step -> (src, dst) edge set.

    Step grammar (SPARQL property-path subset):
      * ``"pred"``      — forward edge
      * ``"^pred"``     — inverse edge
      * ``"pred+"``     — transitive closure (1 or more hops)
      * ``"pred*"``     — reflexive-transitive closure (0 or more)
      * ``"pred?"``     — zero or one hop
      * ``["a", "b"]``  — alternation (union of the member steps)
      * ``"!a|b"``      — negated property set (any FORWARD edge whose
        predicate is not one of the listed IRIs; SPARQL ``!(a|b)``)
      * ``"pred{n,m}"`` / ``"pred{n}"`` — bounded repetition (n..m
        hops, unrolled compositions; n=0 adds the identity relation)

    Zero-length semantics (``*`` / ``?``): the identity pair (n, n)
    for every term occurring in the graph (subject or object of any
    triple) — the standalone-evaluation reading of SPARQL's
    zero-length path, documented engine contract.
    """
    from .fixpoint import transitive_closure

    if isinstance(step, (list, tuple)):
        parts = [_step_edges(triples, s) for s in step]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()
    if step.startswith("!"):
        # negated property set: one scan with a NOT IN filter (still
        # pushed down); never a join against the predicate vocabulary
        banned = step[1:].split("|")
        return (
            triples.filter(~F.col("pred").isin(banned))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
    rep = re.match(r"^(.+)\{(\d+)(?:,(\d+))?\}$", step)
    if rep:
        # bounded repetition: unrolled hop compositions (distinct after
        # each hop keeps the relation |pairs|-sized, never |paths|)
        lo = int(rep.group(2))
        hi = int(rep.group(3)) if rep.group(3) is not None else lo
        if hi < lo or hi < 1:
            raise ValueError(f"bad repetition bounds in {step!r}")
        base = _step_edges(triples, rep.group(1))
        # disjoint column names per join side: the composed relation and
        # the base share lineage, so qualified-by-name refs are ambiguous
        hop = base.select(
            F.col("src").alias("mid"), F.col("dst").alias("ndst")
        )
        cur, out = base, (base if lo <= 1 else None)
        for h in range(2, hi + 1):
            cur = (
                cur.join(hop, F.col("dst") == F.col("mid"))
                .select("src", F.col("ndst").alias("dst"))
                .distinct()
            )
            if h >= lo:
                out = cur if out is None else out.unionByName(cur)
        if lo == 0:
            nodes = (
                triples.select(F.col("subj").alias("n"))
                .unionByName(triples.select(F.col("obj").alias("n")))
                .distinct()
            )
            ident = nodes.select(
                F.col("n").alias("src"), F.col("n").alias("dst")
            )
            out = ident if out is None else out.unionByName(ident)
        return out.distinct()
    closure = step.endswith("+")
    star = step.endswith("*")
    opt = step.endswith("?")
    pred = step[:-1] if (closure or star or opt) else step
    inverse = pred.startswith("^")
    pred = pred[1:] if inverse else pred
    s, d = ("obj", "subj") if inverse else ("subj", "obj")
    edges = triples.filter(F.col("pred") == pred).select(
        F.col(s).alias("src"), F.col(d).alias("dst")
    ).distinct()
    if closure:
        return transitive_closure(edges)
    if star or opt:
        nodes = (
            triples.select(F.col("subj").alias("n"))
            .unionByName(triples.select(F.col("obj").alias("n")))
            .distinct()
        )
        ident = nodes.select(
            F.col("n").alias("src"), F.col("n").alias("dst")
        )
        base = transitive_closure(edges) if star else edges
        return base.unionByName(ident).distinct()
    return edges


def eval_path(triples: DataFrame, path) -> DataFrame:
    """(src, dst) pairs connected by the sequence of path steps —
    SPARQL property-path evaluation as a chain of equi-joins, with
    ``+``-closures delegated to the O(log D) doubling fixpoint.

    Scale shape: each step is a predicate-sliced scan (filter pushed
    down); the hop composition joins dst→src with distinct after each
    hop to keep the relation a set (prevents path-multiplicity blowup
    on diamond graphs — the join stays |pairs|, not |paths|)."""
    if not path:
        raise ValueError("empty path")
    result = _step_edges(triples, path[0])
    for step in path[1:]:
        nxt = _step_edges(triples, step).withColumnRenamed(
            "src", "mid"
        )
        result = (
            result.join(nxt, result["dst"] == nxt["mid"])
            .select(result["src"], nxt["dst"])
            .distinct()
        )
    return result.orderBy("src", "dst")


def eval_path_sql(triples_cte: str, path) -> str:
    """DuckDB twin (closures as recursive CTEs, hops as joins)."""
    steps_sql = []
    for i, step in enumerate(path):
        name = f"step{i}"
        if isinstance(step, (list, tuple)):
            members = []
            for s in step:
                inv = s.startswith("^")
                p = s[1:] if inv else s
                a, b = ("obj", "subj") if inv else ("subj", "obj")
                members.append(
                    f"SELECT DISTINCT {a} AS src, {b} AS dst"
                    f" FROM triples WHERE pred = '{p}'"
                )
            steps_sql.append(f"{name} AS ({' UNION '.join(members)})")
            continue
        if step.startswith("!"):
            banned = ", ".join(f"'{p}'" for p in step[1:].split("|"))
            steps_sql.append(
                f"{name} AS (SELECT DISTINCT subj AS src, obj AS dst"
                f" FROM triples WHERE pred NOT IN ({banned}))"
            )
            continue
        rep = re.match(r"^(.+)\{(\d+)(?:,(\d+))?\}$", step)
        if rep:
            lo = int(rep.group(2))
            hi = int(rep.group(3)) if rep.group(3) is not None else lo
            p = rep.group(1)
            inv = p.startswith("^")
            p = p[1:] if inv else p
            a, b = ("obj", "subj") if inv else ("subj", "obj")
            steps_sql.append(
                f"{name}_base AS (SELECT DISTINCT {a} AS src, {b} AS dst"
                f" FROM triples WHERE pred = '{p}')"
            )
            arms = []
            for h in range(max(lo, 1), hi + 1):
                joins = " ".join(
                    f"JOIN {name}_base e{j} ON e{j - 1}.dst = e{j}.src"
                    for j in range(2, h + 1)
                )
                arms.append(
                    f"SELECT DISTINCT e1.src, e{h}.dst"
                    f" FROM {name}_base e1 {joins}"
                )
            if lo == 0:
                arms.append(
                    "SELECT DISTINCT n AS src, n AS dst FROM ("
                    "SELECT subj AS n FROM triples"
                    " UNION SELECT obj FROM triples)"
                )
            steps_sql.append(f"{name} AS ({' UNION '.join(arms)})")
            continue
        closure = step.endswith("+")
        star = step.endswith("*")
        opt = step.endswith("?")
        p = step[:-1] if (closure or star or opt) else step
        inv = p.startswith("^")
        p = p[1:] if inv else p
        a, b = ("obj", "subj") if inv else ("subj", "obj")
        base = (
            f"SELECT DISTINCT {a} AS src, {b} AS dst"
            f" FROM triples WHERE pred = '{p}'"
        )
        ident = (
            "SELECT DISTINCT n AS src, n AS dst FROM ("
            "SELECT subj AS n FROM triples"
            " UNION SELECT obj FROM triples)"
        )
        if closure or star:
            rec = f"""WITH RECURSIVE r(src, dst) AS (
    {base}
    UNION
    SELECT r.src, e.dst FROM r
      JOIN ({base}) e ON r.dst = e.src)
  SELECT * FROM r"""
            if star:
                rec += f" UNION {ident}"
            steps_sql.append(f"{name} AS (\n  {rec})")
        elif opt:
            steps_sql.append(f"{name} AS ({base} UNION {ident})")
        else:
            steps_sql.append(f"{name} AS ({base})")
    frm = ["step0"]
    for i in range(1, len(path)):
        frm.append(f"JOIN step{i} ON step{i - 1}.dst = step{i}.src")
    last = f"step{len(path) - 1}"
    return f"""{triples_cte},
{",".join(steps_sql)}
SELECT DISTINCT step0.src AS src, {last}.dst AS dst
FROM {chr(10).join(frm)}
ORDER BY src, dst
"""


# --------------------------------------------------------------------------
# CONSTRUCT-style rule materialization
# --------------------------------------------------------------------------


def construct(triples: DataFrame, patterns, template) -> DataFrame:
    """SPARQL-CONSTRUCT / Datalog-rule materialization: evaluate the
    BGP ``patterns``, then instantiate each ``template`` entry
    (s, p, o, obj_kind) — ``?var`` slots substituted from the
    bindings, everything else constant — and return the distinct new
    triples (subj, pred, obj, obj_kind).

    One rule application = one BGP evaluation + a union of cheap
    projections; iterating rules to fixpoint is the semi-naive loop
    the reasoning module already implements for its RDFS subset —
    this operator is the user-definable-rule generalization.

    Scale shape: inherits match_bgp's join plan; template
    instantiation adds zero shuffles (pure projections + one distinct
    keyed on the emitted triple)."""
    bindings = match_bgp(triples, patterns)

    def _slot(v):
        return (
            F.col(v[1:]) if isinstance(v, str) and v.startswith("?")
            else F.lit(v)
        )

    parts = [
        bindings.select(
            _slot(s).alias("subj"),
            _slot(p).alias("pred"),
            _slot(o).alias("obj"),
            F.lit(kind).alias("obj_kind"),
        )
        for s, p, o, kind in template
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.distinct().orderBy("subj", "pred", "obj")


def construct_sql(triples_cte: str, patterns, template) -> str:
    """DuckDB twin: the BGP select feeding one projection per
    template entry, UNION'd."""
    bgp = match_bgp_sql(triples_cte, patterns)
    # keep only the top-level SELECT (everything after the passed CTE),
    # minus its trailing ORDER BY: it feeds the bindings CTE
    body = bgp[len(triples_cte):]
    body = body[: body.rindex("ORDER BY")]

    def _slot(v):
        return v[1:] if isinstance(v, str) and v.startswith("?") else f"'{v}'"

    projs = [
        f"SELECT {_slot(s)} AS subj, {_slot(p)} AS pred,"
        f" {_slot(o)} AS obj, '{kind}' AS obj_kind FROM bindings"
        for s, p, o, kind in template
    ]
    return f"""{triples_cte},
bindings AS MATERIALIZED ({body})
SELECT DISTINCT subj, pred, obj, obj_kind
FROM ({" UNION ALL ".join(projs)})
ORDER BY subj, pred, obj
"""


# --------------------------------------------------------------------------
# incremental (semi-naive) rule maintenance
# --------------------------------------------------------------------------


def construct_delta(
    triples: DataFrame, delta: DataFrame, patterns, template
) -> DataFrame:
    """Conclusions of the CONSTRUCT rule that involve at least one
    ``delta`` triple — the semi-naive increment: for each pattern
    position i, evaluate the BGP with pattern i bound to ``delta``
    and the rest to the full graph, and union the instantiations.

    This is how materialized rule views stay fresh at 10^12-triple
    scale: a day's crawl delta is orders of magnitude smaller than the
    accumulated graph, and every BGP join in the union is anchored on
    the small delta side (AQE broadcasts it), so incremental
    maintenance costs O(|delta| x join fanout), never a full
    re-derivation.  Classic semi-naive Datalog evaluation (public
    literature), in DataFrame algebra.

    Law (tested): construct(old + delta) == construct(old) UNION
    construct_delta(old + delta, delta) when ``triples`` is the
    already-updated graph."""
    outs = []
    for i in range(len(patterns)):
        bindings = _bgp_df(delta, [patterns[i]])
        for j, pat in enumerate(patterns):
            if j == i:
                continue
            part = _pattern_df(triples, pat)
            shared = sorted(set(bindings.columns) & set(part.columns))
            bindings = (
                bindings.join(part, shared)
                if shared
                else bindings.crossJoin(part)
            )
        outs.append(bindings)

    def _slot(v):
        return (
            F.col(v[1:]) if isinstance(v, str) and v.startswith("?")
            else F.lit(v)
        )

    parts = [
        b.select(
            _slot(s).alias("subj"),
            _slot(p).alias("pred"),
            _slot(o).alias("obj"),
            F.lit(kind).alias("obj_kind"),
        )
        for b in outs
        for s, p, o, kind in template
    ]
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.distinct().orderBy("subj", "pred", "obj")


def _pattern_part_sql(pattern, src: str, alias: str):
    wheres, sels = [], {}
    for slot_val, col in zip(pattern, _SLOTS):
        if _is_var(slot_val):
            var = slot_val[1:]
            if var in sels:
                wheres.append(f"{col} = {sels[var]}")
            else:
                sels[var] = col
        else:
            wheres.append(f"{col} = '{slot_val}'")
    sel = ", ".join(f"{c} AS {v}" for v, c in sels.items())
    cond = (" WHERE " + " AND ".join(wheres)) if wheres else ""
    return f"(SELECT DISTINCT {sel} FROM {src}{cond}) {alias}", set(sels)


def construct_delta_sql(
    triples_cte: str, delta_cte: str, patterns, template
) -> str:
    """DuckDB twin of :func:`construct_delta`.  ``delta_cte`` is a
    WITH-clause body defining relation ``delta`` (a subset of
    ``triples``)."""

    def _slot(v):
        return v[1:] if isinstance(v, str) and v.startswith("?") else f"'{v}'"

    anchored = []
    for i in range(len(patterns)):
        sub, seen = _pattern_part_sql(patterns[i], "delta", f"a{i}")
        joins = [sub]
        for j, pat in enumerate(patterns):
            if j == i:
                continue
            psub, pvars = _pattern_part_sql(pat, "triples", f"a{i}_{j}")
            shared = sorted(seen & pvars)
            joins.append(
                f"JOIN {psub} USING ({', '.join(shared)})"
                if shared
                else f"CROSS JOIN {psub}"
            )
            seen |= pvars
        for s, p, o, kind in template:
            anchored.append(
                f"SELECT {_slot(s)} AS subj, {_slot(p)} AS pred,"
                f" {_slot(o)} AS obj, '{kind}' AS obj_kind\n"
                f"FROM {chr(10).join(joins)}"
            )
    return f"""{triples_cte},
{delta_cte}
SELECT DISTINCT subj, pred, obj, obj_kind
FROM ({" UNION ALL ".join(anchored)})
ORDER BY subj, pred, obj
"""


# --------------------------------------------------------------------------
# ASK / DESCRIBE
# --------------------------------------------------------------------------


def ask(
    triples: DataFrame, patterns, optional=None, filters=None, minus=None
) -> DataFrame:
    """SPARQL ASK: ONE row ``(exists_flag int)`` — 1 iff the group
    pattern has at least one solution.  The binding plan is truncated
    with ``limit(1)`` BEFORE the existence count, so Spark stops the
    scan at the first match (the same early-out a SQL EXISTS gets)."""
    b = _bindings_df(triples, patterns, optional, minus, filters)
    return b.limit(1).agg(
        (F.count(F.lit(1)) > 0).cast("int").alias("exists_flag")
    )


def ask_sql(
    triples_cte: str, patterns, optional=None, filters=None, minus=None
) -> str:
    """DuckDB twin: EXISTS over the same FROM chain."""
    frm, where, mconds, seen = _bindings_sql(
        patterns, optional, minus, filters
    )
    if mconds:
        raise ValueError("ASK twin does not support MINUS groups")
    return f"""{triples_cte}
SELECT CASE WHEN EXISTS (SELECT 1 FROM {frm}
{where}) THEN 1 ELSE 0 END AS exists_flag
"""


def describe(triples: DataFrame, resource: str) -> DataFrame:
    """SPARQL DESCRIBE (concise-bounded-description lite): every triple
    where ``resource`` is the subject or the object — two pushed-down
    scans unioned, no shuffle."""
    return (
        triples.filter(
            (F.col("subj") == resource) | (F.col("obj") == resource)
        )
        .select("subj", "pred", "obj", "obj_kind")
        .distinct()
        .orderBy("subj", "pred", "obj")
    )


def describe_sql(triples_cte: str, resource: str) -> str:
    return f"""{triples_cte}
SELECT DISTINCT subj, pred, obj, obj_kind
FROM triples
WHERE subj = '{resource}' OR obj = '{resource}'
ORDER BY subj, pred, obj
"""


# --------------------------------------------------------------------------
# BGP join-order advisor
# --------------------------------------------------------------------------


def bgp_selectivity_order(triples: DataFrame, patterns) -> DataFrame:
    """(position, subj, pred, obj, est_rows) — the BGP's patterns
    reordered by EXACT match counts, smallest first: the textbook
    greedy join-order heuristic (start from the most selective
    pattern, grow the chain), surfaced as data so a caller reorders
    its ``match_bgp`` input — or audits why a query is slow — before
    paying for the join.  ``match_bgp`` itself joins in the given
    order (documented there: "order your patterns so each one
    connects"); this operator supplies that order.

    Exactness beats estimation at this granularity: each pattern's
    binding count is ONE conditional-count aggregate over a single
    shared scan (a constant-bound slot predicate per pattern — no join
    is executed, the same never-run-the-join stance as
    ``join_size_estimate``).  Ties break by pattern text so the order
    is total."""
    conds = []
    for i, pat in enumerate(patterns):
        c = F.lit(True)
        for slot_val, col in zip(pat, _SLOTS):
            if not _is_var(slot_val):
                c = c & (F.col(col) == slot_val)
        conds.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"n{i}"))
    row = triples.agg(*conds).collect()[0]
    ranked = sorted(
        (int(row[f"n{i}"]), tuple(p)) for i, p in enumerate(patterns)
    )
    spark = triples.sparkSession
    return spark.createDataFrame(
        [
            (pos + 1, p[0], p[1], p[2], n)
            for pos, (n, p) in enumerate(ranked)
        ],
        "position int, subj string, pred string, obj string, est_rows long",
    )


def bgp_selectivity_order_sql(triples_cte: str, patterns) -> str:
    """DuckDB twin: identical conditional counts, identical
    (count, pattern-text) ordering."""
    legs = []
    for pat in patterns:
        wheres = [
            f"{col} = '{v}'"
            for v, col in zip(pat, _SLOTS)
            if not _is_var(v)
        ]
        cond = " AND ".join(wheres) if wheres else "TRUE"
        s, p, o = pat
        legs.append(
            f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj,\n"
            f"  (SELECT count(*) FROM triples WHERE {cond})::BIGINT"
            f" AS est_rows"
        )
    union = "\nUNION ALL\n".join(legs)
    return f"""{triples_cte},
est AS ({union})
SELECT row_number() OVER (ORDER BY est_rows, subj, pred, obj)::INT
         AS position,
       subj, pred, obj, est_rows
FROM est
ORDER BY position"""
