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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["match_bgp", "match_bgp_sql"]

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


def match_bgp(triples: DataFrame, patterns) -> DataFrame:
    """Evaluate a conjunction of (s, p, o) patterns; ``?name`` slots
    are variables, everything else matches exactly.  Returns the
    distinct variable bindings, one column per variable, ordered by
    the sorted variable names (deterministic).

    Patterns sharing no variable with the accumulated bindings produce
    a cross join (the SPARQL product semantics) — intentional, but at
    scale order your patterns so each one connects."""
    if not patterns:
        raise ValueError("empty BGP")
    result = _pattern_df(triples, patterns[0])
    for pat in patterns[1:]:
        part = _pattern_df(triples, pat)
        shared = sorted(set(result.columns) & set(part.columns))
        result = (
            result.join(part, shared) if shared else result.crossJoin(part)
        )
    cols = sorted(result.columns)
    return result.select(*cols).distinct().orderBy(*cols)


def match_bgp_sql(triples_cte: str, patterns) -> str:
    """DuckDB twin: the mechanical SPARQL-to-SQL translation — one
    subquery per pattern, JOIN USING on shared variables."""
    parts = []
    bound_so_far: list[set] = []
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
        parts.append((f"(SELECT DISTINCT {sel} FROM triples{cond}) p{i}",
                      set(sels)))
        bound_so_far.append(set(sels))
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
    allvars = sorted(seen)
    return f"""{triples_cte}
SELECT DISTINCT {", ".join(allvars)}
FROM {chr(10).join(joins)}
ORDER BY {", ".join(allvars)}
"""
