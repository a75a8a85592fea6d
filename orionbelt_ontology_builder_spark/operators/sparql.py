"""SPARQL text front end — a parser for the SELECT subset the engine's
query algebra (:mod:`query`) already evaluates, so users bring actual
SPARQL strings instead of pattern tuples.  Grammar (W3C SPARQL 1.1,
public spec) subset:

    PREFIX foo: <uri>                      (any number)
    SELECT ?a ?b | SELECT *                (projection)
    WHERE { triples . ; ,                  (BGP, predicate/object lists)
            OPTIONAL { ... }               (left join groups)
            MINUS { ... }                  (anti join groups)
            FILTER EXISTS { ... }          (semi join groups)
            FILTER ( expr )                (common Spark/DuckDB subset)
            VALUES ?x { ... }              (inline single-var table)
            BIND ( expr AS ?v ) }          (computed columns)
    ORDER BY ?x DESC(?y)  LIMIT n  OFFSET n

Terms: ``<uri>``, ``prefix:name`` (expanded), ``a`` (rdf:type),
``?var``, ``"literal"``, plain numbers/words as literal strings.
FILTER/BIND expressions are rewritten from SPARQL surface to the
engine's SQL subset (``?x`` -> ``x``, ``&&`` -> ``AND``, ``||`` ->
``OR``, ``!=`` -> ``<>``) — anything beyond the shared Spark/DuckDB
expression subset raises rather than mis-evaluates.

The parser runs driver-side on a query STRING (zero data-plane cost);
both the Spark evaluation and the DuckDB twin consume the SAME parsed
structure, so text-level parity reduces to the already-proven algebra
parity of ``match_bgp`` / ``match_bgp_sql``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ..model import RDF
from . import query as Q

__all__ = [
    "parse_select",
    "sparql_select",
    "sparql_select_sql",
    "sparql_ask",
    "sparql_ask_sql",
    "sparql_construct",
    "sparql_construct_sql",
    "sparql_describe",
    "sparql_describe_sql",
    "sparql_path",
    "sparql_path_sql",
]

_TOKEN_RX = re.compile(
    r"<[^>]*>"                      # IRI
    r"|\"(?:[^\"\\]|\\.)*\""        # string literal
    r"|\?\w+"                        # variable
    r"|[{}();,]"                     # structure
    r"|\.(?=\s|$)"                   # statement dot (not inside tokens)
    r"|[^\s{}();,]+"                 # bare word / prefixed name / number
)

_KEYWORDS = {"optional", "minus", "filter", "values", "bind", "exists"}


def _tokens(text: str) -> list[str]:
    return _TOKEN_RX.findall(text)


def _expand(term: str, prefixes: dict[str, str]) -> str:
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    if term.startswith("?"):
        return term
    if term == "a":
        return RDF.type
    if term.startswith('"') and term.endswith('"'):
        return term[1:-1]
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in prefixes:
            if re.search(r"[/|+*?^{]", local):
                # path operators can't appear in a prefixed local name;
                # without this guard "ont:a/ont:b+" would silently
                # expand into a plausible-looking garbage IRI
                raise ValueError(
                    f"property-path expression {term!r}: evaluate via "
                    "sparql_path"
                )
            return prefixes[pfx] + local
        raise ValueError(f"unknown prefix in term: {term}")
    return term  # bare literal (number / word)


def _filter_to_sql(expr: str, prefixes: dict[str, str]) -> str:
    """SPARQL expression surface -> the shared Spark/DuckDB SQL
    subset: variables lose the '?', IRIs / prefixed names / SPARQL
    string literals become single-quoted SQL strings, && / || / !=
    become AND / OR / <>."""
    banned = re.search(
        r"\b(regex|str|lang|datatype|bound)\s*\(", expr, re.I
    )
    if banned:
        raise ValueError(f"unsupported FILTER function: {banned.group(1)}")

    def tok(m: re.Match) -> str:
        t = m.group(0)
        if t.startswith('"'):
            return "'" + t[1:-1].replace("'", "''") + "'"
        if t.startswith("<"):
            return "'" + t[1:-1] + "'"
        if t.startswith("?"):
            return t[1:]
        pfx = t.split(":", 1)[0]
        if pfx in prefixes:
            return "'" + prefixes[pfx] + t.split(":", 1)[1] + "'"
        return t

    out = re.sub(
        r"\"(?:[^\"\\]|\\.)*\"|<[^>]*>|\?\w+|\w*:[\w/#.~-]+", tok, expr
    )
    out = out.replace("&&", " AND ").replace("||", " OR ")
    out = out.replace("!=", "<>")
    return out.strip()


def _group_block(toks: list[str], i: int) -> tuple[list[str], int]:
    """Consume a balanced { ... } starting at toks[i] == '{'."""
    assert toks[i] == "{"
    depth, j = 0, i
    while j < len(toks):
        if toks[j] == "{":
            depth += 1
        elif toks[j] == "}":
            depth -= 1
            if depth == 0:
                return toks[i + 1 : j], j + 1
        j += 1
    raise ValueError("unbalanced braces in SPARQL body")


def _paren_block(toks: list[str], i: int) -> tuple[list[str], int]:
    assert toks[i] == "("
    depth, j = 0, i
    while j < len(toks):
        if toks[j] == "(":
            depth += 1
        elif toks[j] == ")":
            depth -= 1
            if depth == 0:
                return toks[i + 1 : j], j + 1
        j += 1
    raise ValueError("unbalanced parens in SPARQL body")


def _parse_triples(toks: list[str], prefixes: dict[str, str]) -> list[tuple]:
    """Triple statements with ';' (same subject) and ',' (same
    subject+predicate) continuation lists."""
    pats: list[tuple] = []
    i, n = 0, len(toks)
    subj = pred = None
    state = 0  # 0 expect subj, 1 expect pred, 2 expect obj
    while i < n:
        t = toks[i]
        if t == ".":
            subj = pred = None
            state = 0
        elif t == ";":
            state = 1
        elif t == ",":
            state = 2
        else:
            term = _expand(t, prefixes)
            if state == 0:
                subj = term
                state = 1
            elif state == 1:
                pred = term
                state = 2
            elif state == 2:
                pats.append((subj, pred, term))
                # a separator (',' ';' '.') must follow an object
                state = 3
            else:
                raise ValueError(
                    f"expected '.', ';' or ',' after object, got {t!r}"
                )
        i += 1
    return pats


def _strip_comments(q: str) -> str:
    """Drop ``# ...`` comments — but '#' inside an IRI (<...#>) or a
    string literal is content, not a comment."""
    out_lines = []
    for line in q.splitlines():
        in_iri = in_str = False
        cut = len(line)
        for i, ch in enumerate(line):
            if ch == "<" and not in_str:
                in_iri = True
            elif ch == ">" and not in_str:
                in_iri = False
            elif ch == '"' and not in_iri:
                in_str = not in_str
            elif ch == "#" and not in_iri and not in_str:
                cut = i
                break
        out_lines.append(line[:cut])
    return "\n".join(out_lines)


def parse_select(query: str) -> dict:
    """Parse a SELECT query into the ``match_bgp`` argument dict plus
    ``project`` (the SELECT list, or None for ``*``)."""
    q = _strip_comments(query)
    prefixes = {
        m.group(1): m.group(2)
        for m in re.finditer(r"PREFIX\s+(\w*):\s*<([^>]*)>", q, re.I)
    }
    q = re.sub(r"PREFIX\s+\w*:\s*<[^>]*>", "", q, flags=re.I)
    m = re.search(r"SELECT\s+(.+?)\s+WHERE", q, re.I | re.S)
    if not m:
        raise ValueError("only SELECT ... WHERE { ... } is supported")
    sel = m.group(1).split()
    project = None if sel == ["*"] else [v.lstrip("?") for v in sel]

    body_start = q.index("{", m.end() - 1)
    toks = _tokens(q[body_start:])
    body, after = _group_block(toks, 0)

    # top-level { g1 } UNION { g2 } [UNION { g3 }] — arm groups only
    if any(t.lower() == "union" for t in body):
        groups, i = [], 0
        while i < len(body):
            t = body[i]
            if t == "{":
                grp, i = _group_block(body, i)
                groups.append(_parse_triples(grp, prefixes))
            elif t.lower() == "union":
                i += 1
            else:
                raise ValueError(
                    "UNION bodies must be brace groups of triples"
                )
        tail = " ".join(toks[after:])
        lm = re.search(r"LIMIT\s+(\d+)", tail, re.I)
        if project is not None:
            raise ValueError("UNION supports SELECT * only")
        return {
            "union": groups,
            "limit": int(lm.group(1)) if lm else None,
        }

    patterns_toks: list[str] = []
    optional, minus, exists, filters = [], [], [], []
    values = None
    bind: dict[str, str] = {}
    i = 0
    while i < len(body):
        t = body[i]
        low = t.lower()
        if low == "optional":
            grp, i = _group_block(body, i + 1)
            optional.append(_parse_triples(grp, prefixes))
        elif low == "minus":
            grp, i = _group_block(body, i + 1)
            minus.append(_parse_triples(grp, prefixes))
        elif low == "filter":
            if body[i + 1].lower() == "exists":
                grp, i = _group_block(body, i + 2)
                exists.append(_parse_triples(grp, prefixes))
            else:
                expr_toks, i = _paren_block(body, i + 1)
                filters.append(_filter_to_sql(" ".join(expr_toks), prefixes))
        elif low == "values":
            var = body[i + 1].lstrip("?")
            grp, i = _group_block(body, i + 2)
            rows = [[_expand(g, prefixes)] for g in grp]
            values = ([var], rows)
        elif low == "bind":
            expr_toks, i = _paren_block(body, i + 1)
            joined = " ".join(expr_toks)
            bm = re.match(r"(.+?)\s+AS\s+\?(\w+)$", joined, re.I)
            if not bm:
                raise ValueError("BIND needs (expr AS ?var)")
            bind[bm.group(2)] = _filter_to_sql(bm.group(1), prefixes)
        else:
            patterns_toks.append(t)
            i += 1
            continue
        # block consumers already advanced i
    patterns = _parse_triples(patterns_toks, prefixes)

    tail = " ".join(toks[after:])
    order_by = None
    om = re.search(
        r"ORDER\s+BY\s+(.+?)(?:LIMIT|OFFSET|$)", tail, re.I | re.S
    )
    if om:
        order_by = []
        for part in re.findall(r"DESC\s*\(\s*\?(\w+)\s*\)|\?(\w+)", om.group(1), re.I):
            order_by.append("-" + part[0] if part[0] else part[1])
    lm = re.search(r"LIMIT\s+(\d+)", tail, re.I)
    fm = re.search(r"OFFSET\s+(\d+)", tail, re.I)

    if "(" in m.group(1):  # aggregate SELECT list -> GROUP BY path
        aggs, plain = _parse_agg_select(m.group(1), tail)
        gm = re.search(
            r"GROUP\s+BY\s+((?:\?\w+\s*)+)", tail, re.I
        )
        if not gm:
            raise ValueError("aggregate SELECT needs GROUP BY")
        group_by = [v[1:] for v in re.findall(r"\?\w+", gm.group(1))]
        # HAVING body via balanced-paren scan — a non-greedy regex would
        # truncate nested parens like ((?n >= 3) && (?m < 2))
        having = None
        hm = re.search(r"HAVING\s*\(", tail, re.I)
        if hm:
            expr_toks, _ = _paren_block(_tokens(tail[hm.end() - 1:]), 0)
            having = _filter_to_sql(" ".join(expr_toks), prefixes)
        if values is not None or bind or order_by or lm or fm:
            raise ValueError(
                "VALUES/BIND/ORDER/LIMIT unsupported with aggregates"
            )
        if set(plain) - set(group_by):
            raise ValueError("non-grouped bare variable in SELECT")
        return {
            "patterns": patterns,
            "optional": optional or None,
            "minus": minus or None,
            "exists": exists or None,
            "filters": filters or None,
            "group_by": group_by,
            "aggs": aggs,
            "having": having,
        }

    return {
        "patterns": patterns,
        "optional": optional or None,
        "minus": minus or None,
        "exists": exists or None,
        "filters": filters or None,
        "values": values,
        "bind": bind or None,
        "order_by": order_by,
        "limit": int(lm.group(1)) if lm else None,
        "offset": int(fm.group(1)) if fm else None,
        "project": project,
    }


_AGG_ENTRY_RX = re.compile(
    r"\(\s*(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\?\w+|\*)\s*\)"
    r"\s+AS\s+\?(\w+)\s*\)",
    re.I,
)


def _parse_agg_select(sel_text: str, tail: str) -> tuple[dict, list]:
    """Aggregate SELECT list + GROUP BY/HAVING tail -> (aggs, plain
    vars).  SUM/AVG cast their (string-typed) variable to DOUBLE so
    both engines aggregate numerically; COUNT/MIN/MAX are
    string-safe as-is."""
    aggs: dict[str, str] = {}
    for m in _AGG_ENTRY_RX.finditer(sel_text):
        fn, dist, arg, alias = (
            m.group(1).lower(),
            "DISTINCT " if m.group(2) else "",
            m.group(3),
            m.group(4),
        )
        col = "*" if arg == "*" else arg[1:]
        if fn in ("sum", "avg") and col != "*":
            col = f"CAST({col} AS DOUBLE)"
        aggs[alias] = f"{fn}({dist}{col})"
    plain = [
        v[1:]
        for v in re.findall(r"\?\w+", _AGG_ENTRY_RX.sub("", sel_text))
    ]
    return aggs, plain


def _check_projected_order(project: list, order_by) -> None:
    """SPARQL allows ORDER BY over non-projected variables; this
    engine's set-semantics projection drops them before the sort, so
    honoring such an ORDER BY is impossible — raise instead of
    silently mis-sorting (module contract)."""
    missing = [
        o.lstrip("-") for o in (order_by or []) if o.lstrip("-") not in project
    ]
    if missing:
        raise ValueError(
            "ORDER BY variable(s) not in the SELECT projection: "
            f"{missing} (projection is applied first)"
        )


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL SELECT string over the triples DataFrame
    (aggregate SELECT lists route to ``select_agg``).

    The engine evaluates under SET semantics throughout (``match_bgp``
    is DISTINCT; a projected SELECT list deduplicates the projected
    tuples — the documented deviation from SPARQL's default bag
    semantics).  With a projection: project -> DISTINCT -> ORDER BY
    (the query's spec, remaining columns appended so the order stays
    total) -> OFFSET -> LIMIT, so LIMIT n returns n distinct projected
    rows and a DESC sort is honored."""
    args = parse_select(query)
    if "union" in args:
        return Q.match_union(triples, args["union"], limit=args["limit"])
    if "aggs" in args:
        return Q.select_agg(triples, **args)
    project = args.pop("project")
    if not project:
        return Q.match_bgp(triples, **args)
    order_by = args.pop("order_by")
    limit = args.pop("limit")
    offset = args.pop("offset")
    _check_projected_order(project, order_by)
    cols = sorted(project)
    out = Q.match_bgp(triples, **args).select(*cols).distinct()
    keyed, _ = Q._order_exprs(cols, order_by)
    out = out.orderBy(*keyed)
    if offset:
        out = out.offset(offset)
    return out.limit(limit) if limit is not None else out


def sparql_select_sql(with_prefix: str, query: str) -> str:
    """DuckDB twin built from the SAME parse; ``with_prefix`` is the
    ``"WITH triples AS (...)"`` header, per the ``match_bgp_sql``
    convention.  Projection semantics mirror :func:`sparql_select`:
    project -> DISTINCT -> ORDER BY spec (+ fill columns) -> LIMIT /
    OFFSET."""
    args = parse_select(query)
    if "union" in args:
        return Q.match_union_sql(
            with_prefix, args["union"], limit=args["limit"]
        )
    if "aggs" in args:
        return Q.select_agg_sql(with_prefix, **args)
    project = args.pop("project")
    if not project:
        return Q.match_bgp_sql(with_prefix, **args)
    order_by = args.pop("order_by")
    limit = args.pop("limit")
    offset = args.pop("offset")
    _check_projected_order(project, order_by)
    inner = Q.match_bgp_sql(with_prefix, **args)
    cols_sorted = sorted(project)
    cols = ", ".join(cols_sorted)
    if order_by:
        keyed = [
            (f"{o[1:]} DESC" if o.startswith("-") else o) for o in order_by
        ]
        named = {o.lstrip("-") for o in order_by}
        order = ", ".join(keyed + [c for c in cols_sorted if c not in named])
    else:
        order = cols
    lim = f"\nLIMIT {limit}" if limit is not None else ""
    if offset:
        lim += f"\nOFFSET {offset}"
    return (
        f"SELECT DISTINCT {cols} FROM (\n{inner}\n)\nORDER BY {order}{lim}"
    )


# --------------------------------------------------------------------- #
# ASK / CONSTRUCT / DESCRIBE text forms (round 3)
# --------------------------------------------------------------------- #


def _rewrite_to_select(query: str, keyword: str) -> str:
    """Reuse the SELECT parser for ASK/CONSTRUCT bodies by rewriting
    the query head; the body grammar (triples, OPTIONAL, MINUS,
    FILTER, ...) is identical by spec."""
    out, n = re.subn(
        rf"\b{keyword}\b", "SELECT * WHERE", query, count=1, flags=re.I
    )
    if n != 1:
        raise ValueError(f"not a {keyword} query")
    return out


def sparql_ask(triples: DataFrame, query: str) -> DataFrame:
    """``ASK { ... }`` -> one row ``(exists_flag int)``.  The body
    accepts the SELECT subset's group patterns (triples / OPTIONAL /
    MINUS / FILTER); solution modifiers and VALUES/BIND are
    meaningless for ASK and raise."""
    args = parse_select(_rewrite_to_select(query, "ASK"))
    if "union" in args or "aggs" in args:
        raise ValueError("ASK supports plain group patterns only")
    for key in ("values", "bind", "order_by", "limit", "offset"):
        if args.get(key):
            raise ValueError(f"{key} is not valid in an ASK query")
    if args.get("exists"):
        raise ValueError("FILTER EXISTS unsupported in the ASK subset")
    return Q.ask(
        triples,
        args["patterns"],
        optional=args["optional"],
        filters=args["filters"],
        minus=args["minus"],
    )


def sparql_ask_sql(with_prefix: str, query: str) -> str:
    """DuckDB twin of :func:`sparql_ask` from the SAME parse."""
    args = parse_select(_rewrite_to_select(query, "ASK"))
    return Q.ask_sql(
        with_prefix,
        args["patterns"],
        optional=args["optional"],
        filters=args["filters"],
        minus=args["minus"],
    )


def _parse_template(toks: list[str], prefixes: dict[str, str]) -> list[tuple]:
    """CONSTRUCT template block -> (s, p, o, obj_kind) entries; object
    kind is classified from the surface token (quoted string / bare
    number -> literal, otherwise uri).  Variable slots keep their
    ``?var`` form for ``query.construct``; a variable OBJECT is
    emitted as ``uri`` — the engine's documented construct subset
    (bindings carry term strings, not kinds)."""
    out: list[tuple] = []
    subj = pred = None
    state = 0
    for t in toks:
        if t == ".":
            subj = pred = None
            state = 0
        elif t == ";":
            state = 1
        elif t == ",":
            state = 2
        else:
            keep_var = t.startswith("?")
            term = t if keep_var else _expand(t, prefixes)
            if state == 0:
                subj = term
                state = 1
            elif state == 1:
                pred = term
                state = 2
            elif state == 2:
                kind = (
                    "literal"
                    if t.startswith('"')
                    or re.fullmatch(r"[+-]?\d+(\.\d+)?", t)
                    else "uri"
                )
                out.append((subj, pred, term, kind))
                state = 3
            else:
                raise ValueError(
                    f"expected '.', ';' or ',' after template object, got {t!r}"
                )
    if not out:
        raise ValueError("empty CONSTRUCT template")
    return out


def _parse_construct(query: str) -> tuple[list[tuple], dict]:
    q = _strip_comments(query)
    prefixes = {
        m.group(1): m.group(2)
        for m in re.finditer(r"PREFIX\s+(\w*):\s*<([^>]*)>", q, re.I)
    }
    m = re.search(r"CONSTRUCT\s*\{", q, re.I)
    if not m:
        raise ValueError("not a CONSTRUCT query")
    toks = _tokens(q[q.index("{", m.end() - 1):])
    tmpl_toks, after = _group_block(toks, 0)
    template = _parse_template(tmpl_toks, prefixes)
    # body: hand the WHERE group to the SELECT parser
    rest = q[: m.start()] + "SELECT * " + " ".join(toks[after:])
    args = parse_select(rest)
    if any(
        args.get(k)
        for k in ("optional", "minus", "exists", "filters", "values",
                  "bind", "order_by", "limit", "offset")
    ):
        raise ValueError(
            "CONSTRUCT subset: plain BGP body only (no OPTIONAL/MINUS/"
            "FILTER/VALUES/BIND/solution modifiers)"
        )
    return template, args


def sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    """``CONSTRUCT { template } WHERE { bgp }`` -> distinct instantiated
    triples (subj, pred, obj, obj_kind), via ``query.construct``."""
    template, args = _parse_construct(query)
    return Q.construct(triples, args["patterns"], template)


def sparql_construct_sql(triples_cte: str, query: str) -> str:
    """DuckDB twin from the SAME parse."""
    template, args = _parse_construct(query)
    return Q.construct_sql(triples_cte, args["patterns"], template)


def sparql_describe(triples: DataFrame, query: str) -> DataFrame:
    """``DESCRIBE <resource>`` (or prefixed name) -> the resource's
    concise-bounded-description-lite slice."""
    return Q.describe(triples, _parse_describe(query))


def _parse_describe(query: str) -> str:
    q = _strip_comments(query)
    prefixes = {
        m.group(1): m.group(2)
        for m in re.finditer(r"PREFIX\s+(\w*):\s*<([^>]*)>", q, re.I)
    }
    m = re.search(r"DESCRIBE\s+(\S+)", q, re.I)
    if not m:
        raise ValueError("not a DESCRIBE query")
    term = _expand(m.group(1), prefixes)
    if term.startswith("?"):
        raise ValueError("DESCRIBE subset takes a concrete resource")
    return term


def sparql_describe_sql(with_prefix: str, query: str) -> str:
    return Q.describe_sql(with_prefix, _parse_describe(query))


# --------------------------------------------------------------------- #
# property-path text form (round 3)
# --------------------------------------------------------------------- #


def _parse_path_elem(part: str, prefixes: dict[str, str]) -> str:
    """One path element: ``[^]term[+*?]`` or ``term{n[,m]}`` -> the
    ``query.eval_path`` step string (operators re-attached around the
    expanded IRI)."""
    m = re.match(r"^(\^?)(.*?)([+*?]|\{\d+(?:,\d+)?\})?$", part)
    inv, core, suffix = m.group(1), m.group(2), m.group(3) or ""
    if not core:
        raise ValueError(f"empty path element in {part!r}")
    return inv + _expand_path_core(core, prefixes) + suffix


def _expand_path_core(core: str, prefixes: dict[str, str]) -> str:
    if core == "a":
        return RDF.type
    if core.startswith("<") and core.endswith(">"):
        return core[1:-1]
    pfx, _, local = core.partition(":")
    if pfx in prefixes:
        return prefixes[pfx] + local
    raise ValueError(f"unknown prefix in path element: {core}")


def _parse_path_token(tok: str, prefixes: dict[str, str]) -> list:
    """A whitespace-free path token -> ``eval_path`` spec: ``/`` splits
    sequence steps; within a step, ``!a|b`` is a negated property set,
    ``a|b`` an alternation, and each element takes ``^`` / ``+`` /
    ``*`` / ``?`` / ``{n,m}`` operators.  (Parenthesized groups are
    out of subset and raise at tokenization — parens are structure
    tokens, so they never reach here.)"""
    steps: list = []
    for part in tok.split("/"):
        if part.startswith("!"):
            steps.append(
                "!" + "|".join(
                    _expand_path_core(p, prefixes)
                    for p in part[1:].split("|")
                )
            )
        elif "|" in part:
            steps.append(
                [_parse_path_elem(p, prefixes) for p in part.split("|")]
            )
        else:
            steps.append(_parse_path_elem(part, prefixes))
    return steps


def _parse_path_query(query: str) -> tuple[list, list[tuple[str, str]]]:
    """``SELECT ?s ?o WHERE { ?s <path-expr> ?o . }`` -> (path spec,
    [(endpoint_token, out_column)]).  Exactly ONE pattern; endpoints
    may be variables (projected under their names) or constants
    (filtered, not projected)."""
    q = _strip_comments(query)
    prefixes = {
        m.group(1): m.group(2)
        for m in re.finditer(r"PREFIX\s+(\w*):\s*<([^>]*)>", q, re.I)
    }
    q = re.sub(r"PREFIX\s+\w*:\s*<[^>]*>", "", q, flags=re.I)
    m = re.search(r"SELECT\s+(.+?)\s+WHERE", q, re.I | re.S)
    if not m:
        raise ValueError("property-path subset: SELECT ... WHERE { ... }")
    toks_all = _tokens(q[q.index("{", m.end() - 1):])
    body, after = _group_block(toks_all, 0)
    # re-attach bounded-repetition braces the tokenizer split off:
    # "x:p{2,3}" tokenizes as 'x:p' '{' '2,3'... '}' — merge back
    merged: list[str] = []
    i = 0
    while i < len(body):
        t = body[i]
        if (
            i + 1 < len(body)
            and body[i + 1] == "{"
            and t not in (".", ";", ",")
        ):
            j = i + 2
            inner: list[str] = []
            while j < len(body) and body[j] != "}":
                inner.append(body[j])
                j += 1
            merged.append(t + "{" + "".join(inner) + "}")
            i = j + 1
        else:
            merged.append(t)
            i += 1
    body = merged
    terms = [t for t in body if t != "."]
    if len(terms) != 3:
        raise ValueError(
            "property-path subset: exactly one '?s <path> ?o' pattern"
        )
    s_tok, p_tok, o_tok = terms
    if not re.search(r"[/|+*?^{!]", p_tok):
        raise ValueError(
            "no path operator in predicate — use sparql_select"
        )
    if " ".join(_tokens(q[q.index("{", m.end() - 1):])[after:]).strip():
        raise ValueError(
            "property-path subset: no solution modifiers"
        )
    spec = _parse_path_token(p_tok, prefixes)
    sel = m.group(1).split()
    endpoints = []
    for tok, col in ((s_tok, "src"), (o_tok, "dst")):
        if tok.startswith("?"):
            endpoints.append((tok, col))
        else:
            endpoints.append((_expand(tok, prefixes), col))
    want = [t for t, _ in endpoints if t.startswith("?")]
    if sel != ["*"] and sel != want:
        raise ValueError(
            f"SELECT list must be {' '.join(want) or '(empty)'} "
            "for this pattern"
        )
    return spec, endpoints


def sparql_path(triples: DataFrame, query: str) -> DataFrame:
    """SPARQL 1.1 property-path text form over the single-pattern
    subset: sequences ``p1/p2``, closures ``+ * ?``, inverse ``^``,
    alternation ``p1|p2``, negated sets ``!p1|p2`` and bounded
    repetition ``p{n,m}`` — mapped onto ``query.eval_path`` (closures
    via the O(log D) doubling fixpoint; each step a predicate-sliced
    pushed-down scan)."""
    from pyspark.sql import functions as F

    spec, endpoints = _parse_path_query(query)
    out = Q.eval_path(triples, spec)
    cols = []
    for tok, col in endpoints:
        if tok.startswith("?"):
            cols.append(F.col(col).alias(tok[1:]))
        else:
            out = out.filter(F.col(col) == tok)
    names = [tok[1:] for tok, _ in endpoints if tok.startswith("?")]
    if not names:
        raise ValueError(
            "property-path subset: at least one endpoint variable"
        )
    return out.select(*cols).distinct().orderBy(*names)


def sparql_path_sql(with_prefix: str, query: str) -> str:
    """DuckDB twin from the SAME parse (eval_path_sql wrapped as a
    subquery with the endpoint projection/filters)."""
    spec, endpoints = _parse_path_query(query)
    inner = Q.eval_path_sql(with_prefix, spec)
    sel, where = [], []
    for tok, col in endpoints:
        if tok.startswith("?"):
            sel.append(f"{col} AS {tok[1:]}")
        else:
            where.append(f"{col} = '{tok}'")
    cols = ", ".join(tok[1:] for tok, _ in endpoints if tok.startswith("?"))
    w = ("WHERE " + " AND ".join(where) + "\n") if where else ""
    return (
        f"SELECT DISTINCT {', '.join(sel)} FROM (\n{inner}\n)\n{w}"
        f"ORDER BY {cols}"
    )
