"""Driver-side RDF serializers: Turtle, RDF/XML, JSON-LD.

The reference exports via ``graph.serialize(format=...)`` (rdflib,
``ontology_manager.py:2295-2297``).  Export of a whole ontology is a
UI-sized artifact (SURVEY.md §2.1): the bulk interchange path is
N-Triples / Parquet (``sources.ntriples``), so these serializers operate
on a collected list of triple rows, not on DataFrames.  ``serialize(df,
fmt)`` is the DataFrame-facing facade that collects then renders.

All three formats round-trip through ``sources.parsers`` — property
tested over the fixture graphs (lang tags, datatypes, bnodes).
"""

from __future__ import annotations

import json
from collections import defaultdict
from xml.sax.saxutils import escape as xml_escape
from xml.sax.saxutils import quoteattr

from pyspark.sql import DataFrame

from ..model import RDF_NS, STANDARD_PREFIXES

Row6 = tuple  # (subj, pred, obj, obj_kind, obj_lang, obj_dt)


def _rows(df: DataFrame) -> list[Row6]:
    return [
        (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["obj_lang"], r["obj_dt"])
        for r in df.collect()
    ]


def serialize(df: DataFrame, fmt: str, prefixes: dict[str, str] | None = None) -> str:
    # n3 -> turtle: every Turtle document is valid Notation3; the
    # reference's n3 export (rdflib) uses the same subset for our data
    # model (no formulae/rules), so the Turtle renderer serves both.
    fmt = {"ttl": "turtle", "xml": "rdfxml", "rdf": "rdfxml",
           "jsonld": "jsonld", "json-ld": "jsonld", "json": "jsonld",
           "turtle": "turtle", "rdfxml": "rdfxml", "n3": "turtle"}[fmt.lower()]
    rows = _rows(df)
    if fmt == "turtle":
        return to_turtle(rows, prefixes)
    if fmt == "rdfxml":
        return to_rdfxml(rows)
    return to_jsonld(rows)


# ------------------------------------------------------------------ #
# Turtle
# ------------------------------------------------------------------ #


def _ttl_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _ttl_term(
    node: str, kind: str, lang: str | None, dt: str | None,
    rev: list[tuple[str, str]],
) -> str:
    # Branch strictly on kind: a *literal* whose text happens to start
    # with "_:" must stay a literal (the startswith heuristic only
    # applies when kind is unknown).
    if kind == "bnode" or (kind is None and node.startswith("_:")):
        return node
    if kind == "uri" or (kind is None and not node.startswith("_:")):
        for ns, pfx in rev:
            if node.startswith(ns):
                local = node[len(ns):]
                if local and all(
                    c.isalnum() or c in "_-" for c in local
                ):
                    return f"{pfx}:{local}"
        return f"<{node}>"
    out = f'"{_ttl_escape(node)}"'
    if lang:
        out += f"@{lang}"
    elif dt:
        out += f"^^{_ttl_term(dt, 'uri', None, None, rev)}"
    return out


def _row_key(r: Row6) -> tuple:
    """None-safe sort key for 6-tuple triple rows: None fields (lang/dt
    of non-literals, plain literals) sort as '' instead of raising
    TypeError against str (hypothesis-found: two rows sharing
    (subj, pred, obj, kind) but one with lang=None, one with a dt)."""
    return tuple("" if v is None else v for v in r)


def to_turtle(rows: list[Row6], prefixes: dict[str, str] | None = None) -> str:
    """Subject-grouped Turtle with prefix compaction and ``a`` shorthand."""
    prefixes = {**STANDARD_PREFIXES, **(prefixes or {})}
    rev = sorted(
        ((ns, pfx) for pfx, ns in prefixes.items()),
        key=lambda t: -len(t[0]),
    )
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]
    lines.append("")
    by_subj: dict[str, list[Row6]] = defaultdict(list)
    for r in rows:
        by_subj[r[0]].append(r)
    for subj in sorted(by_subj):
        s = _ttl_term(subj, "bnode" if subj.startswith("_:") else "uri",
                      None, None, rev)
        preds: dict[str, list[str]] = defaultdict(list)
        for _, p, o, k, lg, dt in sorted(by_subj[subj], key=_row_key):
            pt = "a" if p == RDF_NS + "type" else _ttl_term(p, "uri", None, None, rev)
            preds[pt].append(_ttl_term(o, k, lg, dt, rev))
        parts = [f"    {pt} {', '.join(objs)}" for pt, objs in preds.items()]
        lines.append(s + "\n" + " ;\n".join(parts) + " .")
        lines.append("")
    return "\n".join(lines)


# ------------------------------------------------------------------ #
# RDF/XML
# ------------------------------------------------------------------ #


import re as _re

_NCNAME_SUFFIX = _re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*$")


def _split_qname(pred: str) -> tuple[str, str]:
    """Split a predicate URI into (namespace, NCName local part) at the
    longest valid NCName suffix — predicates whose URI ends in a
    non-NCName (e.g. '...#0') are inexpressible as RDF/XML property
    elements (same limit as rdflib)."""
    m = _NCNAME_SUFFIX.search(pred)
    if not m or m.start() == 0:
        raise ValueError(
            f"predicate not expressible as RDF/XML element name: {pred!r}"
        )
    return pred[: m.start()], pred[m.start():]


def to_rdfxml(rows: list[Row6]) -> str:
    """Flat rdf:Description form — every feature expressed with core
    attributes (about/nodeID/resource/datatype/xml:lang), so the subset
    parser round-trips it exactly."""
    out = [
        '<?xml version="1.0" encoding="utf-8"?>',
        f'<rdf:RDF xmlns:rdf="{RDF_NS}">',
    ]
    by_subj: dict[str, list[Row6]] = defaultdict(list)
    for r in rows:
        by_subj[r[0]].append(r)
    for subj in sorted(by_subj):
        if subj.startswith("_:"):
            out.append(f'  <rdf:Description rdf:nodeID={quoteattr(subj[2:])}>')
        else:
            out.append(f'  <rdf:Description rdf:about={quoteattr(subj)}>')
        for _, p, o, k, lg, dt in sorted(by_subj[subj], key=_row_key):
            ns, local = _split_qname(p)
            tag = f'q:{local} xmlns:q={quoteattr(ns)}'
            if k == "uri":
                out.append(f'    <{tag} rdf:resource={quoteattr(o)}/>')
            elif k == "bnode" or (k is None and o.startswith("_:")):
                out.append(f'    <{tag} rdf:nodeID={quoteattr(o[2:])}/>')
            else:
                attrs = ""
                if lg:
                    attrs += f" xml:lang={quoteattr(lg)}"
                if dt:
                    attrs += f" rdf:datatype={quoteattr(dt)}"
                out.append(
                    f'    <q:{local} xmlns:q={quoteattr(ns)}{attrs}>'
                    f"{xml_escape(o)}</q:{local}>"
                )
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out)


# ------------------------------------------------------------------ #
# JSON-LD (flat, expanded-ish)
# ------------------------------------------------------------------ #


def to_jsonld(rows: list[Row6]) -> str:
    """Flat ``@graph`` of node objects; values in expanded form
    (``@id`` / ``@value`` + ``@language``/``@type``)."""
    nodes: dict[str, dict] = {}
    for s, p, o, k, lg, dt in rows:
        node = nodes.setdefault(s, {"@id": s})
        if k in ("uri", "bnode"):
            val: dict = {"@id": o}
        else:
            val = {"@value": o}
            if lg:
                val["@language"] = lg
            if dt:
                val["@type"] = dt
        node.setdefault(p, []).append(val)
    graph = [nodes[s] for s in sorted(nodes)]
    return json.dumps({"@graph": graph}, indent=2, sort_keys=True)
