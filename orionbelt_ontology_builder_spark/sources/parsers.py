"""Driver-side RDF parsers: Turtle (subset), RDF/XML (subset), JSON-LD.

The reference parses uploads with rdflib (``ontology_manager.py:
2000-2024``); ontology files are UI-sized, so parsing is a driver-side
concern (SURVEY.md §2.1) — the resulting row list becomes a triples
DataFrame via ``spark.createDataFrame``.  Bulk data takes the
N-Triples/Parquet path instead (``sources.ntriples``).

Coverage:

* **Turtle**: ``@prefix``/``PREFIX``, ``@base``/``BASE``, prefixed
  names, IRIs, ``a``, ``;`` ``,`` grouping, string literals (single,
  triple-quoted) with ``@lang``/``^^dt``, numeric + boolean shorthand,
  blank-node labels and ``[ ... ]`` property lists, collections
  ``( ... )`` expanded to rdf:first/rest, comments.
* **RDF/XML**: rdf:Description and typed node elements, rdf:about /
  rdf:ID / rdf:nodeID, property elements with rdf:resource / rdf:nodeID
  / rdf:datatype / xml:lang (inherited), nested node elements,
  rdf:parseType="Resource".
* **JSON-LD**: flat or ``@graph`` form with expanded values, plus a
  simple-``@context`` (string prefix map) compaction layer.

Each parser returns 6-tuples matching TRIPLES_SCHEMA.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..model import RDF_NS, TRIPLES_SCHEMA, XSD

Row6 = tuple

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


def parse(spark: SparkSession, text: str, fmt: str) -> DataFrame:
    """Format-dispatched parse -> triples DataFrame (the reference's
    extension map, ``app.py:2223-2232``)."""
    fmt = fmt.lower().lstrip(".")
    if fmt in ("ttl", "turtle"):
        rows = parse_turtle(text)
    elif fmt == "n3":
        rows = parse_n3(text)
    elif fmt in ("xml", "rdf", "owl", "rdfxml"):
        rows = parse_rdfxml(text)
    elif fmt in ("jsonld", "json-ld", "json"):
        rows = parse_jsonld(text)
    elif fmt in ("nt", "ntriples"):
        from .ntriples import parse_nt

        lines = spark.createDataFrame(
            [(ln,) for ln in text.splitlines()], "line string"
        )
        return parse_nt(lines)
    else:
        raise ValueError(f"unknown RDF format: {fmt}")
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


# ------------------------------------------------------------------ #
# Turtle
# ------------------------------------------------------------------ #

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<dtmark>\^\^)
    | (?P<n3punct>=>|<=|[{}!^=])
    | (?P<iri><[^>]*>)
    | (?P<triple_str>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<punct>[;,.\[\]()])
    | (?P<bnode>_:[\w.-]+)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<local>[\w.-]*(?:%[0-9A-Fa-f]{2}[\w.-]*)*)
    | (?P<kw>@?[A-Za-z][\w-]*)
    """,
    re.VERBOSE,
)

_STR_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", '"': '"', "'": "'", "\\": "\\",
    "b": "\b", "f": "\f",
}


def _unescape_str(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _STR_ESCAPES:
                out.append(_STR_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


#: owl:sameAs — the N3 ``=`` operator's meaning (public N3 spec §"equality")
_OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

#: SWAP log vocabulary (public, w3.org/2000/10/swap/log) — used by the
#: documented N3-formula triple encoding (see ``_N3Parser.formula``).
_LOG_NS = "http://www.w3.org/2000/10/swap/log#"
_LOG_FORMULA = _LOG_NS + "Formula"
_LOG_IMPLIES = _LOG_NS + "implies"
_LOG_INCLUDES = _LOG_NS + "includes"
_RDF_STATEMENT = RDF_NS + "Statement"
_RDF_SUBJECT = RDF_NS + "subject"
_RDF_PREDICATE = RDF_NS + "predicate"
_RDF_OBJECT = RDF_NS + "object"

#: rows that ARE part of a formula's reification encoding — never
#: re-reified when a formula nests inside another formula.
_REIFY_PREDS = frozenset(
    {_LOG_INCLUDES, _RDF_SUBJECT, _RDF_PREDICATE, _RDF_OBJECT}
)


class _TurtleParser:
    #: N3-only surface accepted when True (``_N3Parser``); plain Turtle
    #: rejects those tokens with the normal parse errors.
    n3 = False

    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        for m in _TOKEN.finditer(text):
            kind = m.lastgroup
            if kind in ("comment",):
                continue
            if m.group("local") is not None and kind in ("local", "pname"):
                self.toks.append(("pname", m.group(0)))
            else:
                self.toks.append((kind, m.group(0)))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.rows: list[Row6] = []
        self._bn = 0

    # -- token helpers ------------------------------------------------
    def peek(self) -> Optional[tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        k, v = self.next()
        if v != ch:
            raise ValueError(f"expected '{ch}', got {v!r}")

    def new_bnode(self) -> str:
        self._bn += 1
        return f"_:gen{self._bn}"

    # -- grammar ------------------------------------------------------
    def parse(self) -> list[Row6]:
        while self.peek():
            k, v = self.peek()
            low = v.lower()
            if low in ("@prefix", "prefix"):
                self.next()
                _, pn = self.next()           # "pfx:" pname token
                pfx = pn[:-1] if pn.endswith(":") else pn.split(":")[0]
                _, iri = self.next()
                self.prefixes[pfx] = self._iri(iri)
                if self.peek() and self.peek()[1] == ".":
                    self.next()
            elif low in ("@base", "base"):
                self.next()
                _, iri = self.next()
                self.base = self._iri(iri)
                if self.peek() and self.peek()[1] == ".":
                    self.next()
            elif self.n3 and low in ("@forall", "@forsome"):
                raise NotImplementedError(
                    f"N3 quantification ({v}) is permanently out of "
                    "scope (decision r5, SURVEY.md §2.1): quantified "
                    "variables have no faithful flat-triple encoding. "
                    "Formula terms {{ ... }} and => / <= implications "
                    "ARE supported (reified log:Formula encoding, see "
                    "formula())."
                )
            else:
                self.triples_block()
        return self.rows

    def triples_block(self) -> None:
        subj = self.node(as_subject=True)
        self.predicate_object_list(subj)
        if self.peek() and self.peek()[1] == ".":
            self.next()

    def predicate_object_list(self, subj: str) -> None:
        while True:
            k, v = self.peek()
            inverted = False
            if v == "a":
                self.next()
                pred = RDF_TYPE
            elif self.n3 and v == "=":
                # N3 equality operator: x = y  means  x owl:sameAs y
                self.next()
                pred = _OWL_SAMEAS
            elif self.n3 and v == "=>":
                # {A} => {B}  is sugar for  A log:implies B
                self.next()
                pred = _LOG_IMPLIES
            elif self.n3 and v == "<=":
                # A <= B  is sugar for  B log:implies A
                self.next()
                pred = _LOG_IMPLIES
                inverted = True
            elif self.n3 and k == "kw" and v == "has":
                # 'has <pred>' — explicit forward predicate marker
                self.next()
                pred = self.resolve_iri_token()
            elif self.n3 and k == "kw" and v == "is":
                # 'is <pred> of' — inverse predicate: obj pred subj
                self.next()
                pred = self.resolve_iri_token()
                _, of = self.next()
                if of != "of":
                    raise ValueError(
                        f"expected 'of' after 'is <pred>', got {of!r}"
                    )
                inverted = True
            else:
                pred = self.resolve_iri_token()
            while True:
                self.object_item(subj, pred, inverted)
                if self.peek() and self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek() and self.peek()[1] == ";":
                self.next()
                # allow trailing ; before . or ]
                if self.peek() and self.peek()[1] in (".", "]"):
                    return
                continue
            return

    def object_item(
        self, subj: str, pred: str, inverted: bool = False
    ) -> None:
        obj, kind, lang, dt = self.term()
        if inverted:
            if kind == "literal":
                raise ValueError(
                    "'is <pred> of <term>' needs a node term: a literal "
                    "cannot be a triple subject"
                )
            s_kind = "bnode" if subj.startswith("_:") else "uri"
            self.rows.append((obj, pred, subj, s_kind, None, None))
        else:
            self.rows.append((subj, pred, obj, kind, lang, dt))

    def node(self, as_subject: bool = False) -> str:
        k, v = self.peek()
        if self.n3 and v == "{":
            return self.formula()
        if v == "[":
            self.next()
            bn = self.new_bnode()
            if self.peek() and self.peek()[1] != "]":
                self.predicate_object_list(bn)
            self.expect_punct("]")
            return bn
        if v == "(":
            return self.collection()
        if k == "bnode":
            self.next()
            return v
        n = self.resolve_iri_token()
        if self.n3:
            n = self._n3_path(n, "uri")[0]
        return n

    def formula(self) -> str:
        """N3 formula term ``{ ... }`` -> deterministic triple encoding
        (the engine's documented canonicalization — a flat triple store
        has no quoted-graph contexts, so formula contents are stored as
        standard RDF reification membership):

        * the formula is a bnode ``f`` with ``f rdf:type log:Formula``;
        * every statement inside it (including the structural
          rdf:first/rest rows of inner collections and the
          property-list rows of inner bnodes) becomes a reified
          ``rdf:Statement`` bnode ``st`` with the usual
          rdf:subject/predicate/object, linked ``f log:includes st``;
        * nested formulae keep their own encoding verbatim (encoding
          rows are never re-reified); the inner formula node appears as
          the rdf:object of an outer statement.

        ``{A} => {B}`` / ``<=`` then parse as ordinary triples with
        predicate ``log:implies`` (SWAP log vocabulary).  This is a
        LOAD-TIME one-way canonicalization: exports serialize the
        encoding triples, not ``{ }`` syntax — same as exporting
        rdflib formula contexts through a plain-triple format.
        Quantifiers (@forAll/@forSome) remain out of scope — see the
        parse() error message and SURVEY.md §2.1."""
        self.expect_punct("{")
        f = self.new_bnode()
        self.rows.append((f, RDF_TYPE, _LOG_FORMULA, "uri", None, None))
        while self.peek() and self.peek()[1] != "}":
            start = len(self.rows)
            subj = self.node(as_subject=True)
            self.predicate_object_list(subj)
            if self.peek() and self.peek()[1] == ".":
                self.next()
            inner = self.rows[start:]
            del self.rows[start:]
            for (s, p, o, kind, lang, dt) in inner:
                if p in _REIFY_PREDS or (
                    p == RDF_TYPE and o in (_RDF_STATEMENT, _LOG_FORMULA)
                ):
                    self.rows.append((s, p, o, kind, lang, dt))
                    continue
                st = self.new_bnode()
                self.rows.append(
                    (f, _LOG_INCLUDES, st, "bnode", None, None)
                )
                self.rows.append(
                    (st, RDF_TYPE, _RDF_STATEMENT, "uri", None, None)
                )
                s_kind = "bnode" if s.startswith("_:") else "uri"
                self.rows.append(
                    (st, _RDF_SUBJECT, s, s_kind, None, None)
                )
                self.rows.append(
                    (st, _RDF_PREDICATE, p, "uri", None, None)
                )
                self.rows.append((st, _RDF_OBJECT, o, kind, lang, dt))
        self.expect_punct("}")
        return f

    def collection(self) -> str:
        self.expect_punct("(")
        items: list[tuple[str, str, Optional[str], Optional[str]]] = []
        while self.peek() and self.peek()[1] != ")":
            items.append(self.term())
        self.expect_punct(")")
        if not items:
            return RDF_NIL
        head = self.new_bnode()
        cur = head
        for idx, (o, kind, lang, dt) in enumerate(items):
            self.rows.append((cur, RDF_FIRST, o, kind, lang, dt))
            if idx == len(items) - 1:
                self.rows.append((cur, RDF_REST, RDF_NIL, "uri", None, None))
            else:
                nxt = self.new_bnode()
                self.rows.append((cur, RDF_REST, nxt, "bnode", None, None))
                cur = nxt
        return head

    def term(self) -> tuple[str, str, Optional[str], Optional[str]]:
        k, v = self.peek()
        if self.n3 and v == "{":
            return (self.formula(), "bnode", None, None)
        if v in ("[", "("):
            n = self.node()
            return self._n3_path(n, "uri" if n == RDF_NIL else "bnode")
        if k == "bnode":
            self.next()
            return self._n3_path(v, "bnode")
        if k in ("str", "triple_str"):
            self.next()
            raw = v[3:-3] if k == "triple_str" else v[1:-1]
            val = _unescape_str(raw)
            lang = dt = None
            if self.peek() and self.peek()[0] == "langtag":
                lang = self.next()[1][1:]
            elif self.peek() and self.peek()[0] == "dtmark":
                self.next()
                dt = self.resolve_iri_token()
            return val, "literal", lang, dt
        if k == "num":
            self.next()
            if re.search(r"[.eE]", v):
                dt = XSD.double if re.search(r"[eE]", v) else XSD.decimal
            else:
                dt = XSD.integer
            return v, "literal", None, dt
        if k == "kw" and v in ("true", "false"):
            self.next()
            return v, "literal", None, XSD.boolean
        iri = self.resolve_iri_token()
        return self._n3_path(iri, "uri")

    def _n3_path(
        self, node: str, kind: str
    ) -> tuple[str, str, Optional[str], Optional[str]]:
        """N3 path operators on a node term: ``x!p`` denotes the value
        of p of x (fresh bnode v with x p v), ``x^p`` denotes a subject
        having p x (fresh bnode v with v p x); chainable."""
        while self.n3 and self.peek() and self.peek()[1] in ("!", "^"):
            _, op = self.next()
            pred = self.resolve_iri_token()
            bn = self.new_bnode()
            if op == "!":
                self.rows.append((node, pred, bn, "bnode", None, None))
            else:
                self.rows.append((bn, pred, node, kind, None, None))
            node, kind = bn, "bnode"
        return node, kind, None, None

    def resolve_iri_token(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self._iri(v)
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r}")
            return self.prefixes[pfx] + local
        raise ValueError(f"expected IRI, got {v!r}")

    def _iri(self, tok: str) -> str:
        val = tok[1:-1]
        if val.startswith("#") or (self.base and "://" not in val and not val.startswith("urn:")):
            return self.base + val
        return val


def parse_turtle(text: str) -> list[Row6]:
    return _TurtleParser(text).parse()


class _N3Parser(_TurtleParser):
    n3 = True


def parse_n3(text: str) -> list[Row6]:
    """Notation3 (public W3C team submission): the Turtle surface plus
    the N3-only tokens rdflib accepts in ontology documents — ``=``
    (owl:sameAs), ``has <p>`` / ``is <p> of`` predicate markers, and
    ``!`` / ``^`` path expressions (each step materializes a fresh
    bnode triple).  Rule-program constructs — formulae ``{ }``,
    implication ``=>`` / ``<=``, quantifiers ``@forAll`` /
    ``@forSome`` — raise ``NotImplementedError`` with a clear message
    instead of silently mis-parsing (the reference feeds ``format=
    "n3"`` to rdflib, ontology_manager.py:2000-2012; ontology files in
    the wild use the document subset)."""
    return _N3Parser(text).parse()


# ------------------------------------------------------------------ #
# RDF/XML
# ------------------------------------------------------------------ #

_RDF = "{" + RDF_NS + "}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def parse_rdfxml(text: str) -> list[Row6]:
    root = ET.fromstring(text)
    rows: list[Row6] = []
    counter = [0]

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:x{counter[0]}"

    def uri_of(tag: str) -> str:
        return tag[1:].replace("}", "") if tag.startswith("{") else tag

    def node_subject(el: ET.Element) -> str:
        about = el.get(_RDF + "about")
        if about is not None:
            return about
        rid = el.get(_RDF + "ID")
        if rid is not None:
            return "#" + rid
        nid = el.get(_RDF + "nodeID")
        if nid is not None:
            return "_:" + nid
        return new_bnode()

    def walk_node(el: ET.Element, lang: Optional[str]) -> str:
        subj = node_subject(el)
        lang = el.get(_XML_LANG, lang)
        if uri_of(el.tag) != RDF_NS + "Description":
            rows.append((subj, RDF_TYPE, uri_of(el.tag), "uri", None, None))
        for prop in el:
            walk_prop(subj, prop, lang)
        return subj

    def walk_prop(subj: str, prop: ET.Element, lang: Optional[str]) -> None:
        pred = uri_of(prop.tag)
        plang = prop.get(_XML_LANG, lang)
        res = prop.get(_RDF + "resource")
        if res is not None:
            rows.append((subj, pred, res, "uri", None, None))
            return
        nid = prop.get(_RDF + "nodeID")
        if nid is not None:
            rows.append((subj, pred, "_:" + nid, "bnode", None, None))
            return
        if prop.get(_RDF + "parseType") == "Resource":
            bn = new_bnode()
            rows.append((subj, pred, bn, "bnode", None, None))
            for sub in prop:
                walk_prop(bn, sub, plang)
            return
        if prop.get(_RDF + "parseType") == "Collection":
            items = [walk_node(ch, plang) for ch in prop]
            if not items:
                rows.append((subj, pred, RDF_NIL, "uri", None, None))
                return
            head = new_bnode()
            rows.append((subj, pred, head, "bnode", None, None))
            cur = head
            for idx, it in enumerate(items):
                kind = "bnode" if it.startswith("_:") else "uri"
                rows.append((cur, RDF_FIRST, it, kind, None, None))
                if idx == len(items) - 1:
                    rows.append((cur, RDF_REST, RDF_NIL, "uri", None, None))
                else:
                    nxt = new_bnode()
                    rows.append((cur, RDF_REST, nxt, "bnode", None, None))
                    cur = nxt
            return
        children = list(prop)
        if children:
            obj = walk_node(children[0], plang)
            kind = "bnode" if obj.startswith("_:") else "uri"
            rows.append((subj, pred, obj, kind, None, None))
            return
        dt = prop.get(_RDF + "datatype")
        val = prop.text or ""
        rows.append(
            (subj, pred, val, "literal", None if dt else plang, dt)
        )

    for el in root:
        walk_node(el, root.get(_XML_LANG))
    return rows


# ------------------------------------------------------------------ #
# JSON-LD
# ------------------------------------------------------------------ #


def _expand(term: str, ctx: dict[str, str]) -> str:
    if term.startswith("@"):
        return term
    pfx, sep, local = term.partition(":")
    if sep and pfx in ctx:
        return ctx[pfx] + local
    if term in ctx:
        return ctx[term]
    return term


def _jsonld_context(doc) -> dict:
    """Normalize a JSON-LD ``@context`` to {term: str} — dict form, or a
    LIST of context objects merged left-to-right (later wins), matching
    the reference (``ontology_manager.py:207-213``)."""
    ctx_raw = doc.get("@context", {}) if isinstance(doc, dict) else {}
    if isinstance(ctx_raw, list):
        merged: dict = {}
        for item in ctx_raw:
            if isinstance(item, dict):
                merged.update(item)
        ctx_raw = merged
    if not isinstance(ctx_raw, dict):
        return {}
    return {k: v for k, v in ctx_raw.items() if isinstance(v, str)}


def jsonld_prefixes(text: str) -> list[tuple[str, str]]:
    """(prefix, namespace) pairs from a JSON-LD ``@context`` — the
    reference's ``_extract_prefixes_from_jsonld``
    (``ontology_manager.py:195-225``): [] on invalid JSON or top-level
    list (expanded form carries no context); '@'-keywords skipped; only
    http(s) string values count; '' maps to '(default)'; default-first
    sort."""
    try:
        doc = json.loads(text)
    except (json.JSONDecodeError, TypeError):
        return []
    if isinstance(doc, list):
        return []
    out = [
        (k if k else "(default)", v)
        for k, v in _jsonld_context(doc).items()
        if not k.startswith("@")
        and (v.startswith("http://") or v.startswith("https://"))
    ]
    out.sort(key=lambda x: "" if x[0] == "(default)" else x[0])
    return out


def parse_jsonld(text: str) -> list[Row6]:
    doc = json.loads(text)
    ctx = _jsonld_context(doc)
    if isinstance(doc, list):
        nodes = doc
    elif "@graph" in doc:
        nodes = doc["@graph"]
    else:
        nodes = [doc]
    rows: list[Row6] = []
    counter = [0]

    def new_bnode() -> str:
        counter[0] += 1
        return f"_:j{counter[0]}"

    def node_id(n: dict) -> str:
        return _expand(n.get("@id") or new_bnode(), ctx)

    def emit(subj: str, pred: str, val) -> None:
        if isinstance(val, dict) and "@list" in val:
            items = val["@list"]
            if not items:
                rows.append((subj, pred, RDF_NIL, "uri", None, None))
                return
            head = new_bnode()
            rows.append((subj, pred, head, "bnode", None, None))
            cur = head
            for idx, it in enumerate(items):
                emit(cur, RDF_FIRST, it)
                if idx == len(items) - 1:
                    rows.append((cur, RDF_REST, RDF_NIL, "uri", None, None))
                else:
                    nxt = new_bnode()
                    rows.append((cur, RDF_REST, nxt, "bnode", None, None))
                    cur = nxt
            return
        if isinstance(val, dict) and "@value" in val:
            dt = val.get("@type")
            rows.append(
                (subj, pred, str(val["@value"]), "literal",
                 val.get("@language"), _expand(dt, ctx) if dt else None)
            )
            return
        if isinstance(val, dict):
            obj = node_id(val)
            kind = "bnode" if obj.startswith("_:") else "uri"
            rows.append((subj, pred, obj, kind, None, None))
            walk(val, obj)
            return
        if isinstance(val, bool):
            rows.append((subj, pred, str(val).lower(), "literal", None, XSD.boolean))
            return
        if isinstance(val, int):
            rows.append((subj, pred, str(val), "literal", None, XSD.integer))
            return
        if isinstance(val, float):
            rows.append((subj, pred, str(val), "literal", None, XSD.double))
            return
        # plain string: IRI keywords handled by caller; treat as literal
        rows.append((subj, pred, str(val), "literal", None, None))

    def walk(n: dict, subj: Optional[str] = None) -> None:
        subj = subj or node_id(n)
        for key, vals in n.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                for tv in vals if isinstance(vals, list) else [vals]:
                    rows.append((subj, RDF_TYPE, _expand(tv, ctx), "uri", None, None))
                continue
            pred = _expand(key, ctx)
            for v in vals if isinstance(vals, list) else [vals]:
                emit(subj, pred, v)

    for n in nodes:
        walk(n)
    return rows
