"""Independent Turtle statement counter (grammar separators, no parse).

Exists so the ``upper_ontology_stats`` oracle's ``total_triples`` column
is NOT self-certified by the engine's own Turtle parser
(``sources/parsers.py``): this module never builds a triple — it counts
statement-producing grammar positions directly off the token stream
(';'/','/'.' separators, property-list tails, collection elements), so a
triple-counting bug in the parser and a bug here would have to coincide
to agree.  Verified exact against the parser on every reference sample
Turtle file (``tests/test_samples_integration.py``).

Counting rules (Turtle grammar, W3C TR/turtle):

- each stand-alone ``.`` statement terminator → 1 triple (the final
  predicate-object pair of the statement);
- each ``;`` introducing a further pair → 1; a *trailing* semicolon
  (followed by ``.``/``]``/``;``) produces nothing;
- each ``,`` → 1 (an additional object for the current predicate);
- a bracketed property list ``[...]`` with content → 1 for its final
  pair (the pairs before it were counted by their ``;``);
- each element of a collection ``(...)`` → 2 (its ``rdf:first`` and
  ``rdf:rest`` cons triples); the collection node itself is the object
  of the containing pair, which is counted by that pair's separator.

Scope: plain Turtle documents (the reference's sample set).  Not a
validator — malformed input yields a best-effort number, never an
exception.
"""

from __future__ import annotations

import re

_SEPARATOR_RE = re.compile(r"([\[\]\();,])")
_DOT_RE = re.compile(r"\.(?=\s|$)")
_DIRECTIVE_RE = re.compile(
    r"(?m)^\s*(@prefix|@base|PREFIX|BASE)[^\n]*$"
)


def _lex(text: str) -> list[str]:
    """Token stream with strings → ``STR``, IRIs → ``IRI``, comments
    dropped — so no dot/semicolon inside a literal or IRI can be
    mistaken for a separator."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j
        elif text.startswith('"""', i) or text.startswith("'''", i):
            q = text[i : i + 3]
            j = i + 3
            while j < n and not text.startswith(q, j):
                j += 2 if text[j] == "\\" else 1
            out.append(" STR ")
            i = j + 3
        elif c in "\"'":
            j = i + 1
            while j < n and text[j] != c:
                j += 2 if text[j] == "\\" else 1
            out.append(" STR ")
            i = j + 1
        elif c == "<":
            j = text.find(">", i)
            out.append(" IRI ")
            i = (j + 1) if j >= 0 else n
        else:
            out.append(c)
            i += 1
    s = "".join(out)
    s = _DIRECTIVE_RE.sub(" ", s)
    s = _SEPARATOR_RE.sub(r" \1 ", s)
    s = _DOT_RE.sub(" . ", s)
    return s.split()


def count_turtle_statements(text: str) -> int:
    """Number of triples a conforming Turtle parser emits for ``text``
    — derived from separator positions alone (see module docstring)."""
    toks = _lex(text)
    triples = 0
    # context stack: ["("] for a collection, ["[", has_content] for a
    # bnode property list — element/content rules read the stack top.
    stack: list[list] = []
    for k, t in enumerate(toks):
        top = stack[-1] if stack else None
        nxt = toks[k + 1] if k + 1 < len(toks) else None
        if t == "(":
            if top is not None and top[0] == "(":
                triples += 2  # nested collection node is an element
            stack.append(["("])
        elif t == ")":
            if stack:
                stack.pop()
        elif t == "[":
            if top is not None and top[0] == "(":
                triples += 2  # bnode element: rdf:first + rdf:rest
            stack.append(["[", False])
        elif t == "]":
            if stack and stack.pop()[1]:
                triples += 1  # final pair of the property list
        elif t == ";":
            if nxt not in (".", "]", ";", None):
                triples += 1
        elif t == ",":
            triples += 1
        elif t == ".":
            triples += 1
        else:
            if top is not None and top[0] == "(":
                triples += 2  # bare collection element
            elif top is not None and top[0] == "[" and not top[1]:
                top[1] = True
    return triples
