"""HTML -> text extraction: the shared pure-Python reference module.

BASELINE.json demands *byte-identical extracted text per url* versus the
reference extractor.  We make identity hold by construction: this module
IS the reference implementation, imported both by the Spark pandas UDF
(``extract.py``) and by the oracle tests — one code path, one byte
stream.  No external HTML lib (the container has none); the grammar the
synthesizer emits is plain HTML4 with entities, which this covers.

The function is deliberately dependency-free and total: any bytes in,
deterministic text out.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    rb"</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|nav|footer|header|section|article)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITIES = {
    b"&amp;": b"&",
    b"&lt;": b"<",
    b"&gt;": b">",
    b"&quot;": b'"',
    b"&#39;": b"'",
    b"&apos;": b"'",
    b"&nbsp;": b" ",
}
_WS_RE = re.compile(rb"[ \t\r\f\v]+")
_NL_RE = re.compile(rb"\n\s*\n+")


def html_to_text(html: bytes) -> str:
    """Deterministic text extraction.  Order of operations is part of the
    byte-identity contract — do not reorder:

    1. drop script/style blocks and comments
    2. block-level tags become newlines, all other tags vanish
    3. decode the fixed entity set
    4. collapse horizontal whitespace; collapse blank-line runs
    5. strip each line; drop empty lines; join with single newlines
    """
    if html is None:
        return ""
    if isinstance(html, str):
        html = html.encode("utf-8", "replace")
    s = _SCRIPT_RE.sub(b" ", html)
    s = _COMMENT_RE.sub(b" ", s)
    s = _BLOCK_TAG_RE.sub(b"\n", s)
    s = _TAG_RE.sub(b" ", s)
    for ent, rep in _ENTITIES.items():
        s = s.replace(ent, rep)
    s = _WS_RE.sub(b" ", s)
    lines = [ln.strip() for ln in s.split(b"\n")]
    out = b"\n".join(ln for ln in lines if ln)
    return out.decode("utf-8", "replace")


# --------------------------------------------------------------------------
# sentence-pattern triple extraction (pure, shared by UDF and oracle)
# --------------------------------------------------------------------------

#: relation surface patterns the synthesizer emits and the extractor
#: recognizes.  (pattern, predicate local name).  The extractor does NOT
#: know the entity catalog — it matches sentence shapes only; alias
#: resolution happens later in the linking stage.
RELATION_PATTERNS: list[tuple[str, str]] = [
    # "Every ..." MUST precede the "is a" pattern — "Every City is a
    # Place." would otherwise parse as a type assertion with subject
    # "Every City".
    (r"^Every (?P<s>[A-Z][\w\- .]*?) is an? (?P<o>[A-Z][\w\- .]*?)\.$", "subClassOf"),
    (r"^(?P<s>[A-Z][\w\- .]*?) is located in (?P<o>[A-Z][\w\- .]*?)\.$", "locatedIn"),
    (r"^(?P<s>[A-Z][\w\- .]*?) was founded by (?P<o>[A-Z][\w\- .]*?)\.$", "foundedBy"),
    (r"^(?P<s>[A-Z][\w\- .]*?) works with (?P<o>[A-Z][\w\- .]*?)\.$", "worksWith"),
    (r"^(?P<s>[A-Z][\w\- .]*?) is an? (?P<o>[A-Z][\w\- .]*?)\.$", "type"),
]

_COMPILED = [(re.compile(p), pred) for p, pred in RELATION_PATTERNS]


def extract_triples_from_text(text: str) -> list[tuple[str, str, str]]:
    """(subject_surface, predicate, object_surface) per matched sentence.
    Deterministic; first matching pattern per sentence wins."""
    out: list[tuple[str, str, str]] = []
    for line in text.split("\n"):
        for sent in _split_sentences(line):
            for rx, pred in _COMPILED:
                m = rx.match(sent)
                if m:
                    out.append((m.group("s").strip(), pred, m.group("o").strip()))
                    break
    return out


def _split_sentences(line: str) -> list[str]:
    parts = []
    for chunk in line.split(". "):
        chunk = chunk.strip()
        if not chunk:
            continue
        if not chunk.endswith("."):
            chunk += "."
        parts.append(chunk)
    return parts


def extract_mentions_from_text(text: str) -> list[str]:
    """All entity surface forms participating in matched relations."""
    ments = []
    for s, _p, o in extract_triples_from_text(text):
        ments.append(s)
        ments.append(o)
    return ments
