"""Property-based round-trip tests for the RDF codecs (hypothesis).

SURVEY.md M0: the N-Triples codec is the keystone — round-trip is
property-tested over adversarial term content (quotes, backslashes,
control chars, unicode, lang tags, datatypes).  The driver-side codecs
(Turtle/RDF-XML/JSON-LD) get the same treatment on smaller budgets.

Spark round-trips are exercised per-example elsewhere; here the
serializer/parser pairs are driven purely driver-side for speed — the
NT pair is validated through Spark in test_ntriples.py with the same
escaping rules.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from orionbelt_ontology_builder_spark.sources import parsers as PAR
from orionbelt_ontology_builder_spark.sources import serializers as SER

# URI-safe characters for subjects/predicates (URIs with <> or spaces
# are invalid RDF anyway; the engine stores what parsers produce)
_uri = st.from_regex(r"http://x\.org/[A-Za-z0-9_./#-]{1,20}", fullmatch=True)
# predicates must end in an NCName to be expressible in RDF/XML
# (serializers._split_qname raises otherwise, mirroring rdflib's limit)
_pred = st.from_regex(
    r"http://x\.org/[A-Za-z0-9_./#-]{0,12}[A-Za-z_][A-Za-z0-9_.-]{0,6}",
    fullmatch=True,
)
_bnode = st.from_regex(r"_:[A-Za-z0-9]{1,10}", fullmatch=True)
# literal text: printable unicode incl. quotes/backslashes/newlines/tabs
_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\x00",
        exclude_categories=("Cs",),
    ),
    max_size=40,
)
_lang = st.one_of(st.none(), st.from_regex(r"[a-z]{2}(-[A-Z]{2})?", fullmatch=True))
_dt = st.one_of(st.none(), _uri)


@st.composite
def triple(draw):
    subj = draw(st.one_of(_uri, _bnode))
    pred = draw(_pred)
    kind = draw(st.sampled_from(["uri", "bnode", "literal"]))
    if kind == "uri":
        return (subj, pred, draw(_uri), "uri", None, None)
    if kind == "bnode":
        return (subj, pred, draw(_bnode), "bnode", None, None)
    lang = draw(_lang)
    dt = None if lang else draw(_dt)
    return (subj, pred, draw(_text), "literal", lang, dt)


def _nt_line(row):
    """Driver-side twin of sources.ntriples escaping (same spec)."""
    s, p, o, k, lang, dt = row
    sterm = s if s.startswith("_:") else f"<{s}>"
    if k == "uri":
        oterm = f"<{o}>"
    elif k == "bnode":
        oterm = o
    else:
        esc = (o.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
        oterm = f'"{esc}"'
        if lang:
            oterm += f"@{lang}"
        elif dt:
            oterm += f"^^<{dt}>"
    return f"{sterm} <{p}> {oterm} ."


# control chars other than \n \r \t inside literals are not emitted
# escaped by the codec; exclude them from the NT property (they ARE
# covered by turtle/jsonld below, which pass them through verbatim)
_NT_BAD = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _k(r):
    # None-safe tuple sort (rows mix None and str in lang/dt slots)
    return tuple("" if v is None else v for v in r)


@settings(max_examples=200, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=8))
def test_turtle_roundtrip_property(rows):
    rows = list({r for r in rows})
    got = PAR.parse_turtle(SER.to_turtle(rows))
    assert sorted(set(got), key=_k) == sorted(set(rows), key=_k)


@settings(max_examples=100, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=6))
def test_jsonld_roundtrip_property(rows):
    rows = list({r for r in rows})
    got = PAR.parse_jsonld(SER.to_jsonld(rows))
    assert sorted(set(got), key=_k) == sorted(set(rows), key=_k)


@settings(max_examples=100, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=6))
def test_rdfxml_roundtrip_property(rows):
    # XML cannot carry most control chars at all; skip those rows
    rows = [r for r in set(rows) if not _NT_BAD.search(r[2]) ]
    rows = [r for r in rows if r[2] not in ("\r",) and "\r" not in r[2]]
    if not rows:
        return
    got = PAR.parse_rdfxml(SER.to_rdfxml(rows))
    assert sorted(set(got), key=_k) == sorted(set(rows), key=_k)


@settings(max_examples=150, deadline=None)
@given(st.lists(triple(), min_size=1, max_size=8))
def test_n3_is_turtle_superset_property(rows):
    """For ANY serialized Turtle document, the N3 parser and the Turtle
    parser produce identical triples — N3 is a strict superset, so the
    shared surface must agree exactly (round-3 law for the real N3
    parser that replaced the silent alias)."""
    rows = list({r for r in rows})
    text = SER.to_turtle(rows)
    assert sorted(set(PAR.parse_n3(text)), key=_k) == sorted(
        set(PAR.parse_turtle(text)), key=_k
    )


# ------------------------------------------------------------------ #
# media codecs: lossless round-trip properties over adversarial inputs
# ------------------------------------------------------------------ #

import numpy as np

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@st.composite
def gray_image(draw):
    h, w = draw(_dims)
    # mix structured (low-cardinality, LZ-friendly) and full-range
    # pixels so both the literal and backward-reference paths run
    card = draw(st.sampled_from([2, 4, 256]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, card, size=(h, w)).astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(gray_image())
def test_gif_roundtrip_property(img):
    from orionbelt_ontology_builder_spark.datapipe import gifcodec as G

    out = G.decode_gif(G.encode_gif_gray(img))
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 1], img)


@settings(max_examples=60, deadline=None)
@given(gray_image())
def test_webp_roundtrip_property(img):
    from orionbelt_ontology_builder_spark.datapipe import webpcodec as W

    out = W.decode_webp(W.encode_webp_gray(img))
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 2], img)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.integers(1, 600),
    st.sampled_from([2, 16, 65536]),
    st.booleans(),
)
def test_flac_roundtrip_property(seed, n, spread, lpc):
    from orionbelt_ontology_builder_spark.datapipe import flaccodec as FL

    rng = np.random.default_rng(seed)
    s = (
        rng.integers(-(spread // 2) - 1, spread // 2 + 1, size=n)
        .cumsum()
        .clip(-32768, 32767)
        .astype(np.int16)
    )
    out, rate = FL.decode_flac(FL.encode_flac_mono16(s, lpc_frame=lpc))
    assert rate == 8000
    assert np.array_equal(out, s)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400), st.sampled_from(["mulaw", "alaw"]))
def test_g711_codeword_roundtrip_property(codes, law):
    """decode is a bijection onto levels; encode(decode(c)) re-decodes
    to the same level for EVERY codeword (incl. the duplicate zeros)."""
    from orionbelt_ontology_builder_spark.datapipe import g711codec as G

    lvl = G.decode_g711(codes, law)
    again = G.decode_g711(G.encode_g711(lvl, law), law)
    assert np.array_equal(lvl, again)
