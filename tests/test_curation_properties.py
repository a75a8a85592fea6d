"""Property-based differential tests for the curation operators vs
pure-Python references (hypothesis).  Few examples, one Spark job per
example — each example is a whole random corpus, so 10 examples cover
hundreds of documents including degenerate ones (empty text, all-
punctuation, single-token)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from orionbelt_ontology_builder_spark.datapipe import curation as C

WORDS = ["the", "fox", "rain", "spark", "data", "a", "x9", "Meadow", "##", ""]


def _text():
    return st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(
        " ".join
    )


def _corpus():
    return st.lists(_text(), min_size=1, max_size=12)


def _norm_toks(text: str) -> list[str]:
    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return norm.split(" ") if norm else [""]


def _grams(text: str, n: int) -> set[str]:
    toks = _norm_toks(text)
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=10, deadline=None)
@given(_corpus(), st.integers(min_value=2, max_value=4))
def test_decontaminate_matches_python_reference(spark, texts, n):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    d = spark.createDataFrame(rows)
    bench_ids = [i for i in range(len(texts)) if i % 3 == 0]
    bench_grams = set().union(*(_grams(texts[i], n) for i in bench_ids))
    out = {r["doc_id"]: r for r in
           C.decontaminate(d, d.filter(d.doc_id % 3 == 0), n=n).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        g = _grams(t, n)
        assert out[i]["n_grams"] == len(g)
        assert out[i]["n_contaminated_grams"] == len(g & bench_grams)
        assert out[i]["contaminated"] == int(bool(g & bench_grams))


@settings(max_examples=10, deadline=None)
@given(
    _corpus(),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=3),
)
def test_pack_sequences_matches_python_reference(spark, texts, cap, shards):
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    out = {
        r["doc_id"]: r
        for r in C.pack_sequences(
            spark.createDataFrame(rows), capacity=cap, shards=shards
        ).collect()
    }
    offsets = {s: 0 for s in range(shards)}
    for i, t in enumerate(texts):
        norm = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        ntok = len(norm.split(" ")) if norm else 0
        sh = i % shards
        start = offsets[sh]
        offsets[sh] += ntok
        r = out[i]
        assert (r["shard"], r["n_tokens"], r["start_offset"]) == (sh, ntok, start)
        assert r["first_chunk"] == start // cap
        last = (start + ntok - 1) // cap if ntok > 0 else start // cap
        assert r["last_chunk"] == last
        assert r["n_chunks"] == last - start // cap + 1
