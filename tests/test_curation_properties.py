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


def test_domain_quality_blocklist_threshold(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    good = " ".join(
        ["the quick brown fox jumps over the lazy dog again and again"] * 10
    )
    bad = "000 111 222"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=good, source="good.com") for i in range(5)]
        + [Row(doc_id=10 + i, text=bad, source="bad.com") for i in range(5)]
        + [Row(doc_id=100, text=bad, source="tiny.com")]
    )
    out = {r["source"]: r for r in C.domain_quality(
        docs, min_docs=5, block_threshold=0.4).collect()}
    assert not out["good.com"]["blocked"]
    assert out["bad.com"]["blocked"] and out["bad.com"]["n_docs"] == 5
    # below min_docs: never proposed even if low quality
    assert not out["tiny.com"]["blocked"]


def test_cluster_representatives_picks_best_quality(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    base = ("the quick brown fox jumps over the lazy dog while rain "
            "falls softly on the quiet green meadow near the bridge")
    docs = spark.createDataFrame([
        # near-dup pair: doc 1 is longer -> higher quality than doc 0
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base + " and the river runs past the old mill"),
        Row(doc_id=2, text="completely unrelated text about spark plans"),
    ])
    out = C.cluster_representatives(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["keeper_doc_id"] == 0          # min-id cluster key
    assert r["rep_doc_id"] == 1             # best-quality member wins
    assert r["cluster_size"] == 2
