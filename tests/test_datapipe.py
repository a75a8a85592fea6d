"""Semantic tests for the training-data pipeline operators (datapipe).

Synthetic micro-corpora with planted exact dups / near-dups / clusters,
so each operator's *behavior* is asserted (the driver's differential
oracle separately asserts engine parity on /root/testdata)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark.datapipe import (
    dedup,
    multimodal,
    similarity,
    textstats,
)

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls softly on the quiet green meadow near the old stone bridge"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text=BASE_TEXT, lang="en", source="s0",
            n_chars=len(BASE_TEXT)),
        # exact duplicate (after normalization: case + punctuation)
        Row(doc_id=1, text=BASE_TEXT.upper() + "!!", lang="en", source="s1",
            n_chars=len(BASE_TEXT) + 2),
        # near duplicate: one word changed
        Row(doc_id=2, text=BASE_TEXT.replace("lazy", "sleepy"), lang="en",
            source="s2", n_chars=len(BASE_TEXT) + 2),
        # unrelated
        Row(doc_id=3,
            text="completely different content about spark catalyst "
                 "optimizer plans shuffles partitions and executors",
            lang="en", source="s3", n_chars=99),
        Row(doc_id=4, text="der hund und die katze sind nicht auf der "
                           "wiese mit dem ball", lang="de", source="s4",
            n_chars=60),
    ]
    return spark.createDataFrame(rows).cache()


@pytest.fixture(scope="module")
def embs(spark):
    # 3 tight clusters of 4 vectors each (dim 8); cluster = vec_id % 3 so
    # the first vec_ids (the deterministic IVF centroids) span clusters
    rows = []
    for cid in range(3):
        base = [1.0 if i == cid else 0.0 for i in range(8)]
        for j in range(4):
            vec = [v + 0.01 * j * ((i % 3) - 1) for i, v in enumerate(base)]
            rows.append(Row(vec_id=cid + 3 * j, embedding=vec, label=cid))
    return spark.createDataFrame(rows).cache()


def test_exact_dedup_collapses_normalized_dup(docs):
    groups = dedup.exact_dedup_groups(docs).collect()
    sizes = {r["keeper_doc_id"]: r["n_docs"] for r in groups}
    assert sizes[0] == 2          # doc 1 normalizes to doc 0's text
    assert len(groups) == 4       # 5 docs, one collapsed pair


def test_minhash_finds_planted_near_dup(docs):
    pairs = dedup.minhash_band_pairs(docs, jaccard_threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found        # exact dup -> jaccard 1.0
    assert (0, 2) in found        # one-word edit -> high jaccard
    assert all(3 not in p and 4 not in p for p in found)


def test_minhash_agrees_with_exact_jaccard(docs):
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_band_pairs(docs, jaccard_threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_id=None
        ).collect()
    }
    # verified-pair jaccards are the exact values (LSH only gates candidates)
    for k, v in lsh.items():
        assert exact[k] == pytest.approx(v)


def test_minhash_bucket_cap_drops_degenerate_buckets(spark):
    # 60 identical docs -> every band bucket has 60 members > cap 50
    rows = [Row(doc_id=i, text=BASE_TEXT, lang="en", source="s",
                n_chars=len(BASE_TEXT)) for i in range(60)]
    d = spark.createDataFrame(rows)
    assert dedup.minhash_band_pairs(d, max_bucket=50).count() == 0
    assert dedup.minhash_band_pairs(d, max_bucket=500).count() == 60 * 59 / 2


def test_simhash_near_for_near_dups(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    ham01 = bin(sh[0] ^ sh[1]).count("1")
    ham03 = bin(sh[0] ^ sh[3]).count("1")
    assert ham01 == 0             # normalized-identical text
    assert ham03 > 3              # unrelated text far away


def test_fingerprint_shift_robust(spark):
    # same content with a prepended sentence: full_hash differs,
    # min_gram_hash can survive (window set overlaps heavily)
    rows = [
        Row(doc_id=0, text=BASE_TEXT, lang="en", source="s", n_chars=1),
        Row(doc_id=1, text="breaking news today " + BASE_TEXT, lang="en",
            source="s", n_chars=1),
    ]
    fps = {r["doc_id"]: r for r in
           textstats.fingerprints(spark.createDataFrame(rows)).collect()}
    assert fps[0]["full_hash"] != fps[1]["full_hash"]
    assert fps[0]["min_gram_hash"] == fps[1]["min_gram_hash"]


def test_lang_id_stopword_heuristic(docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in
           textstats.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[4] == "de"


def test_quality_monotone_in_length(docs):
    q = {r["doc_id"]: r["quality"] for r in
         textstats.quality_scores(docs).collect()}
    assert 0.0 < q[3] < 1.0
    assert q[0] > q[3]            # longer, stopword-rich text scores higher


def test_token_counts(docs):
    tc = {r["doc_id"]: r for r in textstats.token_counts(docs).collect()}
    assert tc[0]["n_tokens"] == len(BASE_TEXT.split())
    assert tc[0]["n_distinct_tokens"] < tc[0]["n_tokens"]


def test_brute_topk_prefers_same_cluster(embs):
    top = similarity.brute_topk(embs, n_queries=4, k=3).collect()
    for r in top:
        assert r["neighbor_id"] % 3 == r["query_id"] % 3
        assert r["cos"] > 0.99


def test_ivf_matches_brute_on_clustered_data(embs):
    brute = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in similarity.brute_topk(embs, n_queries=4, k=3).collect()}
    ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in similarity.ivf_topk(
               embs, n_queries=4, k=3, n_centroids=3, nprobe=1).collect()}
    # perfect recall when clusters are tight and centroid set spans them
    assert ivf == brute


def test_cosine_pairs_within_clusters(embs):
    pairs = dedup.cosine_pairs(embs, threshold=0.99).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["id_a"] % 3 == r["id_b"] % 3


def test_media_features_roundtrip(docs):
    media = multimodal.synthesize_media(docs)
    feats = {r["doc_id"]: r for r in
             multimodal.extract_features(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    assert feats[0]["header_ok"] == 1
    assert feats[0]["n_bytes"] == len(row0["text"]) + len(multimodal.HEADER)
    import hashlib
    want = hashlib.md5(multimodal.HEADER + row0["text"].encode()).hexdigest()
    assert feats[0]["content_md5"] == want


def test_media_frames_cover_payload(docs):
    media = multimodal.synthesize_media(docs)
    frames = multimodal.sample_frames(media).collect()
    by_doc: dict[int, int] = {}
    for r in frames:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["frame_len"]
    row0 = docs.filter(F.col("doc_id") == 0).first()
    assert by_doc[0] == len(row0["text"])          # chunks tile the payload
    assert all(r["frame_idx"] < multimodal.N_FRAMES for r in frames)


def test_decode_image_entropy_codecs_still_stubbed():
    # JPEG, GIF and lossless WebP are real decoders — truncated input
    # is a malformed-stream error, not a capability gap; only lossy
    # VP8 WebP stays honestly rejected (needs libwebp)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0jfif")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"GIF89a.....")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"RIFF....WEBPVP8L")
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\0" * 12
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(lossy)


def test_ppm_bmp_png_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (8, 8), (5, 3), (7, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ppm = multimodal.decode_image(multimodal.encode_ppm(px))
        assert (ppm == px).all() and ppm.shape == (h, w, 3)
        # BMP exercises row padding (w=5 -> 15-byte rows pad to 16)
        bmp = multimodal.decode_image(multimodal.encode_bmp(px))
        assert (bmp == px).all() and bmp.shape == (h, w, 3)
        # PNG round-trip: h >= 5 exercises all five scanline filters
        png = multimodal.decode_image(multimodal.encode_png(px))
        assert (png == px).all() and png.shape == (h, w, 3)
        flat = multimodal.decode_image(
            multimodal.encode_png(px, row_filters=False)
        )
        assert (flat == px).all()


def test_png_gray_palette_alpha_variants():
    """Hand-built non-RGB PNGs: gray (type 0), palette (3), gray+alpha
    (4), RGBA (6) all decode to (h, w, 3)."""
    import struct
    import zlib

    import numpy as np

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def build(w, h, ctype, raw_rows, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        out = multimodal._PNG_SIG + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        out += chunk(b"IDAT", zlib.compress(raw_rows)) + chunk(b"IEND", b"")
        return out

    # gray 2x2: filter 0 rows
    g = build(2, 2, 0, b"\x00\x0a\x14\x00\x1e\x28")
    arr = multimodal.decode_image(g)
    assert arr.shape == (2, 2, 3) and arr[0, 0, 0] == 10 and (
        arr[:, :, 1] == arr[:, :, 0]
    ).all()
    # palette 2x1: indices 1, 0
    plte = bytes([255, 0, 0, 0, 255, 0])
    p = build(2, 1, 3, b"\x00\x01\x00", plte)
    arr = multimodal.decode_image(p)
    assert arr.tolist() == [[[0, 255, 0], [255, 0, 0]]]
    # gray+alpha 1x1 and RGBA 1x1: alpha dropped
    ga = build(1, 1, 4, b"\x00\x07\x80")
    assert multimodal.decode_image(ga).tolist() == [[[7, 7, 7]]]
    rgba = build(1, 1, 6, b"\x00\x01\x02\x03\x80")
    assert multimodal.decode_image(rgba).tolist() == [[[1, 2, 3]]]


def test_pnm_gray_and_comments():
    import numpy as np

    g = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    blob = b"P5\n# a comment\n3 2\n255\n" + g.tobytes()
    arr = multimodal.decode_image(blob)
    assert arr.shape == (2, 3, 3)
    assert (arr[:, :, 0] == g[:, :, 0]).all()
    assert (arr[:, :, 1] == arr[:, :, 0]).all()  # gray replicated


def test_wav_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=37, dtype=np.int16)
    s, rate = multimodal.decode_wav(multimodal.encode_wav(mono, 16000))
    assert rate == 16000 and (s == mono).all()
    stereo = rng.integers(-32768, 32768, size=(10, 2), dtype=np.int16)
    s2, _ = multimodal.decode_wav(multimodal.encode_wav(stereo))
    assert s2.shape == (10, 2) and (s2 == stereo).all()
    # extra chunk between fmt and data still decodes (chunk walk)
    blob = multimodal.encode_wav(mono)
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = blob[:36] + extra + blob[36:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    s3, _ = multimodal.decode_wav(patched)
    assert (s3 == mono).all()
    with pytest.raises(NotImplementedError):
        # audio_format 85 (MP3) rejected honestly
        bad = bytearray(multimodal.encode_wav(mono))
        bad[20] = 85
        multimodal.decode_wav(bytes(bad))


def test_decode_audio_stats_real_decode(docs):
    import hashlib as _hl

    media = multimodal.synthesize_wav_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_audio_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    h = _hl.md5(row0["text"].encode()).hexdigest()
    hexs = h
    for _ in range(3):
        h = _hl.md5(h.encode()).hexdigest()
        hexs += h
    import numpy as np

    samples = np.frombuffer(bytes.fromhex(hexs), dtype="<i2")
    s = stats[0]
    assert (s["sample_rate"], s["n_channels"], s["n_samples"]) == (
        multimodal.WAV_RATE, 1, multimodal.WAV_N_BYTES // 2)
    assert s["s_sum"] == int(samples.sum(dtype="int64"))
    assert s["s_min"] == int(samples.min())
    assert s["s_max"] == int(samples.max())
    assert s["pcm_md5"] == _hl.md5(hexs.encode()).hexdigest()


def test_decode_image_stats_real_decode(docs):
    import hashlib as _hl

    media = multimodal.synthesize_ppm_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_image_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    # recompute the chained-md5 payload the pixels come from
    h = _hl.md5(row0["text"].encode()).hexdigest()
    payload = h
    for _ in range(5):
        h = _hl.md5(h.encode()).hexdigest()
        payload += h
    s = stats[0]
    assert (s["width"], s["height"]) == (multimodal.PPM_W, multimodal.PPM_H)
    assert s["px_sum"] == sum(payload.encode())
    assert s["px_md5"] == _hl.md5(payload.encode()).hexdigest()
    assert s["px_mean"] == s["px_sum"] / (multimodal.PPM_W * multimodal.PPM_H * 3)


# ------------------------------------------------------------------ #
# textstats: repetition, PII, BPE-ish tokens
# ------------------------------------------------------------------ #


def test_repetition_stats_flags_repeated_text(spark):
    rows = [
        Row(doc_id=0, text="spam spam spam spam spam spam", lang="en",
            source="s", n_chars=29),
        Row(doc_id=1, text=BASE_TEXT, lang="en", source="s",
            n_chars=len(BASE_TEXT)),
        Row(doc_id=2, text="", lang="en", source="s", n_chars=0),
        Row(doc_id=3, text="one", lang="en", source="s", n_chars=3),
    ]
    d = spark.createDataFrame(rows)
    out = {r["doc_id"]: r for r in textstats.repetition_stats(d).collect()}
    assert out[0]["dup_2gram_ratio"] > 0.7          # "spam spam" everywhere
    assert out[0]["top_2gram_ratio"] > 1.0          # overlapping grams > n/2
    assert out[1]["dup_2gram_ratio"] < out[0]["dup_2gram_ratio"]
    assert out[2]["n_tokens"] == 0 and out[2]["top_2gram_ratio"] == 0.0
    assert out[3]["dup_2gram_ratio"] == 0.0         # single token: no 2-grams


def test_pii_scrub_counts_and_redacts(spark):
    out = {
        r["doc_id"]: r
        for r in textstats.pii_scrub(textstats.pii_fixture_df(spark)).collect()
    }
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert "<EMAIL>" in out[0]["scrubbed"] and "<PHONE>" in out[0]["scrubbed"]
    assert "alice@example.com" not in out[0]["scrubbed"]
    assert out[2]["n_emails"] == out[2]["n_ipv4"] == out[2]["n_phones"] == 0
    assert out[2]["scrubbed"] == textstats.PII_FIXTURE[2][1]  # untouched
    assert out[4]["n_ipv4"] == 2  # naive matcher: version strings count too


def test_bpe_token_count_matches_python_re(spark):
    """The Spark regexp_count over BPE_RX must agree with Python's re
    scanner on adversarial shapes (contractions, digit runs, punct runs,
    unicode-free ASCII edge cases)."""
    import re

    texts = [
        "I'll say it's Bob's 42nd try... really!?",
        "   leading space",
        "trailing space   ",
        "",
        "a",
        "don't can't won't we've they'd I'm you're",
        "x1y2z3 12ab34 ---===+++",
        "(parens) [brackets] {braces} <angles>",
    ]
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in textstats.bpe_token_counts(
            spark.createDataFrame(rows)
        ).collect()
    }
    rx = re.compile(textstats.BPE_RX)
    for i, t in enumerate(texts):
        assert out[i] == len(rx.findall(t)), (i, t, rx.findall(t))


def test_url_normalize_canonicalizes_equivalent_urls(spark):
    from orionbelt_ontology_builder_spark.datapipe import urls as U

    out = {r["url_id"]: r for r in U.normalize_urls(U.url_fixture_df(spark)).collect()}
    # param reorder + tracking param + trailing slash all collapse
    assert out[1]["norm_url"] == out[6]["norm_url"]
    # scheme differs -> distinct keys
    assert out[0]["norm_url"] != out[1]["norm_url"]
    assert out[0]["norm_url"] == "http://example.com/Path/Page?a=1&b=2"
    # default port + www + fragment dropped
    assert out[0]["host"] == "example.com"
    # non-default port kept
    assert ":8080" in out[5]["norm_url"] and "ref=rss" not in out[5]["norm_url"]
    # bare root gets "/"
    assert out[3]["norm_url"] == "http://example.com/"


def test_source_mix_totals(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import urls as U

    out = {r["source"]: r for r in U.source_mix(docs).collect()}
    assert sum(r["n_docs"] for r in out.values()) == docs.count()
    assert out["s0"]["total_tokens"] == len(BASE_TEXT.split())


# ------------------------------------------------------------------ #
# curation: decontamination / packing / quality funnel
# ------------------------------------------------------------------ #


def test_decontaminate_flags_benchmark_overlap(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    # benchmark = doc 0; doc 1 is its normalized exact dup, doc 2 a
    # one-word-changed near dup -> both share full 8-token windows.
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r for r in C.decontaminate(docs, bench).collect()}
    assert out[0]["contaminated"] == 1          # benchmark doc itself
    assert out[1]["contaminated"] == 1          # exact dup
    assert out[2]["contaminated"] == 1          # near dup shares windows
    assert out[3]["contaminated"] == 0          # unrelated
    assert out[4]["contaminated"] == 0
    # near dup overlaps fewer grams than the exact dup
    assert 0 < out[2]["n_contaminated_grams"] < out[1]["n_contaminated_grams"]


def test_decontaminate_short_docs_contribute_no_grams(spark):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    rows = [Row(doc_id=0, text="one two three", lang="en", source="s",
                n_chars=13),
            Row(doc_id=1, text="one two three", lang="en", source="s",
                n_chars=13)]
    d = spark.createDataFrame(rows)
    out = C.decontaminate(d, d, n=8).collect()
    assert all(r["n_grams"] == 0 and r["contaminated"] == 0 for r in out)


def test_pack_sequences_stream_laws(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    out = C.pack_sequences(docs, capacity=10, shards=2).collect()
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        offset = 0
        for r in rows:
            assert r["shard"] == r["doc_id"] % 2
            # offsets are contiguous within a stream (concat semantics)
            assert r["start_offset"] == offset
            offset += r["n_tokens"]
            # chunk span arithmetic
            assert r["first_chunk"] == r["start_offset"] // 10
            end = r["start_offset"] + r["n_tokens"]
            if r["n_tokens"] > 0:
                assert r["last_chunk"] == (end - 1) // 10
            assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1


def test_quality_funnel_conservation(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    rows = C.quality_funnel(docs).collect()
    assert [r["stage"] for r in rows] == [1, 2, 3, 4, 5]
    assert [r["rule"] for r in rows] == [n for n, _ in C.FUNNEL_RULES]
    total = docs.count()
    # funnel conservation: survivors_i = survivors_{i-1} - dropped_i
    prev = total
    for r in rows:
        assert r["n_survivors"] == prev - r["n_dropped"]
        prev = r["n_survivors"]
    assert rows[-1]["n_survivors"] >= 0


def test_curate_corpus_stage_semantics(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    bench = docs.filter(F.col("doc_id") == 3)   # the unrelated doc
    out = C.curate_corpus(docs, bench)
    rows = {r["name"]: r for r in out["metrics"].collect()}
    # chain integrity: docs_in of stage k == docs_out of stage k-1
    order = ["exact_dedup", "near_dup", "quality", "decontaminate", "pack"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["docs_in"] == rows[prev]["docs_out"]
    # doc 1 is an exact dup of doc 0 -> one group collapsed
    assert rows["exact_dedup"]["docs_in"] == 5
    assert rows["exact_dedup"]["docs_out"] == 4
    assert rows["exact_dedup"]["aux"] == 1
    # doc 2 is a near dup of doc 0 -> one cluster, one doc dropped
    assert rows["near_dup"]["docs_out"] == 3
    assert rows["near_dup"]["aux"] == 1
    # benchmark = doc 3 (survivor) -> it decontaminates itself away
    # whenever it passes quality; chain stays consistent either way
    assert rows["pack"]["docs_in"] == rows["decontaminate"]["docs_out"]
    # survivors frame matches the funnel's final count
    assert out["survivors"].count() == rows["pack"]["docs_out"]
    # packed rows = one per survivor
    assert out["packed"].count() == rows["pack"]["docs_out"]
    out["release"]()
    # survivors stays correct (recomputed) after the cache is released
    assert out["survivors"].count() == rows["pack"]["docs_out"]


def test_split_corpus_deterministic_and_stratified(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    a = {r["doc_id"]: r["split"] for r in C.split_corpus(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in C.split_corpus(docs).collect()}
    assert a == b                                  # rerun-stable
    c = {r["doc_id"]: r["split"]
         for r in C.split_corpus(docs, salt="other").collect()}
    assert set(c) == set(a)                        # same docs, any salt
    full = {r["doc_id"]: r for r in
            C.split_corpus(docs, val_pct=0, test_pct=0).collect()}
    assert all(r["split"] == "train" for r in full.values())
    assert all(0 <= r["bucket"] < 100 for r in full.values())


def test_tfidf_topk_ranks_rare_terms(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    corpus = spark.createDataFrame(
        [
            (0, "apple apple banana common common common"),
            (1, "banana cherry common common"),
            (2, "common common common common"),
        ],
        "doc_id long, text string",
    )
    out = TS.tfidf_topk(corpus, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2/6 df=1 -> score 1.0; banana 1/6 * 3/2 = .25;
    # common 3/6 * 1 = .5 -> top-2 = apple, common
    assert [r["term"] for r in by_doc[0]] == ["apple", "common"]
    assert by_doc[0][0]["score"] == pytest.approx(1.0)
    # doc 1: cherry 1/4*3 = .75 > common 2/4*1 = .5 > banana 1/4*1.5
    assert [r["term"] for r in by_doc[1]] == ["cherry", "common"]
    # doc 2 only has one distinct term
    assert [r["term"] for r in by_doc[2]] == ["common"]
    # ranks are 1-based and contiguous
    assert [r["rank"] for r in by_doc[0]] == [1, 2]


def test_zipf_and_vocab_summary(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    corpus = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b zz"), (2, "")],
        "doc_id long, text string",
    )
    top = TS.zipf_topk(corpus, k=2).collect()
    assert [(r["rank"], r["term"], r["cnt"]) for r in top] == [
        (1, "a", 4), (2, "b", 3)]
    assert top[0]["freq"] == pytest.approx(4 / 9)
    vs = TS.vocab_summary(corpus).collect()[0]
    assert vs["n_token_occurrences"] == 9
    assert vs["vocab_size"] == 4
    assert vs["n_hapax"] == 2          # c and zz
    assert vs["type_token_ratio"] == pytest.approx(4 / 9)


def test_quota_sample_exact_and_stable(spark):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    rows = [(i, f"t{i}", "en", f"src{i % 3}", 2) for i in range(40)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = C.quota_sample(d, n_per_group=5).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # exact quota per group; ranks 1..5 contiguous
    for src, rs in by_src.items():
        assert len(rs) == 5
        assert sorted(r["sample_rank"] for r in rs) == [1, 2, 3, 4, 5]
    # rerun-stable (hash order, no RNG)
    again = {(r["source"], r["doc_id"]) for r in
             C.quota_sample(d, n_per_group=5).collect()}
    assert {(r["source"], r["doc_id"]) for r in out} == again
    # different salt -> (almost surely) different draw, same quota shape
    other = {(r["source"], r["doc_id"]) for r in
             C.quota_sample(d, n_per_group=5, salt="v2").collect()}
    assert len(other) == 15 and other != again
    # small group: returns the whole group, not more
    tiny = C.quota_sample(d.filter("doc_id < 2"), n_per_group=5).collect()
    assert len(tiny) == 2


def test_chunk_text_window_semantics(spark):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    toks = [f"w{i}" for i in range(10)]
    rows = [
        (0, " ".join(toks)),       # 10 tokens, size 4 step 3 -> 3 chunks
        (1, "a b"),                # n <= size -> exactly one chunk
        (2, ""),                   # empty -> no chunks
        (3, " ".join(toks[:4])),   # n == size -> exactly one chunk
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.chunk_text(d, chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: starts 0,3,6 cover [0,4),[3,7),[6,10) — wait: n=10,size=4,
    # step=3 -> n_chunks = 1+ceil(6/3) = 3
    assert [r["chunk_text"] for r in by_doc[0]] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    # consecutive chunks share exactly `overlap` tokens
    assert by_doc[0][0]["chunk_text"].split()[-1] == \
        by_doc[0][1]["chunk_text"].split()[0]
    assert by_doc[1] == [by_doc[1][0]] and by_doc[1][0]["n_chunk_tokens"] == 2
    assert 2 not in by_doc
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 4
    # every token of doc 0 appears in some chunk (full coverage)
    covered = {t for r in by_doc[0] for t in r["chunk_text"].split()}
    assert covered == set(toks)
    with pytest.raises(ValueError):
        C.chunk_text(d, chunk_tokens=4, overlap=4)


def test_incremental_dedup_classifies_batch(spark, docs):
    # corpus = the 5-doc fixture; batch: an exact copy of doc 0, a
    # near-variant of doc 3, and a genuinely new doc
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=BASE_TEXT, lang="en", source="b",
                n_chars=len(BASE_TEXT)),
            Row(doc_id=101,
                text="completely different content about spark catalyst "
                     "optimizer plans shuffles partitions and executors ok",
                lang="en", source="b", n_chars=100),
            Row(doc_id=102, text="entirely novel words nowhere else at all "
                                 "in any corpus document whatsoever today",
                lang="en", source="b", n_chars=80),
        ]
    )
    out = {r["doc_id"]: (r["status"], r["dup_of"])
           for r in dedup.incremental_dedup(batch, docs, 0.5).collect()}
    assert out[100] == ("exact_dup", 0)
    assert out[101] == ("near_dup", 3)
    assert out[102] == ("new", None)
    # every batch doc classified exactly once
    assert set(out) == {100, 101, 102}


def test_budget_sample_greedy_prefix(spark):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    # every doc = 10 tokens; budgets then select exact doc counts
    text = " ".join(f"t{i}" for i in range(10))
    rows = [(i, text, "en", f"src{i % 2}", 1) for i in range(20)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = C.budget_sample(d, token_budget=35, overrides={"src1": 70}).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # 35-token budget over 10-token docs -> 4 docs (last overshoots by 5)
    assert len(by_src["src0"]) == 4
    assert len(by_src["src1"]) == 7          # override honored
    # greedy prefix: cum_tokens monotone, first doc always kept
    for rs in by_src.values():
        cums = [r["cum_tokens"] for r in rs]
        assert cums == sorted(cums) and cums[0] == 10
        assert cums[-1] - rs[-1]["n_tokens"] < 70
    # rerun-stable
    again = {(r["source"], r["doc_id"]) for r in
             C.budget_sample(d, 35, overrides={"src1": 70}).collect()}
    assert {(r["source"], r["doc_id"]) for r in out} == again
    # budget bigger than the group: whole group kept
    assert len(C.budget_sample(d, token_budget=10_000).collect()) == 20


def test_line_dedup_removes_shared_boilerplate(spark):
    out = {
        r["doc_id"]: r
        for r in dedup.remove_boilerplate_lines(
            dedup.boilerplate_fixture_df(spark)
        ).collect()
    }
    # header/footer (all 13 docs) and cookie banner (6 docs) removed
    assert "Home | Products" not in out[0]["clean_text"]
    assert "Example Corp" not in out[0]["clean_text"]
    assert "cookies" not in out[0]["clean_text"]
    # a line shared by only 2 docs stays (below min_docs=3)
    assert "newsletter" in out[0]["clean_text"]
    assert "newsletter" in out[1]["clean_text"]
    # unique body lines survive verbatim, in original order
    assert out[2]["clean_text"].startswith("Doc 2 body line 0")
    # boilerplate-only doc collapses to empty but is still present
    assert out[12]["n_kept"] == 0 and out[12]["clean_text"] == ""
    # conservation: kept <= lines, and removal really happened
    assert all(r["n_kept"] <= r["n_lines"] for r in out.values())
    assert out[0]["n_kept"] == out[0]["n_lines"] - 3


def test_line_dedup_matches_duckdb_oracle(spark):
    import duckdb

    got = sorted(
        (r["doc_id"], r["n_lines"], r["n_kept"], r["clean_text"])
        for r in dedup.remove_boilerplate_lines(
            dedup.boilerplate_fixture_df(spark)
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(
        dedup.remove_boilerplate_lines_oracle()).fetchall()))
    con.close()
    assert got == want


def test_term_pmi_ranks_true_collocation_first(spark):
    # 'neural network' co-occurs always and exclusively; 'the' is
    # everywhere, so its pairs score ~1 (chance) and rank below.
    rows = [
        (0, "the neural network model"),
        (1, "the neural network trains"),
        (2, "the neural network converges"),
        (3, "the weather report today"),
        (4, "the weather report tomorrow"),
        (5, "the stock market moves"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.term_pmi_pairs(docs, k=5, min_pair=2).collect()
    # rarer exclusive pair wins: 6*2/(2*2) = 3.0 > 6*3/(3*3) = 2.0
    assert (out[0]["ta"], out[0]["tb"]) == ("report", "weather")
    assert out[0]["pmi_ratio"] == 3.0
    assert (out[1]["ta"], out[1]["tb"]) == ("network", "neural")
    assert out[1]["pmi_ratio"] == 2.0
    # any pair involving 'the' (df = 6) scores exactly 1.0 = chance
    the_ratios = [r["pmi_ratio"] for r in out if "the" in (r["ta"], r["tb"])]
    assert all(r == 1.0 for r in the_ratios)


def test_term_pmi_pair_generation_is_ordered_and_distinct(spark):
    # repeated token within a doc counts once; ta < tb always
    docs = spark.createDataFrame(
        [(0, "b a b a c"), (1, "a c b"), (2, "c b a")],
        "doc_id long, text string",
    )
    out = textstats.term_pmi_pairs(docs, k=10, min_pair=1).collect()
    assert all(r["ta"] < r["tb"] for r in out)
    pairs = {(r["ta"], r["tb"]): r["pair_docs"] for r in out}
    assert pairs == {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 3}


def test_containment_catches_embedded_doc_minhash_misses(spark):
    # doc 1 is a 30-token prefix of the 150-token doc 0: containment of
    # the short side is ~1 while Jaccard (which MinHash thresholds on)
    # is ~0.2 -- the case this operator exists for.
    words = [f"w{i}" for i in range(150)]
    long_doc = " ".join(words)
    short_doc = " ".join(words[:30])
    other = " ".join(f"z{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(0, long_doc), (1, short_doc), (2, other)],
        "doc_id long, text string",
    )
    out = dedup.containment_pairs(docs, threshold=0.8).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    # the short side is fully contained (every sampled gram of doc 1
    # also occurs in doc 0)
    assert r["contain_b"] == 1.0
    assert r["contain_a"] < 0.8          # asymmetry preserved
    # the unrelated doc never pairs
    assert all(2 not in p for p in pairs)


def test_containment_matches_duckdb_on_sample(spark, docs):
    import duckdb

    got = sorted(
        (r["doc_a"], r["doc_b"], r["shared"], r["fp_a"], r["fp_b"])
        for r in dedup.containment_pairs(docs).collect()
    )
    pdf = docs.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        (a, b, s, fa, fb)
        for a, b, s, fa, fb, _, _ in con.execute(
            dedup.containment_pairs_oracle()
        ).fetchall()
    )
    con.close()
    assert got == want


def test_ngram_lm_counts_hand_checked(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "c a b"), (2, "x")],
        "doc_id long, text string",
    )
    out = {r["gram"]: r for r in
           textstats.ngram_lm_counts(docs, n=2, k=10).collect()}
    # 'a b' occurs 3x (twice in doc 0, once in doc 1) across 2 docs
    assert out["a b"]["count"] == 3 and out["a b"]["n_docs"] == 2
    # left contexts of 'a b': <s> (doc0 start), 'b' (doc0 2nd), 'c' -> 3
    assert out["a b"]["n_left_contexts"] == 3
    # 'b a' occurs once, left 'a' only
    assert out["b a"]["count"] == 1
    assert out["b a"]["n_left_contexts"] == 1
    # single-token doc yields no bigram
    assert not any(g.startswith("x") for g in out)


def test_ngram_lm_counts_trigram_order(spark):
    docs = spark.createDataFrame(
        [(0, "p q r p q r"), (1, "p q r")], "doc_id long, text string"
    )
    out = textstats.ngram_lm_counts(docs, n=3, k=3).collect()
    assert out[0]["gram"] == "p q r" and out[0]["count"] == 3
    # left contexts of 'p q r': <s> (both doc starts) and 'r' (repeat)
    assert out[0]["n_left_contexts"] == 2


def test_vocab_drift_laws(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame(
        [(0, "alpha alpha beta"), (2, "alpha beta"),      # old slice
         (1, "gamma gamma gamma beta"), (3, "gamma beta")],  # new slice
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in TS.vocab_drift(docs, k=10).collect()}
    # slice-exclusive terms drift hardest, in opposite directions
    assert out["gamma"]["cnt_old"] == 0 and out["gamma"]["log_ratio"] > 0
    assert out["alpha"]["cnt_new"] == 0 and out["alpha"]["log_ratio"] < 0
    assert out["gamma"]["drift"] > out["beta"]["drift"]
    # smoothing keeps every ratio finite
    assert all(abs(r["log_ratio"]) < float("inf") for r in out.values())


def test_lang_confusion_laws(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame(
        [(0, "the cat is on the mat and the dog", "en"),
         (1, "der hund ist nicht auf der matte und das", "de"),
         (2, "xyzzy qwerty", "en")],       # no stopword hits -> 'en' tie-break
        "doc_id long, text string, lang string",
    )
    rows = TS.lang_confusion(docs).collect()
    out = {(r["lang"], r["predicted_lang"]): r for r in rows}
    assert out[("en", "en")]["n_docs"] == 2
    assert out[("de", "de")]["n_docs"] == 1
    # per-language fractions sum to 1
    import collections
    frac = collections.defaultdict(float)
    for r in rows:
        frac[r["lang"]] += r["frac_of_lang"]
    assert all(abs(v - 1.0) < 1e-12 for v in frac.values())


def test_length_histogram_buckets_and_fracs(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame(
        [(0, "one"),                       # 1 token  -> bucket 0
         (1, "two words"),                 # 2 tokens -> bucket 1
         (2, "three little words"),        # 3 tokens -> bucket 1
         (3, "a b c d e f g h"),           # 8 tokens -> bucket 3
         (4, "...")],                      # normalizes to empty -> -1
        "doc_id long, text string",
    )
    out = {r["bucket"]: r for r in TS.length_histogram(docs).collect()}
    assert out[-1]["n_docs"] == 1 and out[-1]["lo_tokens"] == 0
    assert out[0]["n_docs"] == 1 and out[0]["lo_tokens"] == 1
    assert out[1]["n_docs"] == 2 and out[1]["lo_tokens"] == 2
    assert out[3]["n_docs"] == 1 and out[3]["lo_tokens"] == 8
    assert abs(sum(r["frac"] for r in out.values()) - 1.0) < 1e-12


def test_bpe_merge_pairs_weighted_by_word_freq(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame([
        Row(doc_id=0, text="aba aba ab"),
        Row(doc_id=1, text="aba cd"),
    ])
    out = {(r["sym_a"], r["sym_b"]): r["weight"]
           for r in TS.bpe_merge_pairs(docs, k=10).collect()}
    # 'aba' freq 3 contributes (a,b)+(b,a) each x3; 'ab' freq 1 adds (a,b)
    assert out[("a", "b")] == 4
    assert out[("b", "a")] == 3
    assert out[("c", "d")] == 1


def test_bpe_merge_pairs_topk_deterministic(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame([Row(doc_id=0, text="xy yz zx")])
    rows = TS.bpe_merge_pairs(docs, k=2).collect()
    # all three pairs weight 1: deterministic (sym_a, sym_b) tiebreak
    assert [(r["sym_a"], r["sym_b"]) for r in rows] == [
        ("x", "y"), ("y", "z")]


def test_embedding_covariance_known_matrix(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import similarity as SIM

    # 2-dim corpus with known covariance: x = [1,2,3], y = [2,4,6]
    # mean_x = 2, mean_y = 4; var_x = 2/3, cov_xy = 4/3, var_y = 8/3
    embs = spark.createDataFrame([
        Row(vec_id=0, embedding=[1.0, 2.0]),
        Row(vec_id=1, embedding=[2.0, 4.0]),
        Row(vec_id=2, embedding=[3.0, 6.0]),
    ])
    out = {(r["i"], r["j"]): r["cov"]
           for r in SIM.embedding_covariance(embs, dim=2).collect()}
    assert abs(out[(0, 0)] - 2 / 3) < 1e-12
    assert abs(out[(0, 1)] - 4 / 3) < 1e-12
    assert abs(out[(1, 1)] - 8 / 3) < 1e-12
    assert set(out) == {(0, 0), (0, 1), (1, 1)}  # upper triangle only


def test_unigram_logprob_known_values(spark):
    import math
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    # corpus: "a a b" + "b" -> counts a:2 b:2, N=4, V=2, alpha=0.5
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a a b"),
        Row(doc_id=1, text="b"),
    ])
    out = {r["doc_id"]: r for r in TS.unigram_logprob(docs).collect()}
    p = (2 + 0.5) / (4 + 0.5 * 3)  # both terms share count 2
    assert abs(out[0]["mean_logprob"] - math.log(p)) < 1e-12
    assert abs(out[1]["mean_logprob"] - math.log(p)) < 1e-12
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    common = "the cat sat on the mat " * 5
    docs = spark.createDataFrame([
        Row(doc_id=0, text=common),
        Row(doc_id=1, text="zqx wvu jkl"),  # singletons only
    ])
    out = {r["doc_id"]: r["mean_logprob"]
           for r in TS.unigram_logprob(docs).collect()}
    assert out[1] < out[0]


def test_mention_contexts_window_clamping(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame([
        Row(doc_id=0, text="alpha beta TARGET gamma delta epsilon"),
        Row(doc_id=1, text="TARGET at start"),
    ])
    out = {(r["doc_id"], r["pos"]): r["context"]
           for r in TS.mention_contexts(docs, ["target"], window=2)
           .collect()}
    # mid-doc: two tokens either side
    assert out[(0, 2)] == "alpha beta target gamma delta"
    # doc start: left side clamps
    assert out[(1, 0)] == "target at start"


def test_mention_contexts_multiple_occurrences(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame([Row(doc_id=0, text="x y x z")])
    rows = TS.mention_contexts(docs, ["x"], window=1).collect()
    assert [(r["pos"], r["context"]) for r in rows] == [
        (0, "x y"), (2, "y x z")]


def test_entity_index_matches_global_rank(spark):
    import hashlib
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import negatives as NEG

    ents = [f"e{i}" for i in range(50)]
    edges = spark.createDataFrame(
        [Row(h=ents[i], r="r", t=ents[(i + 7) % 50]) for i in range(50)]
    )
    got = {r["entity"]: r["idx"]
           for r in NEG.entity_index(edges).collect()}
    want = {e: i for i, e in enumerate(
        sorted(ents, key=lambda e: (hashlib.md5(e.encode()).hexdigest(), e)))}
    assert got == want  # two-phase rank == naive global rank


def test_kg_negative_samples_deterministic_and_flagged(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import negatives as NEG

    edges = spark.createDataFrame(
        [Row(h=f"h{i}", r="rel", t=f"t{i}") for i in range(10)]
    )
    a = NEG.kg_negative_samples(edges, k=3).collect()
    b = NEG.kg_negative_samples(edges.repartition(7), k=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # partition-invariant
    assert len(a) == 30
    for r in a:
        assert r["is_false_negative"] == (r["neg_tail"] == r["t"])


def test_length_percentiles_exact_interpolation(spark):
    from pyspark.sql import Row
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    # en docs with 1..5 tokens -> p50 = 3, p90 = 1 + 0.9*4 = 4.6
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * (i + 1)), lang="en")
         for i in range(5)]
        + [Row(doc_id=10, text="a b", lang="fr")]
    )
    out = {r["lang"]: r for r in TS.length_percentiles(docs).collect()}
    en = out["en"]
    assert en["n_docs"] == 5 and abs(en["p50"] - 3.0) < 1e-12
    assert abs(en["p90"] - 4.6) < 1e-12
    assert out["fr"]["p10"] == out["fr"]["p99"] == 2.0


def test_duplicated_passages_fraction(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup

    docs = spark.createDataFrame(
        [
            # doc 0 and 1 share the 4-token prefix -> two shared 3-grams
            Row(doc_id=0, text="alpha beta gamma delta unique0 tail0"),
            Row(doc_id=1, text="alpha beta gamma delta unique1 tail1"),
            # doc 2 shares nothing
            Row(doc_id=2, text="zeta eta theta iota kappa"),
            # doc 3 is shorter than n tokens -> excluded (no positions)
            Row(doc_id=3, text="tiny doc"),
        ]
    )
    out = {r["doc_id"]: r for r in dedup.duplicated_passages(docs, n=3).collect()}
    assert set(out) == {0, 1, 2}
    # 6 tokens -> 4 positional 3-grams; the 2 prefix grams are cross-doc
    assert out[0]["total_ngrams"] == 4 and out[0]["dup_ngrams"] == 2
    assert out[1]["total_ngrams"] == 4 and out[1]["dup_ngrams"] == 2
    assert abs(out[0]["dup_fraction"] - 0.5) < 1e-12
    assert out[2]["dup_ngrams"] == 0 and out[2]["dup_fraction"] == 0.0


def test_duplicated_passages_within_doc_repeat_not_cross(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup

    # a gram repeated INSIDE one doc is not cross-document duplication
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c a b c"),
            Row(doc_id=1, text="x y z w v u"),
        ]
    )
    out = {r["doc_id"]: r for r in dedup.duplicated_passages(docs, n=3).collect()}
    assert out[0]["dup_ngrams"] == 0
    assert out[1]["dup_ngrams"] == 0


def test_hard_negatives_band_and_cap(spark, embs):
    from orionbelt_ontology_builder_spark.datapipe import similarity as SIM

    # wide-open band, m=2: every surviving pair is in [lo, hi), no
    # anchor carries more than m rows, and the listing is symmetric
    out = SIM.hard_negatives(embs, lo=0.0, hi=0.99, m=2, dim=8).collect()
    assert out, "band should catch cross-cluster confusables"
    per_anchor = {}
    pairs = set()
    for r in out:
        assert 0.0 <= r["cos"] < 0.99
        per_anchor[r["anchor_id"]] = per_anchor.get(r["anchor_id"], 0) + 1
        pairs.add((r["anchor_id"], r["neg_id"]))
    assert max(per_anchor.values()) <= 2
    assert all(1 <= r["pos"] <= 2 for r in out)
    # near-dups (same tight cluster, cos ~ 1) are excluded by hi
    same_cluster = [(a, b) for a, b in pairs if a % 3 == b % 3]
    assert not same_cluster


# ------------------------------------------------------------------ #
# Sketches: HLL / Count-Min / Bloom laws
# ------------------------------------------------------------------ #


def test_sketch_laws(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import sketches

    # HLL: estimate within the textbook error envelope for m=256
    # (1.04/sqrt(m) ~ 6.5%; allow 3 sigma) and positive.
    for r in sketches.hll_distinct(docs).collect():
        assert r["n_exact"] > 0 and r["hll_est"] > 0
        assert abs(r["rel_err"]) < 0.20, r

    # CMS: overestimate-only, and estimates of heavy hitters are
    # within one grid-collision of exact (width 256 >> distinct mass
    # per cell at fixture scale).
    cms = sketches.countmin_topk(docs, k=10).collect()
    assert len(cms) == 10
    for r in cms:
        assert r["c_cms"] >= r["c_exact"], r

    # Bloom: occupancy positive, never above k*n bits nor m, and the
    # analytical expected fill agrees with the measured fill within a
    # few points at fixture scale.
    b = sketches.bloom_stats(docs).collect()[0]
    assert 0 < b["n_bits_set"] <= min(4096, 4 * b["n_items"])
    assert abs(b["fill_ratio"] - b["expected_fill"]) < 0.05, b


def test_weighted_sample_laws(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    # k larger than corpus -> everything, keys strictly descending,
    # deterministic across runs.
    a = C.weighted_sample(docs, k=10).collect()
    b = C.weighted_sample(docs, k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 5
    keys = [r["key"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert all(r["key"] < 0 and r["weight"] > 0 for r in a)
    # truncation takes the key-order prefix
    top2 = [r["doc_id"] for r in C.weighted_sample(docs, k=2).collect()]
    assert top2 == [r["doc_id"] for r in a[:2]]
    # a different salt re-rolls the keys (values must change even if
    # the 5-doc ordering happens to coincide)
    c = C.weighted_sample(docs, k=5, salt="v2").collect()
    assert {r["doc_id"] for r in c} == {r["doc_id"] for r in a}
    assert [r["key"] for r in c] != [r["key"] for r in a]


def test_grouped_split_no_group_straddles(spark, docs):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    out = C.grouped_split(docs, val_pct=30, test_pct=30).collect()
    assert sum(r["n_docs"] for r in out) == 5
    assert sum(r["n_groups"] for r in out) == 5  # 5 distinct sources
    # every group lands in exactly one split: per-split group counts
    # sum to the total distinct groups (no double counting)


def test_compression_ratio_exact_python_twin(spark, docs):
    import zlib

    from orionbelt_ontology_builder_spark.datapipe import textstats as T

    got = {r["doc_id"]: r for r in T.compression_ratio(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        b = row["text"].encode("utf-8")
        exp = len(zlib.compress(b, 6))
        assert got[row["doc_id"]]["n_bytes"] == len(b)
        assert got[row["doc_id"]]["n_compressed"] == exp
        assert abs(got[row["doc_id"]]["ratio"] - exp / len(b)) < 1e-12
    # repetitive text compresses much better than high-entropy text
    import string
    rep = spark.createDataFrame(
        [(0, "spam ham " * 200), (1, string.ascii_letters * 2 + "0123")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["ratio"]
            for r in T.compression_ratio(rep).collect()}
    assert rows[0] < 0.05 < rows[1]


# ------------------------------------------------------------------ #
# NB classifier / DSIR selection / DistMult ranking (session-9)
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def lang_docs(spark):
    # perfectly separable vocab per language; even ids train, odd test
    en = "apple banana cherry apple banana plum"
    de = "apfel birne kirsche apfel birne pflaume"
    rows = []
    for i in range(8):
        lang = "en" if i % 4 < 2 else "de"
        text = en if lang == "en" else de
        rows.append(Row(doc_id=i, text=text, lang=lang, source="s",
                        n_chars=len(text)))
    return spark.createDataFrame(rows).cache()


def test_nb_classifier_separable_corpus_is_diagonal(lang_docs):
    from orionbelt_ontology_builder_spark.datapipe import textstats as T

    out = T.nb_lang_confusion(lang_docs).collect()
    cells = {(r["true_lang"], r["pred_lang"]): r for r in out}
    assert set(cells) == {("en", "en"), ("de", "de")}
    assert cells[("en", "en")]["n_docs"] == 2
    assert cells[("de", "de")]["n_docs"] == 2
    # disjoint vocab => decisive margins
    assert all(r["avg_margin"] > 1.0 for r in out)


def test_dsir_select_prefers_target_like_docs(spark):
    from orionbelt_ontology_builder_spark.datapipe import curation as C

    tgt = "solar panel energy grid power solar energy panel"
    like = "solar energy panel output rises"
    unlike = "medieval castle moat drawbridge knight armor"
    rows = [
        Row(doc_id=0, text=tgt, lang="en", source="s", n_chars=len(tgt)),
        Row(doc_id=1, text=like, lang="fr", source="s", n_chars=len(like)),
        Row(doc_id=2, text=unlike, lang="fr", source="s",
            n_chars=len(unlike)),
    ]
    docs = spark.createDataFrame(rows)
    out = C.dsir_select(docs, target_lang="en", k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["avg_log_ratio"] > out[1]["avg_log_ratio"]
    # target-domain docs are never selected
    assert all(r["lang"] != "en" for r in out)


def test_distmult_rank_matches_numpy_twin(embs):
    import hashlib

    from orionbelt_ontology_builder_spark.datapipe import kgembed as K

    out = K.distmult_rank(embs, n_queries=4, dim=8).collect()
    rows = {r["vec_id"]: (list(r["embedding"]), r["label"])
            for r in embs.collect()}
    ids = sorted(rows)
    max_id = max(ids)

    def sign(rel, i):
        h = hashlib.md5(f"{rel}|{i}".encode()).hexdigest()
        return 1 - 2 * (int(h[:2], 16) % 2)

    def score(h_emb, rel, c_emb):
        return sum(
            float(h_emb[i]) * sign(rel, i) * float(c_emb[i])
            for i in range(8)
        )

    assert len(out) == 4
    for r in sorted(out, key=lambda x: x["h_id"]):
        h_emb, rel = rows[r["h_id"]]
        target = (r["h_id"] * K.TAIL_MUL + K.TAIL_OFF) % (max_id + 1)
        ge = [v for v in ids if v >= target]
        t_id = ge[0] if ge else ids[0]
        assert r["t_id"] == t_id
        s_true = score(h_emb, rel, rows[t_id][0])
        expect = 1 + sum(
            1
            for c in ids
            if score(h_emb, rel, rows[c][0]) > s_true
            or (score(h_emb, rel, rows[c][0]) == s_true and c < t_id)
        )
        assert r["t_rank"] == expect
        assert r["n_candidates"] == len(ids)
        assert 1 <= r["t_rank"] <= len(ids)


# --------------------------------------------------------------------- #
# sparse_cosine_pairs (df-pruned inverted-index count-vector cosine)
# --------------------------------------------------------------------- #


def _sc_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sparse_cosine_identical_docs_hit_one(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
    ]
    out = D.sparse_cosine_pairs(
        _sc_docs(spark, texts), threshold=0.2, max_df=50
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(0, 1)]
    assert abs(out[0]["cosine"] - 1.0) < 1e-12


def test_sparse_cosine_df_cap_prunes_boilerplate(spark):
    """A trigram present in EVERY doc is pruned by max_df, so docs
    sharing only boilerplate never pair."""
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    boiler = "all rights reserved"
    texts = [f"{boiler} unique{i} text{i} words{i}" for i in range(4)]
    out = D.sparse_cosine_pairs(
        _sc_docs(spark, texts), threshold=0.01, max_df=3
    ).collect()
    assert out == []
    # raise the cap: the shared trigrams now count and all pairs appear
    out2 = D.sparse_cosine_pairs(
        _sc_docs(spark, texts), threshold=0.01, max_df=4
    ).collect()
    assert len(out2) == 6


def test_sparse_cosine_short_docs_have_no_trigrams(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    out = D.sparse_cosine_pairs(
        _sc_docs(spark, ["one two", "one two", ""]), threshold=0.0
    ).collect()
    assert out == []


def test_sparse_cosine_matches_brute_force(spark):
    """Cosine values equal a NumPy count-vector computation over the
    kept-term space."""
    import math
    from collections import Counter

    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sleeps under the lazy dog",
        "a completely different sentence with other words inside",
        "the quick brown fox jumps over a sleeping cat",
    ]
    out = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in D.sparse_cosine_pairs(
            _sc_docs(spark, texts), threshold=0.0, min_df=2, max_df=50
        ).collect()
    }

    def grams(t):
        w = t.split()
        return Counter(
            " ".join(w[i:i + 3]) for i in range(len(w) - 2)
        )

    vecs = [grams(t) for t in texts]
    df = Counter(g for v in vecs for g in v)
    kept = {g for g, c in df.items() if 2 <= c <= 50}
    vecs = [{g: c for g, c in v.items() if g in kept} for v in vecs]
    for a in range(4):
        for b in range(a + 1, 4):
            dot = sum(vecs[a][g] * vecs[b][g] for g in vecs[a] if g in vecs[b])
            if not dot:
                assert (a, b) not in out
                continue
            na = sum(c * c for c in vecs[a].values())
            nb = sum(c * c for c in vecs[b].values())
            assert abs(out[(a, b)] - dot / math.sqrt(na * nb)) < 1e-12


def test_blocking_metrics_planted_duplicates(spark):
    """Two identical docs + distinct fillers: LSH must find the planted
    pair (completeness 1.0) while pruning most of C(n,2)."""
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    texts = ["the exact same duplicated document body here" if i < 2
             else f"completely unrelated filler number {i} with words {i * 17}"
             for i in range(12)]
    out = D.blocking_metrics(
        _sc_docs(spark, texts), jaccard_threshold=0.9, max_doc_id=None
    ).collect()[0]
    assert out["n_docs"] == 12 and out["total_pairs"] == 66
    assert out["truth_pairs"] == 1
    assert out["true_candidates"] == 1
    assert out["pair_completeness"] == 1.0
    assert 0 < out["candidate_pairs"] <= 66
    assert out["reduction_ratio"] >= 0.5


def test_blocking_metrics_no_truth_is_null_completeness(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    texts = [f"totally different document {i} about topic {i * 31}"
             for i in range(6)]
    out = D.blocking_metrics(
        _sc_docs(spark, texts), jaccard_threshold=0.99, max_doc_id=None
    ).collect()[0]
    assert out["truth_pairs"] == 0
    assert out["pair_completeness"] is None


def test_ann_recall_full_probe_is_exact(spark):
    """Probing every list makes IVF == brute force: recall@k 1.0 for
    every query; fewer probes can only lower it."""
    from orionbelt_ontology_builder_spark.datapipe import similarity as S

    rows = []
    for cid in range(3):
        base = [1.0 if i == cid else 0.0 for i in range(8)]
        for j in range(5):
            rows.append(
                (cid + 3 * j, [v + 0.01 * j * ((i % 3) - 1)
                               for i, v in enumerate(base)])
            )
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = S.ann_recall(embs, n_queries=3, k=3, nprobe=64, dim=8).collect()
    assert [r["recall"] for r in full] == [1.0, 1.0, 1.0]
    probed = S.ann_recall(embs, n_queries=3, k=3, nprobe=1, dim=8).collect()
    for r in probed:
        assert 0.0 <= r["recall"] <= 1.0


def test_mutual_nn_pairs_reciprocity(spark):
    """Two tight twin pairs + one outlier near a twin: only mutual
    top-1s survive (the outlier's best friend doesn't reciprocate)."""
    from orionbelt_ontology_builder_spark.datapipe import similarity as S

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),     # 0<->1 mutual
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.01, 0.999, 0.0, 0.0]),     # 2<->3 mutual
        (4, [0.9, 0.1, 0.0, 0.0]),        # closest to 1, but 1 prefers 0
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = [(r["id_a"], r["id_b"])
           for r in S.mutual_nn_pairs(embs, threshold=0.0, dim=4).collect()]
    assert out == [(0, 1), (2, 3)]


def test_neighbor_mean_embedding_pools_neighbors(spark):
    """Twin pair 0<->1 plus a far singleton: pooled mean for 0 is
    exactly 1's vector (its only neighbor), singleton absent."""
    from orionbelt_ontology_builder_spark.datapipe import similarity as S

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # tight twin of 0
        (2, [0.0, 0.0, 1.0, 0.0]),      # orthogonal to both
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.neighbor_mean_embedding(embs, threshold=0.5, dim=4).collect()
    by = {(r["vec_id"], r["dim_idx"]): r for r in got}
    assert {v for v, _ in by} == {0, 1}
    # node 0's pooled neighborhood is exactly vector 1 (its only nbr)
    assert [by[(0, d)]["nbr_mean"] for d in range(4)] == [0.999, 0.01, 0.0, 0.0]
    assert [by[(0, d)]["self_v"] for d in range(4)] == [1.0, 0.0, 0.0, 0.0]
    assert all(by[k]["n_nbrs"] == 1 for k in by)


def test_prefix_jaccard_lossless_vs_brute(spark):
    """PPJoin prefix filter is LOSSLESS: output == brute-force all-pairs
    token Jaccard >= t (computed in python on the same corpus)."""
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumped over a lazy dog"),
        (2, "entirely different content about spark shuffles"),
        (3, "content about spark shuffles entirely different"),  # perm of 2
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "unrelated short text"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.prefix_jaccard_pairs(docs, threshold=0.5).collect()
    }

    import re

    toks = {i: set(re.sub(r"[^a-z0-9]+", " ", t.lower()).split()) for i, t in texts}
    want = {}
    for a in toks:
        for b in toks:
            if a < b:
                j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
                if j >= 0.5:
                    want[(a, b)] = j
    assert got == want
    assert (2, 3) in got and got[(2, 3)] == 1.0  # permutation dup found


def test_prefix_jaccard_matches_oracle_on_testdata(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], round(r["jaccard"], 9))
        for r in D.prefix_jaccard_pairs(docs, threshold=0.6).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        (a, b, round(j, 9))
        for a, b, j in con.execute(D.prefix_jaccard_oracle(0.6)).fetchall()
    )
    con.close()
    assert got == want


def test_top_eigenvector_recovers_planted_direction(spark):
    """Planted-spike corpus: vectors = s*u + small deterministic noise;
    3 power iterations recover u (spectral gap >> 1)."""
    import math

    from orionbelt_ontology_builder_spark.datapipe import similarity as S

    d = 8
    u = [1.0 if i == 2 else 0.0 for i in range(d)]
    rows = []
    for n in range(40):
        s = 3.0 if n % 2 else -3.0  # symmetric spike, mean ~0
        noise = [0.01 * ((n * 7 + i) % 5 - 2) for i in range(d)]
        rows.append((n, [s * u[i] + noise[i] for i in range(d)]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = S.top_eigenvector(embs, dim=d, iters=3).collect()
    v = [r["component"] for r in sorted(got, key=lambda r: r["dim_idx"])]
    dot = sum(a * b for a, b in zip(v, u))
    assert abs(dot) > 0.999
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    assert got[0]["eigenvalue"] > 8.0  # spike variance ~9


def test_mirror_sources_containment(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    docs = spark.createDataFrame(
        [
            (1, "the same syndicated lead paragraph here", "hostA"),
            (2, "the same syndicated lead paragraph here", "hostB"),
            (3, "another shared wire story lead text", "hostA"),
            (4, "another shared wire story lead text", "hostB"),
            (5, "hostA exclusive content nobody copies", "hostA"),
            (6, "hostC only talks to itself", "hostC"),
        ],
        "doc_id long, text string, source string",
    )
    got = D.mirror_sources(docs, key_chars=128).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["source_a"], r["source_b"], r["n_shared"]) == (
        "hostA", "hostB", 2)
    # hostB has 2 distinct leads, both shared: containment 1.0
    assert r["containment"] == 1.0


def test_mirror_sources_hot_lead_guard(spark):
    from orionbelt_ontology_builder_spark.datapipe import dedup as D

    # a lead present on 3 sources is dropped when max_sources=2 —
    # the boilerplate guard runs BEFORE the pair join
    docs = spark.createDataFrame(
        [(i, "universal footer boilerplate text", f"h{i}")
         for i in range(3)],
        "doc_id long, text string, source string",
    )
    assert D.mirror_sources(docs, max_sources=2).collect() == []


def test_bm25_rewards_rare_terms_and_matches_hand_math(spark):
    import math

    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame(
        [
            (1, "rare word here"),
            (2, "common common common word"),
            (3, "common word"),
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           TS.bm25_search(docs, ["rare", "common"]).collect()}
    assert set(got) == {1, 2, 3}           # doc 4 hits nothing
    # 'rare' (df=1) must out-score 'common' (df=2) at equal tf
    assert got[1]["score"] > got[3]["score"]
    # hand math for doc 3, term 'common': tf=1, dl=2, N=4, avgdl=11/4
    k1, b = 1.2, 0.75
    idf = math.log((4 - 2 + 0.5) / (2 + 0.5) + 1.0)
    contrib = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 2 / (11 / 4)))
    idf_r = 0.0  # doc3 has no 'rare'
    assert math.isclose(got[3]["score"], contrib + idf_r, rel_tol=1e-12)


def test_dbscan_roles_and_noise(spark):
    from orionbelt_ontology_builder_spark.datapipe import similarity as S

    # tight 3-clique (cores) + one satellite (border) + one outlier
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.05, 0.0, 0.0]),
        (2, [0.98, 0.08, 0.0, 0.0]),
        (3, [0.9, 0.3, 0.0, 0.0]),      # near the clique edge
        (4, [0.0, 0.0, 1.0, 0.0]),      # noise
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["cluster"], r["role"])
           for r in S.dbscan_clusters(embs, eps_cos=0.95, min_pts=2,
                                      dim=4).collect()}
    assert 4 not in got                       # outlier is noise
    assert got[0] == (0, "core")
    assert got[1][1] == "core" and got[1][0] == 0
    # everyone present sits in cluster 0
    assert {c for c, _ in got.values()} == {0}


# ------------------------------------------------------------------ #
# C4 keep-first span dedup
# ------------------------------------------------------------------ #


def test_c4_span_dedup_keeps_first_occurrence(spark):
    """The duplicated span survives ONLY in its globally-first home
    (min (doc_id, pos)); unique spans survive everywhere."""
    rows = [
        (0, "Shared sentence here. Unique alpha."),
        (1, "Unique beta. Shared sentence here. Unique gamma."),
        # both spans first occur in doc 0 (note: the FINAL span keeps its
        # trailing '.', so it only matches doc 0's final span, not the
        # mid-document "Unique alpha" — split semantics, same both sides)
        (2, "Shared sentence here. Unique alpha."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.c4_span_dedup(df).collect()}
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 2   # first copy kept
    assert out[1]["n_spans"] == 3 and out[1]["n_kept"] == 2   # middle copy cut
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 0   # dup-only doc emptied
    # clean text is hashed deterministically; emptied doc == md5("")
    import hashlib
    assert out[2]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_c4_span_dedup_vs_boilerplate_semantics(spark):
    """Drop-all (CCNet) vs keep-one (C4): corpus-wide the C4 pass
    retains exactly one copy of a heavy span, the sum over n_kept
    differs by exactly the number of deduped distinct spans."""
    rows = [(i, "Repeated span text. Doc %d body." % i) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.c4_span_dedup(df).collect()
    total_kept = sum(r["n_kept"] for r in out)
    # 4 unique bodies + exactly 1 surviving copy of the repeated span
    assert total_kept == 5


# ------------------------------------------------------------------ #
# BPE merge training + char-trigram LM
# ------------------------------------------------------------------ #


def _mini_docs(spark, texts):
    from pyspark.sql import Row as R

    return spark.createDataFrame(
        [
            R(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    )


def test_bpe_merges_learning_order(spark):
    """Corpus 'abc abc abc abd': round 1 must merge (a,b) freq 4, round
    2 (ab,c) freq 3, round 3 (ab,d) freq 1 — the exact greedy BPE
    sequence, with merge application feeding the next round's counts."""
    from orionbelt_ontology_builder_spark.datapipe import tokenizer

    docs = _mini_docs(spark, ["abc abc abc abd"])
    rows = [
        tuple(r)
        for r in tokenizer.bpe_merges(docs, rounds=3)
        .orderBy("merge_round")
        .collect()
    ]
    assert rows == [
        (1, "a", "b", "ab", 4),
        (2, "ab", "c", "abc", 3),
        (3, "ab", "d", "abd", 1),
    ]


def test_bpe_merges_early_stop_and_word_weighting(spark):
    from orionbelt_ontology_builder_spark.datapipe import tokenizer

    # single-char words only: no adjacent pairs, loop stops at 0 rows
    empty = tokenizer.bpe_merges(_mini_docs(spark, ["a b a b c"]), rounds=3)
    assert empty.count() == 0
    # pair counts are word-frequency weighted, not distinct-word
    docs = _mini_docs(spark, ["xy xy xy", "zq"])
    top = tokenizer.bpe_merges(docs, rounds=1).collect()[0]
    assert (top["lhs"], top["rhs"], top["freq"]) == ("x", "y", 3)


def test_char_trigram_logprob_hand_computed(spark):
    """Corpus {'aaaa', 'abcd'}: model counts c3 = {aaa:2, abc:1, bcd:1},
    c2 = {aa:2, ab:1, bc:1}, V = 4.  doc0 mean = ln(2.5/4.5); doc1 mean
    = ln(1.5/3.5).  Repetitive text must score strictly higher."""
    import math

    docs = _mini_docs(spark, ["aaaa", "abcd"])
    got = {
        r["doc_id"]: r
        for r in textstats.char_trigram_logprob(docs).collect()
    }
    assert got[0]["n_trigrams"] == 2 and got[1]["n_trigrams"] == 2
    assert got[0]["mean_logprob"] == pytest.approx(math.log(2.5 / 4.5))
    assert got[1]["mean_logprob"] == pytest.approx(math.log(1.5 / 3.5))
    assert got[0]["mean_logprob"] > got[1]["mean_logprob"]


def test_char_trigram_logprob_short_docs_vanish(spark):
    docs = _mini_docs(spark, ["ab", "x", "", "abc"])
    out = textstats.char_trigram_logprob(docs).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_bpe_encode_stats_fertility(spark):
    """rounds=2 on 'abc abc abc abd': vocab encodes abc as one symbol,
    abd as ('ab', 'd') — doc fertility (3*1 + 2) / 4 = 1.25."""
    from orionbelt_ontology_builder_spark.datapipe import tokenizer

    docs = _mini_docs(spark, ["abc abc abc abd"])
    row = tokenizer.bpe_encode_stats(docs, rounds=2).collect()[0]
    assert row["n_words"] == 4
    assert row["n_subwords"] == 5
    assert row["fertility"] == pytest.approx(1.25)


def test_srp_pairs_subset_of_exact_and_identical_vectors_found(spark):
    """SRP candidates that verify are exactly a subset of the all-pairs
    cosine join (precision 1.0 by construction), and two identical
    vectors agree on every sign bit, so they are ALWAYS found."""
    from pyspark.sql import Row as R

    import orionbelt_ontology_builder_spark.datapipe.similarity as S

    dim = 8
    base = [1.0, 0.5, -0.25, 2.0, -1.0, 0.75, 0.1, -0.6]
    far = [-1.0, 2.0, 0.5, -0.3, 1.5, -2.0, 0.9, 0.4]
    rows = [
        R(vec_id=0, embedding=base, label="a"),
        R(vec_id=1, embedding=list(base), label="a"),  # identical twin
        R(vec_id=2, embedding=far, label="b"),
    ]
    embs = spark.createDataFrame(rows)
    got = S.srp_lsh_pairs(embs, threshold=0.42, dim=dim, n_bits=4,
                          n_tables=2).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (0, 1) in pairs
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.ivf_cosine_pairs(embs, threshold=0.42, dim=dim).collect()
    } | {(0, 1)}
    assert pairs <= exact
    for r in got:
        if (r["id_a"], r["id_b"]) == (0, 1):
            assert r["cos"] == pytest.approx(1.0)


def test_leakage_safe_split_cluster_coherence(spark, docs):
    """Near-dup cluster members must share one split; singletons must
    match split_corpus bit-for-bit at the same salt."""
    from orionbelt_ontology_builder_spark.datapipe import curation

    out = curation.leakage_safe_split(docs).collect()
    by_id = {r["doc_id"]: r for r in out}
    clusters = dedup.dedup_clusters(docs).collect()
    assert clusters, "fixture must contain near-dup clusters"
    for c in clusters:
        assert (
            by_id[c["doc_id"]]["split"]
            == by_id[c["keeper_doc_id"]]["split"]
        )
        assert by_id[c["doc_id"]]["split_key"] == c["keeper_doc_id"]
    plain = {
        r["doc_id"]: r for r in curation.split_corpus(docs).collect()
    }
    clustered = {c["doc_id"] for c in clusters}
    for did, r in by_id.items():
        if did not in clustered:
            assert r["split"] == plain[did]["split"]
            assert r["bucket"] == plain[did]["bucket"]


def test_pq_adc_distance_is_reconstruction_distance(spark):
    """The defining ADC identity: adist(q, v) equals the exact squared
    L2 distance from q to the PQ *reconstruction* of v (each subvector
    replaced by its assigned centroid) — checked against a pure-Python
    recomputation on a 4-vector corpus (dim=8, m=2, kc=2)."""
    from pyspark.sql import Row as R

    import orionbelt_ontology_builder_spark.datapipe.similarity as S

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0],
        1: [0.9, 0.1, 0.0, 0.0, 0.0, 1.8, 0.0, 0.0],
        2: [0.0, 0.0, 3.0, 0.0, 0.0, 2.1, 0.0, 0.0],
        3: [0.1, 0.0, 2.9, 0.0, 1.9, 0.1, 0.0, 0.0],
    }
    embs = spark.createDataFrame(
        [R(vec_id=i, embedding=v, label="x") for i, v in vecs.items()]
    )
    m, kc, dim, sub_dim = 2, 2, 8, 4
    # codebook: stride = 4 // 2 = 2 -> centroids from vec 0 and vec 2
    book = {
        sub: {
            cid: vecs[cid * 2][sub * sub_dim:(sub + 1) * sub_dim]
            for cid in range(kc)
        }
        for sub in range(m)
    }

    def dsq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def code(v, sub):
        s = v[sub * sub_dim:(sub + 1) * sub_dim]
        return min(range(kc), key=lambda c: (dsq(s, book[sub][c]), c))

    def adist(q, v):
        return sum(
            dsq(
                q[sub * sub_dim:(sub + 1) * sub_dim],
                book[sub][code(v, sub)],
            )
            for sub in range(m)
        )

    got = {
        (r["query_id"], r["neighbor_id"]): r
        for r in S.pq_adc_topk(
            embs, n_queries=2, k=3, m=m, kc=kc, dim=dim
        ).collect()
    }
    for (q, v), r in got.items():
        assert r["adist"] == pytest.approx(adist(vecs[q], vecs[v]))
    # ranks follow adist ascending per query
    for q in (0, 1):
        ranked = sorted(
            (r for key, r in got.items() if key[0] == q),
            key=lambda r: r["rank"],
        )
        dists = [r["adist"] for r in ranked]
        assert dists == sorted(dists)


def test_lsh_parameter_plan_s_curve_laws(spark):
    """Hand-math at (6,4): p = 1-(1-0.5^4)^6; more bands at fixed rows
    raises capture probability AND false-positive mass; the 1-row-
    bands extreme is near-certain capture, the 12-row extreme is
    near-zero FP."""
    got = {
        (r["bands"], r["rows"]): r
        for r in dedup.lsh_parameter_plan(spark, threshold=0.5).collect()
    }
    assert got[(6, 4)]["p_at_threshold"] == pytest.approx(
        1.0 - (1.0 - 0.5**4) ** 6
    )
    assert got[(24, 1)]["p_at_threshold"] > 0.99
    assert got[(2, 12)]["fp_area"] < got[(24, 1)]["fp_area"]
    assert got[(2, 12)]["fn_area"] > got[(24, 1)]["fn_area"]
    # more bands at fixed rows -> strictly more capture everywhere
    assert got[(12, 2)]["p_at_threshold"] > got[(4, 6)]["p_at_threshold"]


def test_embedding_drift_identical_halves_zero(spark):
    """Label whose parity halves are identical: zero drift, cosine 1;
    label whose halves differ: positive drift."""
    from pyspark.sql import Row as R

    import orionbelt_ontology_builder_spark.datapipe.similarity as S

    rows = []
    stable = [1.0, 2.0, 0.0, 1.0]
    for i in range(4):  # vec_ids 0..3: both parities see `stable`
        rows.append(R(vec_id=i, embedding=stable, label="stable"))
    for i in range(4, 8):  # even ids one direction, odd another
        emb = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        rows.append(R(vec_id=i, embedding=emb, label="moved"))
    got = {
        r["label"]: r
        for r in S.embedding_drift(spark.createDataFrame(rows)).collect()
    }
    assert got["stable"]["l2_drift"] == pytest.approx(0.0)
    assert got["stable"]["cos_centroids"] == pytest.approx(1.0)
    assert got["stable"]["n_a"] == 2 and got["stable"]["n_b"] == 2
    assert got["moved"]["l2_drift"] == pytest.approx(2.0**0.5)
    assert got["moved"]["cos_centroids"] == pytest.approx(0.0)


# ------------------------------------------------------------------ #
# multi-pass sorted-neighborhood blocking
# ------------------------------------------------------------------ #


def test_sorted_neighborhood_window_and_twin(spark):
    import duckdb

    from pyspark.sql import functions as F

    from orionbelt_ontology_builder_spark.datapipe import dedup

    rows = [
        (1, "smith"), (2, "smyth"), (3, "smooth"),
        (4, "jones"), (5, "jonas"), (6, "zzz"),
    ]
    df = spark.createDataFrame(rows, "rec_id long, name string")
    got = [
        (r["pass"], r["id_a"], r["id_b"])
        for r in dedup.sorted_neighborhood_pairs(
            df, {"name": F.col("name")}, bucket_len=2, window=2
        ).collect()
    ]
    # bucket 'sm' sorted: smith < smooth < smyth -> adjacent pairs only
    # bucket 'jo' sorted: jonas < jones
    assert got == [
        ("name", 4, 5),  # jonas-jones? ordered by rank: jonas(r1), jones(r2)
        ("name", 1, 3),
        ("name", 3, 2),
    ] or sorted(got) == sorted(
        [("name", 5, 4), ("name", 1, 3), ("name", 3, 2)]
    )
    # rank order pins id_a = lower rank; check against the twin instead
    vals = ", ".join(f"({i}, '{n}')" for i, n in rows)
    want = duckdb.sql(
        dedup.sorted_neighborhood_sql(
            f"records(rec_id, name) AS (VALUES {vals})",
            {"name": "name"},
            bucket_len=2,
            window=2,
        )
    ).fetchall()
    assert sorted(got) == sorted(tuple(r) for r in want)
    # multi-pass union dedups and tags the firing pass
    two = dedup.sorted_neighborhood_pairs(
        df,
        {"name": F.col("name"), "rev": F.reverse(F.col("name"))},
        bucket_len=2,
        window=2,
    ).collect()
    assert {r["pass"] for r in two} <= {"name", "rev"}
    assert len({(r["pass"], r["id_a"], r["id_b"]) for r in two}) == len(two)


def test_url_rules_filter_longest_match(spark):
    import duckdb

    from orionbelt_ontology_builder_spark.datapipe import urls as U

    got = {
        r["url_id"]: (r["decision"], r["rule_prefix"])
        for r in U.url_rules_filter(
            U.url_fixture_df(spark), U.url_rules_df(spark)
        ).collect()
    }
    # longest match wins: allow /Path/Page beats deny /Path
    assert got[0] == ("allow", "/Path/Page")
    assert got[6] == ("allow", "/Path/Page")
    # deny when only the shorter deny matches
    assert got[2] == ("deny", "/items")
    # allow /a beats deny / on news.site
    assert got[5] == ("allow", "/a")
    # unmatched path / unknown host default to allow with empty prefix
    assert got[3] == ("allow", "")
    assert got[7] == ("allow", "")
    want = {
        r[0]: (r[3], r[4])
        for r in duckdb.sql(U.url_rules_filter_sql()).fetchall()
    }
    assert got == want


# ------------------------------------------------------------------ #
# TextRank corpus keywords (textstats.textrank_keywords)
# ------------------------------------------------------------------ #


def test_textrank_hub_word_ranks_first(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    docs = spark.createDataFrame(
        [
            (1, "spark handles massive shuffle"),
            (2, "spark powers stream compute"),
            (3, "spark stores column tables"),
            (4, "quiet garden grows tulips"),
        ],
        "doc_id int, text string",
    )
    rows = TS.textrank_keywords(docs, k=100).collect()
    assert rows[0]["term"] == "spark"  # hub of the co-occurrence graph
    scores = {r["term"]: r["score"] for r in rows}
    # every peripheral word is strictly below the hub
    assert all(scores["spark"] > s for t, s in scores.items() if t != "spark")
    # short tokens are not candidates at min_len=4 (none here are <4,
    # so also check an explicit one)
    docs2 = spark.createDataFrame([(1, "ab cd massive shuffle")],
                                  "doc_id int, text string")
    terms2 = {r["term"] for r in TS.textrank_keywords(docs2, k=10).collect()}
    assert "ab" not in terms2 and "massive" in terms2


def test_textrank_k_limit_and_tiebreak(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats as TS

    # symmetric 2-cliques -> tied scores; tiebreak is term ascending
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")],
        "doc_id int, text string",
    )
    rows = TS.textrank_keywords(docs, k=3).collect()
    assert len(rows) == 3
    assert [r["term"] for r in rows] == ["alpha", "beta", "delta"]


# ------------------------------------------------------------------ #
# JPEG baseline codec (r5)
# ------------------------------------------------------------------ #


def test_jpeg_codec_roundtrips():
    """Pure-NumPy baseline JPEG: constant 8x8 blocks with the all-ones
    quant table round-trip BIT-EXACT (DC-only, exact multiples of 8);
    arbitrary pixels bound by coefficient rounding; a real quant table
    stays within quantization error on smooth content."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import jpegcodec as J

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, size=(12, 16))
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(J.decode_jpeg_gray(J.encode_jpeg_gray(img)), img)

    img2 = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    got = J.decode_jpeg_gray(J.encode_jpeg_gray(img2))
    assert np.abs(got.astype(int) - img2.astype(int)).max() <= 1

    qt = np.clip(np.arange(64) // 4 + 1, 1, 32)
    x = np.linspace(0, 255, 64)
    img3 = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    got3 = J.decode_jpeg_gray(J.encode_jpeg_gray(img3, qt))
    assert np.abs(got3.astype(int) - img3.astype(int)).max() <= 2

    # dispatch: decode_image expands grayscale to identical RGB planes
    rgb = multimodal.decode_image(J.encode_jpeg_gray(img))
    assert rgb.shape == (96, 128, 3)
    assert np.array_equal(rgb[:, :, 0], img)
    assert np.array_equal(rgb[:, :, 1], img)

    # marker framing
    blob = J.encode_jpeg_gray(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"


def test_jpeg_unsupported_features_named():
    import struct

    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import jpegcodec as J

    img = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(J.encode_jpeg_gray(img))
    # flip SOF0 (FFC0) to SOF2 (FFC2 progressive)
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        J.decode_jpeg_gray(bytes(blob))
    # 3-component SOF rejected
    blob2 = bytearray(J.encode_jpeg_gray(img))
    i = bytes(blob2).index(b"\xff\xc0")
    blob2[i + 9] = 3  # Nf
    with pytest.raises(NotImplementedError, match="single-component"):
        J.decode_jpeg_gray(bytes(blob2))
    # odd dims rejected by the encoder
    with pytest.raises(ValueError):
        J.encode_jpeg_gray(np.zeros((10, 8), dtype=np.uint8))


def test_decode_jpeg_block_stats_real_decode(docs):
    """Full Huffman+IDCT decode inside mapInPandas: stats equal the
    payload arithmetic the DuckDB oracle recomputes."""
    import hashlib as _hl

    media = multimodal.synthesize_jpeg_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_jpeg_block_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    h = _hl.md5(row0["text"].encode()).hexdigest()
    payload = h
    for _ in range(5):
        h = _hl.md5(h.encode()).hexdigest()
        payload += h
    s = stats[0]
    assert (s["width"], s["height"]) == (128, 96)
    assert s["px_sum"] == 192 * sum(payload.encode())
    assert s["px_mean"] == s["px_sum"] / (128 * 96 * 3)
    assert s["block_md5"] == _hl.md5(payload.encode()).hexdigest()


def test_gif_codec_roundtrips():
    """Real LZW (variable width, dict growth, 12-bit cap, overflow
    resets) + GIF89a container: lossless round-trips on random and
    repetitive images; dispatch expands via the identity palette."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import gifcodec as G

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (12, 16), (33, 7), (64, 64)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        rgb = multimodal.decode_image(G.encode_gif_gray(img))
        assert rgb.shape == (h, w, 3)
        assert np.array_equal(rgb[:, :, 0], img)
        assert np.array_equal(rgb[:, :, 2], img)
    # LZW edge cases: empty, single, dict-overflow on repetitive data
    for data, mcs in [(b"", 2), (b"\x01", 2),
                      (b"abcabcabd" * 20000, 8)]:
        assert G.lzw_decode(G.lzw_encode(data, mcs), mcs) == data
    # real compression on repetitive input (not the fixed-width trick)
    rep = b"xyxyxyxyxy" * 5000
    assert len(G.lzw_encode(rep, 8)) < len(rep) // 10
    # interlace honestly rejected
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(G.encode_gif_gray(img))
    idesc = 6 + 7 + 768  # header + screen descriptor + 256-entry GCT
    assert blob[idesc] == 0x2C
    blob[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        G.decode_gif(bytes(blob))


def test_decode_gif_stats_real_decode(docs):
    import hashlib as _hl

    media = multimodal.synthesize_gif_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_gif_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    h = _hl.md5(row0["text"].encode()).hexdigest()
    payload = h
    for _ in range(5):
        h = _hl.md5(h.encode()).hexdigest()
        payload += h
    s = stats[0]
    assert (s["width"], s["height"]) == (16, 12)
    assert s["px_sum"] == 3 * sum(payload.encode())
    assert s["px_md5"] == _hl.md5(payload.encode()).hexdigest()


def test_webp_codec_roundtrips():
    """Real VP8L: length-limited canonical prefix codes (package-merge,
    Kraft-exact), code-length-coded + simple storage, greedy LZ77 with
    overlap — lossless round-trips on random, repetitive and constant
    images through the RIFF container and the decode_image dispatch;
    out-of-scope features rejected by name."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import webpcodec as W

    rng = np.random.default_rng(13)
    for h, w in [(1, 1), (12, 16), (33, 7), (64, 64)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        rgb = multimodal.decode_image(W.encode_webp_gray(img))
        assert rgb.shape == (h, w, 3)
        assert np.array_equal(rgb[:, :, 0], img)
        assert np.array_equal(rgb[:, :, 2], img)
    # LZ77-heavy inputs: few symbols, long runs, overlap copies
    for img in [
        np.zeros((40, 40), dtype=np.uint8),
        np.tile(np.array([3, 7], dtype=np.uint8), (25, 30)),
        rng.integers(0, 3, size=(50, 50)).astype(np.uint8),
    ]:
        blob = W.encode_webp_gray(img)
        assert np.array_equal(W.decode_webp(blob)[:, :, 1], img)
    # real compression on repetitive input
    rep = np.tile(np.arange(20, dtype=np.uint8), (40, 10))
    assert len(W.encode_webp_gray(rep)) < rep.size // 10
    # full 4-channel ARGB path
    argb = rng.integers(0, 256, size=(9, 11, 4), dtype=np.uint8)
    out = W.decode_webp(W.encode_webp_lossless(argb))
    assert np.array_equal(out, argb[:, :, 1:])
    # package-merge: Kraft-exact, depth-limited, on adversarial freqs
    freqs = [1] + [2**i for i in range(12)] + [0, 5, 5]
    for limit in (7, 15):
        L = W.limited_code_lengths(freqs, limit)
        used = [x for x in L if x]
        assert max(used) <= limit
        assert abs(sum(2.0**-x for x in used) - 1.0) < 1e-12
    # out-of-scope bits rejected by name (transform flag, lossy VP8)
    blob = bytearray(W.encode_webp_gray(np.zeros((4, 4), dtype=np.uint8)))
    assert blob[20] == 0x2F  # RIFF(12) + VP8L chunk header(8) -> sig
    # after the signature: 14w + 14h + 1 alpha + 3 version = 32 bits,
    # so the transform-present bit is bit 0 of bitstream byte 4
    blob[21 + 4] |= 0x01
    with pytest.raises(NotImplementedError, match="transform"):
        W.decode_webp(bytes(blob))
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\0" * 12
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp(lossy)


def test_decode_webp_stats_real_decode(docs):
    import hashlib as _hl

    media = multimodal.synthesize_webp_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_webp_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    h = _hl.md5(row0["text"].encode()).hexdigest()
    payload = h
    for _ in range(5):
        h = _hl.md5(h.encode()).hexdigest()
        payload += h
    s = stats[0]
    assert (s["width"], s["height"]) == (16, 12)
    assert s["px_sum"] == 3 * sum(payload.encode())
    assert s["px_md5"] == _hl.md5(payload.encode()).hexdigest()


def test_exact_substr_spans(docs):
    """ExactSubstr k-gram seeding: full duplicates get one maximal
    span covering the whole doc; a one-word edit splits coverage at
    the edited token (positions whose k-window crosses it are unique);
    unrelated docs produce no rows."""
    out = {r["doc_id"]: r for r in
           dedup.exact_substr_spans(docs, k=8).collect()}
    # docs 0 and 1 are identical after normalization: 24 shared tokens
    for d in (0, 1):
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 24
        assert out[d]["longest_span"] == 24
    # doc 2 differs at token index 7 ("lazy" -> "sleepy"): only k-gram
    # starts 8..16 avoid it -> one maximal span of 16 tokens
    assert out[2]["n_spans"] == 1
    assert out[2]["dup_tokens"] == 16
    assert 3 not in out and 4 not in out


def test_flac_codec_roundtrips():
    """Real FLAC: fixed-predictor + partitioned-Rice encoder, decoder
    with constant/verbatim/fixed/LPC subframes and verified CRC-8 /
    CRC-16 — lossless round-trips across signal shapes, compression
    on smooth signals, tamper detection, subset rejections by name."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import flaccodec as FL

    rng = np.random.default_rng(29)
    sigs = [
        np.zeros(192, dtype=np.int16),
        rng.integers(-32768, 32768, size=192).astype(np.int16),
        (1000 * np.sin(np.arange(192) / 5)).astype(np.int16),
        np.arange(-96, 96, dtype=np.int16) * 30,
        rng.integers(-5, 6, size=500).cumsum().astype(np.int16),
        np.array([7], dtype=np.int16),
        np.full(300, -32768, dtype=np.int16),
    ]
    for s in sigs:
        for lpc in (False, True):
            out, rate = FL.decode_flac(FL.encode_flac_mono16(s, lpc_frame=lpc))
            assert rate == 8000
            assert np.array_equal(out, s)
    # real compression on a smooth signal (not a container trick)
    smooth = (1000 * np.sin(np.arange(192) / 5)).astype(np.int16)
    assert len(FL.encode_flac_mono16(smooth)) < 192 * 2 // 2
    # extended-UTF-8 frame numbers round-trip
    for n in [0, 127, 128, 2047, 2048, 65535, (1 << 36) - 1]:
        assert FL._read_utf8_number(FL._BR(FL._utf8_number(n))) == n
    # CRC tamper detection (body bit flip and CRC-16 flip)
    blob = bytearray(FL.encode_flac_mono16(np.arange(192, dtype=np.int16)))
    for k in (-1, -3, 30):
        bad = bytearray(blob)
        bad[k] ^= 0x40
        with pytest.raises((ValueError, NotImplementedError)):
            FL.decode_flac(bytes(bad))
    # stereo honestly rejected via STREAMINFO channels
    info = bytearray(blob)
    # magic(4) + block header(4) + 12 bytes into STREAMINFO: the byte
    # holding [rate low nibble | channels-1 (3 bits) | bps-1 high bit]
    info[8 + 12] |= 0x0E
    with pytest.raises(NotImplementedError, match="mono|stereo"):
        FL.decode_flac(bytes(info))


def test_g711_codec_roundtrips():
    """G.711: published level ranges (±32124 μ-law / ±32256 A-law),
    exact nearest-level quantization (checked against brute force),
    level-identity round-trips, and WAV fmt-6/7 container dispatch."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import g711codec as G

    assert int(G.MULAW_TABLE.max()) == 32124
    assert int(G.ALAW_TABLE.max()) == 32256
    rng = np.random.default_rng(17)
    s = rng.integers(-32768, 32768, size=1500).astype(np.int16)
    for law, table in [("mulaw", G.MULAW_TABLE), ("alaw", G.ALAW_TABLE)]:
        # every representable level round-trips exactly
        levels = table.astype(np.int16)
        assert np.array_equal(
            G.decode_g711(G.encode_g711(levels, law), law), levels
        )
        # nearest-level optimality vs brute force
        t64 = table.astype(np.int64)
        got = G.decode_g711(G.encode_g711(s, law), law).astype(np.int64)
        best = np.min(
            np.abs(t64[None, :] - s[:, None].astype(np.int64)), axis=1
        )
        assert np.array_equal(np.abs(got - s.astype(np.int64)), best)
        # container dispatch: codewords through decode_wav
        codes = rng.integers(0, 256, size=64).astype(np.uint8).tobytes()
        wav = G.encode_wav_g711(codes, law)
        samples, rate = multimodal.decode_wav(wav)
        assert rate == 8000
        assert np.array_equal(samples, G.decode_g711(codes, law))


def test_adpcm_codec_roundtrips():
    """IMA ADPCM: the real encoder tracks a smooth signal within
    adaptive-quantizer error; arbitrary nibble streams decode
    deterministically through the WAV fmt-0x11 container dispatch;
    stereo honestly rejected."""
    import numpy as np

    from orionbelt_ontology_builder_spark.datapipe import adpcmcodec as A

    rng = np.random.default_rng(3)
    nb = bytes(rng.integers(0, 256, size=192, dtype=np.uint8))
    s = A.decode_nibbles(A.nibbles_of(nb))
    wav = A.encode_wav_adpcm(nb)
    s2, rate = multimodal.decode_wav(wav)
    assert np.array_equal(s, s2) and rate == 8000 and len(s2) == 385

    t = np.arange(400)
    sig = (3000 * np.sin(t / 10)).astype(np.int16)
    packed, pred, idx = A.encode_samples(sig)
    dec = A.decode_nibbles(A.nibbles_of(packed), pred, idx)[: len(sig)]
    err = np.abs(dec.astype(int) - sig.astype(int))
    # ADPCM is lossy; bounded by the adaptive step (slope-overload
    # transients at onset, small steady-state error)
    assert err.max() < 1500 and err.mean() < 60
    assert dec[0] == sig[0]  # predictor seeds exactly

    import struct
    stereo = bytearray(wav)
    i = wav.index(b"fmt ")
    struct.pack_into("<H", stereo, i + 10, 2)  # channels = 2
    with pytest.raises(NotImplementedError, match="stereo"):
        multimodal.decode_wav(bytes(stereo))


def test_decode_adpcm_stats_matches_state_machine(docs):
    """Spark decode of the ADPCM synthesis equals a plain-Python replay
    of the published update rule (the same numbers the DuckDB
    recursive-CTE oracle reproduces)."""
    import hashlib as _hl

    from orionbelt_ontology_builder_spark.datapipe import adpcmcodec as A

    media = multimodal.synthesize_adpcm_media(docs)
    stats = {r["doc_id"]: r for r in
             multimodal.decode_audio_stats(media).collect()}
    row0 = docs.filter(F.col("doc_id") == 0).first()
    h = _hl.md5(row0["text"].encode()).hexdigest()
    payload = h
    for _ in range(5):
        h = _hl.md5(h.encode()).hexdigest()
        payload += h
    ref = A.decode_nibbles(A.nibbles_of(payload.encode("ascii")))
    s = stats[0]
    assert s["n_samples"] == 385 == len(ref)
    assert s["s_min"] == int(ref.min()) and s["s_max"] == int(ref.max())
    assert s["s_sum"] == int(ref.sum(dtype="int64"))
    assert s["pcm_md5"] == _hl.md5(
        ref.astype("<i2").tobytes().hex().encode()
    ).hexdigest()
