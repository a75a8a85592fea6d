"""Unit tests for session-16 KG ops: AMIE chain-rule mining,
property-graph export projection, open relation-phrase mining.
(Differential Spark-vs-DuckDB checks ride test_oracle_parity.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orionbelt_ontology_builder_spark import fixtures as FX
from orionbelt_ontology_builder_spark.operators import (
    pgraph,
    rulemine,
    taxonomy,
)


# --------------------------------------------------------------------- #
# rule mining
# --------------------------------------------------------------------- #


def test_amie_planted_rule_scores(spark):
    out = {
        (r.body_p, r.body_q, r.head_r): (r.support, r.n_pca, r.pca_conf)
        for r in rulemine.amie_chain_rules(
            rulemine.rule_fixture_df(spark)
        ).collect()
    }
    kg = "http://kg.example.org/"
    planted = (kg + "worksFor", kg + "basedIn", kg + "livesIn")
    # eve is a PCA counter-instance (has a livesIn fact elsewhere);
    # frank has no livesIn fact -> excluded from the denominator.
    assert out[planted] == (3, 4, 0.75)
    # derived geography rule is exact on the confirming trio
    geo_rule = (kg + "livesIn", kg + "cityIn", kg + "citizenOf")
    assert out[geo_rule] == (3, 3, 1.0)


def test_amie_thresholds_prune(spark):
    out = rulemine.amie_chain_rules(
        rulemine.rule_fixture_df(spark), min_conf=0.9
    ).collect()
    assert all(r.pca_conf >= 0.9 for r in out)
    assert len(out) == 1


def test_amie_head_not_in_body(spark):
    for r in rulemine.amie_chain_rules(
        rulemine.rule_fixture_df(spark), min_support=1, min_conf=0.0
    ).collect():
        assert r.head_r not in (r.body_p, r.body_q)


# --------------------------------------------------------------------- #
# property-graph export
# --------------------------------------------------------------------- #


def test_pg_nodes_labels_and_props(spark):
    t = FX.fixture_triples(spark, "populated_om")
    rows = {r.node: r for r in pgraph.pg_nodes(t).collect()}
    alice = rows["http://test.org/ont#alice"]
    # labels sorted csv; type triples became labels, not edges
    assert alice.labels_csv == "Employee,NamedIndividual"
    assert alice.props_csv == "label=Alice"
    # literal-only node keeps empty labels
    assert rows["http://test.org/ont#hasName"].labels_csv == "DatatypeProperty"
    # object-side resources appear as nodes even when never subjects
    assert "http://www.w3.org/2001/XMLSchema#string" in rows


def test_pg_edges_exclude_types(spark):
    t = FX.fixture_triples(spark, "populated_om")
    edges = [(r.src, r.rel, r.dst) for r in pgraph.pg_edges(t).collect()]
    rels = {r for _, r, _ in edges}
    assert "type" not in rels
    assert (
        "http://test.org/ont#Employee",
        "subClassOf",
        "http://test.org/ont#Person",
    ) in edges


# --------------------------------------------------------------------- #
# open relation mining
# --------------------------------------------------------------------- #


def test_open_relations_support_and_filters(spark):
    out = {
        (r.subj, r.rel_phrase, r.obj): r.support
        for r in taxonomy.open_relations(
            taxonomy.rel_sentences_df(spark)
        ).collect()
    }
    kg = "http://kg.example.org/"
    # repeated sentence pair -> support 2
    assert out[(kg + "Berlin", "signed a treaty with", kg + "Paris")] == 2
    # coordination phrase filtered ("san francisco AND new york")
    assert not any(p == "and" for _, p, _ in out)
    # third-mention intrusion excluded: no NYC->Berlin rule through
    # the sentence "new york met paris near berlin quickly"
    assert not any(
        s == kg + "NewYorkCity" and o == kg + "Berlin" and "paris" in p
        for s, p, o in out
    )
    # leftmost-longest: "the new york times praised berlin" binds the
    # 3-gram NYTimes, not the inner city
    assert (kg + "NYTimes", "praised", kg + "Berlin") in out


# --------------------------------------------------------------------- #
# rule application (link prediction)
# --------------------------------------------------------------------- #


def test_rule_predictions_fill_gaps_only(spark):
    preds = rulemine.rule_predictions(rulemine.rule_fixture_df(spark))
    rows = [(r.subj, r.pred, r.obj, r.pca_conf) for r in preds.collect()]
    kg = "http://kg.example.org/"
    # frank has no livesIn fact: the planted rule predicts paris
    assert (kg + "frank", kg + "livesIn", kg + "paris", 0.75) in rows
    # no prediction duplicates an existing fact
    existing = {
        (t[0], t[1], t[2]) for t in rulemine.RULE_FIXTURE
    }
    assert all((s, p, o) not in existing for s, p, o, _ in rows)


# --------------------------------------------------------------------- #
# graph digest
# --------------------------------------------------------------------- #


def test_graph_digest_invariances(spark):
    from orionbelt_ontology_builder_spark.operators import setops

    t = FX.fixture_triples(spark, "populated_om")
    base = tuple(setops.graph_digest(t).collect()[0])
    # partitioning / order invariance
    assert tuple(setops.graph_digest(t.repartition(13)).collect()[0]) == base
    assert (
        tuple(
            setops.graph_digest(t.orderBy(F.desc("obj"))).collect()[0]
        )
        == base
    )
    # duplicate rows do not change the SET digest
    assert (
        tuple(setops.graph_digest(t.unionByName(t.limit(5))).collect()[0])
        == base
    )
    # any single-triple change moves the digest
    changed = tuple(
        setops.graph_digest(
            t.withColumn(
                "obj",
                F.when(F.col("obj") == "Alice", "Alicia").otherwise(
                    F.col("obj")
                ),
            )
        ).collect()[0]
    )
    assert changed[0] == base[0] and changed[1] != base[1]


# --------------------------------------------------------------------- #
# literal canonicalization
# --------------------------------------------------------------------- #


def test_canonicalize_literals_branches(spark):
    from orionbelt_ontology_builder_spark.operators import mutations

    out = mutations.canonicalize_literals(
        mutations.messy_literals_df(spark)
    ).collect()
    objs = {(r.subj, r.obj) for r in out}
    assert ("http://t/e1", "7") in objs          # +007 and 7 collapse
    assert len([r for r in out if r.subj == "http://t/e1"]) == 1
    assert ("http://t/e2", "0") in objs          # -0 -> 0
    assert ("http://t/e3", "1.5") in objs        # trailing zero
    assert ("http://t/e4", "0.1") in objs        # leading zeros
    assert ("http://t/e5", "0.0") in objs        # -0.0 -> 0.0
    assert ("http://t/e6", "0.5") in objs        # .5 -> 0.5
    assert ("http://t/e7", "true") in objs       # 1 -> true
    assert ("http://t/e9", "1.50") in objs       # double untouched
    assert ("http://t/e10", "007") in objs       # untyped untouched


# --------------------------------------------------------------------- #
# partition quality
# --------------------------------------------------------------------- #


def test_partition_quality_salting_tradeoff(spark):
    from orionbelt_ontology_builder_spark.plans import bucketing

    # star graph: one hub fanning to 64 leaves + 16 singleton edges
    rows = [("hub", f"leaf{i}") for i in range(64)] + [
        (f"s{i}", f"t{i}") for i in range(16)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    out = {
        r.strategy: r
        for r in bucketing.partition_quality(
            edges, k=4, hot_degree=10
        ).collect()
    }
    sh, sa = out["subject_hash"], out["salted_subject"]
    assert sh.n_edges == sa.n_edges == 80
    # the hub piles >= its 64 edges on one partition under subject hash
    assert sh.max_load >= 64
    # salting spreads the hub: strictly better balance
    assert sa.skew < sh.skew
    assert sa.max_load < sh.max_load


# --------------------------------------------------------------------- #
# reciprocal-rank fusion
# --------------------------------------------------------------------- #


def test_rrf_disagreeing_rankings(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [
            (0, "table scan window"),            # all 3 terms once
            (1, "table table table table table"),  # one term, high tf
            (2, "table scan"),                   # 2 terms
            (3, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.rrf_retrieval(
        docs, ["table", "scan", "window"], kconst=60
    ).collect()}
    assert 3 not in out
    # doc0 wins coordination, doc1 wins tf — fusion puts doc0 first
    # (rank 1 + rank 2 beats rank 2-or-3 + rank 1)
    assert out[0].rank_overlap == 1 and out[1].rank_tf == 1
    best = max(out.values(), key=lambda r: r.rrf_score)
    assert best.doc_id == 0


def test_rrf_plan_has_no_global_window(spark):
    """VERDICT r2 #8: base lists are pre-capped with TakeOrdered and
    exact ranks recovered by a counting join — no single-partition
    global window rank anywhere in the plan."""
    from orionbelt_ontology_builder_spark.datapipe import textstats

    docs = spark.createDataFrame(
        [(0, "table scan"), (1, "scan window")], "doc_id long, text string"
    )
    df = textstats.rrf_retrieval(docs, ["table", "scan", "window"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_rrf_rank_exactness_beyond_cap(spark):
    """The count-join ranks equal global row_number ranks even when the
    hit set is larger than anything the caps would keep for a tiny
    top: every reported rank is the doc's true global rank."""
    from orionbelt_ontology_builder_spark.datapipe import textstats

    # 150 docs all hit 'term' with distinct tf -> hit set > m_cap for
    # top=1 (m_cap = 2 + 2*1 = 4 with kconst=2)
    docs = spark.createDataFrame(
        [(i, " ".join(["term"] * (i + 1))) for i in range(150)],
        "doc_id long, text string",
    )
    out = textstats.rrf_retrieval(docs, ["term"], kconst=2, top=3).collect()
    # every doc hits once distinct -> rank_overlap is doc_id order;
    # tf descends with doc_id -> doc 149 is tf rank 1
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].rank_overlap == 1 and by_id[0].rank_tf == 150
    assert by_id[149].rank_tf == 1 and by_id[149].rank_overlap == 150


# --------------------------------------------------------------------- #
# streaming near-dedup
# --------------------------------------------------------------------- #


def test_stream_near_dedup_replay_insensitive(spark, tmp_path):
    from orionbelt_ontology_builder_spark.streaming import ingest as ST

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    once = str(tmp_path / "once")
    twice = str(tmp_path / "twice")
    docs.write.mode("overwrite").parquet(once)
    docs.write.mode("overwrite").parquet(twice)
    docs.write.mode("append").parquet(twice)

    a = [tuple(r) for r in ST.stream_near_dedup(spark, once).collect()]
    spark.catalog.dropTempView("near_dedup_sigs_sink")
    b = [tuple(r) for r in ST.stream_near_dedup(spark, twice).collect()]
    # min(doc_id) winner state is associative/idempotent: replaying the
    # whole corpus a second time changes nothing
    assert a == b
    assert len(a) > 0
    # shadow counts bounded by the band count
    from orionbelt_ontology_builder_spark.datapipe.dedup import BANDS
    assert all(1 <= n <= BANDS for _, n, _ in a)


# --------------------------------------------------------------------- #
# numeric outliers
# --------------------------------------------------------------------- #


def test_numeric_outliers_planted(spark):
    from orionbelt_ontology_builder_spark.operators import validation

    out = validation.numeric_outliers(
        validation.outlier_fixture_df(spark)
    ).collect()
    flagged = {(r.pred, r.subj) for r in out}
    assert ("http://t/population", "http://t/cityX") in flagged  # 9.9e9
    assert ("http://t/population", "http://t/cityY") in flagged  # -500000
    assert ("http://t/age", "http://t/pX") in flagged            # 530
    # clean predicate and degenerate (constant) predicate stay silent
    assert not any(p == "http://t/price" for p, _ in flagged)
    assert not any(p == "http://t/floors" for p, _ in flagged)
    assert len(out) == 3


# --------------------------------------------------------------------- #
# bitext candidates
# --------------------------------------------------------------------- #


def test_bitext_candidates_clusters(spark):
    from orionbelt_ontology_builder_spark.datapipe import bitext

    out = {
        (r.doc_a, r.doc_b): (r.lang_a, r.lang_b, r.n_shared)
        for r in bitext.bitext_candidates(
            bitext.bitext_docs_df(spark)
        ).collect()
    }
    # the 3-language parallel cluster yields all three cross-lang pairs
    assert {(0, 1), (0, 2), (1, 2), (5, 6)} == set(out)
    assert out[(5, 6)] == ("en", "fr", 4)
    # the single-shared-anchor pair ("mild") stays below min_shared
    assert (3, 4) not in out


# --------------------------------------------------------------------- #
# anaphora resolution
# --------------------------------------------------------------------- #


def test_resolve_anaphora_rules(spark):
    out = {
        (r.doc_id, r.anaphor): (r.entity, r.antecedent_pos)
        for r in taxonomy.resolve_anaphora(
            taxonomy.coref_sentences_df(spark)
        ).collect()
    }
    kg = "http://kg.example.org/"
    # nearest PRECEDING wins: berlin (later) beats paris in doc 2
    assert out[(2, "the city")][0] == kg + "Berlin"
    # type compatibility: "the paper" skips the nearer city mention
    assert out[(1, "the paper")][0] == kg + "NYTimes"
    # untyped pronoun takes any antecedent
    assert out[(3, "it")][0] == kg + "SanFrancisco"
    # no preceding mention -> dropped
    assert not any(d == 4 for d, _ in out)


# --------------------------------------------------------------------- #
# recall estimation
# --------------------------------------------------------------------- #


def test_recall_estimate_lincoln_petersen(spark):
    from orionbelt_ontology_builder_spark.operators import profiling

    out = {
        r.pred: r
        for r in profiling.recall_estimate(
            profiling.capture_fixture_df(spark, "a"),
            profiling.capture_fixture_df(spark, "b"),
        ).collect()
    }
    w = out["worksFor"]
    assert (w.n_a, w.n_b, w.n_both, w.n_union) == (3, 4, 2, 5)
    assert w.est_total == 6.0 and abs(w.est_recall - 5 / 6) < 1e-12
    # full agreement -> complete
    assert out["livesIn"].est_recall == 1.0
    # zero overlap -> no estimate
    assert out["basedIn"].est_total is None


# --------------------------------------------------------------------- #
# SPARQL text front end
# --------------------------------------------------------------------- #


def test_sparql_parser_features(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    q = """
    PREFIX ont: <http://test.org/ont#>   # trailing comment
    SELECT ?cls WHERE {
      ?cls a <http://www.w3.org/2002/07/owl#Class> .
      FILTER ( ?cls != ont:Organization && ?cls != "junk" )
    } ORDER BY DESC(?cls) LIMIT 2 OFFSET 1
    """
    args = SP.parse_select(q)
    assert args["patterns"] == [
        ("?cls", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://www.w3.org/2002/07/owl#Class")
    ]
    assert args["filters"] == [
        "cls <> 'http://test.org/ont#Organization'  AND  cls <> 'junk'"
    ]
    assert args["order_by"] == ["-cls"]
    assert args["limit"] == 2 and args["offset"] == 1
    assert args["project"] == ["cls"]

    t = FX.fixture_triples(spark, "populated_om")
    rows = [r.cls for r in SP.sparql_select(t, q).collect()]
    # DESC order, offset 1 of [Person, Employee] remainder
    assert rows == ["http://test.org/ont#Employee"]


def test_sparql_pred_object_lists(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    q = """
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    SELECT * WHERE { ?p a owl:NamedIndividual ; rdfs:label ?l . }
    """
    t = FX.fixture_triples(spark, "populated_om")
    rows = {(r.p, r.l) for r in SP.sparql_select(t, q).collect()}
    assert ("http://test.org/ont#alice", "Alice") in rows
    assert ("http://test.org/ont#acme", "ACME Corp") in rows


def test_sparql_unsupported_raises():
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    with _pt.raises(ValueError):
        SP.parse_select("SELECT ?x WHERE { ?x ?p ?o . FILTER(regex(?x, 'a')) }")
    with _pt.raises(ValueError):
        SP.parse_select("ASK { ?s ?p ?o }")


def test_sparql_aggregate_path(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    q = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    SELECT ?cls (COUNT(?i) AS ?n)
    WHERE { ?i rdf:type ?cls . }
    GROUP BY ?cls
    HAVING ( ?n >= 2 )
    """
    args = SP.parse_select(q)
    assert args["aggs"] == {"n": "count(i)"}
    assert args["group_by"] == ["cls"]
    assert args["having"] == "n >= 2"

    t = FX.fixture_triples(spark, "populated_om")
    rows = {r.cls: r.n for r in SP.sparql_select(t, q).collect()}
    # owl:Class has 3 instances (Person, Organization, Employee)
    assert rows["http://www.w3.org/2002/07/owl#Class"] == 3
    assert all(n >= 2 for n in rows.values())


def test_sparql_agg_rejects_pagination():
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    with _pt.raises(ValueError):
        SP.parse_select(
            "SELECT (COUNT(?i) AS ?n) WHERE { ?i ?p ?o . } "
            "GROUP BY ?p LIMIT 3"
        )


def test_sparql_nested_having_parens(spark):
    """ADVICE r2: HAVING bodies with nested parens must extract whole
    (balanced-paren scan, not a non-greedy regex)."""
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    q = """
    SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o . }
    GROUP BY ?p HAVING ((?n >= 2) && (?n < 100))
    """
    args = SP.parse_select(q)
    assert args["having"] == "( n >= 2 )  AND  ( n < 100 )"
    t = FX.fixture_triples(spark, "populated_om")
    rows = SP.sparql_select(t, q).collect()
    assert rows and all(2 <= r.n < 100 for r in rows)


def test_sparql_missing_separator_raises():
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    # two objects without ',' between them used to silently behave as
    # a comma list (ADVICE r2)
    with _pt.raises(ValueError, match="after object"):
        SP.parse_select(
            "SELECT * WHERE { ?s <http://p.org/p> ?a ?b . }"
        )


def test_sparql_projection_order_semantics(spark):
    """ADVICE r2 (medium): with a projection the parsed ORDER BY
    (incl. DESC) is honored after projection, and LIMIT n returns n
    distinct projected rows; ORDER BY over a non-projected variable
    raises instead of silently re-sorting."""
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    t = FX.fixture_triples(spark, "populated_om")
    q = """
    SELECT ?cls WHERE { ?cls a <http://www.w3.org/2002/07/owl#Class> . }
    ORDER BY DESC(?cls) LIMIT 2
    """
    rows = [r.cls for r in SP.sparql_select(t, q).collect()]
    assert len(rows) == 2 and rows == sorted(rows, reverse=True)
    with _pt.raises(ValueError, match="not in the SELECT projection"):
        SP.sparql_select(
            t,
            "SELECT ?s WHERE { ?s ?p ?o . } ORDER BY ?o",
        )


def test_sparql_ask_construct_describe(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    t = FX.fixture_triples(spark, "populated_om")
    B = "http://test.org/ont#"
    # ASK true / false + filter grammar shared with SELECT
    assert SP.sparql_ask(
        t, "ASK { ?p a <http://test.org/ont#Employee> . }"
    ).collect()[0][0] == 1
    assert SP.sparql_ask(
        t, "ASK { ?p a <http://test.org/ont#Robot> . }"
    ).collect()[0][0] == 0
    with _pt.raises(ValueError):
        SP.sparql_ask(t, "ASK { ?s ?p ?o . } LIMIT 3")
    # CONSTRUCT: template kinds classified from surface tokens
    rows = {
        (r.subj, r.pred, r.obj, r.obj_kind)
        for r in SP.sparql_construct(
            t,
            "PREFIX owl: <http://www.w3.org/2002/07/owl#>\n"
            "PREFIX ont: <http://test.org/ont#>\n"
            'CONSTRUCT { ?p a ont:Agent . ?p ont:src "txt" . }\n'
            "WHERE { ?p a owl:NamedIndividual . }",
        ).collect()
    }
    rdf_t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (B + "alice", rdf_t, B + "Agent", "uri") in rows
    assert (B + "alice", B + "src", "txt", "literal") in rows
    # DESCRIBE: subject- and object-side triples of the resource
    drows = {(r.subj, r.pred, r.obj) for r in SP.sparql_describe(
        t, "PREFIX ont: <http://test.org/ont#>\nDESCRIBE ont:alice"
    ).collect()}
    assert any(s == B + "alice" for s, _, _ in drows)
    with _pt.raises(ValueError):
        SP.sparql_describe(t, "DESCRIBE ?x")


def test_sparql_path_text_forms(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    import pytest as _pt

    B = "http://x.org/"
    t = spark.createDataFrame(
        [
            (B + "a", B + "p", B + "b", "uri", None, None),
            (B + "b", B + "p", B + "c", "uri", None, None),
            (B + "c", B + "q", B + "d", "uri", None, None),
            (B + "e", B + "r", B + "a", "uri", None, None),
        ],
        "subj string, pred string, obj string, obj_kind string,"
        " obj_lang string, obj_dt string",
    )
    pre = "PREFIX x: <http://x.org/>\n"

    def run(q):
        return {tuple(r) for r in SP.sparql_path(t, pre + q).collect()}

    # transitive closure
    assert run("SELECT ?s ?o WHERE { ?s x:p+ ?o . }") == {
        (B + "a", B + "b"), (B + "a", B + "c"),
        (B + "b", B + "c"),
    }
    # sequence with constant subject endpoint
    assert run("SELECT ?o WHERE { x:a x:p/x:p/x:q ?o . }") == {
        (B + "d",)
    }
    # inverse + alternation
    assert run("SELECT ?s ?o WHERE { ?s ^x:r|x:q ?o . }") == {
        (B + "a", B + "e"), (B + "c", B + "d")
    }
    # negated property set
    assert run("SELECT ?s ?o WHERE { ?s !x:p|x:q ?o . }") == {
        (B + "e", B + "a")
    }
    # bounded repetition
    assert run("SELECT ?s ?o WHERE { ?s x:p{2} ?o . }") == {
        (B + "a", B + "c")
    }
    # guards: plain predicate routes to sparql_select; paths inside
    # sparql_select raise instead of mis-expanding
    with _pt.raises(ValueError, match="use sparql_select"):
        SP.sparql_path(t, pre + "SELECT ?s ?o WHERE { ?s x:p ?o . }")
    with _pt.raises(ValueError, match="sparql_path"):
        SP.sparql_select(t, pre + "SELECT ?s ?o WHERE { ?s x:p+ ?o . }")


def test_sparql_union_path(spark):
    from orionbelt_ontology_builder_spark.operators import sparql as SP

    q = """
    PREFIX owl: <http://www.w3.org/2002/07/owl#>
    SELECT * WHERE {
      { ?e a owl:Class }
      UNION
      { ?e a owl:ObjectProperty }
    }
    """
    t = FX.fixture_triples(spark, "populated_om")
    rows = {r.e for r in SP.sparql_select(t, q).collect()}
    assert "http://test.org/ont#Person" in rows
    assert "http://test.org/ont#worksFor" in rows
    assert len(rows) == 4


# --------------------------------------------------------------------- #
# content policy
# --------------------------------------------------------------------- #


def test_license_precedence(spark):
    from orionbelt_ontology_builder_spark.datapipe import policy

    out = {r.doc_id: r.license for r in policy.license_detect(
        policy.policy_docs_df(spark)).collect()}
    # the sharealike doc also contains the plain cc-by and cc cues —
    # precedence picks the most specific
    assert out[1] == "cc-by-sa" and out[2] == "cc-by"
    assert out[0] == "cc0" and out[4] == "all-rights-reserved"
    assert out[5] == "unknown"


def test_blocklist_rate_threshold(spark):
    from orionbelt_ontology_builder_spark.datapipe import policy

    out = {r.doc_id: r for r in policy.blocklist_stats(
        policy.policy_docs_df(spark)).collect()}
    assert out[7].n_hits == 3 and not out[7].keep      # 27% rate
    assert out[8].n_hits == 1 and out[8].keep          # 9% < 10%
    assert all(out[i].keep for i in range(7))


# --------------------------------------------------------------------- #
# temporal folds
# --------------------------------------------------------------------- #


def test_temporal_folds_no_leakage(spark):
    from orionbelt_ontology_builder_spark.operators import temporal

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = {(r.fold, r.split): r for r in
            temporal.temporal_folds(ev, n_folds=3).collect()}
    for f in (1, 2, 3):
        tr, te = rows[(f, "train")], rows[(f, "test")]
        # every test row strictly later than every train row
        assert tr.max_ts < te.min_ts
    # train grows monotonically across folds (rolling origin)
    assert (rows[(1, "train")].n_rows < rows[(2, "train")].n_rows
            < rows[(3, "train")].n_rows)


# --------------------------------------------------------------------- #
# BGP plan order
# --------------------------------------------------------------------- #


def test_bgp_plan_order_smallest_first(spark):
    from orionbelt_ontology_builder_spark.operators import query

    t = FX.fixture_triples(spark, "populated_om")
    pats = [
        ("?s", "?p", "?o"),                 # matches everything (20)
        ("?c", "http://www.w3.org/2000/01/rdf-schema#subClassOf", "?sup"),
        ("?i", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "?t"),
    ]
    rows = query.bgp_selectivity_order(t, pats).collect()
    counts = [r.est_rows for r in rows]
    assert counts == sorted(counts)
    assert rows[0].pred.endswith("subClassOf")   # 1 match, most selective
    assert rows[-1].est_rows == 20               # the wildcard scan last


# --------------------------------------------------------------------- #
# keyness + bootstrap
# --------------------------------------------------------------------- #


def test_keyness_distinctive_terms(spark):
    from orionbelt_ontology_builder_spark.datapipe import textstats

    a = spark.createDataFrame(
        [(i, "quantum flux quantum drive") for i in range(10)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(100 + i, "harvest grain harvest mill") for i in range(10)],
        "doc_id long, text string",
    )
    out = {r.term: r for r in textstats.keyness_terms(a, b).collect()}
    assert out["quantum"].direction == "a" and out["quantum"].g2 > 10
    assert out["harvest"].direction == "b" and out["harvest"].g2 > 10
    assert out["quantum"].n_b == 0


def test_bootstrap_ci_brackets_mean(spark):
    from orionbelt_ontology_builder_spark.operators import profiling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = profiling.bootstrap_mean_ci(docs).collect()[0]
    assert r.ci_lo <= r.mean_len <= r.ci_hi
    assert r.ci_hi - r.ci_lo < r.mean_len  # nondegenerate, sane width
    assert r.n_replicates == 40


# --------------------------------------------------------------------- #
# motif significance
# --------------------------------------------------------------------- #


def test_motif_significance_null_model(spark):
    from orionbelt_ontology_builder_spark.operators import graphstats

    # a 4-clique: 4 triangles observed, far above the null
    clique = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    edges = spark.createDataFrame(clique, "src string, dst string")
    r = graphstats.motif_significance(edges).collect()[0]
    assert (r.n_nodes, r.n_edges, r.observed_triangles) == (4, 6, 4)
    assert r.excess_ratio > 1.0

    # a star: zero triangles, expectation positive -> ratio 0
    star = [("hub", f"s{i}") for i in range(6)]
    r2 = graphstats.motif_significance(
        spark.createDataFrame(star, "src string, dst string")
    ).collect()[0]
    assert r2.observed_triangles == 0 and r2.excess_ratio == 0.0


# --------------------------------------------------------------------- #
# WARC parsing
# --------------------------------------------------------------------- #


def test_warc_record_assembly(spark):
    from orionbelt_ontology_builder_spark.sources import warc

    rows = {r.rec_id: r for r in warc.parse_warc_lines(
        warc.warc_fixture_df(spark)).collect()}
    assert len(rows) == 3
    a = rows[1]
    assert a.uri == "http://example.org/a"
    assert a.payload == "hello world\nsecond line of a"
    # a colon line AFTER the blank separator is payload, not a header
    b = rows[2]
    assert b.payload.startswith("payload with colon")
    assert b.warc_date == "2024-02-02T12:30:00Z"
    # warcinfo record has no target URI — NULL-free contract: ''
    assert rows[3].uri == "" and rows[3].warc_type == "warcinfo"
    # every output cell is non-NULL (driver hash robustness)
    for r in rows.values():
        assert None not in r.asDict().values()


def test_warc_per_file_record_ids(spark):
    from orionbelt_ontology_builder_spark.sources import warc

    out = warc.parse_warc_lines(
        warc.warc_multifile_fixture_df(spark)
    ).collect()
    by_key = {(r.path, r.rec_id): r for r in out}
    assert len(out) == 3
    # record ids restart at 1 in the second file
    assert ("crawl-00000.warc", 1) in by_key
    assert ("crawl-00001.warc", 1) in by_key
    assert ("crawl-00001.warc", 2) in by_key
    # no record leaks across the file edge: file 0 record keeps its
    # full payload, file 1's first record parses independently
    assert (
        by_key[("crawl-00000.warc", 1)].payload
        == "hello world\nsecond line of a"
    )
    assert (
        by_key[("crawl-00001.warc", 1)].uri == "http://example.org/b"
    )


def test_robots_grouping_semantics(spark):
    from orionbelt_ontology_builder_spark.sources import crawlmeta

    rows = crawlmeta.parse_robots(
        crawlmeta.robots_fixture_df(spark)
    ).collect()
    by = {(r.host, r.user_agent, r.directive): r.value for r in rows}
    # wildcard group rules
    assert by[("ex.org", "*", "disallow")] == "/private/"
    assert by[("ex.org", "*", "allow")] == "/private/press/"
    assert by[("ex.org", "*", "crawl-delay")] == "2"
    # consecutive User-agent lines share ONE group: both bots get the
    # same Disallow
    assert by[("ex.org", "trainingbot", "disallow")] == "/"
    assert by[("ex.org", "otherbot", "disallow")] == "/"
    # sitemap is host-global (empty agent - NULL-free contract)
    assert by[("ex.org", "", "sitemap")] == "https://ex.org/sitemap.xml"
    # empty Disallow (allow-all idiom) survives as an empty value
    assert by[("open.site", "*", "disallow")] == ""


def test_sitemap_optional_fields(spark):
    from orionbelt_ontology_builder_spark.sources import crawlmeta

    rows = {r.url: r for r in crawlmeta.parse_sitemap(
        crawlmeta.sitemap_fixture_df(spark)).collect()}
    assert rows["https://ex.org/"].lastmod == "2024-01-01"
    assert rows["https://ex.org/"].priority == "1.0"
    assert rows["https://ex.org/a"].priority == ""      # absent -> ''
    assert rows["https://ex.org/b"].lastmod == ""
    assert rows["https://open.site/x"].sitemap == "https://open.site/sm.xml"


def test_warc_window_is_partitioned(spark):
    """The plan must not contain a single-partition global sort: the
    window partitions by path."""
    from orionbelt_ontology_builder_spark.sources import warc

    plan = warc.parse_warc_lines(
        warc.warc_fixture_df(spark)
    )._jdf.queryExecution().executedPlan().toString()
    import re

    for mline in re.findall(r"Window .*", plan):
        assert "path" in mline  # partition spec present


# --------------------------------------------------------------------- #
# web tables
# --------------------------------------------------------------------- #


def test_web_tables_unrolling(spark):
    from orionbelt_ontology_builder_spark.sources import webtables

    rows = {
        (r.doc_id, r.row_key, r.header): r.value
        for r in webtables.extract_web_tables(
            webtables.webtable_fixture_df(spark)
        ).collect()
    }
    assert rows[(0, "berlin", "population")] == "3600000"
    assert rows[(0, "paris", "country")] == "france"
    # attribute-carrying <td> and whitespace both handled
    assert rows[(1, "acme", "founded")] == "1999"
    # the key column itself emits no (key, key) fact
    assert (0, "berlin", "city") not in rows
    assert len(rows) == 5


def test_jsonld_islands(spark):
    from orionbelt_ontology_builder_spark.sources import webtables

    rows = {
        (r.doc_id, r.subj, r.pred): (r.obj, r.obj_kind)
        for r in webtables.extract_jsonld_islands(
            webtables.ld_docs_df(spark)
        ).collect()
    }
    t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert rows[(0, "http://ex.org/acme", t)] == (
        "http://schema.org/Organization", "uri")
    assert rows[(0, "http://ex.org/acme", "http://schema.org/name")] == (
        "Acme Corp", "literal")
    # second island on the same page parsed too; nested @id -> uri
    assert rows[(1, "http://ex.org/alice",
                 "http://schema.org/worksFor")] == (
        "http://ex.org/acme", "uri")


def test_jsonld_islands_is_distributed(spark):
    """The decode runs inside the plan (MapInPandas), never via a
    driver-side collect + createDataFrame round-trip."""
    from orionbelt_ontology_builder_spark.sources import webtables

    df = webtables.extract_jsonld_islands(webtables.ld_docs_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # the only local-collection scan is the 2-row INPUT fixture; a
    # collect()-then-parallelize decode would instead scan a local
    # collection already carrying the OUTPUT columns (subj/pred/...)
    import re

    for scan in re.findall(r"Scan ExistingRDD\[[^\]]*\]", plan):
        assert "subj" not in scan and "pred" not in scan


def test_jsonld_islands_skips_malformed(spark):
    from orionbelt_ontology_builder_spark.sources import webtables

    docs = spark.createDataFrame(
        [(7,
          '<html><script type="application/ld+json">{not json'
          '</script><script type="application/ld+json">'
          '{"@id": "http://ex.org/ok", "@type": "http://schema.org/Thing"}'
          "</script></html>")],
        "doc_id long, html string",
    )
    rows = webtables.extract_jsonld_islands(docs).collect()
    assert len(rows) == 1 and rows[0].subj == "http://ex.org/ok"


def test_hreflang_both_attribute_orders(spark):
    from orionbelt_ontology_builder_spark.sources import webtables

    rows = {(r.lang, r.alt_url) for r in webtables.extract_hreflang(
        webtables.hreflang_docs_df(spark)).collect()}
    assert ("de", "http://ex.org/de/page") in rows
    assert ("es", "http://ex.org/es/page") in rows  # reversed attrs
    assert len(rows) == 3                           # stylesheet ignored


def test_k_anonymity_flags_small_groups(spark):
    from orionbelt_ontology_builder_spark.datapipe import policy

    import datetime as dt

    rows = [
        # 6 users on day 1 (safe), 2 users on day 2 (at risk)
        *[(i, dt.datetime(2024, 1, 1, 10), i, "view", 1.0, "{}")
          for i in range(6)],
        (100, dt.datetime(2024, 1, 2, 10), 1, "view", 1.0, "{}"),
        (101, dt.datetime(2024, 1, 2, 11), 2, "view", 1.0, "{}"),
        (102, dt.datetime(2024, 1, 2, 12), 1, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {(r.event_type, r.day): r for r in
           policy.k_anonymity_report(ev, k=5).collect()}
    assert not out[("view", "2024-01-01")].at_risk
    risky = out[("view", "2024-01-02")]
    assert risky.at_risk and risky.n_users == 2 and risky.n_rows == 3
