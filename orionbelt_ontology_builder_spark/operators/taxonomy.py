"""Taxonomy induction and hierarchy hygiene.

Two constructive complements to the reference's hand-edited class
hierarchy (``ontology_manager.py``'s add_class parent wiring /
get_class_hierarchy reader):

* :func:`hearst_patterns` — lexico-syntactic hypernym mining (Hearst,
  COLING 1992, public literature): "X such as Y", "X including Y",
  "X especially Y", "Y and other X" over raw sentences yield
  (hypernym, hyponym) subClassOf *candidates* with support counts —
  the webtext-to-ontology bootstrap step that turns a crawl into
  hierarchy suggestions a curator reviews.

* :func:`hierarchy_reduction` — transitive reduction of the
  subClassOf DAG: an asserted edge (a, c) is REDUNDANT when some
  intermediate b also sits between them (a ⊑ … ⊑ b ⊑ … ⊑ c), i.e. the
  edge adds no information and clutters every tree render and
  delete-impact scan.  Classic DAG hygiene (Aho, Garey & Ullman 1972).

Scale notes: Hearst mining is a pure per-row projection chain
(regexp_extract + split + explode — whole-stage codegen, no shuffle
until the final support count, which is map-side combinable on the
(hyper, hypo, pattern) key).  Reduction reuses the doubling transitive
closure (O(log D) shuffles) and decides redundancy with ONE
closure⋈direct-edge equi-join — never path enumeration; class
hierarchies are vocabulary-sized next to the instance data, so every
join side broadcasts at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern name, regex, hyper group, list group, list is hyponyms)
# The regexes are deliberately dialect-neutral (char classes +
# non-capturing groups only) so Spark's Java regex and DuckDB's RE2
# match identically.
_LIST = "[a-z]+(?:, [a-z]+)*(?: and [a-z]+)?"
HEARST_RULES: list[tuple[str, str, int, int]] = [
    ("such_as", f"([a-z]+) such as ({_LIST})", 1, 2),
    ("including", f"([a-z]+) including ({_LIST})", 1, 2),
    ("especially", f"([a-z]+) especially ({_LIST})", 1, 2),
    ("and_other", f"({_LIST}) and other ([a-z]+)", 2, 1),
]

#: Deterministic sentence fixture for the registry query (the sf
#: documents tables are synthetic word salad — Hearst cues never occur
#: there, so the operator ships its own corpus slice, the embedded-
#: VALUES convention used by the fixture graphs).
HEARST_SENTENCES: list[str] = [
    "animals such as dogs, cats and horses run fast",
    "animals such as dogs and wolves hunt in packs",
    "metals including copper, zinc and iron corrode slowly",
    "metals including copper resist rust poorly",
    "dogs and other animals bark at strangers",
    "cars and other vehicles such as trucks need fuel",
    "fruits especially apples and pears ripen in autumn",
    "languages such as french are spoken widely",
    "composers especially bach wrote fugues",
    "copper and other metals conduct electricity",
]


def hearst_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(HEARST_SENTENCES)],
        "sent_id int, text string",
    )


def hearst_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(HEARST_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


def hearst_patterns(sents: DataFrame) -> DataFrame:
    """(hypernym, hyponym, pattern, support) — hypernym candidates
    mined from ``sents(sent_id, text)`` by the four classic Hearst
    rules; ``support`` counts distinct supporting sentences per
    (pair, pattern).  Lowercase-alpha token model (the fixture corpus
    contract; production text goes through the normalizer first)."""
    parts = []
    for name, rx, hyper_g, list_g in HEARST_RULES:
        hyper = F.regexp_extract("text", rx, hyper_g)
        lst = F.regexp_extract("text", rx, list_g)
        parts.append(
            sents.select(
                "sent_id", hyper.alias("hypernym"), lst.alias("lst")
            )
            .filter(F.col("hypernym") != "")
            .select(
                "sent_id",
                "hypernym",
                F.explode(F.split("lst", ",| and ")).alias("hyponym"),
                F.lit(name).alias("pattern"),
            )
            .select(
                "sent_id",
                "hypernym",
                F.trim(F.col("hyponym")).alias("hyponym"),
                "pattern",
            )
            .filter(F.col("hyponym") != "")
        )
    mined = parts[0]
    for p in parts[1:]:
        mined = mined.unionByName(p)
    return (
        mined.distinct()
        .groupBy("hypernym", "hyponym", "pattern")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy("hypernym", "hyponym", "pattern")
    )


def hearst_patterns_sql(sents_cte: str) -> str:
    """DuckDB twin; ``sents_cte`` must define ``s(sent_id, text)``."""
    branches = []
    for name, rx, hyper_g, list_g in HEARST_RULES:
        branches.append(f"""
  SELECT sent_id,
    regexp_extract(text, '{rx}', {hyper_g}) AS hypernym,
    trim(u.x) AS hyponym, '{name}' AS pattern
  FROM s, unnest(string_split_regex(
    regexp_extract(text, '{rx}', {list_g}), ',| and ')) AS u(x)
  WHERE regexp_extract(text, '{rx}', {hyper_g}) <> '' AND trim(u.x) <> ''""")
    union = "\n  UNION ALL".join(branches)
    return f"""
WITH {sents_cte.strip()},
mined AS (SELECT DISTINCT * FROM ({union}))
SELECT hypernym, hyponym, pattern, count(*)::BIGINT AS support
FROM mined GROUP BY hypernym, hyponym, pattern
ORDER BY hypernym, hyponym, pattern
"""


def hierarchy_reduction(edges: DataFrame) -> DataFrame:
    """(subclass, superclass, status) for every asserted direct edge of
    ``edges(subclass, superclass)``: ``redundant`` when an intermediate
    node b exists with subclass ⊑* b and b ⊑ superclass asserted
    (b distinct from both ends), else ``kept`` — the transitive
    reduction split of a subClassOf DAG.  Cycle-safe by the b-endpoint
    guards (a cyclic pair marks both directions redundant only via a
    genuine third node, never via itself)."""
    from .fixpoint import transitive_closure

    direct = (
        edges.select(
            F.col("subclass").alias("a"), F.col("superclass").alias("c")
        )
        .filter(F.col("a") != F.col("c"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    clo = transitive_closure(
        direct.select(F.col("a").alias("src"), F.col("c").alias("dst"))
    )
    mid = (
        clo.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            direct.select(F.col("a").alias("b"), F.col("c")),
            "b",
        )
        .filter((F.col("b") != F.col("a")) & (F.col("b") != F.col("c")))
        .select("a", "c")
        .distinct()
    )
    return (
        direct.join(mid.withColumn("red", F.lit(1)), ["a", "c"], "left")
        .select(
            F.col("a").alias("subclass"),
            F.col("c").alias("superclass"),
            F.when(F.col("red").isNotNull(), F.lit("redundant"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
        .orderBy("subclass", "superclass")
    )


def hierarchy_reduction_sql(edges_cte: str) -> str:
    """DuckDB twin: recursive reachability (MATERIALIZED) + the same
    closure⋈direct redundancy join.  ``edges_cte`` must define
    ``edges(subclass, superclass)``."""
    return f"""
WITH RECURSIVE {edges_cte.strip()},
direct AS MATERIALIZED (
  SELECT DISTINCT subclass AS a, superclass AS c FROM edges
  WHERE subclass <> superclass),
clo(src, dst) AS (
  SELECT a, c FROM direct
  UNION
  SELECT clo.src, d.c FROM clo JOIN direct d ON clo.dst = d.a),
cm AS MATERIALIZED (SELECT src, dst FROM clo),
mid AS (
  SELECT DISTINCT cm.src AS a, d.c
  FROM cm JOIN direct d ON cm.dst = d.a
  WHERE cm.dst <> cm.src AND cm.dst <> d.c)
SELECT direct.a AS subclass, direct.c AS superclass,
  CASE WHEN mid.a IS NOT NULL THEN 'redundant' ELSE 'kept' END AS status
FROM direct LEFT JOIN mid ON direct.a = mid.a AND direct.c = mid.c
ORDER BY subclass, superclass
"""


#: Hierarchy fixture with planted transitive shortcuts (the redundancy
#: the reducer must find) — embedded-VALUES convention.
HIER_EDGES: list[tuple[str, str]] = [
    ("Car", "Vehicle"), ("Vehicle", "Artifact"), ("Car", "Artifact"),
    ("Artifact", "Thing"), ("Vehicle", "Thing"), ("Car", "Thing"),
    ("Boat", "Vehicle"), ("Dog", "Animal"), ("Animal", "Thing"),
]


def hier_edges_df(spark) -> DataFrame:
    return spark.createDataFrame(
        HIER_EDGES, "subclass string, superclass string"
    )


def hier_edges_values() -> str:
    rows = ", ".join(f"('{a}', '{b}')" for a, b in HIER_EDGES)
    return f"edges(subclass, superclass) AS (VALUES {rows})"


# --------------------------------------------------------------------- #
# acronym-definition mining (entity-alias signal)
# --------------------------------------------------------------------- #

_ACRO_RX = r"([a-z]+(?: [a-z]+){0,4}) \(([A-Za-z]{2,6})\)"

#: Deterministic fixture (single definition cue per sentence — the
#: first-match contract of regexp_extract on both engines).
ACRONYM_SENTENCES: list[str] = [
    "the world health organization (WHO) sets global rules",
    "a large language model (LLM) predicts the next token",
    "the european union (EU) expanded eastward",
    "the world health organization (WHO) met again in geneva",
    "a banana split (XY) is not an acronym definition",
    "the random forest (RF) model wins on tabular data",
    "knowledge graphs (KG) power entity linking",
]


def acronym_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(ACRONYM_SENTENCES)],
        "sent_id int, text string",
    )


def acronym_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(ACRONYM_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


def acronym_pairs(sents: DataFrame) -> DataFrame:
    """(acronym, expansion, support) — parenthetical acronym
    definitions mined from ``sents(sent_id, text)``: the phrase
    directly before "(ABC)" is trimmed to the last ``len(ABC)`` words
    and kept only when those words' initials spell the acronym — the
    Schwartz & Hearst (PSB 2003, public literature) abbreviation-
    definition heuristic, simplified to exact initialisms.  The
    entity-ALIAS signal for linking: "WHO" and "world health
    organization" are the same node.

    Pure projection chain (regexp_extract -> split/slice/transform ->
    filter) until the final map-side-combinable support count; the
    higher-order fns are CodegenFallback (the engineering notes) but stay
    JVM-side and run on match rows only."""
    words = F.split(F.col("phrase"), " ")
    k = F.length(F.col("acro"))
    cand = F.slice(words, F.size(words) - k + 1, k)
    initials = F.upper(
        F.concat_ws("", F.transform(cand, lambda w: F.substring(w, 1, 1)))
    )
    return (
        sents.select(
            "sent_id",
            F.regexp_extract("text", _ACRO_RX, 1).alias("phrase"),
            F.regexp_extract("text", _ACRO_RX, 2).alias("acro"),
        )
        .filter(F.col("phrase") != "")
        .select(
            "sent_id",
            F.upper("acro").alias("acronym"),
            F.concat_ws(" ", cand).alias("expansion"),
            F.size(cand).alias("nw"),
            initials.alias("ini"),
        )
        .filter((F.col("nw") == F.length("acronym")) & (F.col("ini") == F.col("acronym")))
        .groupBy("acronym", "expansion")
        .agg(F.count_distinct("sent_id").alias("support"))
        .orderBy("acronym", "expansion")
    )


def acronym_pairs_sql(sents_cte: str) -> str:
    """DuckDB twin; ``sents_cte`` must define ``s(sent_id, text)``."""
    rx = _ACRO_RX  # standard SQL strings keep backslashes literal
    return f"""
WITH {sents_cte.strip()},
m AS (
  SELECT sent_id,
    regexp_extract(text, '{rx}', 1) AS phrase,
    upper(regexp_extract(text, '{rx}', 2)) AS acronym
  FROM s),
e AS (
  SELECT sent_id, acronym,
    array_to_string(list_slice(string_split(phrase, ' '),
      len(string_split(phrase, ' ')) - length(acronym) + 1,
      len(string_split(phrase, ' '))), ' ') AS expansion
  FROM m WHERE phrase <> '')
SELECT acronym, expansion, count(DISTINCT sent_id)::BIGINT AS support
FROM e
WHERE len(string_split(expansion, ' ')) = length(acronym)
  AND upper(array_to_string(
        list_transform(string_split(expansion, ' '), w -> w[1]), ''))
      = acronym
GROUP BY acronym, expansion
ORDER BY acronym, expansion
"""


# ---------------------------------------------------------------------------
# Gazetteer entity spotting (dictionary-based NER — the Aho-Corasick
# family, public literature; here as a token-n-gram broadcast join).
# The deterministic mention detector next to the pipeline's pattern
# extractor: a curated surface-form dictionary (labels + aliases from
# the ontology itself) is matched against the corpus with
# leftmost-longest-wins overlap resolution.
# ---------------------------------------------------------------------------

#: (surface form, entity uri) — lowercase, normalized like norm_col.
GAZETTEER: list[tuple[str, str]] = [
    ("new york", "http://kg.example.org/NewYorkCity"),
    ("york", "http://kg.example.org/York"),
    ("new york times", "http://kg.example.org/NYTimes"),
    ("san francisco", "http://kg.example.org/SanFrancisco"),
    ("paris", "http://kg.example.org/Paris"),
    ("berlin", "http://kg.example.org/Berlin"),
]

GAZ_SENTENCES: list[str] = [
    "flights from new york to paris leave daily",
    "the new york times reported from berlin",
    "york has roman walls",
    "san francisco fog rolled in while paris baked",
    "no entities here at all",
]


def gaz_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(GAZ_SENTENCES)],
        "doc_id int, text string",
    )


def gaz_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(GAZ_SENTENCES)
    )
    return f"s(doc_id, text) AS (VALUES\n    {rows})"


def _gaz_values() -> str:
    rows = ",\n    ".join(f"('{s}', '{e}')" for s, e in GAZETTEER)
    return f"gaz(surface, entity) AS (VALUES\n    {rows})"


def gazetteer_mentions(
    sents: DataFrame, gazetteer: list[tuple[str, str]] | None = None,
    max_n: int = 3,
) -> DataFrame:
    """(doc_id, pos, n_tokens, surface, entity) — dictionary mentions
    with leftmost-longest overlap resolution: a candidate dies iff
    another candidate overlaps its token span and is longer, or is
    equally long and starts earlier ("new york times" beats both
    "new york" and "york" inside it).

    Scale shape: token n-grams come from a lead() ladder on ONE
    per-doc window sort (no self-join); the dictionary probe is a
    BROADCAST equi-join on the surface string; overlap resolution is a
    per-doc anti-join over the (sparse) match set — candidates per doc
    are bounded by mention density, never corpus size."""
    from pyspark.sql import Window

    from ..datapipe.textstats import norm_col, tokens_col

    gaz = gazetteer if gazetteer is not None else GAZETTEER
    spark = sents.sparkSession
    gdf = spark.createDataFrame(gaz, "surface string, entity string")
    toks = (
        sents.withColumn("norm", norm_col())
        .select("doc_id", F.posexplode(tokens_col()).alias("pos", "t0"))
        .filter(F.col("t0") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [
        F.lead("t0", d).over(w).alias(f"t{d}") for d in range(1, max_n)
    ]
    seq = toks.select("doc_id", "pos", "t0", *lead_cols)
    grams = None
    for n in range(1, max_n + 1):
        parts = [F.col(f"t{d}") for d in range(n)]
        g = seq.filter(
            F.lit(True) if n == 1 else F.col(f"t{n-1}").isNotNull()
        ).select(
            "doc_id",
            "pos",
            F.lit(n).alias("n_tokens"),
            F.concat_ws(" ", *parts).alias("surface"),
        )
        grams = g if grams is None else grams.unionByName(g)
    cand = grams.join(F.broadcast(gdf), "surface")
    # leftmost-longest: kill a match overlapped by a longer (or equal
    # and earlier) match in the same doc
    a = cand.alias("a")
    b = cand.alias("b")
    killer = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") <= F.col("a.pos") + F.col("a.n_tokens") - 1)
        & (F.col("a.pos") <= F.col("b.pos") + F.col("b.n_tokens") - 1)
        & (
            (F.col("b.n_tokens") > F.col("a.n_tokens"))
            | (
                (F.col("b.n_tokens") == F.col("a.n_tokens"))
                & (F.col("b.pos") < F.col("a.pos"))
            )
        ),
        "left_semi",
    )
    return (
        cand.exceptAll(killer)
        .select("doc_id", "pos", "n_tokens", "surface", "entity")
        .orderBy("doc_id", "pos")
    )


def gazetteer_mentions_sql(
    sents_cte: str, max_n: int = 3, gaz_values: str | None = None
) -> str:
    """DuckDB twin; ``sents_cte`` defines ``s(doc_id, text)``;
    ``gaz_values`` overrides the default dictionary with another
    ``gaz(surface, entity)`` VALUES clause body."""
    from ..datapipe.textstats import norm_sql, tokens_sql

    lead_cols = ", ".join(
        f"lead(t0, {d}) OVER (PARTITION BY doc_id ORDER BY pos) AS t{d}"
        for d in range(1, max_n)
    )
    legs = " UNION ALL ".join(
        "SELECT doc_id, pos, {n} AS n_tokens, {expr} AS surface FROM seq{f}".format(
            n=n,
            expr=" || ' ' || ".join(f"t{d}" for d in range(n))
            if n > 1
            else "t0",
            f=f" WHERE t{n-1} IS NOT NULL" if n > 1 else "",
        )
        for n in range(1, max_n + 1)
    )
    return f"""
WITH {sents_cte},
{gaz_values if gaz_values is not None else _gaz_values()},
ex AS (
  SELECT doc_id,
    unnest({tokens_sql(norm_sql())}) AS t0,
    unnest(range(len({tokens_sql(norm_sql())}))) AS pos
  FROM s),
toks AS (SELECT * FROM ex WHERE t0 <> ''),
seq AS (SELECT doc_id, pos, t0, {lead_cols} FROM toks),
grams AS ({legs}),
cand AS (
  SELECT g.doc_id, g.pos, g.n_tokens, g.surface, z.entity
  FROM grams g JOIN gaz z ON g.surface = z.surface)
SELECT doc_id, pos, n_tokens, surface, entity FROM cand a
WHERE NOT EXISTS (
  SELECT 1 FROM cand b
  WHERE b.doc_id = a.doc_id
    AND b.pos <= a.pos + a.n_tokens - 1
    AND a.pos <= b.pos + b.n_tokens - 1
    AND (b.n_tokens > a.n_tokens
         OR (b.n_tokens = a.n_tokens AND b.pos < a.pos)))
ORDER BY doc_id, pos"""


def comention_edges(mentions: DataFrame) -> DataFrame:
    """(entity_a, entity_b, n_docs) — entity pairs co-mentioned in a
    document, counted over distinct docs: the relatedness graph
    gazetteer output feeds into graphstats (PPR, communities).  One
    distinct projection + one per-doc self-equi-join (mention density
    bounded per doc) + one keyed count."""
    de = mentions.select("doc_id", "entity").distinct()
    a = de.alias("a")
    b = de.alias("b")
    return (
        a.join(b, "doc_id")
        .filter(F.col("a.entity") < F.col("b.entity"))
        .groupBy(
            F.col("a.entity").alias("entity_a"),
            F.col("b.entity").alias("entity_b"),
        )
        .agg(F.count("*").alias("n_docs"))
        .orderBy("entity_a", "entity_b")
    )


def comention_edges_sql(mentions_sql: str) -> str:
    """DuckDB twin over a full mentions SELECT."""
    return f"""
WITH m AS ({mentions_sql}),
de AS (SELECT DISTINCT doc_id, entity FROM m)
SELECT a.entity AS entity_a, b.entity AS entity_b,
       count(*)::BIGINT AS n_docs
FROM de a JOIN de b ON a.doc_id = b.doc_id AND a.entity < b.entity
GROUP BY 1, 2
ORDER BY entity_a, entity_b"""


# ---------------------------------------------------------------------------
# Open relation-phrase mining (the TextRunner/ReVerb family, public
# literature, simplified to surface patterns): the token span BETWEEN
# two gazetteer mentions becomes the candidate relation phrase — the
# open-IE complement of the pipeline's closed predicate patterns, and
# the raw material for a predicate-clustering pass.
# ---------------------------------------------------------------------------

#: phrases that open with a coordination/article token are noise
#: ("san francisco AND new york"), not relations — first-token gate.
_REL_STOP_FIRST = ("and", "or", "the", "a", "an")

REL_SENTENCES: list[str] = [
    "new york hosted the summit with berlin",
    "berlin signed a treaty with paris",
    "berlin signed a treaty with paris again last winter",
    "paris welcomed delegates from san francisco",
    "the new york times praised berlin",
    "san francisco and new york share the same fog",
    "new york met paris near berlin quickly",
    "no entities in this sentence at all",
]


def rel_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(REL_SENTENCES)],
        "doc_id int, text string",
    )


def rel_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(REL_SENTENCES)
    )
    return f"s(doc_id, text) AS (VALUES\n    {rows})"


def open_relations(
    sents: DataFrame,
    gazetteer: list[tuple[str, str]] | None = None,
    max_gap: int = 4,
) -> DataFrame:
    """(subj, rel_phrase, obj, support) — open-IE relation candidates:
    for each ordered pair of same-document gazetteer mentions with
    1..``max_gap`` tokens between them and NO third mention intruding
    in the gap (leftmost-longest resolution makes mention spans
    disjoint, so intrusion is a plain position-range test), the gap
    tokens are the relation phrase; phrases opening with a
    coordination/article token are dropped; support counts distinct
    documents.

    Scale shape: mentions are sparse (density-bounded per doc), so the
    pair join, the intrusion anti-join, and the token-slice join are
    all per-doc-keyed equi-joins on the mention table — never a
    corpus-sized fan-out; the slice reads the doc's token array once
    from the sentence scan."""
    from ..datapipe.textstats import norm_col, tokens_col

    m = gazetteer_mentions(sents, gazetteer)
    toks = sents.withColumn("norm", norm_col()).select(
        "doc_id", tokens_col().alias("toks")
    )
    a = m.select(
        "doc_id",
        F.col("pos").alias("a_pos"),
        (F.col("pos") + F.col("n_tokens")).alias("a_end"),
        F.col("entity").alias("subj"),
    )
    b = m.select(
        "doc_id", F.col("pos").alias("b_pos"), F.col("entity").alias("obj")
    )
    pairs = (
        a.join(b, "doc_id")
        .withColumn("gap", F.col("b_pos") - F.col("a_end"))
        .filter(
            (F.col("gap") >= 1)
            & (F.col("gap") <= max_gap)
            & (F.col("subj") != F.col("obj"))
        )
    )
    intruder = m.select("doc_id", F.col("pos").alias("c_pos"))
    clean = pairs.join(
        intruder,
        (pairs.doc_id == intruder.doc_id)
        & (intruder.c_pos >= pairs.a_end)
        & (intruder.c_pos < pairs.b_pos),
        "left_anti",
    )
    phrased = (
        clean.join(toks, "doc_id")
        .select(
            "doc_id", "subj", "obj",
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("a_end") + 1, F.col("gap"))
            ).alias("rel_phrase"),
        )
        .filter(
            ~F.split(F.col("rel_phrase"), " ")
            .getItem(0)
            .isin(*_REL_STOP_FIRST)
        )
    )
    return (
        phrased.groupBy("subj", "rel_phrase", "obj")
        .agg(F.count_distinct("doc_id").alias("support"))
        .orderBy("subj", "rel_phrase", "obj")
    )


def open_relations_sql(
    sents_cte: str, mentions_sql: str, max_gap: int = 4
) -> str:
    """DuckDB twin; ``sents_cte`` defines ``s(doc_id, text)`` (the
    sentence CTE is needed again for the token-array slice — the inner
    WITH of ``mentions_sql`` shadows it harmlessly)."""
    from ..datapipe.textstats import norm_sql, tokens_sql

    stop = ", ".join(f"'{w}'" for w in _REL_STOP_FIRST)
    return f"""
WITH {sents_cte},
m AS ({mentions_sql}),
tk AS (SELECT doc_id, {tokens_sql(norm_sql())} AS toks FROM s),
pairs AS (
  SELECT a.doc_id, a.entity AS subj, b.entity AS obj,
         a.pos + a.n_tokens AS a_end,
         b.pos AS b_pos, b.pos - (a.pos + a.n_tokens) AS gap
  FROM m a JOIN m b ON a.doc_id = b.doc_id
  WHERE b.pos - (a.pos + a.n_tokens) BETWEEN 1 AND {max_gap}
    AND a.entity <> b.entity),
clean AS (
  SELECT p.* FROM pairs p
  WHERE NOT EXISTS (
    SELECT 1 FROM m c
    WHERE c.doc_id = p.doc_id AND c.pos >= p.a_end AND c.pos < p.b_pos)),
phrased AS (
  SELECT c.doc_id, c.subj, c.obj,
         array_to_string(
           list_slice(t.toks, c.a_end + 1, c.a_end + c.gap), ' ')
           AS rel_phrase
  FROM clean c JOIN tk t ON c.doc_id = t.doc_id)
SELECT subj, rel_phrase, obj, count(DISTINCT doc_id)::BIGINT AS support
FROM phrased
WHERE list_extract(string_split(rel_phrase, ' '), 1) NOT IN ({stop})
GROUP BY 1, 2, 3
ORDER BY subj, rel_phrase, obj"""


# ---------------------------------------------------------------------------
# Mention disambiguation: when one surface form maps to several KG
# entities ("paris" -> Paris-France | Paris-Texas), vote per candidate
# with the KG relatedness of the document's UNAMBIGUOUS mentions
# (coherence voting — the Milne-Witten / TagMe family, public
# literature), priors as tiebreak.
# ---------------------------------------------------------------------------

AMBIG_GAZETTEER: list[tuple[str, str]] = [
    ("eiffel tower", "http://kg.example.org/EiffelTower"),
    ("france", "http://kg.example.org/France"),
    ("spain", "http://kg.example.org/Spain"),
    ("texas", "http://kg.example.org/Texas"),
    ("dallas", "http://kg.example.org/Dallas"),
    ("paris", "http://kg.example.org/Paris_France"),
    ("paris", "http://kg.example.org/Paris_Texas"),
]

AMBIG_SENTENCES: list[str] = [
    "eiffel tower stands in paris france",
    "paris texas sits near dallas",
    "the eiffel tower attracts visitors to paris",
    "dallas cowboys fans drove to paris",
    "france borders spain",
]

#: KG relatedness edges the voter consults (undirected).
AMBIG_RELATED: list[tuple[str, str]] = [
    ("http://kg.example.org/Paris_France", "http://kg.example.org/EiffelTower"),
    ("http://kg.example.org/Paris_France", "http://kg.example.org/France"),
    ("http://kg.example.org/Paris_Texas", "http://kg.example.org/Texas"),
    ("http://kg.example.org/Paris_Texas", "http://kg.example.org/Dallas"),
]


def ambig_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(AMBIG_SENTENCES)],
        "doc_id int, text string",
    )


def ambig_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(AMBIG_SENTENCES)
    )
    return f"s(doc_id, text) AS (VALUES\n    {rows})"


def ambig_gaz_values() -> str:
    rows = ",\n    ".join(f"('{s}', '{e}')" for s, e in AMBIG_GAZETTEER)
    return f"gaz(surface, entity) AS (VALUES\n    {rows})"


def ambig_related_values() -> str:
    rows = ",\n    ".join(f"('{a}', '{b}')" for a, b in AMBIG_RELATED)
    return f"rel(ea, eb) AS (VALUES\n    {rows})"


def disambiguate_mentions(
    mentions: DataFrame, related: DataFrame
) -> DataFrame:
    """(doc_id, pos, surface, entity, votes, prior) — the winning
    candidate per ambiguous mention slot.

    A slot (doc_id, pos) with >1 candidate entity is ambiguous; each
    candidate scores one VOTE per distinct unambiguous entity in the
    same document it is related to (``related``: undirected (src,
    dst) KG edges).  Ties break on the candidate's corpus-wide
    unambiguous-mention PRIOR, then entity asc.  Integer scores —
    cross-engine exact.

    Scale shape: slot ambiguity is one (doc,pos) count; votes are one
    equi-join on doc_id (document mention sets are tiny) + one
    BROADCAST relatedness probe; the winner is a per-slot window.
    The relatedness table is KG-edge-scale — pre-filter to the
    gazetteer's entity set before broadcasting at corpus scale."""
    from pyspark.sql import Window

    slot = Window.partitionBy("doc_id", "pos")
    m = mentions.withColumn(
        "n_cand", F.count(F.lit(1)).over(slot)
    )
    amb = m.filter(F.col("n_cand") > 1).drop("n_cand")
    unamb = m.filter(F.col("n_cand") == 1).drop("n_cand")
    prior = unamb.groupBy("entity").agg(F.count(F.lit(1)).alias("prior"))
    doc_ents = unamb.select("doc_id", F.col("entity").alias("ctx")).distinct()
    rel = related.select(
        F.col("src").alias("cand"), F.col("dst").alias("rctx")
    ).unionByName(
        related.select(F.col("dst").alias("cand"), F.col("src").alias("rctx"))
    ).distinct()
    votes = (
        amb.join(doc_ents, "doc_id")
        .join(
            F.broadcast(rel),
            (F.col("entity") == F.col("cand"))
            & (F.col("ctx") == F.col("rctx")),
        )
        .groupBy("doc_id", "pos", "entity")
        .agg(F.countDistinct("rctx").alias("votes"))
    )
    scored = (
        amb.join(votes, ["doc_id", "pos", "entity"], "left")
        .join(F.broadcast(prior), "entity", "left")
        .select(
            "doc_id",
            "pos",
            "surface",
            "entity",
            F.coalesce("votes", F.lit(0)).alias("votes"),
            F.coalesce("prior", F.lit(0)).alias("prior"),
        )
    )
    w = Window.partitionBy("doc_id", "pos").orderBy(
        F.col("votes").desc(), F.col("prior").desc(), F.col("entity")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("doc_id", "pos")
    )


def disambiguate_mentions_sql(
    mentions_sql: str, related_values: str
) -> str:
    """DuckDB twin over a full mentions SELECT + a rel(ea, eb) VALUES
    clause body."""
    return f"""
WITH m0 AS ({mentions_sql}),
{related_values},
m AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, pos) AS n_cand FROM m0),
amb AS (SELECT doc_id, pos, surface, entity FROM m WHERE n_cand > 1),
unamb AS (SELECT doc_id, pos, surface, entity FROM m WHERE n_cand = 1),
prior AS (SELECT entity, count(*)::BIGINT AS prior FROM unamb GROUP BY 1),
doc_ents AS (SELECT DISTINCT doc_id, entity AS ctx FROM unamb),
relu AS (
  SELECT ea AS cand, eb AS ctx FROM rel
  UNION SELECT eb, ea FROM rel),
votes AS (
  SELECT a.doc_id, a.pos, a.entity,
         count(DISTINCT r.ctx)::BIGINT AS votes
  FROM amb a
  JOIN doc_ents d ON a.doc_id = d.doc_id
  JOIN relu r ON a.entity = r.cand AND d.ctx = r.ctx
  GROUP BY 1, 2, 3),
scored AS (
  SELECT a.doc_id, a.pos, a.surface, a.entity,
    coalesce(v.votes, 0)::BIGINT AS votes,
    coalesce(p.prior, 0)::BIGINT AS prior
  FROM amb a
  LEFT JOIN votes v ON a.doc_id = v.doc_id AND a.pos = v.pos
                   AND a.entity = v.entity
  LEFT JOIN prior p ON a.entity = p.entity)
SELECT doc_id, pos, surface, entity, votes, prior FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id, pos
    ORDER BY votes DESC, prior DESC, entity) AS rn
  FROM scored)
WHERE rn = 1
ORDER BY doc_id, pos"""


# ---------------------------------------------------------------------------
# Copula instance typing + coordination siblings — the two regex
# mining passes that complete Hearst's subclass mining: copulas ("X is
# a Y") yield INSTANCE-of candidates, coordinations ("X, Y and Z")
# yield co-hyponym SIBLING sets that corroborate shared parents.
# Dialect-neutral regexes (char classes + non-capturing groups) so
# Java regex and RE2 agree, same as HEARST_RULES.
# ---------------------------------------------------------------------------

COPULA_SENTENCES: list[str] = [
    "paris is a city of lights",
    "berlin is a city too",
    "rex is a dog",
    "a dog is not a cat entirely",
    "felix is not a dog at all",
    "copper is an element",
    "the whale is a mammal",
]


def copula_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(COPULA_SENTENCES)],
        "sent_id int, text string",
    )


def copula_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(COPULA_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


_COPULA_RE = "([a-z]+) is an? ([a-z]+)"
_COPULA_NEG = "([a-z]+) is not an? ([a-z]+)"


def copula_instances(sents: DataFrame) -> DataFrame:
    """(instance, class_term, support) — "X is a/an Y" instance-typing
    candidates with negation filtering ("X is not a Y" never
    extracts); 'the X is a Y' generic-subject rows keep X (the
    instance/class call is the curator's).  Pure regexp projection +
    one map-side-combinable count — the instance-level complement of
    Hearst subclass mining."""
    hit = sents.select(
        F.regexp_extract("text", _COPULA_RE, 1).alias("instance"),
        F.regexp_extract("text", _COPULA_RE, 2).alias("class_term"),
        F.regexp_extract("text", _COPULA_NEG, 1).alias("neg"),
    ).filter(
        (F.col("instance") != "") & (F.col("neg") == "")
    )
    return (
        hit.groupBy("instance", "class_term")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy("instance", "class_term")
    )


def copula_instances_sql(sents_cte: str) -> str:
    """DuckDB twin — identical regex text."""
    return f"""
WITH {sents_cte},
hit AS (
  SELECT regexp_extract(text, '{_COPULA_RE}', 1) AS instance,
         regexp_extract(text, '{_COPULA_RE}', 2) AS class_term,
         regexp_extract(text, '{_COPULA_NEG}', 1) AS neg
  FROM s)
SELECT instance, class_term, count(*)::BIGINT AS support
FROM hit WHERE instance <> '' AND neg = ''
GROUP BY 1, 2
ORDER BY instance, class_term"""


COORD_SENTENCES: list[str] = [
    "cats, dogs and horses need food",
    "copper, zinc and iron conduct heat",
    "cats, dogs and wolves hunt mice",
    "red or green or blue works fine",
]


def coord_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(COORD_SENTENCES)],
        "sent_id int, text string",
    )


def coord_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(COORD_SENTENCES)
    )
    return f"s(sent_id, text) AS (VALUES\n    {rows})"


_COORD_RE = "([a-z]+(?:, [a-z]+)+,? (?:and|or) [a-z]+)"


def coordination_siblings(sents: DataFrame) -> DataFrame:
    """(term_a, term_b, support) — unordered co-hyponym pairs from
    coordination lists "X, Y(,) and/or Z": every list of k terms
    yields its C(k,2) pairs, counted across the corpus.  Siblings
    corroborate shared hypernyms (two terms coordinated often belong
    under the same parent Hearst proposes).

    Plan: regexp_extract the list span -> split on the connectors ->
    explode twice WITHIN the (tiny, per-sentence) array — the pair
    fan-out is per-list k², never a corpus join."""
    lists_ = sents.select(
        F.regexp_extract("text", _COORD_RE, 1).alias("span")
    ).filter(F.col("span") != "")
    terms = lists_.select(
        F.split(
            F.regexp_replace("span", ",? (?:and|or) ", ", "), ", "
        ).alias("ts")
    )
    pairs = terms.select(
        F.explode("ts").alias("term_a"), F.col("ts")
    ).select(
        "term_a", F.explode("ts").alias("term_b")
    ).filter(F.col("term_a") < F.col("term_b"))
    return (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy("term_a", "term_b")
    )


def coordination_siblings_sql(sents_cte: str) -> str:
    """DuckDB twin — same span regex and connector normalization."""
    return f"""
WITH {sents_cte},
spans AS (
  SELECT regexp_extract(text, '{_COORD_RE}', 1) AS span FROM s),
terms AS (
  SELECT string_split(
    regexp_replace(span, ',? (?:and|or) ', ', ', 'g'), ', ') AS ts
  FROM spans WHERE span <> ''),
pairs AS (
  SELECT a.ta AS term_a, b.tb AS term_b
  FROM terms, unnest(ts) AS a(ta), unnest(ts) AS b(tb)
  WHERE a.ta < b.tb)
SELECT term_a, term_b, count(*)::BIGINT AS support
FROM pairs GROUP BY 1, 2
ORDER BY term_a, term_b"""


# ---------------------------------------------------------------------------
# Anaphora resolution (rule-based coreference-lite, the Hobbs/
# nearest-antecedent family, public literature): definite descriptions
# and pronouns resolve to the NEAREST PRECEDING type-compatible
# entity mention — the coreference stage between mention detection and
# triple extraction (without it, "the company hired 500 workers" is a
# fact about nobody).
# ---------------------------------------------------------------------------

#: entity -> coarse type, extending GAZETTEER for compatibility checks.
ENTITY_TYPES: list[tuple[str, str]] = [
    ("http://kg.example.org/NewYorkCity", "city"),
    ("http://kg.example.org/York", "city"),
    ("http://kg.example.org/SanFrancisco", "city"),
    ("http://kg.example.org/Paris", "city"),
    ("http://kg.example.org/Berlin", "city"),
    ("http://kg.example.org/NYTimes", "org"),
]

#: anaphor surface -> required antecedent type ('' = any type).
ANAPHOR_TRIGGERS: list[tuple[str, str]] = [
    ("the city", "city"),
    ("the paper", "org"),
    ("it", ""),
]

COREF_SENTENCES: list[str] = [
    "berlin grew quickly and the city built new rails",
    "the new york times praised paris and the paper sold out",
    "paris expanded while berlin slept and the city celebrated",
    "san francisco shone and it glittered at night",
    "the city stands alone with no antecedent here",
]


def coref_sentences_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(COREF_SENTENCES)],
        "doc_id int, text string",
    )


def coref_sentences_values() -> str:
    rows = ",\n    ".join(
        f"({i}, '{s}')" for i, s in enumerate(COREF_SENTENCES)
    )
    return f"s(doc_id, text) AS (VALUES\n    {rows})"


def resolve_anaphora(
    sents: DataFrame,
    gazetteer: list[tuple[str, str]] | None = None,
    entity_types: list[tuple[str, str]] | None = None,
    triggers: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(doc_id, anaphor_pos, anaphor, entity, antecedent_pos) — each
    anaphor occurrence resolved to the nearest PRECEDING
    type-compatible entity mention in the same document; unresolvable
    anaphors are dropped.  Nearest-wins is the deterministic argmax
    ``max(antecedent pos)`` per anaphor — a min_by-style struct max,
    no window needed.

    Plan: mentions and anaphor occurrences come from the SAME lead-
    ladder spotting pass (two broadcast dictionary probes); resolution
    is one per-doc equi-join bounded by mention density, then a keyed
    max — never corpus-quadratic."""
    spark = sents.sparkSession
    types = spark.createDataFrame(
        entity_types if entity_types is not None else ENTITY_TYPES,
        "entity string, etype string",
    )
    trig = triggers if triggers is not None else ANAPHOR_TRIGGERS
    m = gazetteer_mentions(sents, gazetteer).join(
        F.broadcast(types), "entity"
    )
    an = gazetteer_mentions(
        sents, [(s, f"need:{t}") for s, t in trig]
    ).select(
        "doc_id",
        F.col("pos").alias("anaphor_pos"),
        F.col("surface").alias("anaphor"),
        F.regexp_replace("entity", "^need:", "").alias("need_type"),
    )
    cand = an.join(
        m.select(
            "doc_id",
            F.col("pos").alias("ante_pos"),
            "entity",
            "etype",
        ),
        "doc_id",
    ).filter(
        (F.col("ante_pos") < F.col("anaphor_pos"))
        & ((F.col("need_type") == "") | (F.col("need_type") == F.col("etype")))
    )
    return (
        cand.groupBy("doc_id", "anaphor_pos", "anaphor")
        .agg(
            F.max(F.struct("ante_pos", "entity")).alias("best")
        )
        .select(
            "doc_id", "anaphor_pos", "anaphor",
            F.col("best.entity").alias("entity"),
            F.col("best.ante_pos").alias("antecedent_pos"),
        )
        .orderBy("doc_id", "anaphor_pos")
    )


def resolve_anaphora_sql(
    sents_cte: str,
    mentions_sql: str,
    anaphor_mentions_sql: str,
) -> str:
    """DuckDB twin: the two spotting passes as CTEs, the same
    preceding/type filter and struct-max resolution."""
    type_rows = ", ".join(f"('{e}', '{t}')" for e, t in ENTITY_TYPES)
    return f"""
WITH {sents_cte},
ty(entity, etype) AS (VALUES {type_rows}),
m AS ({mentions_sql}),
an AS ({anaphor_mentions_sql}),
cand AS (
  SELECT an.doc_id, an.pos AS anaphor_pos, an.surface AS anaphor,
         regexp_replace(an.entity, '^need:', '') AS need_type,
         m.pos AS ante_pos, m.entity, ty.etype
  FROM an
  JOIN m ON an.doc_id = m.doc_id AND m.pos < an.pos
  JOIN ty ON m.entity = ty.entity)
SELECT doc_id, anaphor_pos, anaphor,
       max(struct_pack(ante_pos := ante_pos, entity := entity)).entity
         AS entity,
       max(struct_pack(ante_pos := ante_pos, entity := entity)).ante_pos
         AS antecedent_pos
FROM cand
WHERE need_type = '' OR need_type = etype
GROUP BY 1, 2, 3
ORDER BY doc_id, anaphor_pos"""
