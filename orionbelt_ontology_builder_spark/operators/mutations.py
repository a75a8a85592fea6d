"""Mutation operators: CRUD as pure ``triples -> triples`` transforms
(SURVEY.md §2.8).

The reference mutates an in-memory graph; here every mutation returns a
NEW DataFrame (the versioned-snapshot model — each checkpointed write is
an undoable snapshot, see ``plans.snapshots``).  Single-entity ops are
size-1 batches of the bulk ops: the bulk path (anti-join staged rows
against existing, union remainder) is the primary implementation, matching
how a 1000-executor cluster would actually apply edits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import (
    OWL,
    RDF,
    RDFS,
    SKOS,
    TRIPLE_COLS,
    TRIPLES_SCHEMA,
    XSD,
    XSD_DATATYPES,
    t_lit,
    t_uri,
    type_slice,
    uri,
)


def _rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def add_triples(triples: DataFrame, new_rows: DataFrame) -> DataFrame:
    """Set-union add (graph.add is idempotent in rdflib)."""
    return triples.unionByName(new_rows).dropDuplicates(TRIPLE_COLS)


def remove_pattern(
    triples: DataFrame,
    subj: str | None = None,
    pred: str | None = None,
    obj: str | None = None,
) -> DataFrame:
    """Remove all triples matching a wildcard (s, p, o) pattern — the
    reference's ``graph.remove((s, p, o))`` with None wildcards
    (``ontology_manager.py:483-485``, ``:874-877``)."""
    cond = F.lit(True)
    if subj is not None:
        cond = cond & (F.col("subj") == subj)
    if pred is not None:
        cond = cond & (F.col("pred") == pred)
    if obj is not None:
        cond = cond & (F.col("obj") == obj)
    return triples.filter(~cond)


# --------------------------------------------------------------------------
# classes (reference ontology_manager.py:303-485)
# --------------------------------------------------------------------------


def add_class(
    triples: DataFrame,
    name: str,
    base: str,
    label: str | None = None,
    comment: str | None = None,
    parent: str | None = None,
) -> DataFrame:
    """Reference ``add_class`` (``:303-318``)."""
    spark = triples.sparkSession
    c = uri(name, base)
    rows = [t_uri(c, RDF.type, OWL.Class)]
    if parent:
        rows.append(t_uri(c, RDFS.subClassOf, uri(parent, base)))
    if label:
        rows.append(t_lit(c, RDFS.label, label))
    if comment:
        rows.append(t_lit(c, RDFS.comment, comment))
    return add_triples(triples, _rows(spark, rows))


def rename_resource(
    triples: DataFrame, old: str, new: str, rename_predicate: bool = False
) -> DataFrame:
    """Rewrite s- and o- (and optionally p-) positions old -> new.

    Covers ``rename_class`` (``:341-369``), ``rename_property``
    (``:837-870``, which also rewrites the predicate position), and
    ``rename_individual`` (``:1025-1053``).  Pure projection — no join,
    map-side only at any scale.
    """
    def rw(c):
        return F.when(F.col(c) == old, F.lit(new)).otherwise(F.col(c))

    out = triples.withColumn("subj", rw("subj")).withColumn(
        "obj",
        F.when(
            (F.col("obj") == old) & (F.col("obj_kind") == "uri"), F.lit(new)
        ).otherwise(F.col("obj")),
    )
    if rename_predicate:
        out = out.withColumn("pred", rw("pred"))
    return out.dropDuplicates(TRIPLE_COLS)


def delete_resource(triples: DataFrame, resource: str, as_predicate: bool = False) -> DataFrame:
    """Remove (r,*,*) and (*,*,r) — reference ``delete_class``
    (``:480-485``); with ``as_predicate`` also (*,r,*) — reference
    ``delete_property`` (``:872-877``)."""
    cond = (F.col("subj") == resource) | (
        (F.col("obj") == resource) & (F.col("obj_kind") != "literal")
    )
    if as_predicate:
        cond = cond | (F.col("pred") == resource)
    return triples.filter(~cond)


def update_annotation(
    triples: DataFrame,
    resource: str,
    pred: str,
    value: str,
    lang: str | None = None,
) -> DataFrame:
    """Upsert: remove-then-add (the reference's update pattern,
    ``ontology_manager.py:320-339``)."""
    spark = triples.sparkSession
    removed = remove_pattern(triples, subj=resource, pred=pred)
    return add_triples(removed, _rows(spark, [t_lit(resource, pred, value, lang)]))


# --------------------------------------------------------------------------
# properties (reference ontology_manager.py:748-877)
# --------------------------------------------------------------------------


def add_object_property(
    triples: DataFrame,
    name: str,
    base: str,
    domain: str | None = None,
    range_: str | None = None,
    label: str | None = None,
    comment: str | None = None,
    characteristics: list[str] | None = None,
    inverse_of: str | None = None,
) -> DataFrame:
    """Reference ``add_object_property`` (``:748-785``)."""
    from ..model import PROPERTY_CHARACTERISTICS

    spark = triples.sparkSession
    p = uri(name, base)
    rows = [t_uri(p, RDF.type, OWL.ObjectProperty)]
    if domain:
        rows.append(t_uri(p, RDFS.domain, uri(domain, base)))
    if range_:
        rows.append(t_uri(p, RDFS.range, uri(range_, base)))
    if label:
        rows.append(t_lit(p, RDFS.label, label))
    if comment:
        rows.append(t_lit(p, RDFS.comment, comment))
    if inverse_of:
        rows.append(t_uri(p, OWL.inverseOf, uri(inverse_of, base)))
    char_map = dict(PROPERTY_CHARACTERISTICS)
    for ch in characteristics or []:
        rows.append(t_uri(p, RDF.type, char_map[ch]))
    return add_triples(triples, _rows(spark, rows))


def add_data_property(
    triples: DataFrame,
    name: str,
    base: str,
    domain: str | None = None,
    range_: str | None = None,
    label: str | None = None,
    functional: bool = False,
) -> DataFrame:
    """Reference ``add_data_property`` (``:787-806``): range resolved via
    the XSD map, unknown -> xsd:string (``:797``)."""
    spark = triples.sparkSession
    p = uri(name, base)
    rows = [t_uri(p, RDF.type, OWL.DatatypeProperty)]
    if domain:
        rows.append(t_uri(p, RDFS.domain, uri(domain, base)))
    rows.append(t_uri(p, RDFS.range, XSD_DATATYPES.get(range_ or "string", XSD.string)))
    if label:
        rows.append(t_lit(p, RDFS.label, label))
    if functional:
        rows.append(t_uri(p, RDF.type, OWL.FunctionalProperty))
    return add_triples(triples, _rows(spark, rows))


# --------------------------------------------------------------------------
# individuals (reference ontology_manager.py:976-1059)
# --------------------------------------------------------------------------


def add_individual(
    triples: DataFrame,
    name: str,
    base: str,
    class_name: str | None = None,
    label: str | None = None,
) -> DataFrame:
    """Reference ``add_individual`` (``:976-990``)."""
    spark = triples.sparkSession
    i = uri(name, base)
    rows = [t_uri(i, RDF.type, OWL.NamedIndividual)]
    if class_name:
        rows.append(t_uri(i, RDF.type, uri(class_name, base)))
    if label:
        rows.append(t_lit(i, RDFS.label, label))
    return add_triples(triples, _rows(spark, rows))


def add_individual_property(
    triples: DataFrame,
    individual: str,
    prop: str,
    value: str,
    is_object: bool,
    base: str,
    lang: str | None = None,
    datatype: str | None = None,
) -> DataFrame:
    """Reference ``add_individual_property`` (``:992-1002``)."""
    spark = triples.sparkSession
    i, p = uri(individual, base), uri(prop, base)
    row = (
        t_uri(i, p, uri(value, base))
        if is_object
        else t_lit(i, p, value, lang, datatype)
    )
    return add_triples(triples, _rows(spark, [row]))


# --------------------------------------------------------------------------
# SKOS (reference ontology_manager.py:1385-1616)
# --------------------------------------------------------------------------

#: symmetric SKOS relations auto-mirrored on add (reference ``:1594-1596``)
SKOS_SYMMETRIC = {SKOS.related, SKOS.closeMatch, SKOS.exactMatch, SKOS.relatedMatch}


def add_concept_scheme(
    triples: DataFrame, name: str, base: str, label: str | None = None
) -> DataFrame:
    spark = triples.sparkSession
    s = uri(name, base)
    rows = [t_uri(s, RDF.type, SKOS.ConceptScheme)]
    if label:
        rows.append(t_lit(s, RDFS.label, label))
    return add_triples(triples, _rows(spark, rows))


def add_concept(
    triples: DataFrame,
    name: str,
    base: str,
    scheme: str | None = None,
    pref_label: str | None = None,
    broader: str | None = None,
) -> DataFrame:
    """Reference ``add_concept`` (``:1450-1478``) — note the auto-added
    inverse ``skos:narrower`` edge (``:1473-1476``)."""
    spark = triples.sparkSession
    c = uri(name, base)
    rows = [t_uri(c, RDF.type, SKOS.Concept)]
    if scheme:
        rows.append(t_uri(c, SKOS.inScheme, uri(scheme, base)))
    if pref_label:
        rows.append(t_lit(c, SKOS.prefLabel, pref_label))
    if broader:
        b = uri(broader, base)
        rows.append(t_uri(c, SKOS.broader, b))
        rows.append(t_uri(b, SKOS.narrower, c))
    return add_triples(triples, _rows(spark, rows))


def add_concept_relation(
    triples: DataFrame, source: str, relation: str, target: str, base: str
) -> DataFrame:
    """Reference ``add_concept_relation`` (``:1575-1596``): auto-inverse
    for broader/narrower, auto-symmetric for related/*Match."""
    spark = triples.sparkSession
    s, t = uri(source, base), uri(target, base)
    rows = [t_uri(s, relation, t)]
    if relation == SKOS.broader:
        rows.append(t_uri(t, SKOS.narrower, s))
    elif relation == SKOS.narrower:
        rows.append(t_uri(t, SKOS.broader, s))
    elif relation in SKOS_SYMMETRIC:
        rows.append(t_uri(t, relation, s))
    return add_triples(triples, _rows(spark, rows))


def delete_concept(triples: DataFrame, concept: str, base: str) -> DataFrame:
    """Reference ``delete_concept`` (``:1598-1616``): removes the concept's
    triples AND inverse/symmetric counterparts pointing at it."""
    c = uri(concept, base)
    return delete_resource(triples, c)


# --------------------------------------------------------------------------
# base-URI rewrite (reference ontology_manager.py:237-286)
# --------------------------------------------------------------------------


def set_base_uri(triples: DataFrame, old_base: str, new_base: str) -> DataFrame:
    """Prefix-rewrite every URI starting with old base in s and o positions
    (reference ``:268-283``).  Pure projection — the reference's only
    full-graph-scan mutation stays map-side here too."""
    def rw(c):
        return F.when(
            F.col(c).startswith(old_base),
            F.concat(F.lit(new_base), F.substring(F.col(c), len(old_base) + 1, 1 << 20)),
        ).otherwise(F.col(c))

    return (
        triples.withColumn("subj", rw("subj"))
        .withColumn(
            "obj",
            F.when(F.col("obj_kind") == "uri", rw("obj")).otherwise(F.col("obj")),
        )
        .withColumn("pred", rw("pred"))
        .dropDuplicates(TRIPLE_COLS)
    )


# --------------------------------------------------------------------------
# bulk operators (reference ontology_manager.py:532-744)
# --------------------------------------------------------------------------


def bulk_add_classes(
    triples: DataFrame, staged: DataFrame, base: str
) -> DataFrame:
    """``staged(name, label, comment)`` -> new class triples, skipping
    names that already exist (reference pre-scan ``:576``) via a single
    anti-join — the batch-shaped entry the reference loops row-by-row."""
    staged = staged.select(
        F.when(
            F.col("name").startswith("http://") | F.col("name").startswith("https://"),
            F.col("name"),
        )
        .otherwise(F.concat(F.lit(base), F.col("name")))
        .alias("subj"),
        "label",
        "comment",
    ).dropDuplicates(["subj"])
    existing = type_slice(triples, OWL.Class)
    fresh = staged.join(existing, "subj", "left_anti")
    new_rows = (
        fresh.select(
            "subj",
            F.lit(RDF.type).alias("pred"),
            F.lit(OWL.Class).alias("obj"),
            F.lit("uri").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dt"),
        )
        .unionByName(
            fresh.filter(F.col("label").isNotNull()).select(
                "subj",
                F.lit(RDFS.label).alias("pred"),
                F.col("label").alias("obj"),
                F.lit("literal").alias("obj_kind"),
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit(None).cast("string").alias("obj_dt"),
            )
        )
        .unionByName(
            fresh.filter(F.col("comment").isNotNull()).select(
                "subj",
                F.lit(RDFS.comment).alias("pred"),
                F.col("comment").alias("obj"),
                F.lit("literal").alias("obj_kind"),
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit(None).cast("string").alias("obj_dt"),
            )
        )
    )
    return add_triples(triples, new_rows)


def bulk_delete_resources(triples: DataFrame, names: DataFrame, base: str) -> DataFrame:
    """Single anti-join delete of many resources (reference loops
    ``:670-701``).  ``names(name)`` local names or URIs."""
    uris = names.select(
        F.when(
            F.col("name").startswith("http://") | F.col("name").startswith("https://"),
            F.col("name"),
        )
        .otherwise(F.concat(F.lit(base), F.col("name")))
        .alias("u")
    ).distinct()
    out = triples.join(uris, triples["subj"] == uris["u"], "left_anti")
    out = out.join(
        uris,
        (out["obj"] == uris["u"]) & (out["obj_kind"] != "literal"),
        "left_anti",
    )
    return out.join(uris, out["pred"] == uris["u"], "left_anti")
