"""Dictionary encoding of RDF terms — the classic triple-store layout
trick (RDF-3X / Virtuoso / Jena TDB, public literature): replace long
URI/literal strings with fixed-width integer ids so every downstream
shuffle, join and sort moves 8-byte keys instead of 60-byte strings.
At 100 TB this is the single biggest shuffle-volume lever the engine
has; the joins in reasoning/closure/linking all key on terms.

Spark-first shape: ids are CONTENT hashes (md5-derived 60-bit ints —
the engine's portable hash idiom, bit-identical in DuckDB), not
sequence numbers: no global sort, no zipWithIndex barrier, encode is
a pure projection and any two runs/partitions/clusters agree on every
id without coordination.  The price is a collision audit (expected
zero at 2^60 until ~10^8 distinct terms per the birthday bound; the
audit is one agg and the remediation — widen to two hash slices — is
mechanical)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "term_id",
    "dictionary",
    "encode_triples",
    "encoding_audit",
    "encoding_audit_sql",
]


def term_id(col) -> F.Column:
    """60-bit deterministic content id: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def dictionary(triples: DataFrame) -> DataFrame:
    """(term, role_mask, id) — every distinct term with its id and a
    bitmask of the roles it plays (1 subj | 2 pred | 4 obj): one
    union + one keyed agg, map-side combinable."""
    terms = (
        triples.select(F.col("subj").alias("term"), F.lit(1).alias("role"))
        .unionByName(
            triples.select(F.col("pred").alias("term"), F.lit(2).alias("role"))
        )
        .unionByName(
            triples.select(F.col("obj").alias("term"), F.lit(4).alias("role"))
        )
    )
    # roles are disjoint powers of two, so sum(DISTINCT role) IS the
    # bitmask — a plain hash aggregate, no ObjectHashAggregate
    # collect_set detour
    return (
        terms.groupBy("term")
        .agg(F.sum_distinct(F.col("role")).alias("role_mask"))
        .select("term", "role_mask", term_id(F.col("term")).alias("id"))
        .orderBy("term")
    )


def encode_triples(triples: DataFrame) -> DataFrame:
    """(s_id, p_id, o_id, obj_kind, obj_lang, obj_dt) — the integer
    fact table every downstream join should run on; a pure projection
    (no dictionary join needed on the encode side — ids are content
    hashes)."""
    return triples.select(
        term_id(F.col("subj")).alias("s_id"),
        term_id(F.col("pred")).alias("p_id"),
        term_id(F.col("obj")).alias("o_id"),
        "obj_kind",
        "obj_lang",
        "obj_dt",
    )


def encoding_audit(triples: DataFrame) -> DataFrame:
    """One row (n_terms, n_ids, n_collisions, n_triples) — the
    collision audit that licenses the integer fact table: n_collisions
    must be 0 (two distinct terms sharing an id).  One distinct-term
    projection + two count-distinct aggs."""
    terms = (
        triples.select(F.col("subj").alias("term"))
        .unionByName(triples.select(F.col("pred").alias("term")))
        .unionByName(triples.select(F.col("obj").alias("term")))
        .distinct()
        .select("term", term_id(F.col("term")).alias("id"))
    )
    stats = terms.agg(
        F.count("*").alias("n_terms"),
        F.countDistinct("id").alias("n_ids"),
    )
    total = triples.agg(F.count("*").alias("n_triples"))
    return stats.crossJoin(total).select(
        "n_terms",
        "n_ids",
        (F.col("n_terms") - F.col("n_ids")).alias("n_collisions"),
        "n_triples",
    )


def encoding_audit_sql(triples_src: str = "triples") -> str:
    """DuckDB twin — identical md5-slice id construction."""
    tid = "('0x' || substr(md5(term), 1, 15))::BIGINT"
    return f"""
terms AS (
  SELECT DISTINCT term FROM (
    SELECT subj AS term FROM {triples_src}
    UNION ALL SELECT pred FROM {triples_src}
    UNION ALL SELECT obj FROM {triples_src})),
ids AS (SELECT term, {tid} AS id FROM terms)
SELECT count(*)::BIGINT AS n_terms,
  count(DISTINCT id)::BIGINT AS n_ids,
  (count(*) - count(DISTINCT id))::BIGINT AS n_collisions,
  (SELECT count(*)::BIGINT FROM {triples_src}) AS n_triples
FROM ids"""


def encoded_two_hop(triples: DataFrame) -> DataFrame:
    """(individual, cls, parent) — the instance->class->superclass
    two-hop JOIN EXECUTED ON INTEGER IDS: triples are dictionary-
    encoded (pure projection), both hops join on 8-byte ids, and only
    the final result columns decode back through the (vocabulary-
    sized, broadcast) dictionary.  The execution-pattern proof for the
    encoding: the oracle runs the same query on strings, so parity
    shows the integer path computes the identical relation while its
    shuffles move fixed-width keys.

    Constants (rdf:type, rdfs:subClassOf) enter as ``term_id(lit(..))``
    — Catalyst constant-folds the md5, so the scan filter compares
    against a literal long."""
    from ..model import RDF, RDFS

    enc = encode_triples(triples)
    d = dictionary(triples).select("id", "term")
    typ = enc.filter(F.col("p_id") == term_id(F.lit(RDF.type))).select(
        F.col("s_id").alias("i_id"), F.col("o_id").alias("c_id")
    )
    sub = enc.filter(
        F.col("p_id") == term_id(F.lit(RDFS.subClassOf))
    ).select(F.col("s_id").alias("c_id"), F.col("o_id").alias("p2_id"))
    hop = typ.join(sub, "c_id")

    def dec(df, id_col, out):
        return df.join(
            F.broadcast(d.select(F.col("id").alias(id_col),
                                 F.col("term").alias(out))),
            id_col,
        )

    out = dec(dec(dec(hop, "i_id", "individual"), "c_id", "cls"),
              "p2_id", "parent")
    return out.select("individual", "cls", "parent").orderBy(
        "individual", "cls", "parent"
    )


def encoded_two_hop_sql(triples_src: str = "triples") -> str:
    """DuckDB twin — the SAME relation computed directly on strings
    (parity proves the encoded path's correctness)."""
    from ..model import RDF, RDFS

    return f"""
SELECT t1.subj AS individual, t1.obj AS cls, t2.obj AS parent
FROM {triples_src} t1
JOIN {triples_src} t2
  ON t1.obj = t2.subj AND t2.pred = '{RDFS.subClassOf}'
WHERE t1.pred = '{RDF.type}'
ORDER BY individual, cls, parent"""
