"""Approximate-nearest-neighbor search over an embedding column.

``embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)``.

Two paths:

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set
  against the corpus, one narrow JVM ``zip_with`` fold per (query, vec)
  pair, ``row_number`` per query.  Exact baseline and recall oracle.
* ``ivf_topk`` — the scale path: IVF coarse quantization.  A fixed,
  deterministic centroid set partitions the corpus into inverted lists
  (one shuffle, by centroid id); each query probes only its ``nprobe``
  nearest lists, so per-query work drops from O(corpus) to
  O(corpus * nprobe / n_centroids).  At 100 TB the inverted lists are
  the partitioning scheme of the stored table itself (write once
  partitioned by centroid id -> partition pruning serves each probe).

Determinism contract: cosines are raw doubles — both engines fold the
same values in the same index order in double precision, so results are
bit-identical; ranking ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr

N_CENTROIDS = 8
NPROBE = 2


def _with_norm(e: DataFrame) -> DataFrame:
    return e.select(
        "vec_id",
        "embedding",
        F.sqrt(F.expr(dot_expr("embedding", "embedding"))).alias("nrm"),
    )


def brute_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): exact top-k by cosine for the
    first ``n_queries`` vec_ids (self excluded)."""
    e = _with_norm(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.expr(dot_expr("q_emb", "embedding"))
            / (F.col("q_nrm") * F.col("nrm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos"
        )
        .orderBy("query_id", "rank")
    )


def brute_topk_oracle(n_queries: int = 5, k: int = 5) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM e
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
    list_dot_product(q.q_emb, e.emb) / (q.q_nrm * e.nrm) AS cos
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id AS neighbor_id, rank, cos
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = N_CENTROIDS
) -> DataFrame:
    """(vec_id, centroid_id): nearest-centroid assignment.

    Centroids are the first ``n_centroids`` corpus vectors — a
    deterministic stand-in for a k-means pass (which at scale would run
    on a sample; the assignment join below is identical either way).
    Broadcast the centroid table; one pass over the corpus.
    """
    e = _with_norm(embeddings)
    c = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    scored = e.crossJoin(F.broadcast(c)).withColumn(
        "cos",
        F.expr(dot_expr("c_emb", "embedding"))
        / (F.col("c_nrm") * F.col("nrm")),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = NPROBE,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos): ANN via IVF probing.

    Query probes its ``nprobe`` closest centroids; candidates = vectors
    assigned to those lists; exact cosine + top-k within candidates.
    """
    e = _with_norm(embeddings)
    assign = ivf_assign(embeddings, n_centroids)
    c = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    qprobe = (
        q.crossJoin(F.broadcast(c))
        .withColumn(
            "ccos",
            F.expr(dot_expr("c_emb", "q_emb"))
            / (F.col("c_nrm") * F.col("q_nrm")),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("ccos"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "q_emb", "q_nrm", "centroid_id")
    )
    cands = qprobe.join(assign, "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.join(e, "vec_id").withColumn(
        "cos",
        F.expr(dot_expr("q_emb", "embedding"))
        / (F.col("q_nrm") * F.col("nrm")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cos"
        )
        .orderBy("query_id", "rank")
    )


def ivf_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.42,
    n_centroids: int = N_CENTROIDS,
) -> DataFrame:
    """(id_a, id_b, cos): near-dup pairs restricted to vectors sharing an
    IVF inverted list — the corpus-scale replacement for the all-pairs
    cosine join (work drops from O(n^2) to O(sum of list sizes squared),
    and each list is an independent partition).

    Recall tradeoff is the standard IVF one: cross-list near-dups are
    missed; raise n_probe/overlap or use dedup.cosine_pairs as the
    sample-scale oracle.
    """
    e = _with_norm(embeddings)
    assign = ivf_assign(embeddings, n_centroids)
    ea = e.join(assign, "vec_id")
    a = ea.alias("a")
    b = ea.alias("b")
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos",
            F.expr(dot_expr("a.embedding", "b.embedding"))
            / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cos",
        )
        .orderBy("id_a", "id_b")
    )


def ivf_cosine_pairs_oracle(
    threshold: float = 0.42, n_centroids: int = N_CENTROIDS
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings),
c AS (SELECT vec_id AS centroid_id, emb AS c_emb, nrm AS c_nrm FROM e
      WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id, row_number() OVER
      (PARTITION BY e.vec_id ORDER BY
        list_dot_product(c.c_emb, e.emb) / (c.c_nrm * e.nrm) DESC,
        c.centroid_id ASC) AS rk
    FROM e CROSS JOIN c)
  WHERE rk = 1),
ea AS (SELECT e.*, assign.centroid_id FROM e JOIN assign USING (vec_id))
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS cos
FROM ea a JOIN ea b
  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= {threshold}
ORDER BY id_a, id_b
"""


def ivf_topk_oracle(
    n_queries: int = 5,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    nprobe: int = NPROBE,
) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings),
c AS (SELECT vec_id AS centroid_id, emb AS c_emb, nrm AS c_nrm FROM e
      WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id, row_number() OVER
      (PARTITION BY e.vec_id ORDER BY
        list_dot_product(c.c_emb, e.emb) / (c.c_nrm * e.nrm) DESC,
        c.centroid_id ASC) AS rk
    FROM e CROSS JOIN c)
  WHERE rk = 1),
q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM e
      WHERE vec_id < {n_queries}),
qprobe AS (
  SELECT query_id, q_emb, q_nrm, centroid_id FROM (
    SELECT q.query_id, q.q_emb, q.q_nrm, c.centroid_id, row_number() OVER
      (PARTITION BY q.query_id ORDER BY
        list_dot_product(c.c_emb, q.q_emb) / (c.c_nrm * q.q_nrm) DESC,
        c.centroid_id ASC) AS rk
    FROM q CROSS JOIN c)
  WHERE rk <= {nprobe}),
scored AS (
  SELECT p.query_id, a.vec_id,
    list_dot_product(p.q_emb, e.emb) / (p.q_nrm * e.nrm) AS cos
  FROM qprobe p JOIN assign a USING (centroid_id)
  JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id <> p.query_id),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
SELECT query_id, vec_id AS neighbor_id, rank, cos
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""
