"""PySpark-native knowledge-graph construction & ontology engine.

A from-scratch re-expression of the capabilities of
``ralfbecher/orionbelt-ontology-builder`` (reference read-only at
``/root/reference``) on Apache Spark: one canonical ``triples`` DataFrame
(lossless RDF term encoding), all ontology operators as declarative
DataFrame/SQL transforms optimized by Catalyst/AQE, a driver-side fixpoint
controller for closure/reasoning/connected-components, and a web-scale
KG-construction pipeline (HTML->text -> mention/triple extraction ->
MinHash-LSH entity linking -> canonicalization -> partitioned edge tables).

Design notes (scale-first):
  * The reference holds an in-memory ``rdflib.Graph`` (a set of triples,
    reference ``ontology_manager.py:59``); here the same set semantics live
    in a 6-column DataFrame (see ``model.TRIPLES_SCHEMA``) so Catalyst gets
    predicate pushdown, column pruning and broadcast/AQE join planning
    for free on every operator.
  * No RDDs, no per-row Python in hot paths; vectorized pandas/Arrow UDFs
    only where DataFrame algebra genuinely cannot express the semantics
    (HTML extraction, mention detection).
  * Iterative algorithms (transitive closure, OWL-RL reasoning, connected
    components) are driver-side loops over DataFrame jobs with
    ``localCheckpoint`` per round to truncate lineage.
"""

__version__ = "0.1.0"
