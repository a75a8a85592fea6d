"""Drop-in ``OntologyManager`` facade with the reference's API surface.

The engine proper is pure: every operator is a function from DataFrames
to DataFrames (operators/, sources/, plans/).  A user of the reference
(``ontology_manager.py``), though, programs against a *stateful* manager
— ``om.add_class("Person"); om.get_classes()`` — so this module binds
the pure operators to held state with the reference's method NAMES and
argument shapes:

  * ``self.triples``   — the current graph (triples DataFrame)
  * ``self.base_uri``  — default namespace for short names
  * ``self.prefixes``  — prefix side-table (operators/prefixes.py)
  * undo/redo history  — ``plans.undo.UndoManager`` (checkpoint per
    mutation, like the reference's app layer)

Two documented divergences from the reference, both inherent to the
Spark contract:
  * read methods return **DataFrames**, not lists of dicts — call
    ``.collect()`` for driver-side rows (``collect_dicts`` helps);
  * mutation methods RETURN nothing but rebind ``self.triples`` to a
    new immutable DataFrame (the reference mutates its rdflib graph in
    place) — each mutation checkpoints, so undo/redo stack laws match
    ``/root/reference/tests/test_undo.py``.

Everything here is a thin delegation — the semantics (and their
oracle/differential tests) live in the operator modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import model as M
from .model import OWL, t_uri, triples_df
from .operators import lists as L
from .operators import mutations as MU
from .operators import prefixes as P
from .operators import reasoning as RE
from .operators import setops as S
from .operators import validation as V
from .operators import views as W
from .plans.undo import UndoManager
from .sources import ntriples as NT
from .sources import parsers, serializers

IMPORT_REPLACE = "replace"
IMPORT_MERGE = "merge"
IMPORT_MERGE_OVERWRITE = "merge_overwrite"

_CLASS_GUARD = [OWL.Class]
_PROP_GUARD = [OWL.ObjectProperty, OWL.DatatypeProperty]
_IND_GUARD = [OWL.NamedIndividual]


def collect_dicts(df: DataFrame) -> list[dict]:
    """Driver-side convenience: DataFrame -> list of plain dicts (the
    reference's return shape for read methods)."""
    return [row.asDict(recursive=True) for row in df.collect()]


class OntologyManager:
    """Stateful facade over the pure operators (reference
    ``ontology_manager.OntologyManager``, same method names)."""

    XSD_DATATYPES = M.XSD_DATATYPES
    STANDARD_PREFIXES = P.STANDARD_PREFIXES

    def __init__(
        self,
        spark: SparkSession,
        base_uri: str = "http://example.org/ontology#",
        max_history: int = 50,
    ):
        self.spark = spark
        self.base_uri = base_uri
        self.ontology_uri = base_uri.rstrip("#").rstrip("/")
        self.triples = triples_df(
            spark, [t_uri(self.ontology_uri, M.RDF.type, OWL.Ontology)]
        )
        self.prefixes = P.default_prefix_table(spark, base_uri)
        self._history = UndoManager(self.triples, max_history=max_history)

    # -- state plumbing ------------------------------------------------

    def _apply(self, new_triples: DataFrame, label: str) -> None:
        self.triples = self._history.checkpoint(new_triples, label)

    # -- ontology metadata / imports ------------------------------------

    def set_ontology_metadata(self, label=MU.UNSET, comment=MU.UNSET,
                              creator=MU.UNSET, version_iri=MU.UNSET):
        self._apply(
            MU.set_ontology_metadata(
                self.triples, self.ontology_uri, label, comment, creator,
                version_iri,
            ),
            "Set ontology metadata",
        )

    def get_ontology_metadata(self) -> DataFrame:
        return W.get_ontology_metadata(self.triples)

    def add_import(self, import_uri: str):
        self._apply(
            MU.add_import(self.triples, self.ontology_uri, import_uri),
            f"Add import {import_uri}",
        )

    def remove_import(self, import_uri: str):
        self._apply(
            MU.remove_import(self.triples, self.ontology_uri, import_uri),
            f"Remove import {import_uri}",
        )

    def get_imports(self) -> DataFrame:
        return W.get_imports(self.triples)

    # -- prefixes --------------------------------------------------------

    def get_prefixes(self) -> DataFrame:
        return P.get_all_prefixes(self.prefixes)

    get_all_prefixes = get_prefixes

    def add_prefix(self, prefix: str, namespace: str):
        self.prefixes = P.add_prefix(self.prefixes, prefix, namespace)

    def remove_prefix(self, prefix: str):
        self.prefixes = P.remove_prefix(self.prefixes, prefix)

    def set_base_uri(self, new_base: str):
        self._apply(
            MU.set_base_uri(self.triples, self.base_uri, new_base),
            f"Set base URI {new_base}",
        )
        self.base_uri = new_base if new_base[-1] in "#/" else new_base + "#"
        self.ontology_uri = new_base.rstrip("#").rstrip("/")

    # -- io ---------------------------------------------------------------

    def load_from_string(self, text: str, fmt: str = "turtle",
                         strategy: str = IMPORT_REPLACE):
        incoming = parsers.parse(self.spark, text, fmt)
        merged = S.merge_graphs(self.triples, incoming, strategy)
        self._apply(merged, f"Import ({strategy})")
        if fmt.lower().lstrip(".") in ("turtle", "ttl", "n3"):
            tp = parsers._TurtleParser(text)
            tp.parse()
            for pfx, ns in tp.prefixes.items():
                self.prefixes = P.add_prefix(self.prefixes, pfx, ns)
        elif fmt.lower().lstrip(".") in ("json-ld", "jsonld", "json"):
            for pfx, ns in parsers.jsonld_prefixes(text):
                self.prefixes = P.add_prefix(self.prefixes, pfx, ns)

    def load_from_file(self, path: str, fmt: str | None = None,
                       strategy: str = IMPORT_REPLACE):
        if fmt is None:
            # parsers.parse normalizes extensions (ttl/owl/rdf/xml/n3/nt/
            # jsonld/json) directly — the reference's extension map
            fmt = path.rsplit(".", 1)[-1]
        with open(path) as fh:
            self.load_from_string(fh.read(), fmt, strategy)

    def merge_from_string(self, text: str, fmt: str = "turtle",
                          strategy: str = IMPORT_MERGE):
        self.load_from_string(text, fmt, strategy)

    merge_from_graph = merge_from_string

    def export_to_string(self, fmt: str = "turtle") -> str:
        if fmt in ("nt", "ntriples", "n-triples"):
            lines = NT.serialize_nt(self.triples).collect()
            return "\n".join(sorted(r["line"] for r in lines)) + "\n"
        pfx = {
            r["prefix"]: r["namespace"]
            for r in self.prefixes.collect()
        }
        return serializers.serialize(self.triples, fmt, pfx)

    def preview_import(self, text: str, fmt: str = "turtle") -> dict:
        incoming = parsers.parse(self.spark, text, fmt)
        return S.preview_import(self.triples, incoming)

    def compare_to_string(self, text: str, fmt: str = "turtle") -> DataFrame:
        other = parsers.parse(self.spark, text, fmt)
        return S.diff_summary(self.triples, other)

    def compare_graphs(self, other: DataFrame) -> dict[str, DataFrame]:
        return S.diff_graphs(self.triples, other)

    def format_diff_report(self, other: DataFrame,
                           report_format: str = "markdown") -> DataFrame:
        return S.format_diff_report(self.triples, other, report_format)

    def detect_conflicts(self, other: DataFrame) -> DataFrame:
        return S.detect_conflicts(self.triples, other)

    def take_snapshot(self, path: str) -> None:
        NT.snapshot(self.triples, path)

    def restore_snapshot(self, path: str) -> None:
        self._apply(NT.restore(self.spark, path), "Restore snapshot")

    # -- undo / redo -------------------------------------------------------

    def checkpoint(self, label: str = "Edit"):
        # explicit labeled checkpoint of the CURRENT state (reference app
        # checkpoints before risky edits); mutations checkpoint themselves
        self._history.checkpoint(self.triples, label)

    def can_undo(self) -> bool:
        return self._history.can_undo()

    def can_redo(self) -> bool:
        return self._history.can_redo()

    def undo(self):
        label = self._history.undo()
        if label is not None:
            self.triples = self._history.current
        return label

    def redo(self):
        label = self._history.redo()
        if label is not None:
            self.triples = self._history.current
        return label

    def undo_labels(self) -> list[str]:
        return self._history.undo_labels

    def redo_labels(self) -> list[str]:
        return self._history.redo_labels

    # -- classes -----------------------------------------------------------

    def add_class(self, name, label=None, comment=None, parent=None):
        self._apply(
            MU.add_class(self.triples, name, self.base_uri, label, comment,
                         parent),
            f"Add class {name}",
        )

    def update_class(self, name, new_label=None, new_comment=None,
                     new_parent=None, remove_parent=None):
        self._apply(
            MU.update_class(self.triples, name, self.base_uri, new_label,
                            new_comment, new_parent, remove_parent),
            f"Update class {name}",
        )

    def rename_class(self, old, new) -> bool:
        out, ok = MU.rename_checked(
            self.triples, M.uri(old, self.base_uri),
            M.uri(new, self.base_uri), _CLASS_GUARD,
        )
        if ok:
            self._apply(out, f"Rename class {old} -> {new}")
        return ok

    def delete_class(self, name):
        self._apply(
            MU.delete_resource(self.triples, M.uri(name, self.base_uri)),
            f"Delete class {name}",
        )

    def get_classes(self) -> DataFrame:
        return W.get_classes(self.triples)

    def get_class_hierarchy(self) -> DataFrame:
        return W.get_class_hierarchy(self.triples)

    # -- properties ----------------------------------------------------------

    def add_object_property(self, name, domain=None, range=None, label=None,
                            comment=None, characteristics=None,
                            inverse_of=None):
        self._apply(
            MU.add_object_property(self.triples, name, self.base_uri, domain,
                                   range, label, comment, characteristics,
                                   inverse_of),
            f"Add object property {name}",
        )

    def add_data_property(self, name, domain=None, range=None, label=None,
                          functional=False):
        self._apply(
            MU.add_data_property(self.triples, name, self.base_uri, domain,
                                 range, label, functional),
            f"Add data property {name}",
        )

    def update_property(self, name, new_label=None, new_comment=None,
                        new_domain=None, new_range=None):
        self._apply(
            MU.update_property(self.triples, name, self.base_uri, new_label,
                               new_comment, new_domain, new_range),
            f"Update property {name}",
        )

    def rename_property(self, old, new) -> bool:
        out, ok = MU.rename_checked(
            self.triples, M.uri(old, self.base_uri),
            M.uri(new, self.base_uri), _PROP_GUARD, rename_predicate=True,
        )
        if ok:
            self._apply(out, f"Rename property {old} -> {new}")
        return ok

    def delete_property(self, name):
        self._apply(
            MU.delete_resource(self.triples, M.uri(name, self.base_uri),
                               as_predicate=True),
            f"Delete property {name}",
        )

    def get_object_properties(self) -> DataFrame:
        return W.get_object_properties(self.triples)

    def get_data_properties(self) -> DataFrame:
        return W.get_data_properties(self.triples)

    # -- individuals -----------------------------------------------------------

    def add_individual(self, name, class_name=None, label=None):
        self._apply(
            MU.add_individual(self.triples, name, self.base_uri, class_name,
                              label),
            f"Add individual {name}",
        )

    def add_individual_property(self, individual, prop, value,
                                is_object=False, lang=None, datatype=None):
        self._apply(
            MU.add_individual_property(self.triples, individual, prop, value,
                                       is_object, self.base_uri, lang,
                                       datatype),
            f"Add property to {individual}",
        )

    def update_individual(self, name, new_label=None, new_comment=None,
                          add_class=None, remove_class=None):
        self._apply(
            MU.update_individual(self.triples, name, self.base_uri, new_label,
                                 new_comment, add_class, remove_class),
            f"Update individual {name}",
        )

    def rename_individual(self, old, new) -> bool:
        out, ok = MU.rename_checked(
            self.triples, M.uri(old, self.base_uri),
            M.uri(new, self.base_uri), _IND_GUARD,
        )
        if ok:
            self._apply(out, f"Rename individual {old} -> {new}")
        return ok

    def delete_individual(self, name):
        self._apply(
            MU.delete_resource(self.triples, M.uri(name, self.base_uri)),
            f"Delete individual {name}",
        )

    def get_individuals(self) -> DataFrame:
        return W.get_individuals(self.triples)

    # -- restrictions / axioms ---------------------------------------------------

    def add_restriction(self, class_name, property_name, restriction_type,
                        value, on_class=None):
        self._apply(
            MU.add_restriction(self.triples, class_name, property_name,
                               restriction_type, value, self.base_uri,
                               on_class),
            f"Add restriction on {class_name}",
        )

    def delete_restriction(self, class_name, property_name,
                           restriction_type):
        self._apply(
            MU.delete_restriction(self.triples, class_name, property_name,
                                  restriction_type, self.base_uri),
            f"Delete restriction on {class_name}",
        )

    def get_restrictions(self) -> DataFrame:
        return W.get_restrictions(self.triples)

    def add_property_chain(self, property_name, chain_properties):
        self._apply(
            MU.add_property_chain(self.triples, property_name,
                                  chain_properties, self.base_uri),
            f"Add property chain {property_name}",
        )

    def add_class_expression(self, class_name, expression_type, classes=None,
                             individuals=None):
        self._apply(
            MU.add_class_expression(self.triples, class_name, expression_type,
                                    self.base_uri, classes, individuals),
            f"Add class expression {class_name}",
        )

    def add_all_different(self, individuals):
        self._apply(
            MU.add_all_different(self.triples, individuals, self.base_uri),
            "Add AllDifferent",
        )

    def add_has_key(self, class_name, properties):
        self._apply(
            MU.add_has_key(self.triples, class_name, properties,
                           self.base_uri),
            f"Add hasKey {class_name}",
        )

    def add_disjoint_union(self, class_name, disjoint_classes):
        self._apply(
            MU.add_disjoint_union(self.triples, class_name, disjoint_classes,
                                  self.base_uri),
            f"Add disjointUnion {class_name}",
        )

    def get_property_chains(self) -> DataFrame:
        return L.get_property_chains(self.triples)

    def get_class_expressions(self) -> DataFrame:
        return L.get_class_expressions(self.triples)

    def get_all_different(self) -> DataFrame:
        return L.get_all_different(self.triples)

    def get_has_keys(self) -> DataFrame:
        return L.get_has_keys(self.triples)

    def get_disjoint_unions(self) -> DataFrame:
        return L.get_disjoint_unions(self.triples)

    # -- annotations ------------------------------------------------------------

    def add_annotation(self, subject, predicate, value, lang=None):
        self._apply(
            MU.add_annotation(self.triples, subject, predicate, value,
                              self.base_uri, lang),
            f"Add annotation to {subject}",
        )

    def delete_annotation(self, subject, predicate, value=None, lang=None,
                          datatype=None):
        self._apply(
            MU.delete_annotation(self.triples, subject, predicate,
                                 self.base_uri, value, lang, datatype),
            f"Delete annotation from {subject}",
        )

    def get_annotations(self, resource: str) -> DataFrame:
        return W.get_annotations(self.triples, resource)

    def get_used_annotation_predicates(self) -> DataFrame:
        return W.get_used_annotation_predicates(self.triples)

    # -- relations ---------------------------------------------------------------

    def add_class_relation(self, class1, relation_type, class2):
        self._apply(
            MU.add_class_relation(self.triples, class1, relation_type, class2,
                                  self.base_uri),
            f"Add class relation {relation_type}",
        )

    def remove_class_relation(self, class1, relation_type, class2):
        self._apply(
            MU.remove_class_relation(self.triples, class1, relation_type,
                                     class2, self.base_uri),
            f"Remove class relation {relation_type}",
        )

    def add_property_relation(self, prop1, relation_type, prop2):
        self._apply(
            MU.add_property_relation(self.triples, prop1, relation_type,
                                     prop2, self.base_uri),
            f"Add property relation {relation_type}",
        )

    def remove_property_relation(self, prop1, relation_type, prop2):
        self._apply(
            MU.remove_property_relation(self.triples, prop1, relation_type,
                                        prop2, self.base_uri),
            f"Remove property relation {relation_type}",
        )

    def add_individual_relation(self, ind1, relation_type, ind2):
        self._apply(
            MU.add_individual_relation(self.triples, ind1, relation_type,
                                       ind2, self.base_uri),
            f"Add individual relation {relation_type}",
        )

    def remove_individual_relation(self, ind1, relation_type, ind2):
        self._apply(
            MU.remove_individual_relation(self.triples, ind1, relation_type,
                                          ind2, self.base_uri),
            f"Remove individual relation {relation_type}",
        )

    def get_class_relations(self, name=None) -> DataFrame:
        return W.get_relations(self.triples, W.CLASS_RELATIONS, name)

    def get_property_relations(self, name=None) -> DataFrame:
        return W.get_relations(self.triples, W.PROPERTY_RELATIONS, name)

    def get_individual_relations(self, name=None) -> DataFrame:
        return W.get_relations(self.triples, W.INDIVIDUAL_RELATIONS, name)

    # -- SKOS ------------------------------------------------------------------------

    def add_concept_scheme(self, name, label=None, comment=None):
        self._apply(
            MU.add_concept_scheme(self.triples, name, self.base_uri, label,
                                  comment),
            f"Add concept scheme {name}",
        )

    def update_concept_scheme(self, name, new_label=None, new_comment=None):
        self._apply(
            MU.update_concept_scheme(self.triples, name, self.base_uri,
                                     new_label, new_comment),
            f"Update concept scheme {name}",
        )

    def delete_concept_scheme(self, name):
        self._apply(
            MU.delete_concept_scheme(self.triples, name, self.base_uri),
            f"Delete concept scheme {name}",
        )

    def add_concept(self, name, scheme=None, pref_label=None, definition=None,
                    broader=None, lang=None):
        self._apply(
            MU.add_concept(self.triples, name, self.base_uri, scheme,
                           pref_label, definition, broader, lang),
            f"Add concept {name}",
        )

    def update_concept(self, name, new_pref_label=None, new_definition=None,
                       new_broader=None, add_scheme=None, remove_scheme=None):
        self._apply(
            MU.update_concept(self.triples, name, self.base_uri,
                              new_pref_label, new_definition, new_broader,
                              add_scheme, remove_scheme),
            f"Update concept {name}",
        )

    def add_concept_relation(self, source, relation, target):
        self._apply(
            MU.add_concept_relation(self.triples, source, relation, target,
                                    self.base_uri),
            f"Add concept relation {relation}",
        )

    def delete_concept(self, name):
        self._apply(
            MU.delete_concept(self.triples, name, self.base_uri),
            f"Delete concept {name}",
        )

    def get_concept_schemes(self) -> DataFrame:
        return W.get_concept_schemes(self.triples)

    def get_concepts(self, scheme=None) -> DataFrame:
        return W.get_concepts(self.triples, scheme)

    def get_concept_hierarchy(self) -> DataFrame:
        return W.get_concept_hierarchy(self.triples)

    # -- bulk ------------------------------------------------------------------------

    @staticmethod
    def parse_bulk_text(text: str, columns=None) -> list[dict]:
        return MU.parse_bulk_text(text, columns)

    def _staged(self, rows: list[dict], columns: list[str]) -> DataFrame:
        # the bulk operators take fixed staged schemas; pad columns the
        # textarea rows omitted with nulls (reference treats missing CSV
        # cells as empty, ontology_manager.py:560-563)
        return self.spark.createDataFrame(
            [tuple(r.get(k) or None for k in columns) for r in rows],
            ", ".join(f"`{k}` string" for k in columns),
        )

    def bulk_add_classes(self, rows: list[dict]):
        self._apply(
            MU.bulk_add_classes(
                self.triples,
                self._staged(rows, ["name", "label", "comment"]),
                self.base_uri,
            ),
            f"Bulk add {len(rows)} classes",
        )

    def bulk_add_properties(self, rows: list[dict],
                            property_type: str = "object"):
        self._apply(
            MU.bulk_add_properties(
                self.triples,
                self._staged(rows, ["name", "domain", "range", "label"]),
                self.base_uri, property_type,
            ),
            f"Bulk add {len(rows)} properties",
        )

    def bulk_add_individuals(self, rows: list[dict]):
        self._apply(
            MU.bulk_add_individuals(
                self.triples,
                self._staged(rows, ["name", "class", "label"]),
                self.base_uri,
            ),
            f"Bulk add {len(rows)} individuals",
        )

    def bulk_delete_classes(self, names: list[str]):
        self._bulk_delete(names, "classes")

    def bulk_delete_properties(self, names: list[str]):
        self._bulk_delete(names, "properties")

    def bulk_delete_individuals(self, names: list[str]):
        self._bulk_delete(names, "individuals")

    def _bulk_delete(self, names: list[str], what: str):
        staged = self.spark.createDataFrame(
            [(n,) for n in names], "name string"
        )
        self._apply(
            MU.bulk_delete_resources(self.triples, staged, self.base_uri),
            f"Bulk delete {len(names)} {what}",
        )

    def bulk_update_annotations(self, updates: list[dict]):
        staged = self._staged(
            updates, ["resource", "predicate", "value", "lang", "action"]
        )
        self._apply(
            MU.bulk_update_annotations(self.triples, staged, self.base_uri),
            f"Bulk update {len(updates)} annotations",
        )

    # -- analysis / reasoning -----------------------------------------------------------

    def get_statistics(self) -> DataFrame:
        return W.get_statistics(self.triples)

    def get_resource_usages(self, resource: str) -> DataFrame:
        return W.get_resource_usages(self.triples, resource)

    def get_delete_impact(self, resource: str) -> DataFrame:
        return W.get_delete_impact(self.triples, resource)

    def format_delete_impact(self, resource: str) -> DataFrame:
        return W.format_delete_impact(self.triples, resource)

    def search(self, query: str, limit: int | None = None) -> DataFrame:
        return W.search(self.triples, query, limit)

    def validate(self) -> DataFrame:
        return V.validate(self.triples)

    def validate_skos(self) -> DataFrame:
        return V.validate_skos(self.triples)

    def apply_reasoning(self, max_rounds: int = 50,
                        profile: str = "owl-rl") -> int:
        expanded, n_inferred = RE.apply_reasoning(
            self.triples, max_rounds, profile
        )
        self._apply(expanded, "Apply reasoning")
        return n_inferred
