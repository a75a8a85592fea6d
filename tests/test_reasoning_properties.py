"""Property-based differential test: ``apply_reasoning`` vs a naive
in-memory forward-chainer over random small graphs.

The naive twin applies the SAME rule set (module docstring of
``operators/reasoning.py``) with a dumb loop — no schema gating, no CC
routing, no per-round pruning — so any divergence indicts exactly the
optimizations (schema-flag gating, CC-based sameAs, eq-rep batching),
not the rule semantics.  Graphs are drawn from a tiny URI universe so
rules actually interact (chains, diamonds, clique merges).
"""

from __future__ import annotations

import random

from orionbelt_ontology_builder_spark.model import (
    OWL,
    RDF,
    RDFS,
    TRIPLES_SCHEMA,
)
from orionbelt_ontology_builder_spark.operators.reasoning import (
    apply_reasoning,
)

B = "http://x.org/"
_NODES = [B + n for n in "abcdef"]
_CLASSES = [B + c for c in ("C1", "C2", "C3")]
_PROPS = [B + p for p in ("p1", "p2")]


def _naive_closure(triples: set, with_eq: bool) -> set:
    """Dumb fixpoint over (subj, pred, obj) string triples (all-URI
    universe).  Rules: rdfs 2/3/5/7/9/11, prp-inv/symp/trp, and under
    owl-rl: cax-eqc, prp-eqp (+decl symmetry), prp-fp/ifp, cls-hv1/2,
    sameAs sym/trans/reflexive-on-members + eq-rep-s/p/o."""
    t = set(triples)
    struct = {RDF.type, RDFS.subClassOf, RDFS.subPropertyOf}
    while True:
        new = set()
        sub_c = {(s, o) for s, p, o in t if p == RDFS.subClassOf}
        sub_p = {(s, o) for s, p, o in t if p == RDFS.subPropertyOf}
        dom = {(s, o) for s, p, o in t if p == RDFS.domain}
        rng = {(s, o) for s, p, o in t if p == RDFS.range}
        inv = {(s, o) for s, p, o in t if p == OWL.inverseOf}
        typ = {(s, o) for s, p, o in t if p == RDF.type}
        sym_p = {s for s, o in typ if o == OWL.SymmetricProperty}
        trp_p = {s for s, o in typ if o == OWL.TransitiveProperty}
        asrt = {(s, p, o) for s, p, o in t if p not in struct}
        for c, d in sub_c:
            for d2, e in sub_c:
                if d == d2:
                    new.add((c, RDFS.subClassOf, e))
            for s, c2 in typ:
                if c2 == c:
                    new.add((s, RDF.type, d))
        for p, q in sub_p:
            for q2, r in sub_p:
                if q == q2:
                    new.add((p, RDFS.subPropertyOf, r))
            for s, p2, o in asrt:
                if p2 == p:
                    new.add((s, q, o))
        for s, p, o in asrt:
            for p2, c in dom:
                if p == p2:
                    new.add((s, RDF.type, c))
            for p2, c in rng:
                if p == p2:
                    new.add((o, RDF.type, c))
            for p2, q in inv:
                if p == p2:
                    new.add((o, q, s))
                if p == q:
                    new.add((o, p2, s))
            if p in sym_p:
                new.add((o, p, s))
            if p in trp_p:
                for s2, p2, o2 in asrt:
                    if p2 == p and s2 == o:
                        new.add((s, p, o2))
        if with_eq:
            eqc = {(s, o) for s, p, o in t if p == OWL.equivalentClass}
            eqc |= {(o, s) for s, o in eqc}
            eqp = {(s, o) for s, p, o in t if p == OWL.equivalentProperty}
            eqp |= {(o, s) for s, o in eqp}
            for c, d in eqc:
                new.add((c, OWL.equivalentClass, d))
                for s, c2 in typ:
                    if c2 == c:
                        new.add((s, RDF.type, d))
            for p, q in eqp:
                new.add((p, OWL.equivalentProperty, q))
                for s, p2, o in asrt:
                    if p2 == p:
                        new.add((s, q, o))
            fp = {s for s, o in typ if o == OWL.FunctionalProperty}
            ifp = {s for s, o in typ if o == OWL.InverseFunctionalProperty}
            for s, p, o in asrt:
                if p in fp:
                    for s2, p2, o2 in asrt:
                        if p2 == p and s2 == s and o2 != o:
                            new.add((o, OWL.sameAs, o2))
                if p in ifp:
                    for s2, p2, o2 in asrt:
                        if p2 == p and o2 == o and s2 != s:
                            new.add((s, OWL.sameAs, s2))
            onp = {(s, o) for s, p, o in t if p == OWL.onProperty}
            hv = {(s, o) for s, p, o in t if p == OWL.hasValue}
            for r, p in onp:
                for r2, v in hv:
                    if r2 != r:
                        continue
                    for s, c in typ:
                        if c == r:
                            new.add((s, p, v))
                    for s, p2, o in asrt:
                        if p2 == p and o == v:
                            new.add((s, RDF.type, r))
            same = {(s, o) for s, p, o in t if p == OWL.sameAs}
            same |= {(o, s) for s, o in same}
            members = {x for pr in same for x in pr}
            changed = True
            while changed:
                n2 = {(a, c) for a, b in same for b2, c in same if b == b2}
                changed = not n2 <= same
                same |= n2
            same |= {(m, m) for m in members}
            for a, b in same:
                new.add((a, OWL.sameAs, b))
            sib = dict()
            for a, b in same:
                sib.setdefault(a, set()).add(b)
            for s, p, o in t | new:
                for tw in sib.get(s, ()):
                    new.add((tw, p, o))
                for tw in sib.get(p, ()):
                    new.add((s, tw, o))
                for tw in sib.get(o, ()):
                    new.add((s, p, tw))
        if new <= t:
            return t
        t |= new


def _random_graph(rnd: random.Random) -> list:
    rows = []
    schema_menu = [
        lambda: (rnd.choice(_CLASSES), RDFS.subClassOf, rnd.choice(_CLASSES)),
        lambda: (rnd.choice(_PROPS), RDFS.subPropertyOf, rnd.choice(_PROPS)),
        lambda: (rnd.choice(_PROPS), RDFS.domain, rnd.choice(_CLASSES)),
        lambda: (rnd.choice(_PROPS), RDFS.range, rnd.choice(_CLASSES)),
        lambda: (rnd.choice(_PROPS), OWL.inverseOf, rnd.choice(_PROPS)),
        lambda: (rnd.choice(_PROPS), RDF.type, OWL.SymmetricProperty),
        lambda: (rnd.choice(_PROPS), RDF.type, OWL.TransitiveProperty),
        lambda: (rnd.choice(_PROPS), RDF.type, OWL.FunctionalProperty),
        lambda: (
            rnd.choice(_PROPS), RDF.type, OWL.InverseFunctionalProperty,
        ),
        lambda: (
            rnd.choice(_CLASSES), OWL.equivalentClass, rnd.choice(_CLASSES),
        ),
        lambda: (
            rnd.choice(_PROPS), OWL.equivalentProperty, rnd.choice(_PROPS),
        ),
        lambda: (rnd.choice(_CLASSES), OWL.onProperty, rnd.choice(_PROPS)),
        lambda: (rnd.choice(_CLASSES), OWL.hasValue, rnd.choice(_NODES)),
    ]
    for _ in range(rnd.randint(1, 5)):
        rows.append(rnd.choice(schema_menu)())
    for _ in range(rnd.randint(2, 7)):
        kind = rnd.random()
        if kind < 0.5:
            rows.append(
                (rnd.choice(_NODES), rnd.choice(_PROPS), rnd.choice(_NODES))
            )
        elif kind < 0.85:
            rows.append(
                (rnd.choice(_NODES), RDF.type, rnd.choice(_CLASSES))
            )
        else:
            rows.append(
                (rnd.choice(_NODES), OWL.sameAs, rnd.choice(_NODES))
            )
    return sorted(set(rows))


def _check(spark, seed: int, profile: str) -> None:
    rnd = random.Random(seed)
    rows = _random_graph(rnd)
    df = spark.createDataFrame(
        [(s, p, o, "uri", None, None) for s, p, o in rows], TRIPLES_SCHEMA
    )
    out, _n = apply_reasoning(df, profile=profile)
    got = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    want = _naive_closure(set(rows), with_eq=(profile == "owl-rl"))
    if profile == "rdfs":
        # rdfs profile still closes sameAs sym/trans (no reflexive, no
        # substitution) — mirror that here
        same = {(s, o) for s, p, o in want if p == OWL.sameAs}
        same |= {(o, s) for s, o in same}
        changed = True
        while changed:
            n2 = {(a, c) for a, b in same for b2, c in same if b == b2}
            changed = not n2 <= same
            same |= n2
        want |= {
            (a, OWL.sameAs, b) for a, b in same if a != b
        }
    assert got == want, (
        f"seed={seed} profile={profile}\n"
        f"missing={sorted(want - got)[:6]}\nextra={sorted(got - want)[:6]}"
    )


def test_reasoning_matches_naive_closure_rdfs(spark):
    for seed in range(6):
        _check(spark, seed, "rdfs")


def test_reasoning_matches_naive_closure_owlrl(spark):
    for seed in range(100, 106):
        _check(spark, seed, "owl-rl")
