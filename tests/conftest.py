from __future__ import annotations

import pytest

from orionbelt_ontology_builder_spark.fixtures import fixture_triples
from orionbelt_ontology_builder_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="obelt-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def populated_om(spark):
    return fixture_triples(spark, "populated_om").cache()


@pytest.fixture(scope="session")
def skos_om(spark):
    return fixture_triples(spark, "skos_om").cache()
