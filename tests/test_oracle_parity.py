"""Differential gate: every registered query vs its DuckDB oracle at
sf0.001 (fast inner loop). The driver runs the same comparison at sf0.01;
run `SF=0.01 pytest tests/test_oracle_parity.py` locally before release."""

from __future__ import annotations

import os

import pytest

from geomesa_cassandra_tools_spark.oracles import ORACLES
from geomesa_cassandra_tools_spark.queries import NO_ORACLE, QUERIES

from tests.util import assert_matches_oracle

SF_DIR = f"/root/testdata/sf{os.environ.get('SF', '0.001')}"


def test_registry_alignment():
    assert set(QUERIES) - set(ORACLES) == set(NO_ORACLE)
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    assert_matches_oracle(spark, QUERIES[name], ORACLES[name], SF_DIR, name)


@pytest.mark.parametrize("name", sorted(NO_ORACLE))
def test_no_oracle_query_runs(spark, name):
    # rows-only check, mirroring the driver's weaker gate for these
    assert QUERIES[name](spark, SF_DIR).count() >= 0
