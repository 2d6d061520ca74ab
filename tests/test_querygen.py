"""Randomized differential testing: generated PQL vs DuckDB SQL
(BaseClusterIntegrationTestSet.java:227-242 testGeneratedQueries analog)."""

from __future__ import annotations

import pytest

from realtime_olap_spark.plans.pql import PQLEngine
from realtime_olap_spark.suite.querygen import generate
from tests.conftest import SF_DIR, assert_matches_oracle

SEEDS = list(range(150))


@pytest.mark.parametrize("seed", SEEDS)
def test_generated_query_matches_oracle(spark, duck, seed):
    pql, sql = generate(seed)
    df = PQLEngine(spark, SF_DIR).dataframe(pql)
    con = duck(SF_DIR)
    assert_matches_oracle(df, con, sql, name=f"seed {seed}: {pql}")
