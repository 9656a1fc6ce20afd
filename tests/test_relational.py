"""Every relational query must hash-match its DuckDB oracle — the local mirror
of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from score_spark.queries import ORACLE, QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    if name not in ORACLE:
        pytest.skip(f"{name} has no SQL oracle (rows-only check)")
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, oracle_con, ORACLE[name])
