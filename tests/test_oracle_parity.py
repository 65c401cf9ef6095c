"""Every declared query with an oracle must hash-match it (driver's t2 gate)."""

from __future__ import annotations

import pytest

from skiliopay_datapipeline_customer_spark.parity import run_parity
from skiliopay_datapipeline_customer_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    problems = run_parity(spark, sf_dir, name, QUERIES[name], ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
