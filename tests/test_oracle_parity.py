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


def test_compare_frames_rejects_list_columns():
    """Driver contract: its canonicalizer sort_values() raises TypeError on
    list/map cells, so no declared oracle query may return one — even when
    BOTH sides agree (the r7 ``bpe_encoded_docs`` failure mode: selfcheck
    green at three SFs, driver errored). compare_frames must reject the
    column outright; with it enforced there, ``test_oracle_parity`` above
    asserts the contract registry-wide on every oracle query's real output.
    """
    import pandas as pd

    from skiliopay_datapipeline_customer_spark.parity import compare_frames

    pdf = pd.DataFrame({"a": [1, 2], "toks": [["x"], ["y", "z"]]})
    problems = compare_frames(pdf, pdf.copy())
    assert any("list" in p and "toks" in p for p in problems)
    # the fixed projection (joined string) passes clean
    ok = pd.DataFrame({"a": [1, 2], "toks": ["x", "y z"]})
    assert compare_frames(ok, ok.copy()) == []
