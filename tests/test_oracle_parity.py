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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_container_columns_in_any_declared_query(spark, sf_dir, name):
    """Driver contract, registry-wide: the driver canonicalizes EVERY
    declared query's output (rows-only included) with a pandas
    sort_values(), which raises TypeError on list/dict cells. The r7 fix
    asserted this only for oracle queries, and the rows-only
    ``pca_projected_embeddings`` slipped through in r8 — so assert it on
    the schema of every declared query, oracle or not. Schema-only (no
    execution): ArrayType/MapType/StructType in any output field is a
    contract violation regardless of row values.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: container-typed output columns {bad} would crash the "
        "driver canonicalizer — flatten to scalar columns or a joined string"
    )


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
