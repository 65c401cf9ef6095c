"""Python UDTF tier (SURVEY §2.12): exact-equality vs the native twin."""

from __future__ import annotations

import pytest


def _sorted_tuples(df):
    return sorted(tuple(r) for r in df.collect())


def test_udtf_chunks_match_native_twin_on_corpus(spark, sf_dir):
    """The lateral-join UDTF produces EXACTLY the native
    ``chunk_assignments`` rows (doc_id, n_tokens, chunk_id, chunk_start,
    chunk_len) over the real documents table — the twin-equality contract
    that licenses the Python tier."""
    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.textops import (
        chunk_assignments,
    )
    from skiliopay_datapipeline_customer_spark.operators.udtf_ops import (
        chunk_assignments_udtf,
    )

    docs = table(spark, sf_dir, "documents")
    native = chunk_assignments(docs, chunk_tokens=16, overlap=4)
    via_udtf = chunk_assignments_udtf(docs, chunk_tokens=16, overlap=4)
    # names + types must agree; nullability flags differ by construction
    # (a UDTF output column is always nullable)
    assert [(f.name, f.dataType) for f in via_udtf.schema.fields] == [
        (f.name, f.dataType) for f in native.schema.fields
    ]
    rows = _sorted_tuples(via_udtf)
    assert rows == _sorted_tuples(native)
    assert len(rows) > 0


def test_udtf_chunks_match_native_twin_on_edge_cases(spark):
    """Edge semantics pinned row-for-row: empty string and all-whitespace
    text tokenize to a single empty token (Spark split semantics), NULL
    text yields no rows, a remainder <= overlap spawns no duplicate chunk,
    and the final short chunk keeps its remainder length."""
    from skiliopay_datapipeline_customer_spark.operators.textops import (
        chunk_assignments,
    )
    from skiliopay_datapipeline_customer_spark.operators.udtf_ops import (
        chunk_assignments_udtf,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),  # n_tokens = 1 (split of empty string)
            (2, "   "),  # trims to empty -> n_tokens = 1
            (3, None),  # NULL -> no rows either tier
            (4, "a b c d e"),  # n=5: one chunk at 16/4
            (5, " ".join(f"t{i}" for i in range(16))),  # n=16: exact fit
            (6, " ".join(f"t{i}" for i in range(17))),  # n=17: short tail
            (7, " ".join(f"t{i}" for i in range(20))),  # remainder == overlap
            (8, "A  B\tC\nD"),  # mixed whitespace + case folding
        ],
        "doc_id long, text string",
    )
    native = chunk_assignments(docs, chunk_tokens=16, overlap=4)
    via_udtf = chunk_assignments_udtf(docs, chunk_tokens=16, overlap=4)
    n_rows = _sorted_tuples(native)
    assert _sorted_tuples(via_udtf) == n_rows
    by_doc = {d: [] for d in range(1, 9)}
    for r in n_rows:
        by_doc[r[0]].append(r)
    assert by_doc[3] == []  # NULL dropped
    assert by_doc[1] == [(1, 1, 0, 0, 1)]
    assert by_doc[5] == [(5, 16, 0, 0, 16)]  # exact fit: ONE chunk
    assert by_doc[6] == [(6, 17, 0, 0, 16), (6, 17, 1, 12, 5)]
    # n=20: start 12 covers tokens 12..19; a start at 24 > n-1-overlap=15,
    # so no third chunk — the <=overlap remainder rule
    assert by_doc[7] == [(7, 20, 0, 0, 16), (7, 20, 1, 12, 8)]


def test_udtf_rejects_degenerate_stride(spark):
    from skiliopay_datapipeline_customer_spark.operators.udtf_ops import (
        chunk_assignments_udtf,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_assignments_udtf(docs, chunk_tokens=8, overlap=8)
