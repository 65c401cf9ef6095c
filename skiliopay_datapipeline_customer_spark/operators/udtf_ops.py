"""Python UDTF tier (SURVEY §2.12) — table functions, the last rung of the
sanctioned-Python ladder.

The ladder so far: native Column expressions (JVM codegen) > Arrow-batched
pandas (`mapInPandas`/`applyInPandas`) > raw Arrow (`mapInArrow`/
`applyInArrow`, `operators/arrow_ops.py`). All of those are 1-in-N-out maps
or grouped maps; Spark 4's Python UDTFs add the row → MANY-rows shape as a
first-class FROM-clause citizen (`SELECT ... FROM t, LATERAL my_udtf(...)`)
— the lateral-join form a user of the reference's row-expanding pandas
helpers (`/root/reference/src/processing/feature_engineering.py` expansion
steps) would reach for when the expansion logic genuinely needs Python.

Contract: every UDTF here has a native-expression twin already
oracle-checked in the registry, and tests assert EXACT equality against the
twin (the `arrow_ops` correctness pattern). The native twin stays the
production path — a UDTF is row-at-a-time Python and loses whole-stage
codegen — so this tier exists for semantics Spark expressions can't state,
and the twin-equality test is what licenses it.

Scale: a lateral UDTF is map-side (no shuffle added); parallelism equals
the left side's partition count and output rows stream per input row, so
the expansion never materializes per-doc state beyond one row's chunks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _doc_chunks_udtf_class(chunk_tokens: int, overlap: int):
    """Build the UDTF class with the chunking parameters CLOSED OVER —
    UDTF eval args must be columns or foldable literals, and baking the
    constants in keeps the SQL call signature (doc_id, text) minimal.

    Semantics mirror ``operators/textops.py::chunk_assignments`` exactly,
    edge cases included:
      * tokens = regex-split on ``\\s+`` of the trimmed, lowercased text —
        ``re.split`` returns ``['']`` (length 1) on an empty string, which
        matches Spark's ``split(trim(lower(x)), '\\s+')`` returning a
        single-empty-element array;
      * NULL text yields no rows (the native twin's ``posexplode`` of a
        NULL sequence);
      * starts = 0, stride, … up to ``max(n - 1 - overlap, 0)`` INCLUSIVE
        (``F.sequence`` includes its stop bound);
      * final chunk is the short remainder, ``min(chunk_tokens, n - start)``.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    class DocChunks:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF signature
            if text is None:
                return
            n = len(re.split(r"\s+", text.strip().lower()))
            stop = max(n - 1 - overlap, 0)
            for chunk_id, start in enumerate(range(0, stop + 1, stride)):
                yield (
                    doc_id,
                    n,
                    chunk_id,
                    start,
                    min(chunk_tokens, n - start),
                )

    return DocChunks


def chunk_assignments_udtf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """UDTF-tier twin of ``textops.chunk_assignments``: one row per
    (doc, chunk) via a registered Python UDTF in a LATERAL join. Same
    output schema and values as the native twin (test-asserted); use the
    native twin in production — this is the sanctioned shape for
    row-expanding logic that can't be a Spark expression.
    """
    from pyspark.sql.functions import udtf

    spark = df.sparkSession
    cls = _doc_chunks_udtf_class(chunk_tokens, overlap)
    fn = udtf(
        cls,
        returnType=(
            f"{id_col} long, n_tokens long, chunk_id long, "
            "chunk_start long, chunk_len long"
        ),
    )
    name = f"doc_chunks_{chunk_tokens}_{overlap}"
    spark.udtf.register(name, fn)
    view = f"_udtf_docs_{chunk_tokens}_{overlap}"
    df.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.* FROM {view} AS d, "
        f"LATERAL {name}(d.{id_col}, d.{text_col}) AS c"
    )
