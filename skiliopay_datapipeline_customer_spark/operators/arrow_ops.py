"""Arrow-native UDF tier (SURVEY §2.12): ``mapInArrow`` and
``applyInArrow`` — the zero-copy batch path underneath the Pandas tiers.

The sanctioned-Python ladder in this engine is: native Column expressions
(JVM codegen) > Arrow-batched pandas (`mapInPandas`/`applyInPandas`,
`operators/multimodal.py`) > this tier, which strips the last conversion:
the executor hands the worker raw ``pyarrow.RecordBatch``es and the
function answers with RecordBatches — no pandas Block consolidation, no
object boxing, no index. For byte payloads and fixed-width vectors the
pandas detour costs real allocation; ``pyarrow.compute`` kernels run
SIMD-vectorized straight on the wire buffers.

Each operator here has a native-expression twin already oracle-checked in
the registry, and the tests assert the Arrow tier matches the twin exactly
— same correctness contract as `order_trend_pandas` vs `order_trend_slope`.

Scale: identical distribution shape to mapInPandas — map-only, parallelism
= partition count, batch size `spark.sql.execution.arrow.maxRecordsPerBatch`;
applyInArrow shuffles once on the group key and each group must fit one
worker's batch (same contract as applyInPandas grouped-map).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def arrow_doc_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """mapInArrow twin of the `token_stats` query: whitespace token count +
    char length per doc, computed by pyarrow.compute string kernels on the
    Arrow buffers (utf8_length, split_whitespace → list_value_length)."""

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(text_col)
            toks = pc.list_value_length(
                pc.split_pattern_regex(
                    pc.utf8_trim_whitespace(pc.utf8_lower(text)), r"\s+"
                )
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pc.cast(toks, pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                [id_col, "n_tokens", "n_chars"],
            )

    return docs.select(id_col, text_col).mapInArrow(
        stats, f"{id_col} long, n_tokens long, n_chars long"
    )


def arrow_group_trend(
    orders: DataFrame,
    key_col: str = "o_custkey",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """applyInArrow twin of `order_trend_slope`/`order_trend_pandas`:
    per-group least-squares slope, computed with numpy over each group's
    Arrow table (zero-copy to ndarray for the numeric columns)."""

    def slope(table):
        import pyarrow as pa

        x = table.column(x_col).to_numpy(zero_copy_only=False).astype("float64")
        y = table.column(y_col).to_numpy(zero_copy_only=False).astype("float64")
        n = len(x)
        denom = ((x - x.mean()) ** 2).sum()
        s = float(((x - x.mean()) * (y - y.mean())).sum() / denom) if denom else None
        return pa.table(
            {
                key_col: [table.column(key_col)[0].as_py()],
                "n_orders": [n],
                "trend_slope": [s],
            }
        )

    return orders.groupBy(key_col).applyInArrow(
        slope, f"{key_col} long, n_orders long, trend_slope double"
    )
