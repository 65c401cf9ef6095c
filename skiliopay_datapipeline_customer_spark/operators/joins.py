"""Join operators beyond plain equi-joins (SURVEY §2.3 J-suite).

The as-of (backward) join is implemented in the scalable union+window form:
tag both sides, union on (key, time), carry the right payload forward with
``last(ignorenulls)`` over a per-key time order, keep left rows. One shuffle
on the key, no per-key range-join blowup — the shape that survives 100 TB
(a naive theta join right.ts <= left.ts is O(n·m) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row: latest right row with right.time <= left.time
    (same key). Right payload columns come back null when no match.

    inclusive=True matches equal timestamps (right row wins at ties, the
    conventional backward-asof semantics).
    """
    l_tag = left.select(
        F.col(key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in right_payload]).alias("s")
            ).schema["s"].dataType
        ).alias("_rpay"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None)
        .cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema[
                "s"
            ].dataType
        )
        .alias("_lpay"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal time iff inclusive
    order = ["_t", "_is_left"] if inclusive else ["_t", F.desc("_is_left")]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_rlast", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_lpay.*"), F.col("_rlast").alias("_asof")
    )
    return out
