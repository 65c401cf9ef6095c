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
    # right rows sort before left rows at equal time iff inclusive; among
    # right rows tied on (key, time) the GREATEST payload struct wins —
    # without the _rpay tiebreak the carried row is partition-placement-
    # dependent (last() under a ROWS frame sees an arbitrary tie order).
    # Callers with map-typed (unorderable) payloads must pre-dedup ties.
    order = (
        ["_t", "_is_left", "_rpay"]
        if inclusive
        else ["_t", F.desc("_is_left"), "_rpay"]
    )
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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the SMALL side into `salt_buckets`
    replicas, salt the big side's key pseudo-randomly, join on (key, salt).

    SURVEY §7.4: keys like `country` (5 values, churn_schema.json:17) hot-spot
    a hash join — one task gets a fifth of 100 TB. Salting bounds any task at
    ~1/salt_buckets of a hot key. AQE's skew-join split handles moderate skew
    at runtime; explicit salting is for keys KNOWN to be degenerate, where
    replicating the small side is cheaper than re-splitting gigantic
    partitions after the fact.

    The salt on the big side derives from xxhash64 over the whole row's key +
    a per-row uniform; using a hash (not rand()) keeps the join deterministic
    and retry-safe (rand() breaks task-retry idempotence mid-shuffle).
    """
    if how not in ("inner", "left"):
        # the right side is replicated salt_buckets times: an unmatched
        # right row would surface once PER REPLICA under right/full outer
        raise ValueError("salted_join supports how='inner'/'left'")
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    right_rep = right.withColumn("_salt", salts)
    left_salted = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
        ).cast("int"),
    )
    out = left_salted.join(right_rep, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def interval_containment_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start: str,
    end: str,
    bin_micros: int = 86_400_000_000,
    how: str = "inner",
) -> DataFrame:
    """Range join: each point row matched to every interval (same ``key``)
    whose ``[start, end]`` (inclusive, epoch-micros columns) contains its
    ``point_time``.

    Scale posture — time-bin bucketing turns the theta join into an
    equi-join: intervals explode to the bins they cover
    (``sequence(start/g, end/g)``), points compute their single bin, the
    join runs hash-partitioned on ``(key, bin)`` and the exact BETWEEN
    predicate filters inside each bucket. A point's one bin is covered by
    every containing interval exactly once, so no post-dedup is needed.
    Without the bin, a heavy key with n points and m intervals compares
    n·m pairs in one task; with it, candidates are bounded per (key, bin)
    and skew splits across bins. Pick ``bin_micros`` near the typical
    interval length: much smaller explodes interval rows, much larger
    degrades toward the per-key cross product.
    """
    if how not in ("inner", "left"):
        # the interval side is bin-exploded: an unmatched interval would
        # surface once PER COVERED BIN under right/full outer joins
        raise ValueError("interval_containment_join supports how='inner'/'left'")
    g = F.lit(int(bin_micros))
    # explicit aliases: both sides often derive from the same scan (e.g.
    # sessions and purchases both cut from the events table), and
    # same-lineage attribute references resolve ambiguously in a self-join
    exploded = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start) / g).cast("long"), (F.col(end) / g).cast("long")
            )
        ),
    ).alias("_iv")
    pts = points.withColumn(
        "_bin", (F.col(point_time) / g).cast("long")
    ).alias("_pt")
    cond = (
        (F.col(f"_pt.{key}") == F.col(f"_iv.{key}"))
        & (F.col("_pt._bin") == F.col("_iv._bin"))
        & (F.col(f"_pt.{point_time}") >= F.col(f"_iv.{start}"))
        & (F.col(f"_pt.{point_time}") <= F.col(f"_iv.{end}"))
    )
    iv_payload = [
        c for c in intervals.columns if c != key
    ]
    return pts.join(exploded, cond, how).select(
        *[F.col(f"_pt.{c}") for c in points.columns if c != "_bin"],
        *[F.col(f"_iv.{c}") for c in iv_payload],
    )
