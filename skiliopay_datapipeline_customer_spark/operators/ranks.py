"""Scale-safe exact global ranking and quantile bucketing.

The parity-exact forms (`functions.churn_features.quantile_bucket`,
`queries.windows.rfm_quintiles`) use `row_number`/`ntile` over a global
`Window.orderBy(...)` with no partitioning — Spark funnels the whole table
through ONE task. That replicates the reference's pandas semantics
(src/processing/feature_engineering.py:89-98 ranks the full frame) and is
fine at fixture scale, but it is the first thing that dies at 100 TB.

This module is the distributed tier: exact global rank via
range-partitioning — the same mechanism Spark's own `orderBy` uses for
total ordering — plus per-partition row numbers and broadcast prefix
offsets. No single task ever sees more than one range partition; the only
global structure is the per-partition count frame (#partitions rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefix_offsets(parts: DataFrame, agg_expr, pid_col: str = "_pid") -> DataFrame:
    """Exclusive prefix offsets per range partition as a broadcast-ready
    #partitions-row frame, computed IN the same plan as the main pass.

    Staying in-plan is a correctness requirement, not a style choice:
    `repartitionByRange` samples its range boundaries per job, so a separate
    driver-side job (collect counts, prefix-sum in Python) sees DIFFERENT
    partition boundaries than the main pass — measured: two back-to-back
    count-by-pid jobs over the same 15k-row table disagreed on every
    partition. Inside one plan the exchange is computed once and reused.

    The running sum is a TRIANGULAR SELF-JOIN over the metadata-sized
    aggregate frame (one row per range partition): offset(p) = Σ agg(p') for
    p' < p. Quadratic in #partitions — P²/2 comparisons is microscopic for
    any real P — and entirely window-free, so Spark's 'No Partition Defined
    for Window' WARN (which we grep bench logs for to catch REAL single-task
    windows; a constant partitionBy would be stripped by Spark 4's
    EliminateWindowPartitions rule and still warn) never fires."""
    return _prefix_offsets_multi(parts, {"": agg_expr}, pid_col).withColumnRenamed(
        "_offset_", "_offset"
    )


def global_rank_distributed(
    df: DataFrame,
    order_exprs: list,
    rank_col: str = "_rank",
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Exact 1-based global rank under a TOTAL order, no single-task sort.

    Plan shape: repartitionByRange on the order key (deterministic range
    boundaries) → per-partition `row_number` (parallel windows keyed by
    `spark_partition_id`) → broadcast join of cumulative per-partition
    counts → rank = prefix offset + local row number.

    `order_exprs` must define a total order (include a unique tiebreak
    column) or ranks within ties are partition-placement-dependent.

    ``pin=True`` (the DEFAULT) localCheckpoints the range-partitioned
    frame BEFORE the offsets/window branches fork, freezing `_pid` in
    data. The lazy form (pin=False) relies on the planner REUSING the
    range exchange across both branches; over join-derived lineage the
    planner can decline — each branch then re-samples range boundaries
    and AQE may coalesce the two shuffles differently, keying offsets
    against the wrong `_pid` population (measured r9 on
    dsir_deciles_distributed at sf0.1: duplicate/gapped ranks, tile sizes
    430–559 where every tile is exactly 500 — while the SAME code was
    green at sf0.01, so "reuse held so far" is session/size luck, not a
    guarantee). Correctness-first default: every consumer pins; the pin
    is one row per ranked entity and the ContextCleaner releases it with
    the result. pin=False remains for callers that have verified their
    exchange reuse and need to avoid the materialization (none in-tree).
    At 100 TB the pin doubles the rank pass's I/O — the planned
    refinement is expression-derived bucket ids (approx_percentile
    boundaries collected once, `_pid` computed as a pure CASE expression
    of the key, no sampling coupling at all).
    """
    from pyspark.sql import Window

    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(nparts, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    if pin:
        parts = parts.localCheckpoint(eager=True)
    # one value per range partition — metadata-sized, prefix-summed on the
    # driver (no global-order window anywhere in the plan)
    offsets = _prefix_offsets(parts, F.count(F.lit(1)))
    local_w = Window.partitionBy("_pid").orderBy(*order_exprs)
    return (
        parts.withColumn("_local", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col,
            (F.coalesce(F.col("_offset"), F.lit(0)) + F.col("_local")).cast("long"),
        )
        .drop("_pid", "_local", "_offset")
    )


def global_cumsum_distributed(
    df: DataFrame,
    order_exprs: list,
    value_col: str,
    out: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` under a TOTAL order —
    same two-pass shape as :func:`global_rank_distributed`, with per-
    partition VALUE sums as the broadcast prefix offsets instead of counts.
    """
    return global_cumsums_distributed(
        df, order_exprs, {value_col: out}, num_partitions=num_partitions
    )


def global_cumsums_distributed(
    df: DataFrame,
    order_exprs: list,
    cols: dict[str, str],
    num_partitions: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Exact inclusive running sums of SEVERAL value columns under one TOTAL
    order, in ONE range pass — ``cols`` maps value column → output column.

    One pass for k cumsums is not just cheaper, it is a CORRECTNESS
    requirement when the cumsums feed each other's frame: `_pid` is only
    consistent between the offsets frame and the main pass while both hang
    off the SAME repartitionByRange exchange (reused in-plan). NESTING two
    single-column calls re-shuffles the first call's output — and under a
    foreign session's planner the nested exchanges stopped being reused, so
    the second call's offsets keyed `_pid` against DIFFERENT range
    boundaries than its main pass (measured: the KS ecdf query returned a
    different, wrong sup-distance per session). A single multi-column pass
    has exactly one exchange, so the NESTED failure mode cannot exist —
    and since r9, ``pin=True`` (default) localCheckpoints the partitioned
    frame so even the un-nested offsets/main fork cannot diverge when the
    planner declines exchange reuse (the rank twin measured exactly that
    at sf0.1; see :func:`global_rank_distributed`).
    """
    from pyspark.sql import Window

    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(nparts, *order_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    if pin:
        parts = parts.localCheckpoint(eager=True)
    # per-partition value sums, prefix-accumulated in partition order — the
    # same left-to-right add order the windowed form uses, so the IEEE
    # result is identical, without the single-partition window
    offsets = _prefix_offsets_multi(
        parts, {o: F.sum(vc) for vc, o in cols.items()}
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    result = parts
    for vc, o in cols.items():
        result = result.withColumn(f"_local_{o}", F.sum(vc).over(local_w))
    result = result.join(F.broadcast(offsets), "_pid")
    drop = ["_pid"]
    for vc, o in cols.items():
        # sum-of-sums has the same dtype as the per-partition sum
        zero = F.lit(0).cast(offsets.schema[f"_offset_{o}"].dataType)
        result = result.withColumn(
            o,
            F.coalesce(F.col(f"_offset_{o}"), zero) + F.col(f"_local_{o}"),
        )
        drop += [f"_local_{o}", f"_offset_{o}"]
    return result.drop(*drop)


def _prefix_offsets_multi(
    parts: DataFrame, agg_exprs: dict, pid_col: str = "_pid"
) -> DataFrame:
    """:func:`_prefix_offsets` for several aggregates at once — one
    triangular self-join over the metadata-sized per-partition frame yields
    ``_offset_<name>`` per entry (same in-plan requirement)."""
    sizes = parts.groupBy(pid_col).agg(
        *[e.alias(f"_pagg_{n}") for n, e in agg_exprs.items()]
    )
    prior = sizes.select(
        F.col(pid_col).alias("_prior_pid"),
        *[F.col(f"_pagg_{n}").alias(f"_prior_{n}") for n in agg_exprs],
    )
    return (
        sizes.join(prior, F.col("_prior_pid") < F.col(pid_col), "left")
        .groupBy(pid_col)
        .agg(
            *[
                F.sum(f"_prior_{n}").alias(f"_offset_{n}")
                for n in agg_exprs
            ]
        )
    )


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_exprs: list,
    pack_col: str = "pack_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing for training-data assembly: assign each document to
    a fixed-token-budget pack by its cumulative-token START OFFSET under a
    declared total order — ``pack = floor((cumsum - tokens) / budget)``.

    Offset-based assignment (not greedy bin packing): a document straddling
    a budget boundary stays in the pack its offset starts in, so packs can
    overflow by at most one document — the deterministic, shuffle-once form
    (greedy first-fit resets a running remainder per pack, which is a
    sequential dependence no partition-parallel plan can express; trainers
    that need hard caps truncate the straddler downstream). Entirely
    SQL-expressible → oracle-checkable.
    """
    cum = global_cumsum_distributed(
        df, order_exprs, token_col, out="_cs", num_partitions=num_partitions
    )
    pack = F.floor((F.col("_cs") - F.col(token_col)) / F.lit(budget)).cast("long")
    return cum.withColumn(pack_col, pack).drop("_cs")


def quantile_bucket_distributed(
    df: DataFrame,
    col: str,
    labels: list[int],
    ascending: bool,
    q: int = 5,
    tiebreak: str = "user_id",
    out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-pass scale-safe twin of `quantile_bucket` (rank+qcut semantics,
    feature_engineering.py:89-98): pass 1 computes the exact global rank via
    `global_rank_distributed`; pass 2 buckets each rank against the linear-
    interpolation quantile edges of ranks 1..n,

        edge_k = 1 + (n - 1) * (k / q),   k = 1 .. q-1   (right-closed)

    — the same edges pandas' ``Series(1..n).quantile(linspace(0,1,q+1))``
    interpolates. Edges are scalar IEEE expressions, so an ANSI-SQL oracle
    evaluating the identical formula is bit-compatible.

    Keeps `quantile_bucket`'s degenerate-cardinality guard: fewer than 2
    distinct values → constant fill label; q clamps to the distinct count.

    Single-action plan: n / countDistinct ride along as a broadcast 1-row
    cross join instead of a separate eager ``.first()`` job, so one action
    computes stats + rank + buckets (the eager form cost an extra full scan
    and job per call — measured 3× on the sf0.1 bench).
    """
    out = out or f"{col}_q"
    order = [
        F.col(col).asc() if ascending else F.col(col).desc(),
        F.col(tiebreak).asc(),
    ]
    # 1-row stats frame, joined lazily — no separate driver job
    stats = df.agg(
        F.countDistinct(col).alias("_u"),
        F.count(F.lit(1)).alias("_n"),
    )
    ranked = global_rank_distributed(
        df, order, rank_col="_rank", num_partitions=num_partitions
    ).crossJoin(F.broadcast(stats))
    # effective q = min(q, distinct count), evaluated in-plan; the k-th edge
    # term only fires while k < eq, so extra CASE terms vanish for low-
    # cardinality columns. Edge arithmetic (1.0 + (n-1) * (k/eq), doubles)
    # matches the oracle's literal form bit-for-bit.
    eq = F.least(F.lit(q), F.col("_u")).cast("double")
    n1 = (F.col("_n") - F.lit(1)).cast("double")
    bucket = F.lit(1)
    for k in range(1, q):
        edge = F.lit(1.0) + n1 * (F.lit(float(k)) / eq)
        bucket = bucket + (
            (F.lit(k) < F.col("_u")) & (F.col("_rank") > edge)
        ).cast("int")
    # element_at(full labels, bucket) == element_at(labels[:eq], bucket)
    # because bucket <= eq and the slice is a prefix
    label_arr = F.array(*[F.lit(x) for x in labels])
    fill = labels[0] if ascending else labels[-1]
    return ranked.withColumn(
        out,
        F.when(F.col("_u") < 2, F.lit(fill)).otherwise(
            F.element_at(label_arr, bucket)
        ),
    ).drop("_rank", "_u", "_n")


def ntile_distributed(
    df: DataFrame,
    order_exprs: list,
    q: int,
    out: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(q)`` with no single-task global window.

    Pass 1: range-partitioned exact global rank
    (:func:`global_rank_distributed`). Pass 2: the closed-form NTILE
    bucket from (rank, n) — SQL semantics put the remainder rows in the
    FIRST buckets (sizes differ by at most one, larger first), which is
    NOT the Bresenham spread of ``floor((r-1)·q/n)+1``; with
    a = n div q, b = n mod q:

        r ≤ b·(a+1)  →  bucket = floor((r−1)/(a+1)) + 1
        otherwise    →  bucket = b + floor((r − b·(a+1) − 1)/a) + 1

    Matches Spark's and DuckDB's ntile for EVERY (n, q), including q > n
    (then a = 0, b = n, and every row takes the first branch with
    bucket = r) — property-tested against the window form across the
    (n, q) grid in ``tests/test_selection.py``. ``order_exprs`` must be a
    total order (unique tiebreak), same contract as the rank.

    Ranks come from ``global_rank_distributed(..., pin=True)``: ntile
    inputs are typically join-derived (scores joined to metadata), the
    lineage shape where the rank's two branches can re-execute the range
    exchange with different sampled boundaries / AQE coalescing — pin
    freezes `_pid` in data (see the rank's docstring; measured failure on
    dsir_deciles_distributed at sf0.1)."""
    ranked = global_rank_distributed(
        df, order_exprs, rank_col="_r", num_partitions=num_partitions, pin=True
    )
    stats = ranked.agg(F.count(F.lit(1)).alias("_n"))
    ranked = ranked.crossJoin(F.broadcast(stats))
    bucket = _ntile_bucket(F.col("_r"), F.col("_n"), q)
    return ranked.withColumn(out, bucket.cast("int")).drop("_r", "_n")


def _ntile_bucket(r, n, q: int):
    """Closed-form SQL NTILE bucket from (1-based rank r, group size n)."""
    a = F.floor(n / q)
    b = n % q
    head = b * (a + 1)
    return F.when(r <= head, F.floor((r - 1) / (a + 1)) + 1).otherwise(
        b + F.floor((r - head - 1) / a) + 1
    )


def grouped_ntile_distributed(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    q: int,
    out: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(q) OVER (PARTITION BY group ORDER BY ...)`` with no
    single-task window even when ONE group dominates the table (the 60 %
    language of a 100 TB corpus) — the shape the per-lang CCNet split
    needs at scale.

    One pinned range pass ordered by (group, order...): groups are then
    CONTIGUOUS in the global rank, so the within-group rank is
    ``global_rank − min(global_rank of the group) + 1`` and the bucket is
    the same closed-form NTILE arithmetic on (group rank, group size).
    Group stats are a |groups|-row broadcast. A dominant group spans many
    range partitions — no task ever holds a whole group.
    """
    group_order = [F.col(c).asc() for c in group_cols] + list(order_exprs)
    ranked = global_rank_distributed(
        df, group_order, rank_col="_r", num_partitions=num_partitions, pin=True
    )
    stats = ranked.groupBy(*group_cols).agg(
        F.min("_r").alias("_base"), F.count(F.lit(1)).alias("_n")
    )
    joined = ranked.join(F.broadcast(stats), group_cols)
    rg = F.col("_r") - F.col("_base") + 1
    bucket = _ntile_bucket(rg, F.col("_n"), q)
    return joined.withColumn(out, bucket.cast("int")).drop("_r", "_base", "_n")
