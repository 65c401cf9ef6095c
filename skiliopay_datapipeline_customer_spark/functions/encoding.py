"""Categorical encoders with stable, reference-compatible naming.

Reference parity: F15 one-hot (`pd.get_dummies`,
src/processing/feature_engineering.py:257-260 — named dummy columns like
``country_VN``), F16 ordinal label encoding (sklearn LabelEncoder's
sorted-classes order, src/processing/feature_engineering.py:246-256).

Scale notes: the category list is either declared (best: no extra scan) or
discovered with ONE distinct aggregation (a tiny shuffle on a low-cardinality
column). The expansion itself is pure Column expressions — no UDF, no pivot
shuffle, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def one_hot_columns(col: str, categories: list[str], prefix: str | None = None) -> list[Column]:
    """0/1 indicator Column per category, named ``<prefix>_<value>``."""
    prefix = prefix if prefix is not None else col
    return [
        F.when(F.col(col) == cat, 1).otherwise(0).alias(f"{prefix}_{cat}")
        for cat in categories
    ]


def discover_categories(
    df: DataFrame, col: str, max_categories: int = 10_000
) -> list[str]:
    """Distinct values, sorted — LabelEncoder's class order. One small agg.

    Guarded like the similarity exact tier: a vocabulary past
    ``max_categories`` means the column isn't an enum and the driver-side
    collect (and the when-chain / dummy-column expansion it feeds) would
    degenerate — raise loudly and point at the unbounded-cardinality tier
    instead of quietly building a 10^6-column frame."""
    rows = df.select(col).distinct().limit(max_categories + 1).collect()
    if len(rows) > max_categories:
        raise ValueError(
            f"discover_categories({col!r}): more than {max_categories} "
            "distinct values — not an enum column. Pass an explicit "
            "`categories` list or use functions.encoding.hashed_features "
            "(the unbounded-cardinality encoder)."
        )
    return sorted(r[0] for r in rows if r[0] is not None)


def one_hot_encode(
    df: DataFrame,
    col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
    drop_input: bool = True,
) -> DataFrame:
    """get_dummies-equivalent: append one 0/1 column per category."""
    cats = categories if categories is not None else discover_categories(df, col)
    keep = [c for c in df.columns if not (drop_input and c == col)]
    return df.select(*keep, *one_hot_columns(col, cats, prefix))


def label_encode(
    df: DataFrame, col: str, categories: list[str] | None = None, out: str | None = None
) -> DataFrame:
    """Ordinal encode by sorted class order (LabelEncoder semantics).

    Implemented as a when-chain over the (small) sorted category list —
    no StringIndexer model fit, no extra job beyond optional discovery.
    """
    cats = categories if categories is not None else discover_categories(df, col)
    out = out or f"{col}_encoded"
    if not cats:
        # all-NULL column: no classes, every row encodes to NULL (a bare
        # lit has no .otherwise, so the chain below needs ≥1 when-branch)
        return df.withColumn(out, F.lit(None).cast("int"))
    chain = F.when(F.col(col) == cats[0], 0)
    for i, cat in enumerate(cats[1:], start=1):
        chain = chain.when(F.col(col) == cat, i)
    return df.withColumn(out, chain.otherwise(F.lit(None).cast("int")))


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out: str = "te",
    smoothing: float = 0.0,
    prior: float | None = None,
) -> DataFrame:
    """Leave-one-out target (mean) encoding — the high-cardinality
    alternative to one-hot: each row gets its category's target mean
    computed WITHOUT the row itself, (sum - y) / (n - 1), so the encoding
    never leaks the row's own label into its feature (the classic
    target-leak the naive groupBy-mean join has). Optional additive
    smoothing toward the global prior: (sum - y + s·prior) / (n - 1 + s) —
    singleton categories (n=1) come out as the prior when smoothing > 0,
    NULL otherwise.

    Scale: one groupBy on the category (map-side partial sums), the
    per-category frame joins back — dimension-table-sized against the fact,
    so AQE broadcasts it; the LOO arithmetic is map-only. The global prior
    (when smoothing without an explicit prior) is one scalar agg.
    """
    stats = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col).cast("double")).alias("_tsum"),
        F.count(target_col).alias("_tn"),
    )
    joined = df.join(stats, cat_col, "left")
    y = F.col(target_col).cast("double")
    if smoothing > 0:
        if prior is None:
            prior = df.agg(F.avg(F.col(target_col).cast("double"))).first()[0]
        enc = (F.col("_tsum") - y + F.lit(smoothing * prior)) / (
            F.col("_tn") - 1 + F.lit(smoothing)
        )
    else:
        enc = F.when(
            F.col("_tn") > 1, (F.col("_tsum") - y) / (F.col("_tn") - 1)
        )
    return joined.withColumn(out, enc).drop("_tsum", "_tn")


def hashed_features(
    df: DataFrame,
    cols: list[str],
    num_buckets: int = 16,
    salt: str = "fh",
    out_prefix: str = "fh",
) -> DataFrame:
    """Hashing-trick encoder (feature hashing): each (column, value) pair
    hashes to one of ``num_buckets`` counters with a ±1 sign bit, giving a
    FIXED-width numeric representation independent of category cardinality
    — the 100 TB answer to one-hot over unbounded vocabularies (no
    discovery pass, no vocabulary broadcast, collisions average out under
    the signed sum).

    Buckets/signs derive from md5 (engine-portable, same idiom as
    `operators/sampling.hash_bucket`) — bucket from hex chars 1-8, sign
    from the parity of chars 9-10 — so a SQL oracle reproduces the exact
    layout. Map-only: one expression per (input col), no shuffle, no state.
    """
    # bucket AND sign come from one md5 digest (chars 1-8 / 9-10), so the
    # expression is inlined rather than composed from sampling.hash_bucket
    # (which exposes only the bucket half); the hex layout must stay in sync
    # with the SQL oracle in queries/features.py.
    outputs = []
    for b in range(num_buckets):
        terms = []
        for c in cols:
            h = F.md5(F.concat(F.lit(f"{salt}:{c}:"), F.col(c).cast("string")))
            bucket = (
                F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
                % num_buckets
            )
            sign = F.when(
                F.conv(F.substring(h, 9, 2), 16, 10).cast("long") % 2 == 0, 1
            ).otherwise(-1)
            terms.append(F.when(bucket == b, sign).otherwise(0))
        col_sum = terms[0]
        for t in terms[1:]:
            col_sum = col_sum + t
        outputs.append(col_sum.cast("long").alias(f"{out_prefix}_{b}"))
    return df.select(*df.columns, *outputs)
