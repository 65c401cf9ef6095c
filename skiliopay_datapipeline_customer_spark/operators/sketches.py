"""Mergeable-sketch operators with exact-verify composition.

The pattern (shared with `selection.bloom_decontaminate`): a fixed-size
sketch prunes the corpus map-side, and an exact pass over the surviving
candidates restores EXACT semantics — so the declared queries stay
oracle-checkable while the heavy shuffle disappears.

Count-min sketch (Cormode & Muthukrishnan 2005) for heavy hitters: the
sketch is a d×w count grid — the groupBy shuffles AT MOST d·w distinct
keys no matter how many distinct tokens exist. A 100 TB corpus with
billions of distinct n-grams/URLs never pays a full-vocab shuffle; only
occurrences whose (overestimating) sketch count clears the threshold
reach the exact count, and CMS admits no underestimates, so every true
heavy hitter survives the prefilter — the final exact filter then
discards the sketch's false positives.

Hashes use the portable md5 kernel (`dedup.portable_hash64`) so DuckDB
could reproduce the grid bit-for-bit; the declared query's oracle is the
plain exact SQL, because the composition's RESULT is exact.

Reference provenance: the reference has no sketch tier (single-node
pandas counts, src/processing/etl_pipeline.py); this extends the engine
along SURVEY §2's aggregation family toward corpus-scale frequency
analysis.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, bucket, n) count-min grid over a token-occurrence frame.

    One explode (factor = depth) + one groupBy whose key space is bounded
    by depth·width — map-side partials collapse each partition to at most
    that many rows before the shuffle.
    """
    rows = tokens.select(
        F.col(token_col),
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("row"),
    ).select(
        "row",
        (
            portable_hash64(F.col(token_col), 0) + F.col("row") * portable_hash64(F.col(token_col), 1)
        ).alias("_h"),
    )
    return (
        rows.select("row", (F.pmod(F.col("_h"), F.lit(width))).alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    min_share: float,
    top_k: int,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """EXACT top-k tokens with count ≥ ceil(min_share · total), found via a
    CMS prefilter.

    1. Build the d×w sketch (bounded shuffle).
    2. Map-side per-occurrence estimate: d broadcast joins against the
       (≤ width)-row per-row grids, `least()` across rows. No underestimate
       ⇒ the kept set is a SUPERSET of the true heavy hitters.
    3. Exact groupBy over surviving occurrences only, exact threshold
       re-check, deterministic (count desc, token) top-k.

    The declared query's oracle is the plain exact top-k SQL — the sketch
    changes the plan, never the result (the salted_skew_join_counts
    discipline).

    The grand total is derived FROM the sketch (every grid row's bucket
    counts sum to the total occurrence count — each occurrence increments
    exactly one bucket per row), riding the plan as a broadcast 1-row
    frame. The r9 form spent a third full corpus scan on a standalone
    ``tokens.count()`` just for the threshold — at the 100 TB posture
    this module advertises, that was an avoidable extra read.
    """
    sketch = cms_sketch(tokens, token_col, depth, width)
    totals = sketch.filter(F.col("row") == 0).agg(F.sum("n").alias("_tot"))
    # greatest() skips nulls, so an empty corpus (null total) degrades to
    # threshold 1 instead of a null-poisoned filter
    threshold = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.col("_tot") * F.lit(float(min_share)))
    )
    grids = [
        F.broadcast(
            sketch.filter(F.col("row") == r).select(
                F.col("bucket").alias(f"b{r}"), F.col("n").alias(f"n{r}")
            )
        )
        for r in range(depth)
    ]
    h0 = portable_hash64(F.col(token_col), 0)
    h1 = portable_hash64(F.col(token_col), 1)
    occ = tokens.select(
        F.col(token_col),
        *[
            F.pmod(h0 + F.lit(r) * h1, F.lit(width)).alias(f"b{r}")
            for r in range(depth)
        ],
    )
    joined = reduce(lambda df, r: df.join(grids[r], f"b{r}"), range(depth), occ)
    estimate = F.least(*[F.col(f"n{r}") for r in range(depth)])
    survivors = (
        joined.crossJoin(F.broadcast(totals))
        .filter(estimate >= threshold)
        .select(token_col)
    )
    return (
        survivors.groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("n"))
        # the exact re-check joins totals onto the already-aggregated
        # (tiny) candidate frame — 1-row broadcast, not a corpus pass
        .crossJoin(F.broadcast(totals))
        .filter(F.col("n") >= threshold)
        .drop("_tot")
        .orderBy(F.col("n").desc(), F.col(token_col))
        .limit(top_k)
    )


def merge_sketches(sketches: list[DataFrame]) -> DataFrame:
    """Merge CMS grids built over disjoint slices: cell-wise sum.

    This is THE property that makes the sketch distributed- and
    streaming-friendly — per-partition/per-micro-batch grids union and
    re-aggregate to exactly the full-corpus grid (counts are additive per
    (row, bucket)), so an incremental pipeline folds each batch's
    fixed-size grid into a store instead of re-scanning history. The
    mergeability pytest pins exact equality with the one-pass sketch.
    """
    if not sketches:
        raise ValueError("merge_sketches needs at least one sketch")
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


__all__ = ["cms_heavy_hitters", "cms_sketch", "merge_sketches"]
