"""Corpus sampling operators for training-data pipelines.

Data-mixing and quality-gating stages every large-scale corpus build needs
(the reference stops at a single-table deterministic sample,
src/processing/etl_pipeline.py:235-244; these generalize it to per-stratum
rates and per-group exact quantile gates at 100 TB shapes):

- :func:`hash_bucket` / :func:`stratified_sample` — deterministic Bernoulli
  sampling with per-stratum target rates (language/source mixing). The keep
  decision is a pure function of the row id (md5-derived bucket), so a
  re-run — or the DuckDB oracle — selects the identical rows: no RNG state,
  no partition-placement dependence, trivially reproducible across engines
  and cluster sizes.
- :func:`group_top_fraction` — keep the top ``num/den`` fraction of each
  group under a total order (per-language quality-quantile gate). Exact and
  scale-safe: ranks come from the two-pass range-partitioned rank (no
  single-task window even when one stratum dominates the corpus), and the
  threshold test is integer arithmetic — no float percentile boundary to
  diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranks import global_rank_distributed


def hash_bucket(col, salt: str = "mix", modulus: int = 100):
    """Deterministic engine-portable bucket in ``[0, modulus)``: first 8 hex
    chars of md5(salt ':' id) — DuckDB computes the identical value with
    ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % modulus``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % modulus
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    salt: str = "mix",
    modulus: int = 100,
    bucket_out: str | None = "mix_bucket",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff its hash
    bucket < the stratum's target rate (percent when ``modulus=100``).

    Unknown strata get rate 0 (dropped) — mixing is an allowlist. Scale
    posture: one narrow projection + filter, no shuffle, no RNG; the same
    row set survives on 1 executor or 1000.
    """
    rate = F.lit(0)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(int(r))).otherwise(rate)
    bucket = hash_bucket(F.col(id_col), salt=salt, modulus=modulus)
    out = df
    if bucket_out:
        out = out.withColumn(bucket_out, bucket)
        return out.filter(F.col(bucket_out) < rate)
    return out.filter(bucket < rate)


def group_top_fraction(
    df: DataFrame,
    part_col: str,
    score_col: str,
    id_col: str,
    num: int = 1,
    den: int = 4,
) -> DataFrame:
    """Keep the top ``num/den`` fraction of each ``part_col`` group by
    ``score_col`` descending (ties broken by ``id_col`` — a total order, so
    the kept set is deterministic).

    A row survives iff its within-group percent_rank ``(rank-1)/(n-1)``
    ≤ ``num/den``, tested as ``(rank-1)*den <= (n-1)*num`` — integer
    arithmetic, immune to float-boundary drift between engines.

    Plan shape: one range-repartitioned two-pass global rank over
    ``(group, -score, id)`` (:func:`~.ranks.global_rank_distributed` — range
    boundaries split a dominant stratum across many partitions, unlike a
    ``Window.partitionBy(group)`` sort which would put 60 % of a 100 TB
    corpus in one task), then a metadata-sized per-group (min-rank, count)
    broadcast; within-group rank = global rank − group's min rank + 1.
    """
    order = [F.col(part_col), (F.col(score_col), "desc"), F.col(id_col)]
    ranked = global_rank_distributed(df, order, rank_col="_gr")
    base = ranked.groupBy(part_col).agg(
        F.min("_gr").alias("_base"), F.count(F.lit(1)).alias("_n")
    )
    return (
        ranked.join(F.broadcast(base), part_col)
        .filter(
            (F.col("_gr") - F.col("_base")) * F.lit(int(den))
            <= (F.col("_n") - 1) * F.lit(int(num))
        )
        .drop("_gr", "_base", "_n")
    )


def hash_order_key(col, salt: str = "order"):
    """Deterministic engine-portable 60-bit sort key: first 15 hex chars of
    md5(salt ':' id) — DuckDB mirrors it with
    ``CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard",
    order_salt: str = "order",
) -> DataFrame:
    """Deterministic global shuffle + shard layout for training-data writes:
    (id, shard, pos) where ``shard`` is an md5 bucket of the id and ``pos``
    is the row's 1-based position within its shard under a SECOND salted
    hash order. Reading shards sequentially therefore yields a reproducible
    pseudo-random permutation of the corpus — the "global shuffle" training
    epochs need, without any RNG state or partition-placement dependence
    (re-runs and the DuckDB oracle produce the identical layout).

    Plan shape: the per-shard position comes from ONE range-partitioned
    two-pass global rank over (shard, order_key, id) plus a broadcast of
    per-shard min ranks — not a ``Window.partitionBy(shard)`` sort, which
    would funnel each shard (corpus_size / n_shards rows, gigabytes at
    100 TB) through a single task.
    """
    keyed = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), salt=salt, modulus=n_shards)
        .cast("int")
        .alias("shard"),
        hash_order_key(F.col(id_col), salt=order_salt).alias("_ok"),
    )
    ranked = global_rank_distributed(
        keyed, [F.col("shard"), F.col("_ok"), F.col(id_col)], rank_col="_gr"
    )
    base = ranked.groupBy("shard").agg(F.min("_gr").alias("_base"))
    return (
        ranked.join(F.broadcast(base), "shard")
        .select(
            id_col,
            "shard",
            (F.col("_gr") - F.col("_base") + 1).alias("pos"),
        )
    )


def group_capped_sample(
    df: DataFrame,
    part_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Cap each ``part_col`` group at ``cap`` rows, chosen by a salted md5
    hash order of ``id_col`` — the domain-balancing pass of a training-data
    pipeline (downsample overrepresented sources without favoring any
    contiguous id range). Deterministic: re-runs and the SQL oracle select
    the identical rows.

    Plan shape: one range-partitioned two-pass global rank over
    ``(group, hash_key, id)`` (:func:`~.ranks.global_rank_distributed`)
    plus a metadata-sized per-group min-rank broadcast; a giant source
    spreads across many range partitions instead of funneling through one
    ``Window.partitionBy(source)`` task.
    """
    keyed = df.withColumn("_ok", hash_order_key(F.col(id_col), salt=salt))
    ranked = global_rank_distributed(
        keyed, [F.col(part_col), F.col("_ok"), F.col(id_col)], rank_col="_gr"
    )
    base = ranked.groupBy(part_col).agg(F.min("_gr").alias("_base"))
    return (
        ranked.join(F.broadcast(base), part_col)
        .filter(F.col("_gr") - F.col("_base") < F.lit(int(cap)))
        .drop("_ok", "_gr", "_base")
    )


def weighted_sample_keys(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    salt: str = "es",
    key_out: str = "_wkey",
) -> DataFrame:
    """Efraimidis–Spirakis A-Res keys for weighted sampling WITHOUT
    replacement: key = u^(1/w) with u a deterministic md5-derived uniform in
    (0, 1); the k rows with the LARGEST keys are a weighted-without-
    replacement sample of size k. No RNG state — re-runs and the SQL oracle
    compute identical keys, so the selected set is reproducible across
    engines and cluster sizes.

    Scale posture: the key is one map-side expression; the top-k then comes
    from a sort-limit (per-partition top-k + merge — TakeOrderedAndProject,
    no global shuffle of the full corpus, no window).
    """
    # (md5 60-bit int + 1) / (2^60 + 1) ∈ (0, 1) exclusive on both ends
    u = (hash_order_key(F.col(id_col), salt=salt) + 1) / F.lit(
        float(2**60 + 1)
    )
    return df.withColumn(
        key_out, F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    )
