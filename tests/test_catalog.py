"""Catalog DDL operator tests (S9-S13) against a temp warehouse dir."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.io import table
from skiliopay_datapipeline_customer_spark.sources.catalog import (
    analyze_table,
    backup_table,
    create_table,
    index_equivalent_layout,
    table_info,
)


@pytest.fixture(scope="module")
def catalog_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS engine_test")
    yield "engine_test"
    spark.sql("DROP DATABASE IF EXISTS engine_test CASCADE")


def test_create_analyze_info_backup(spark, sf_dir, catalog_db):
    nation = table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").saveAsTable(f"{catalog_db}.nation_t")

    create_table(
        spark,
        f"{catalog_db}.metrics",
        "user_id STRING, score DECIMAL(5,3), ts TIMESTAMP",
    )
    info = table_info(spark, f"{catalog_db}.metrics")
    assert ("score", "decimal(5,3)") in [(c[0], c[1]) for c in info.columns]
    assert info.row_count == 0

    analyze_table(spark, f"{catalog_db}.nation_t", columns=["n_nationkey"])
    info = table_info(spark, f"{catalog_db}.nation_t")
    assert info.row_count == nation.count()

    backup = backup_table(spark, f"{catalog_db}.nation_t", "20260813")
    assert spark.table(backup).count() == nation.count()


def test_index_equivalent_layout_row_group_skipping(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    path = index_equivalent_layout(
        orders, ["o_orderstatus"], str(tmp_path / "orders_idx")
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # the filter column reaches the scan as a pushed filter
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the column must appear INSIDE the PushedFilters list — the bare plan
    # string always contains 'o_orderstatus' via the Filter/scan columns
    import re

    assert re.search(r"PushedFilters: \[[^\]]*o_orderstatus", plan), plan[:500]
    assert (
        back.filter(F.col("o_orderstatus") == "F").count()
        == orders.filter(F.col("o_orderstatus") == "F").count()
    )


def test_bucketed_join_avoids_shuffle(spark, sf_dir, catalog_db):
    from skiliopay_datapipeline_customer_spark.sources.catalog import write_bucketed

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    spark.sql("USE engine_test")
    try:
        write_bucketed(orders, "orders_b", ["o_custkey"], n_buckets=8)
        write_bucketed(
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            "customer_b",
            ["o_custkey"],
            n_buckets=8,
        )
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        # bucketed-side joins must not shuffle: disable broadcast to force
        # the SMJ path, then assert no Exchange appears in the final plan
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(cb, "o_custkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:2000]
            assert joined.count() == orders.join(
                customer, orders.o_custkey == customer.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("USE default")


def test_zorder_layout_narrows_rowgroup_stats_on_both_columns(spark, tmp_path):
    """Z-ordered files keep parquet min/max footprints narrow for BOTH curve
    columns (skipping works for predicates on either), where a plain
    single-column sort leaves the second column's per-file range at full
    width (no skipping possible)."""
    import pyarrow.parquet as pq
    import glob as _glob

    from skiliopay_datapipeline_customer_spark.sources.catalog import (
        zorder_layout,
    )

    df = (
        spark.range(0, 50_000)
        .withColumn("x", (F.xxhash64("id", F.lit(1)) % 100_000).cast("double"))
        .withColumn("y", (F.xxhash64("id", F.lit(2)) % 100_000).cast("double"))
    )

    def avg_coverage(path, col):
        spans, lo, hi = [], None, None
        for f in _glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        st = c.statistics
                        spans.append((st.min, st.max))
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        return sum(b - a for a, b in spans) / len(spans) / (hi - lo)

    zpath = str(tmp_path / "zorder")
    zorder_layout(df, ["x", "y"], zpath, max_records_per_file=2_000)
    zx, zy = avg_coverage(zpath, "x"), avg_coverage(zpath, "y")

    spath = str(tmp_path / "xsort")
    (
        df.repartitionByRange(8, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 2_000)
        .parquet(spath)
    )
    sx, sy = avg_coverage(spath, "x"), avg_coverage(spath, "y")

    # x-sort: perfect on x, useless on y
    assert sx < 0.1 and sy > 0.8
    # z-order: substantially narrow on BOTH dimensions
    assert zx < 0.5 and zy < 0.5
    assert zy < sy / 2


def test_zorder_layout_handles_empty_frame(spark, tmp_path):
    """An empty input writes an empty (readable) layout instead of
    crashing on the NULL percentile stats."""
    from skiliopay_datapipeline_customer_spark.sources.catalog import (
        zorder_layout,
    )

    df = (
        spark.range(0)
        .withColumn("x", F.col("id").cast("double"))
        .withColumn("y", F.col("id").cast("double"))
    )
    path = str(tmp_path / "empty_z")
    zorder_layout(df, ["x", "y"], path)
    assert spark.read.parquet(path).count() == 0


def test_compact_small_files_preserves_content(spark, tmp_path):
    """Compaction collapses a many-small-files directory to the byte-sized
    target count with identical content; sort_cols restores zone-map
    locality during the rewrite."""
    from skiliopay_datapipeline_customer_spark.sources.catalog import (
        compact_small_files,
    )

    path = str(tmp_path / "frag")
    df = spark.range(0, 20_000).withColumn("v", F.col("id") % 97)
    df.repartition(40).write.parquet(path)  # 40 tiny files

    before = spark.read.parquet(path)
    checksum = before.agg(F.sum("id"), F.sum("v")).first()

    stats = compact_small_files(
        spark, path, target_file_bytes=10**12, sort_cols=["v", "id"]
    )
    assert stats["files_before"] == 40 and stats["files_after"] == 1

    after = spark.read.parquet(path)
    assert after.count() == 20_000
    assert after.agg(F.sum("id"), F.sum("v")).first() == checksum


def test_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    """100 TB posture: a date-partitioned layout + a literal day predicate
    must prune at PLANNING time — the scan's PartitionFilters carry the
    predicate and only the matching day directories are read."""
    import os

    from pyspark.sql import functions as F

    from skiliopay_datapipeline_customer_spark.io import table

    path = str(tmp_path / "events_by_day")
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    n_days = len([d for d in os.listdir(path) if d.startswith("day=")])
    assert n_days > 1

    scan = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the day predicate is a PARTITION filter (planning-time pruning),
    # not a post-scan row filter
    assert "PartitionFilters" in plan and "2024-01-05" in plan
    want = ev.filter(F.col("day") == "2024-01-05").count()
    assert want > 0 and scan.count() == want


def test_schema_evolution_merge_read(spark, tmp_path):
    """Landing zones evolve: a later day adds a column. mergeSchema reads
    the union schema, nulls where the old files lack the column — and the
    declared-schema read path stays pruned to the requested columns."""
    import os

    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(
        os.path.join(p, "day=2024-01-01")
    )
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS a", "id * 3 AS b"
    ).write.parquet(os.path.join(p, "day=2024-01-02"))

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b", "day"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[0] == (0, None) and rows[7] == (14, 21)

    # declared-schema read prunes to the requested data columns on BOTH
    # vintages (partition discovery still appends the directory column)
    narrow = spark.read.schema("id long, a long").parquet(p)
    assert narrow.count() == 10
    assert set(narrow.columns) == {"id", "a", "day"}


def test_write_with_bloom_emits_parquet_bloom_metadata(spark, sf_dir, tmp_path):
    """Bloom filters land in the parquet column metadata (offset recorded),
    and the bloom-indexed file answers point lookups identically."""  # noqa: D401
    from skiliopay_datapipeline_customer_spark.sources.catalog import (
        write_with_bloom,
    )

    def _bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    orders = table(spark, sf_dir, "orders").coalesce(1)
    path = str(tmp_path / "orders_bloom")
    write_with_bloom(orders, path, ["o_orderkey"], ndv=100_000)
    plain = str(tmp_path / "orders_plain")
    orders.write.mode("overwrite").parquet(plain)
    # identical rows; the bloom sidecar is the only size delta (this
    # pyarrow build doesn't expose bloom_filter_offset to inspect directly)
    assert _bytes(path) > _bytes(plain)
    assert spark.read.parquet(path).count() == orders.count()
    key = orders.select("o_orderkey").first()[0]
    got = spark.read.parquet(path).filter(F.col("o_orderkey") == key).count()
    want = orders.filter(F.col("o_orderkey") == key).count()
    assert got == want > 0


def test_backfill_partitions_overwrites_only_touched_days(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: re-running one day replaces exactly that
    day; other partitions keep their original content."""
    from skiliopay_datapipeline_customer_spark.sources.catalog import (
        backfill_partitions,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.to_date("ts").alias("day")
    )
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").limit(3).collect()]
    base = ev.filter(F.col("day").isin(days))
    path = str(tmp_path / "events_by_day")
    base.write.mode("overwrite").partitionBy("day").parquet(path)
    before = spark.read.parquet(path).groupBy("day").count().collect()
    # backfill day[1] with doubled values; a STATIC overwrite would drop the
    # other two partitions
    fix = base.filter(F.col("day") == days[1]).withColumn(
        "value", F.col("value") * 2
    )
    backfill_partitions(fix, path, "day")
    after = spark.read.parquet(path)
    assert {r["day"] for r in after.select("day").distinct().collect()} == set(days)
    assert (
        after.filter(F.col("day") == days[0]).agg(F.sum("value")).first()[0]
        == base.filter(F.col("day") == days[0]).agg(F.sum("value")).first()[0]
    )
    doubled = after.filter(F.col("day") == days[1]).agg(F.sum("value")).first()[0]
    orig = base.filter(F.col("day") == days[1]).agg(F.sum("value")).first()[0]
    assert abs(doubled - 2 * orig) < 1e-6
    assert {(r["day"], r["count"]) for r in after.groupBy("day").count().collect()} == {
        (r["day"], r["count"]) for r in before
    }
