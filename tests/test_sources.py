"""Source-layer tests (S1/S3/S4-S6/S15; option-level S7/S8)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from skiliopay_datapipeline_customer_spark.io import table
from skiliopay_datapipeline_customer_spark.sources import (
    RateLimiter,
    fetch_paginated,
    latest_snapshot_path,
    read_csv,
    rest_to_dataframe,
    write_dated_snapshot,
    write_parquet,
)
from skiliopay_datapipeline_customer_spark.sources.jdbc import read_jdbc, write_jdbc


def test_csv_roundtrip_declared_schema(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").option("sep", "|").csv(csv_dir)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
            T.StructField("n_comment", T.StringType()),
        ]
    )
    back = read_csv(spark, csv_dir, schema, sep="|")
    assert back.count() == nation.count()
    assert dict(back.dtypes)["n_nationkey"] == "bigint"  # declared, not inferred
    assert back.select(F.sum("n_nationkey")).first()[0] == nation.select(
        F.sum("n_nationkey")
    ).first()[0]


def test_csv_from_json_schema(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("user_id,age\nU00001,30\nU00002,not_a_number\n")
    json_schema = {
        "properties": {"user_id": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["user_id"],
    }
    df = read_csv(spark, str(p), json_schema)
    rows = df.orderBy("user_id").collect()
    assert rows[0]["age"] == 30 and rows[1]["age"] is None  # PERMISSIVE null


def test_write_parquet_partitioned(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = write_parquet(
        orders, str(tmp_path / "orders.parquet"), partition_by=["order_year"]
    )
    assert not out.endswith(".parquet")  # suffix normalization
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: the filter must reach the scan as a PARTITION
    # filter (one directory scanned), not a post-scan Filter node
    pruned = back.filter(F.col("order_year") == 1998)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*order_year", plan), plan[:500]
    assert pruned.count() == orders.filter(F.year("o_orderdate") == 1998).count()


def _fake_api(n_records: int, page_size_cap: int = 100):
    def fetch(page: int, page_size: int) -> list[dict]:
        start = (page - 1) * page_size
        end = min(start + page_size, n_records)
        return [{"user_id": f"U{i:05d}", "value": float(i)} for i in range(start, end)]

    return fetch


def test_fetch_paginated_stops_on_short_page():
    batches = list(fetch_paginated(_fake_api(250), page_size=100))
    assert [len(b) for b in batches] == [100, 100, 50]
    # exact multiple: one extra empty-page probe terminates
    batches = list(fetch_paginated(_fake_api(200), page_size=100))
    assert [len(b) for b in batches] == [100, 100]


def test_rest_to_dataframe(spark):
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = rest_to_dataframe(spark, _fake_api(250), schema, page_size=100)
    assert df.count() == 250
    assert df.schema == schema


def test_rate_limiter_sliding_window():
    clock = {"t": 0.0}
    sleeps: list[float] = []

    def fake_clock():
        return clock["t"]

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    rl = RateLimiter(max_requests=3, window_s=60, clock=fake_clock, sleeper=fake_sleep)
    for _ in range(3):
        assert rl.wait() == 0.0
    rl.wait()  # 4th within window must block until the 1st expires
    assert sleeps and abs(sleeps[0] - 60.0) < 1e-9
    clock["t"] += 120  # window fully elapsed → free slot again
    assert rl.wait() == 0.0


def test_snapshot_discovery(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    base = str(tmp_path)
    for stamp in ("20260810", "20260812", "20260811"):
        write_dated_snapshot(nation, base, "churn_data", stamp)
    latest = latest_snapshot_path(base, "churn_data")
    assert latest is not None and latest.endswith("churn_data_20260812.parquet")
    assert spark.read.parquet(latest).count() == nation.count()
    assert latest_snapshot_path(base, "missing_prefix") is None


def test_jdbc_option_plumbing(spark, sf_dir):
    df = table(spark, sf_dir, "nation")
    writer = write_jdbc(
        df, "jdbc:postgresql://db/wh", "analytics.users", mode="replace", execute=False
    )
    assert writer is not None  # configured without touching a database
    reader = read_jdbc(
        spark,
        "jdbc:postgresql://db/wh",
        query="SELECT * FROM features WHERE user_id = 'U00001'",
        execute=False,
    )
    assert reader is not None
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:postgresql://db/wh", execute=False)


def test_config_env_substitution_and_dotted_get(tmp_path):
    from skiliopay_datapipeline_customer_spark.config import EngineConfig

    p = tmp_path / "cfg.yaml"
    p.write_text(
        """
database:
  host: "${DB_HOST:localhost}"
  port: ${DB_PORT:5432}
spark:
  shuffle_partitions: ${SHUFFLE:64}
  broadcast_threshold_mb: 32
  aqe: true
"""
    )
    cfg = EngineConfig.load(str(p), env={"DB_HOST": "warehouse.internal"})
    assert cfg.get("database.host") == "warehouse.internal"  # env wins
    assert cfg.get("database.port") == 5432  # default, parsed as int
    assert cfg.get("missing.key", "fallback") == "fallback"
    conf = cfg.spark_conf()
    assert conf["spark.sql.shuffle.partitions"] == "64"
    assert conf["spark.sql.autoBroadcastJoinThreshold"] == str(32 * 1024 * 1024)
    assert conf["spark.sql.adaptive.enabled"] == "true"


def test_rest_datasource_file_backed_pages(spark, tmp_path):
    """S4 executable path: spark.read.format('paged_rest') returns rows from
    a directory of JSON pages — pagination split across partitions, each with
    its share of the request budget (api_ingestion.py:111-150 semantics)."""
    import json

    from skiliopay_datapipeline_customer_spark.sources.rest import RestDataSource

    pages = tmp_path / "pages"
    pages.mkdir()
    # 7 pages of 10 + a short final page of 3 → 73 records
    for p in range(1, 8):
        rows = [{"uid": (p - 1) * 10 + i, "status": "ok"} for i in range(10)]
        (pages / f"page-{p}.json").write_text(json.dumps(rows))
    (pages / "page-8.json").write_text(
        json.dumps([{"uid": 70 + i, "status": "ok"} for i in range(3)])
    )

    spark.dataSource.register(RestDataSource)
    df = (
        spark.read.format("paged_rest")
        .option("schema_ddl", "uid int, status string")
        .option("pages_dir", str(pages))
        .option("total_pages", "12")  # declared > actual: short page stops
        .option("page_size", "10")
        .option("n_partitions", "3")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 73
    assert {r["uid"] for r in rows} == set(range(73))
    assert df.rdd.getNumPartitions() == 3


def test_rest_datasource_requires_fetcher(spark):
    from skiliopay_datapipeline_customer_spark.sources.rest import (
        RestDataSourceReader,
    )
    from pyspark.sql import types as T

    reader = RestDataSourceReader(
        T.StructType([T.StructField("x", T.IntegerType())]), {"total_pages": "2"}
    )
    with pytest.raises(ValueError, match="pages_dir.*base_url"):
        reader._make_fetcher()


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S7/S8 executed end-to-end on embedded Derby: replace/append/fail
    write modes + batchsize (data_warehouse.py:64-99) and query pushdown
    (:101-121)."""
    from pyspark.sql.utils import AnalysisException

    from skiliopay_datapipeline_customer_spark.sources.jdbc import (
        read_jdbc,
        write_jdbc,
    )

    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(0, 100).selectExpr("id", "id * 2.5 AS amount")

    write_jdbc(df, url, "tx", mode="replace", batchsize=25, properties=props)
    back = read_jdbc(spark, url, table="tx", properties=props)
    assert back.count() == 100
    assert {r["ID"] if "ID" in back.columns else r["id"] for r in back.collect()} == set(range(100))

    write_jdbc(df, url, "tx", mode="append", batchsize=25, properties=props)
    assert read_jdbc(spark, url, table="tx", properties=props).count() == 200

    with pytest.raises(AnalysisException):
        write_jdbc(df, url, "tx", mode="fail", properties=props)

    # replace drops + recreates (the reference's if_exists='replace')
    write_jdbc(df.limit(10), url, "tx", mode="replace", properties=props)
    assert read_jdbc(spark, url, table="tx", properties=props).count() == 10

    # pushdown: the WHERE executes in the database, not in Spark
    pushed = read_jdbc(
        spark,
        url,
        # Spark's Derby dialect creates case-sensitive quoted identifiers
        query='SELECT "id" FROM tx WHERE "id" < 5',
        properties=props,
    )
    assert pushed.count() == 5


def test_rest_stream_reader_incremental_pages(spark, tmp_path):
    """Streaming REST ingestion: the checkpointed offset is (page, tail) —
    last fully consumed page plus rows already taken from the next — so a
    second run with new pages emits ONLY the new rows (the reference's
    updated_since incremental pull, exactly-once). A SHORT page is emitted
    immediately (same totals as the batch tier); if it later fills, only
    the rows past the recorded tail are emitted — no replays, no loss."""
    import json

    from skiliopay_datapipeline_customer_spark.sources.rest import RestDataSource

    pages = tmp_path / "pages"
    pages.mkdir()

    def write_page(p, uids):
        (pages / f"page-{p}.json").write_text(
            json.dumps([{"uid": u} for u in uids])
        )

    write_page(1, [0, 1, 2, 3, 4])
    write_page(2, [5, 6, 7, 8, 9])

    spark.dataSource.register(RestDataSource)
    got: list[int] = []

    def run_once():
        stream = (
            spark.readStream.format("paged_rest")
            .option("schema_ddl", "uid int")
            .option("pages_dir", str(pages))
            .option("page_size", "5")
            .load()
        )
        q = (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(
                lambda df, _id: got.extend(r["uid"] for r in df.collect())
            )
            .start()
        )
        q.awaitTermination()

    run_once()
    assert sorted(got) == list(range(10))

    write_page(3, [10, 11, 12, 13, 14])
    write_page(4, [15, 16])  # short page: delivered, tail offset recorded
    run_once()
    assert sorted(got) == list(range(17))

    # the short page fills + a new short page appears: only NEW rows emit
    write_page(4, [15, 16, 17, 18, 19])
    write_page(5, [20])
    run_once()
    assert sorted(got) == list(range(21))
    assert len(got) == 21  # exactly-once: no replay of 15/16


def test_rest_stream_and_batch_tiers_agree_on_short_final_page(
    spark, tmp_path
):
    """A feed that ends on a short page (the normal case: total % page_size
    != 0) must ingest IDENTICAL totals through the batch reader and the
    stream reader — the divergence class where the stream silently dropped
    the final partial page."""
    import json

    from skiliopay_datapipeline_customer_spark.sources.rest import RestDataSource

    pages = tmp_path / "pages"
    pages.mkdir()
    total = 23  # 4 pages of 5 + short page of 3
    for p in range(5):
        uids = list(range(p * 5, min((p + 1) * 5, total)))
        (pages / f"page-{p + 1}.json").write_text(
            json.dumps([{"uid": u} for u in uids])
        )

    spark.dataSource.register(RestDataSource)
    batch_rows = (
        spark.read.format("paged_rest")
        .option("schema_ddl", "uid int")
        .option("pages_dir", str(pages))
        .option("page_size", "5")
        .option("total_pages", "10")
        .load()
        .collect()
    )
    got: list[int] = []
    stream = (
        spark.readStream.format("paged_rest")
        .option("schema_ddl", "uid int")
        .option("pages_dir", str(pages))
        .option("page_size", "5")
        .load()
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .foreachBatch(lambda df, _id: got.extend(r["uid"] for r in df.collect()))
        .start()
    )
    q.awaitTermination()
    assert sorted(r["uid"] for r in batch_rows) == list(range(total))
    assert sorted(got) == list(range(total))


class _PagesHandler:
    """Request handler factory serving /data?page=N&page_size=S as JSON."""

    def __new__(cls, records: list[dict]):
        import http.server
        import json
        import urllib.parse

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                page = int(qs.get("page", ["1"])[0])
                size = int(qs.get("page_size", ["100"])[0])
                body = json.dumps(
                    records[(page - 1) * size : page * size]
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet test output
                pass

        return Handler


@pytest.fixture()
def http_pages_server():
    """In-process HTTP server paginating 23 records (short final page)."""
    import http.server
    import threading

    records = [{"uid": u} for u in range(23)]
    server = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), _PagesHandler(records)
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/data"
    server.shutdown()
    thread.join(timeout=5)


def test_http_fetcher_real_get(http_pages_server):
    """S4 over real HTTP: stdlib urllib against an in-process server —
    same pagination/termination contract as the file-backed fetcher."""
    from skiliopay_datapipeline_customer_spark.sources.rest import (
        fetch_paginated,
        http_fetcher,
    )

    fetch = http_fetcher(http_pages_server)
    batches = list(fetch_paginated(fetch, page_size=5))
    assert [len(b) for b in batches] == [5, 5, 5, 5, 3]
    assert [r["uid"] for b in batches for r in b] == list(range(23))


def test_rest_datasource_over_http(spark, http_pages_server):
    """The partition-parallel DataSource fetching over real HTTP via the
    base_url option: executors build their own urllib fetchers."""
    from skiliopay_datapipeline_customer_spark.sources.rest import RestDataSource

    spark.dataSource.register(RestDataSource)
    rows = (
        spark.read.format("paged_rest")
        .option("schema_ddl", "uid int")
        .option("base_url", http_pages_server)
        .option("page_size", "5")
        .option("total_pages", "10")
        .option("n_partitions", "3")
        .load()
        .collect()
    )
    assert sorted(r["uid"] for r in rows) == list(range(23))


def test_rest_datasource_writer_two_phase_commit(spark, tmp_path):
    """df.write.format('paged_rest') POSTs staged batches from executors;
    the driver commit publishes exactly the winning tasks' tokens — staged
    rows from an uncommitted (simulated loser) token never become visible."""
    import http.server
    import json
    import threading
    import urllib.request

    staged: dict[str, list] = {}
    visible: list = []
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n))
            with lock:
                if "stage" in payload:
                    staged[payload["stage"]] = payload["rows"]
                elif "commit" in payload:
                    for t in payload["commit"]:
                        visible.extend(staged.pop(t, []))
                elif "abort" in payload:
                    for t in payload["abort"]:
                        staged.pop(t, None)
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *args):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}/ingest"
    try:
        from skiliopay_datapipeline_customer_spark.sources.rest import (
            RestDataSource,
        )

        spark.dataSource.register(RestDataSource)
        # a rogue staged batch nobody commits (a lost task attempt)
        urllib.request.urlopen(
            urllib.request.Request(
                url,
                data=json.dumps(
                    {"stage": "loser", "rows": [{"uid": 999}]}
                ).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            ),
            timeout=5,
        ).read()

        df = spark.range(57).selectExpr("CAST(id AS INT) AS uid").repartition(3)
        (
            df.write.format("paged_rest")
            .option("base_url", url)
            .option("batch_size", "10")
            .option("n_partitions", "3")
            .mode("append")
            .save()
        )
        with lock:
            assert sorted(r["uid"] for r in visible) == list(range(57))
            assert staged == {"loser": [{"uid": 999}]}  # never published
    finally:
        server.shutdown()


def test_read_csv_corrupt_record_capture_and_failfast(spark, tmp_path):
    """PERMISSIVE + corrupt_col quarantines unparseable lines VERBATIM
    (typed columns null, raw line captured); FAILFAST raises on the same
    file — the strict-gate alternative."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from skiliopay_datapipeline_customer_spark.sources.csv import read_csv

    p = os.path.join(tmp_path, "dirty.csv")
    with open(p, "w") as f:
        f.write("id,amount\n1,10.5\nnot_an_int,oops\n3,7.25\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = read_csv(spark, p, schema, corrupt_col="_raw")
    rows = df.collect()
    good = [r for r in rows if r["_raw"] is None]
    bad = [r for r in rows if r["_raw"] is not None]
    assert {r["id"] for r in good} == {1, 3}
    assert len(bad) == 1 and bad[0]["_raw"] == "not_an_int,oops"
    assert bad[0]["id"] is None

    import pytest as _pytest

    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_csv(spark, p, schema, mode="FAILFAST").collect()


def test_freshness_report_flags_stale_and_missing_layers(spark, sf_dir, tmp_path):
    """check_daily_data twin: newest stamp + rows per layer; stale layers
    flagged against the expected stamp; empty layers report missing."""
    from skiliopay_datapipeline_customer_spark.sources.snapshots import (
        freshness_report,
        write_dated_snapshot,
    )

    raw = str(tmp_path / "raw")
    proc = str(tmp_path / "processed")
    os.makedirs(proc)
    docs = table(spark, sf_dir, "region")
    write_dated_snapshot(docs, raw, "churn_data", "20240101")
    write_dated_snapshot(docs, raw, "churn_data", "20240102")
    report = {
        r["layer"]: r
        for r in freshness_report(
            spark,
            {"raw": (raw, "churn_data"), "processed": (proc, "churn_proc")},
            expected_stamp="20240102",
        )
    }
    assert report["raw"]["latest_stamp"] == "20240102"
    assert report["raw"]["fresh"] and report["raw"]["rows"] == docs.count()
    assert not report["processed"]["fresh"] and report["processed"]["rows"] == 0
    # expected newer than anything landed -> stale
    stale = {
        r["layer"]: r["fresh"]
        for r in freshness_report(
            spark, {"raw": (raw, "churn_data")}, expected_stamp="20240103"
        )
    }
    assert stale == {"raw": False}


def test_http_fetcher_retries_transient_errors_then_succeeds():
    """5xx responses retry with backoff; the page arrives on a later
    attempt; 4xx (non-404) fails immediately without retries."""
    import http.server
    import json as _json
    import threading
    import urllib.error

    import pytest as _pytest

    from skiliopay_datapipeline_customer_spark.sources.rest import http_fetcher

    hits = {"n": 0}

    class Flaky(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits["n"] += 1
            if "fail4xx" in self.path:
                self.send_response(403)
                self.end_headers()
                return
            if hits["n"] < 3:  # two 503s, then success
                self.send_response(503)
                self.end_headers()
                return
            body = _json.dumps([{"id": 1}]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Flaky)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}/api"
        sleeps = []
        fetch = http_fetcher(base, max_retries=2, sleeper=sleeps.append)
        assert fetch(1, 10) == [{"id": 1}]
        assert hits["n"] == 3 and sleeps == [0.5, 1.0]  # exponential
        # non-transient 4xx: no retries, immediate raise
        hits["n"] = 10
        fetch4 = http_fetcher(base + "?fail4xx=1", max_retries=2, sleeper=sleeps.append)
        before = hits["n"]
        with _pytest.raises(urllib.error.HTTPError):
            fetch4(1, 10)
        assert hits["n"] == before + 1
    finally:
        srv.shutdown()


def test_jsonl_roundtrip_with_corrupt_quarantine(spark, sf_dir, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources.textcorpus import (
        quarantine_corrupt,
        read_jsonl,
        write_jsonl,
    )

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    # plant a damaged shard (truncated write + binary damage)
    with open(os.path.join(out, "part-damaged.json"), "w", encoding="utf-8") as f:
        f.write('{"doc_id": 99999, "text": "trunca\n')
        f.write("\x00\x01 not json at all\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    clean, bad = quarantine_corrupt(read_jsonl(spark, out, schema))
    assert bad.count() == 2
    assert {r["raw_line"][:1] for r in bad.collect()} == {"{", "\x00"}
    # clean side round-trips exactly (same rows, same values)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == orig
    assert "_corrupt_record" not in clean.columns


def test_read_jsonl_does_not_mutate_caller_schema(spark, sf_dir, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources.textcorpus import (
        read_jsonl,
        write_jsonl,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "docs_schema")
    write_jsonl(docs, out)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("lang", T.StringType())]
    )
    before = schema.fieldNames()
    read_jsonl(spark, out, schema)
    # StructType.add mutates in place; read_jsonl must build a copy so the
    # caller can reuse the same schema object (second reader, writer, diff)
    assert schema.fieldNames() == before
    again = read_jsonl(spark, out, schema)
    assert again.columns.count("_corrupt_record") == 1


def test_jsonl_gzip_readback(spark, sf_dir, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources.textcorpus import (
        quarantine_corrupt,
        read_jsonl,
        write_jsonl,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "docs_gz")
    write_jsonl(docs, out, compression="gzip")
    assert any(p.endswith(".gz") for p in os.listdir(out))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("lang", T.StringType())]
    )
    clean, bad = quarantine_corrupt(read_jsonl(spark, out, schema))
    assert bad.count() == 0
    assert clean.count() == docs.count()


def test_text_docs_whole_file_and_lines(spark, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources.textcorpus import (
        read_text_docs,
        read_text_lines,
    )

    d = tmp_path / "raw"
    d.mkdir()
    (d / "a.txt").write_text("first doc\nsecond line")
    (d / "b.txt").write_text("solo")
    docs = read_text_docs(spark, str(d)).collect()
    by_path = {os.path.basename(r["doc_path"]): r["text"] for r in docs}
    assert by_path == {"a.txt": "first doc\nsecond line", "b.txt": "solo"}
    lines = {r["line"] for r in read_text_lines(spark, str(d)).collect()}
    assert lines == {"first doc", "second line", "solo"}


def test_orc_roundtrip_pushdown_and_partitioning(spark, sf_dir, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources import read_orc, write_orc

    orders = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = write_orc(
        orders, str(tmp_path / "orders.orc"), partition_by=["order_year"]
    )
    assert not out.endswith(".orc")  # suffix normalization, like write_parquet
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    assert back.select(F.sum("o_totalprice")).first()[0] == pytest.approx(
        orders.select(F.sum("o_totalprice")).first()[0]
    )
    # same scan-time guarantees as parquet: a value filter reaches the ORC
    # stripe reader as PushedFilters, a partition-column filter prunes
    # directories instead of scanning them. Asserted through plan_digest —
    # the one place the suite parses explain output — so a Spark upgrade
    # that changes plan-string spellings breaks ONE audited helper loudly
    # instead of ad-hoc regexes over the private executedPlan() API.
    from skiliopay_datapipeline_customer_spark.plans.report import plan_digest

    assert (
        plan_digest(back.filter(F.col("o_orderpriority") == "1-URGENT"))[
            "pushed_filters"
        ]
        >= 1
    )
    pruned = back.filter(F.col("order_year") == 1998)
    assert plan_digest(pruned)["partition_filters"] >= 1
    # negative control: an unfiltered scan of the same partitioned layout
    # must NOT count (guards the isnotnull/noise exclusion in the digest)
    assert plan_digest(back)["partition_filters"] == 0
    assert pruned.count() == orders.filter(F.col("order_year") == 1998).count()


def test_orc_declared_schema_from_json_dict(spark, tmp_path):
    from skiliopay_datapipeline_customer_spark.sources import read_orc, write_orc

    src = spark.createDataFrame(
        [("U00001", 30), ("U00002", 41)], "user_id string, age int"
    )
    out = write_orc(src, str(tmp_path / "users.orc"))
    json_schema = {
        "properties": {"user_id": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["user_id"],
    }
    back = read_orc(spark, out, json_schema)
    assert dict(back.dtypes)["age"] in ("int", "bigint")  # declared contract
    assert {r["user_id"] for r in back.collect()} == {"U00001", "U00002"}
