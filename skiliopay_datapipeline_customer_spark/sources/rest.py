"""REST API source with rate limiting (S4-S6).

Reference parity: paginated GET generator
(src/ingestion/api_ingestion.py:111-150), single page (:152-164), sliding
window RateLimiter N req/60 s (:207-239).

Two tiers:
- ``rest_to_dataframe``: driver-side fetch → createDataFrame with a declared
  schema — correct for the reference's scale (one daily snapshot) and for
  any API whose total payload fits one machine.
- ``RestDataSource``: Spark 4 Python DataSource — page ranges are split
  across partitions so executors fetch in parallel, each throttled by its
  own limiter sized to fleet_size (global budget / partitions). This is the
  100 TB-adjacent path (many pages, many executors); register with
  ``spark.dataSource.register(RestDataSource)`` and read via
  ``spark.read.format("paged_rest")``.

Fetchers are injected callables (page_index -> list[dict]). Two in-tree
implementations: ``pages_dir`` reads JSON page files; ``base_url`` does real
HTTP GETs via stdlib urllib (``{base_url}?page=N&page_size=S`` returning a
JSON array — the reference's requests.get params shape,
api_ingestion.py:111-150). Both share identical pagination / termination /
rate-limit behavior. Python DataSources are pickled by module reference —
ship the package to workers (``--py-files`` / pip on the cluster image),
the standard Python-dependency deployment.
"""

from __future__ import annotations

import time
from collections import deque
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PageFetcher = Callable[[int, int], list[dict]]  # (page, page_size) -> records


def file_backed_fetcher(pages_dir: str) -> PageFetcher:
    """A PageFetcher reading ``{pages_dir}/page-{n}.json`` (a JSON array of
    records per page). The in-tree executable stand-in for an HTTP adapter —
    same signature, same termination contract (missing file → empty page);
    the deployment swaps in ``requests.get(...).json()`` one-for-one.
    """
    import json
    import os

    def fetch(page: int, page_size: int) -> list[dict]:
        path = os.path.join(pages_dir, f"page-{page}.json")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    return fetch


def http_fetcher(
    base_url: str,
    timeout: float = 10.0,
    max_retries: int = 2,
    backoff_s: float = 0.5,
    sleeper=None,
) -> PageFetcher:
    """A PageFetcher doing real HTTP GETs with stdlib urllib (no extra
    deps): ``GET {base_url}?page=N&page_size=S``, expecting a JSON array of
    records — the reference's paginated-GET contract
    (src/ingestion/api_ingestion.py:111-150, params {'page': n,
    'page_size': s}). A 404 terminates pagination like a missing page file.
    TRANSIENT failures (HTTP 5xx/429, socket timeouts, connection errors)
    retry up to ``max_retries`` times with exponential backoff — the
    hardening the reference's bare ``session.get`` lacks; non-transient
    HTTP errors (other 4xx) propagate immediately. ``sleeper`` injects the
    delay function for delay-free tests."""
    import json
    import time
    import urllib.error
    import urllib.parse
    import urllib.request

    sleep = sleeper or time.sleep

    def fetch(page: int, page_size: int) -> list[dict]:
        qs = urllib.parse.urlencode({"page": page, "page_size": page_size})
        sep = "&" if "?" in base_url else "?"
        url = f"{base_url}{sep}{qs}"
        for attempt in range(max_retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return []
                transient = e.code >= 500 or e.code == 429
                if not transient or attempt == max_retries:
                    raise
            except (urllib.error.URLError, TimeoutError):
                if attempt == max_retries:
                    raise
            sleep(backoff_s * (2**attempt))
        raise AssertionError("unreachable")

    return fetch


def _fetcher_from_options(options) -> PageFetcher:
    """Shared option → fetcher resolution for the batch and stream readers:
    ``pages_dir`` (file-backed) or ``base_url`` (stdlib HTTP)."""
    pages_dir = options.get("pages_dir")
    if pages_dir:
        return file_backed_fetcher(pages_dir)
    base_url = options.get("base_url")
    if base_url:
        return http_fetcher(
            base_url, timeout=float(options.get("http_timeout", "10"))
        )
    raise ValueError(
        "paged_rest needs a pages_dir (file-backed pages) or base_url "
        "(stdlib-urllib HTTP) option; custom clients bind via subclassing"
    )


class RateLimiter:
    """Sliding-window limiter: at most ``max_requests`` per ``window_s``
    (api_ingestion.py:207-239 semantics)."""

    def __init__(self, max_requests: int = 100, window_s: float = 60.0, clock=time.monotonic, sleeper=time.sleep):
        self.max_requests = max_requests
        self.window_s = window_s
        self._times: deque[float] = deque()
        self._clock = clock
        self._sleep = sleeper

    def wait(self) -> float:
        """Block until a request slot is free; returns seconds slept."""
        slept = 0.0
        now = self._clock()
        while self._times and now - self._times[0] >= self.window_s:
            self._times.popleft()
        if len(self._times) >= self.max_requests:
            delay = self.window_s - (now - self._times[0])
            if delay > 0:
                self._sleep(delay)
                slept = delay
            now = self._clock()
            while self._times and now - self._times[0] >= self.window_s:
                self._times.popleft()
        self._times.append(self._clock())
        return slept


def fetch_paginated(
    fetch_page: PageFetcher,
    page_size: int = 100,
    limiter: RateLimiter | None = None,
    max_pages: int | None = None,
) -> Iterator[list[dict]]:
    """Generator of record batches; stops on the first short/empty page
    (api_ingestion.py:111-150 termination rule)."""
    page = 1
    while max_pages is None or page <= max_pages:
        if limiter is not None:
            limiter.wait()
        batch = fetch_page(page, page_size)
        if not batch:
            return
        yield batch
        if len(batch) < page_size:
            return
        page += 1


def rest_to_dataframe(
    spark: SparkSession,
    fetch_page: PageFetcher,
    schema: T.StructType,
    page_size: int = 100,
    limiter: RateLimiter | None = None,
    max_pages: int | None = None,
) -> DataFrame:
    """Driver-side ingestion: all pages → one DataFrame (declared schema,
    no inference). Fine for snapshot-sized APIs; see RestDataSource for
    partition-parallel fetch."""
    records: list[dict] = []
    for batch in fetch_paginated(fetch_page, page_size, limiter, max_pages):
        records.extend(batch)
    return spark.createDataFrame(records, schema)


try:  # Spark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _PageRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class RestDataSourceReader(DataSourceReader):
        def __init__(self, schema, options):
            self.schema_ = schema
            self.options = options
            self.total_pages = int(options.get("total_pages", "1"))
            self.page_size = int(options.get("page_size", "100"))
            self.n_partitions = int(options.get("n_partitions", "4"))
            self.req_per_min = int(options.get("requests_per_minute", "100"))

        def partitions(self):
            per = max(1, -(-self.total_pages // self.n_partitions))
            return [
                _PageRange(s, min(s + per, self.total_pages))
                for s in range(0, self.total_pages, per)
            ]

        def read(self, partition):
            # Executors re-create the fetcher from options. In-tree the
            # fetcher is file-backed (``pages_dir`` option); a real HTTP
            # adapter binds here via subclassing and builds its client the
            # same way. Per-partition limiter gets an equal share of the
            # global request budget so the FLEET respects the API's quota.
            fetcher = self._make_fetcher()
            limiter = RateLimiter(
                max_requests=max(1, self.req_per_min // self.n_partitions)
            )
            fields = [f.name for f in self.schema_.fields]
            for page in range(partition.start + 1, partition.end + 1):
                limiter.wait()
                batch = fetcher(page, self.page_size)
                if not batch:
                    return  # past the last page of this range
                for rec in batch:
                    yield tuple(rec.get(name) for name in fields)
                if len(batch) < self.page_size:
                    return  # short page = final page (api_ingestion.py rule)

        def _make_fetcher(self) -> PageFetcher:
            return _fetcher_from_options(self.options)

    try:
        from pyspark.sql.datasource import SimpleDataSourceStreamReader
    except ImportError:  # pragma: no cover
        SimpleDataSourceStreamReader = None  # type: ignore[assignment]

    if SimpleDataSourceStreamReader is not None:

        class RestStreamReader(SimpleDataSourceStreamReader):
            """Incremental paginated ingestion as a STREAM: the offset is
            ``{"page": P, "tail": K}`` — P fully-consumed pages plus the
            first K rows of page P+1 — so each micro-batch reads only rows
            that appeared since: the reference's ``updated_since``
            incremental pull (src/ingestion/api_ingestion.py:53-78) with
            exactly-once bookkeeping from the checkpoint instead of ad-hoc
            state files.

            The row-level ``tail`` is what lets a SHORT page be delivered
            immediately (same totals as the batch tier, which emits short
            pages) without giving up exactly-once on a growing feed: if the
            short page later fills, the next batch re-reads it and emits
            only rows past the recorded tail. Replays
            (``readBetweenOffsets``) re-fetch the same page/row range
            deterministically — pages are append-only by contract.
            """

            def __init__(self, schema, options):
                self.schema_ = schema
                self.options = options
                self.page_size = int(options.get("page_size", "100"))
                self.fields = [f.name for f in schema.fields]

            def _fetcher(self) -> PageFetcher:
                return _fetcher_from_options(self.options)

            def initialOffset(self):
                return {"page": 0, "tail": 0}

            def read(self, start):
                fetch = self._fetcher()
                page = start["page"] + 1
                skip = int(start.get("tail", 0))
                rows: list[tuple] = []
                while True:
                    batch = fetch(page, self.page_size)
                    rows.extend(
                        tuple(rec.get(n) for n in self.fields)
                        for rec in batch[skip:]
                    )
                    if len(batch) < self.page_size:
                        # short (or empty) page: emit what's new, record a
                        # row-level offset into it
                        end = {"page": page - 1, "tail": len(batch)}
                        break
                    page += 1
                    skip = 0
                return iter(rows), end

            def readBetweenOffsets(self, start, end):
                fetch = self._fetcher()
                sp, st = start["page"], int(start.get("tail", 0))
                ep, et = end["page"], int(end.get("tail", 0))
                rows: list[tuple] = []
                for page in range(sp + 1, ep + 1):
                    batch = fetch(page, self.page_size)
                    skip = st if page == sp + 1 else 0
                    rows.extend(
                        tuple(rec.get(n) for n in self.fields)
                        for rec in batch[skip:]
                    )
                if et:
                    batch = fetch(ep + 1, self.page_size)
                    skip = st if ep == sp else 0
                    rows.extend(
                        tuple(rec.get(n) for n in self.fields)
                        for rec in batch[skip:et]
                    )
                return iter(rows)

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _RestCommit(WriterCommitMessage):
        def __init__(self, tokens: list[str], rows: int):
            self.tokens = tokens
            self.rows = rows

    class RestDataSourceWriter(DataSourceWriter):
        """Partition-parallel REST EXPORT with a two-phase commit — the
        reverse of the paginated reader (the reference only ingests;
        publishing scored rows back to a service is the natural sink twin).

        Exactly-once over a non-transactional API: each partition POSTs its
        row batches STAGED under fresh tokens and returns them in its commit
        message; the driver's ``commit()`` publishes exactly the winning
        task attempts' tokens in one request (Spark hands commit() one
        message per task — a retried/speculative loser's staged tokens are
        never published, and ``abort()`` voids everything staged). The
        server flips staged → visible atomically on the commit POST.

        Scale posture: executors write in parallel with per-partition rate
        budgets (global quota / ``n_partitions``, like the reader); batches
        of ``batch_size`` rows bound request payloads; the driver-side
        commit carries tokens only (metadata-sized).

        Rate-budget contract: unlike the reader (which creates exactly
        ``n_partitions`` splits itself), the writer runs one task per
        DataFrame partition — set ``n_partitions`` to match (e.g.
        ``df.repartition(n)`` + ``option('n_partitions', n)``) or the
        aggregate request rate exceeds ``requests_per_minute`` by the
        mismatch factor.
        """

        def __init__(self, schema, options):
            self.fields = [f.name for f in schema.fields]
            self.base_url = options["base_url"]
            self.batch_size = int(options.get("batch_size", "100"))
            self.req_per_min = int(options.get("requests_per_minute", "100"))
            self.n_partitions = int(options.get("n_partitions", "4"))

        def _post(self, payload: dict) -> None:
            import json
            import urllib.request

            req = urllib.request.Request(
                self.base_url,
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=10.0) as resp:
                resp.read()

        def write(self, iterator):
            import uuid

            limiter = RateLimiter(
                max_requests=max(1, self.req_per_min // self.n_partitions)
            )
            tokens: list[str] = []
            total = 0
            batch: list[dict] = []

            def flush():
                nonlocal batch, total
                if not batch:
                    return
                token = uuid.uuid4().hex
                limiter.wait()
                self._post({"stage": token, "rows": batch})
                tokens.append(token)
                total += len(batch)
                batch = []

            for row in iterator:
                batch.append({n: row[n] for n in self.fields})
                if len(batch) >= self.batch_size:
                    flush()
            flush()
            return _RestCommit(tokens, total)

        def commit(self, messages):
            self._post(
                {"commit": [t for m in messages if m for t in m.tokens]}
            )

        def abort(self, messages):
            self._post(
                {"abort": [t for m in messages if m for t in m.tokens]}
            )

    class RestDataSource(DataSource):
        @classmethod
        def name(cls):
            return "paged_rest"

        def schema(self):
            return self.options.get(
                "schema_ddl", "page int, payload string"
            )

        def reader(self, schema):
            return RestDataSourceReader(schema, self.options)

        def simpleStreamReader(self, schema):
            if SimpleDataSourceStreamReader is None:  # pragma: no cover
                raise NotImplementedError("streaming needs pyspark >= 4")
            return RestStreamReader(schema, self.options)

        def writer(self, schema, overwrite):
            if overwrite:
                # append-only sink: the staging/commit protocol publishes
                # NEW tokens; it carries no truncate signal, so honoring
                # mode('overwrite') silently as append would duplicate the
                # dataset server-side. Refuse loudly instead.
                raise NotImplementedError(
                    "paged_rest writer is append-only; use mode('append')"
                )
            return RestDataSourceWriter(schema, self.options)

except ImportError:  # pragma: no cover - older pyspark
    RestDataSource = None  # type: ignore[assignment]
    RestDataSourceReader = None  # type: ignore[assignment]
