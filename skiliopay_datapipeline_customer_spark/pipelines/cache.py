"""Checkpoint cache with TTL (C1/C2 — src/utils/cache_manager.py:24-205).

The reference caches pickled pandas frames keyed by
md5(operation, data-hash, params) with per-operation TTLs (24 h feature
engineering, 1 h predictions). The engine's equivalent is a parquet
checkpoint table per key: the "data hash" becomes an explicit
``input_version`` token (source path + mtime, table snapshot version, batch
id...) because content-hashing 100 TB to probe a cache would cost more than
the compute it saves — the version token is the scalable contract.

Hit path: one parquet read (no recompute). Miss path: run the thunk, write
the checkpoint, return the re-read frame (so downstream plans read the
materialized files rather than recompute the lineage — same effect as the
reference returning the cached object).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointCache:
    def __init__(self, cache_dir: str, default_ttl: float = 24 * 3600):
        self.cache_dir = cache_dir
        self.default_ttl = default_ttl
        self.stats = {"hits": 0, "misses": 0, "sets": 0, "invalidations": 0}
        os.makedirs(cache_dir, exist_ok=True)

    def _key(self, operation: str, input_version: str, params: dict | None) -> str:
        blob = json.dumps(
            {"op": operation, "v": input_version, "p": params or {}}, sort_keys=True
        )
        return hashlib.md5(blob.encode()).hexdigest()

    def _paths(self, key: str) -> tuple[str, str]:
        base = os.path.join(self.cache_dir, key)
        return os.path.join(base, "data"), os.path.join(base, "meta.json")

    def get(
        self,
        spark: SparkSession,
        operation: str,
        input_version: str,
        params: dict | None = None,
    ) -> DataFrame | None:
        data, meta = self._paths(self._key(operation, input_version, params))
        if not os.path.exists(meta):
            self.stats["misses"] += 1
            return None
        with open(meta) as f:
            info = json.load(f)
        if time.time() - info["created"] > info["ttl"]:
            self.stats["misses"] += 1
            self.invalidate(operation, input_version, params)
            return None
        self.stats["hits"] += 1
        return spark.read.parquet(data)

    def put(
        self,
        df: DataFrame,
        operation: str,
        input_version: str,
        params: dict | None = None,
        ttl: float | None = None,
    ) -> None:
        data, meta = self._paths(self._key(operation, input_version, params))
        df.write.mode("overwrite").parquet(data)
        with open(meta, "w") as f:
            json.dump(
                {
                    "created": time.time(),
                    "ttl": self.default_ttl if ttl is None else ttl,
                    "op": operation,
                },
                f,
            )
        self.stats["sets"] += 1

    def get_or_compute(
        self,
        spark: SparkSession,
        operation: str,
        input_version: str,
        compute,
        params: dict | None = None,
        ttl: float | None = None,
    ) -> DataFrame:
        """C2 decorator semantics as a call: cache hit or compute+store."""
        cached = self.get(spark, operation, input_version, params)
        if cached is not None:
            return cached
        df = compute()
        self.put(df, operation, input_version, params, ttl)
        data, _ = self._paths(self._key(operation, input_version, params))
        return spark.read.parquet(data)

    def invalidate(
        self, operation: str, input_version: str, params: dict | None = None
    ) -> None:
        base = os.path.join(self.cache_dir, self._key(operation, input_version, params))
        if os.path.isdir(base):
            shutil.rmtree(base)
            self.stats["invalidations"] += 1
