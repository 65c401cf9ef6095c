"""Declared-query registry — the t2 correctness surface.

Every implemented operator from SURVEY.md §2 registers here as a named query
(a ``(spark, sf_dir) -> DataFrame`` callable) together with the ANSI-SQL
oracle DuckDB runs over the same parquet tables. The driver compares
row-count + schema + order-insensitive value hash, with columns sorted by
name — so every computed column is aliased identically on both sides, and
float aggregates are rounded on both sides to absorb summation-order noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        aggregates,
        dedup,
        features,
        ml,
        multimodal,
        olap,
        quality,
        relational,
        similarity,
        temporal,
        text,
        tpch,
        validation,
        windows,
    )


def all_queries():
    load_all()
    return dict(QUERIES)


def all_oracles():
    load_all()
    return dict(ORACLES)
