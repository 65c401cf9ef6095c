"""Local twin of the driver's DuckDB-oracle correctness compare.

Runs a declared Spark query and its oracle SQL on the same parquet dir,
normalizes both frames (columns sorted by name, rows sorted, timestamps to
ISO strings, numpy scalars to python), and diffs them exactly — the same
row-count + schema + order-insensitive value contract the driver grades.
"""

from __future__ import annotations

import math
import os
from typing import Any

# ONE table registry: a table added to io.TABLES gets its DuckDB view here
# automatically (a re-declared literal would silently leave the oracle side
# without the view)
from .io import TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v: Any) -> Any:
    import datetime

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_norm_value(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def normalize_pdf(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def _column_kind(pdf, col: str) -> str:
    """Coarse dtype kind of a pandas column: int / float / bool / datetime /
    str / list / empty.

    The driver's value hash is type-representation-sensitive: DuckDB
    ``sum(int)`` returns HUGEINT (surfacing as float64 in pandas) while Spark
    returns BIGINT, and numerically-identical frames hash differently. Local
    parity must therefore fail on an int-vs-float kind divergence, not coerce
    it away (the round-1 lesson: 8 driver fails that were locally green).
    Width within a kind (int32 vs int64) is NOT distinguished — both render
    identically as values.
    """
    import datetime
    import decimal

    import numpy as np

    dt = pdf[col].dtype
    if dt.kind in "iu":
        return "int"
    if dt.kind == "f":
        return "float"
    if dt.kind == "b":
        return "bool"
    if dt.kind in "mM":
        return "datetime"
    s = pdf[col].dropna()
    if len(s) == 0:
        return "empty"
    v = s.iloc[0]
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        # Spark DateType surfaces as python date, DuckDB DATE as datetime64
        # — they normalize to DIFFERENT ISO strings ('1994-01-01' vs
        # '1994-01-01T00:00:00') and the driver hash is representation-
        # sensitive, so a date column must fail the KIND gate loudly here
        # (cast one side: return a timestamp from Spark, or CAST the
        # oracle's DATE to TIMESTAMP) instead of a cryptic value diff
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    return "str" if isinstance(v, str) else type(v).__name__


def compare_frames(spark_pdf, oracle_pdf) -> list[str]:
    """Return list of mismatch descriptions; empty list = parity."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    for col in sorted(spark_pdf.columns):
        ks, ko = _column_kind(spark_pdf, col), _column_kind(oracle_pdf, col)
        # Driver contract: its canonicalizer sorts the pandas frame by all
        # columns, and sort_values raises TypeError on list/dict cells — so
        # even a BOTH-SIDES-list result (which the value diff below would
        # happily pass) is a guaranteed driver error. Reject it here so the
        # class can never recur (the r7 bpe_encoded_docs lesson): project
        # array_join(...) / to_json(...) in the declared query instead.
        for side, kind in (("spark", ks), ("oracle", ko)):
            if kind in ("list", "dict"):
                problems.append(
                    f"{side} column {col!r} is {kind}-typed: the driver's "
                    "canonicalizer cannot sort list/map cells — join or "
                    "serialize it in the declared query and oracle"
                )
        if "empty" in (ks, ko):
            continue
        if ks != ko:
            problems.append(
                f"dtype kind differs on {col!r}: spark={ks} oracle={ko} "
                "(driver hash is type-sensitive — cast the oracle, e.g. "
                "CAST(sum(...) AS BIGINT))"
            )
    if problems:
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a = normalize_pdf(spark_pdf)
    b = normalize_pdf(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        sample = diffs[:3] if diffs else [(a[:2], b[:2])]
        problems.append(f"values differ: first diffs {sample}")
    return problems


def run_parity(spark, sf_dir: str, name: str, fn, sql: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
