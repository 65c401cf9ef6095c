"""Generate a schema-identical, distribution-matched synthetic SF fixture.

The driver's read-only fixtures stop at sf0.1 (~600k lineitem). Every 100 TB
argument in SCALE.md rests on the 0.001->0.01->0.1 curve; this script extends
the curve one more decade LOCALLY (sf1: 6M lineitem, 1.5M orders, 1M events,
50k documents) so SCALING can measure a 3-step slope at real (if still
single-node) data volume.

Fidelity contract, verified against /root/testdata/sf0.1 before writing this
generator (see PLANS.md r11):
- Arrow schemas byte-identical per column (int32/int64/double/timestamp[us]/
  string/list<float>), same column order.
- Value domains identical: the 5 regions / 25 NATION_i rows are copied
  verbatim from the source fixture (they are SF-invariant); categorical
  columns use the exact observed domains (3 order statuses, 5 priorities,
  6 part types, 25 brands, the 8x8 adjective-noun part-name grid, 5 event
  types, 5 langs at the observed ~41%-en skew, 20 sources round-robin).
- Distributions matched: uniforms over the observed [min, max] for prices /
  balances / sizes / quantities, 0.01-step discount & tax grids, independent
  uniform date draws over the observed ranges (the source fixture draws
  l_shipdate independently of o_orderdate -- gap range -2399..+2496 days --
  so we do too), exponential(50) event values (observed quantiles 14.7/34.7/
  69.0/114/228 match), sorted-uniform event timestamps over the same 30-day
  window, 10..100-word documents over the exact 31-word vocab, unit-norm
  64-dim gaussian-cluster embeddings with 10 labels, and the observed
  ~0.16% exact-duplicate document rate (sf0.1 has 8 dup texts in 5000).
- Deterministic: numpy PCG64(seed=42), row counts scale the 0.01->0.1
  pattern (x10 transactional tables, x10 documents, x4 embeddings).

This is NOT driver data: results here feed SCALING_SF1_r{N}.json slope
measurements only, never CORRECTNESS records. Output lands under the repo
(testdata_local/, gitignored) because /root/testdata is read-only.

Usage: python scripts/gen_sf.py [--sf 1] [--out testdata_local/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000  # microseconds per day


def _ts_us(iso: str) -> int:
    return int(np.datetime64(iso, "us").astype("int64"))


def _counts(sf: float) -> dict[str, int]:
    # the 0.01 -> 0.1 scaling pattern, extended: transactional tables x10
    # per decade, documents x10; embeddings use an explicit x4-per-decade
    # ladder (matching the observed 500 -> 2000 step) set in generate()
    base = sf / 0.1
    return {
        "customer": int(15_000 * base),
        "supplier": int(1_000 * base),
        "part": int(20_000 * base),
        "orders": int(150_000 * base),
        "lineitem": int(600_000 * base),
        "events": int(100_000 * base),
        "documents": int(5_000 * base),
    }


def generate(sf: float, out_dir: str) -> dict[str, int]:
    rng = np.random.default_rng(42)
    n = _counts(sf)
    # embeddings: keep the x4-per-decade ladder simple and explicit
    n["embeddings"] = {0.1: 2_000, 1.0: 8_000, 10.0: 32_000}.get(sf, int(2_000 * (sf / 0.1) ** 0.6))
    os.makedirs(out_dir, exist_ok=True)

    # region + nation are SF-invariant: copy the driver fixture verbatim so
    # joins against them are bit-identical to every other SF dir
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/sf0.1/{t}.parquet", f"{out_dir}/{t}.parquet")

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{out_dir}/{name}.parquet")

    # -- customer ----------------------------------------------------------
    nc = n["customer"]
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, nc), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    # -- supplier -----------------------------------------------------------
    ns = n["supplier"]
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(ns)]),
        "s_nationkey": pa.array(rng.integers(0, 25, ns).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, ns), 2)),
    }))

    # -- part ----------------------------------------------------------------
    npart = n["part"]
    keys = np.arange(npart, dtype=np.int64)
    names = np.array([f"{a} {b}" for a in ADJS for b in NOUNS])
    write("part", pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array(names[rng.integers(0, len(names), npart)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, npart)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, npart)]),
        "p_size": pa.array(rng.integers(1, 51, npart).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + (keys % 1000) / 10.0, 2)),
    }))

    # -- orders ---------------------------------------------------------------
    no = n["orders"]
    od_lo, od_hi = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    odate_us = (
        od_lo + rng.integers(0, (od_hi - od_lo) // DAY_US + 1, no) * DAY_US
    )
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, nc, no).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, no)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, no), 2)),
        "o_orderdate": pa.array(odate_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    # -- lineitem -------------------------------------------------------------
    nl = n["lineitem"]
    sd_lo, sd_hi = _ts_us("1995-01-02"), _ts_us("2001-11-04")
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, npart, nl).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, ns, nl).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, nl).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, nl).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, nl), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, nl) / 100.0, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, nl) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, nl)]),
        "l_shipdate": pa.array(
            sd_lo + rng.integers(0, (sd_hi - sd_lo) // DAY_US + 1, nl) * DAY_US,
            pa.timestamp("us"),
        ),
    }))

    # -- events ---------------------------------------------------------------
    ne = n["events"]
    ts_lo, ts_hi = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    ts = np.sort(rng.integers(ts_lo, ts_hi, ne))
    write("events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(nc // 10, 1), ne).astype(np.int64)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": pa.array(np.round(rng.exponential(50.0, ne), 2)),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)]),
    }))

    # -- documents --------------------------------------------------------------
    nd = n["documents"]
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, nd)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    # exact-duplicate injection at the observed sf0.1 rate (8/5000 = 0.16%):
    # overwrite a trailing slice with copies of earlier docs so dedup
    # operators have real positives at every SF
    ndup = max(int(round(nd * 0.0016)), 1) if nd >= 1000 else 0
    for j in range(ndup):
        texts[nd - 1 - j] = texts[int(rng.integers(0, nd // 2))]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[rng.choice(5, nd, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(nd)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # -- embeddings ---------------------------------------------------------------
    nv, dim, k = n["embeddings"], 64, 10
    centers = rng.normal(0, 1, (k, dim))
    labels = rng.integers(0, k, nv)
    vecs = centers[labels] + rng.normal(0, 0.5, (nv, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(
        repo, "testdata_local", f"sf{args.sf:g}"
    )
    counts = generate(args.sf, out)
    print(json.dumps({"out": out, "rows": counts}))


if __name__ == "__main__":
    main()
