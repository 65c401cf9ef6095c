"""skiliopay_datapipeline_customer_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Catalyst / Structured
Streaming) engine with the query and data-processing capabilities of the
reference customer-churn pipeline (papoibe/SkilioPay-DataPipeline-Customer),
re-designed Spark-first for 100 TB scale:

- declarative DataFrame plans (Catalyst does pushdown/pruning/join selection)
- broadcast joins for small dims, AQE for skew/coalesce at runtime
- exact-stat operators (median/mode/percentile) for oracle parity with
  documented approx_* fallbacks for the 100 TB profiling path
- no driver-side collect() in any operator hot path

Package layout:
  session    SparkSession factory (AQE on, UTC, arrow)
  io         parquet table loaders for the test star schema (nanos handling)
  schema     JSON-schema -> StructType + constraint-expression compiler
  config     YAML config loader with ${VAR:default} env substitution
  sql        SQL entry point over registered table views
  parity     local twin of the driver's DuckDB-oracle compare
  sources/   CSV/REST/JDBC/snapshots + catalog DDL, bucketed tables
  queries/   the declared-query registry (driver contract surface)
  operators/ joins (as-of, salted), dedup ladder, similarity (LSH/IVF),
             text analysis, multimodal binary columns
  functions/ encoding + the reference's six churn feature blocks, fixtures
  plans/     fused data-quality reports + composite gate (V4-V10)
  pipelines/ medallion assembly, TTL checkpoint cache, star warehouse
  streaming/ watermarked windows, stateful dedup, snapshot upsert
  ml/        dataset, stratified split/folds, scaler, GBT/RF/LR, CV,
             tuning + run tracking, batch scoring contract
"""

__version__ = "0.1.0"
