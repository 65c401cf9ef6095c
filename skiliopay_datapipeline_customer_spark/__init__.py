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
  io         parquet/CSV table loaders for the test star schema
  schema     JSON-schema -> StructType + constraint-expression compiler
  config     YAML config loader with ${VAR:default} env substitution
  operators/ relational ops: joins, aggregates, windows, set ops, stats,
             dedup (exact/minhash/simhash), similarity search, text analysis
  functions/ scalar/feature column library (the reference's F1-F19 surface)
  plans/     data-quality checks (V1-V11), medallion pipeline, caching
  streaming/ structured-streaming windows/dedup/merge equivalents
  ml/        Spark ML pipeline: stratified split, scaler, GBT, evaluators
"""

__version__ = "0.1.0"
