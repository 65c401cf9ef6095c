"""Schema-validation queries: the V1 compiler exercised end-to-end."""

from __future__ import annotations

from ..io import table
from ..schema import validation_counts
from . import query

# A churn_schema.json-shaped schema for the customer table: types, required,
# range, enum, and pattern rules — every rule kind the reference's Cerberus
# schema uses (config/schemas/churn_schema.json).
CUSTOMER_SCHEMA = {
    "type": "object",
    "properties": {
        "c_custkey": {"type": "integer", "minimum": 0},
        "c_name": {"type": "string", "pattern": "^Customer#[0-9]+$"},
        "c_nationkey": {"type": "integer", "minimum": 0, "maximum": 24},
        "c_acctbal": {"type": "number", "minimum": -1000.0, "maximum": 10000.0},
        "c_mktsegment": {
            "type": "string",
            "enum": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        },
    },
    "required": ["c_custkey", "c_name", "c_mktsegment"],
}


@query(
    "schema_validation_report",
    oracle="""
    SELECT count(*) AS n_rows,
           -- optional-column range rules ride inside coalesce(…, FALSE):
           -- a NULL optional value breaks no rule (the engine's null-safe
           -- semantics); a bare NOT (NULL < 0) would NULL the AND chain
           -- and count the row invalid
           CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_name IS NOT NULL
                     AND c_mktsegment IS NOT NULL
                     AND NOT (c_custkey < 0)
                     AND regexp_matches(c_name, '^Customer#[0-9]+$')
                     AND NOT coalesce(c_nationkey < 0, FALSE)
                     AND NOT coalesce(c_nationkey > 24, FALSE)
                     AND NOT coalesce(c_acctbal < -1000.0, FALSE)
                     AND NOT coalesce(c_acctbal > 10000.0, FALSE)
                     AND c_mktsegment IN ('AUTOMOBILE','BUILDING','FURNITURE',
                                          'HOUSEHOLD','MACHINERY')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS c_custkey_required,
           CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_custkey < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS c_custkey_min,
           CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS c_name_required,
           CAST(sum(CASE WHEN c_name IS NOT NULL
                     AND NOT regexp_matches(c_name, '^Customer#[0-9]+$')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_name_pattern,
           CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND c_nationkey < 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_nationkey_min,
           CAST(sum(CASE WHEN c_nationkey IS NOT NULL AND c_nationkey > 24
               THEN 1 ELSE 0 END) AS BIGINT) AS c_nationkey_max,
           CAST(sum(CASE WHEN c_acctbal IS NOT NULL AND c_acctbal < -1000.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_min,
           CAST(sum(CASE WHEN c_acctbal IS NOT NULL AND c_acctbal > 10000.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_max,
           CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS c_mktsegment_required,
           CAST(sum(CASE WHEN c_mktsegment IS NOT NULL
                     AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE',
                                              'HOUSEHOLD','MACHINERY')
               THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_enum
    FROM customer
    """,
)
def schema_validation_report(spark, sf_dir):
    return validation_counts(table(spark, sf_dir, "customer"), CUSTOMER_SCHEMA)
