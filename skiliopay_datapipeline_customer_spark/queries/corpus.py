"""Corpus-construction queries: mixing, quality gating, dedup output.

The training-data pipeline stages that sit AFTER analysis and BEFORE
training: choose the language/source mixture, gate on per-language quality,
and emit the post-dedup corpus. Each is oracle-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..operators import dedup as D
from ..operators import sampling as SM
from ..operators import textops as T
from . import query

# ---------------------------------------------------------------------------
# Corpus mixture: per-language target sampling rates (data mixing). The keep
# decision is md5-bucket-deterministic, so the oracle selects the identical
# rows — reproducible sampling is the point of the operator.
# ---------------------------------------------------------------------------

_MIX_RATES = {"en": 25, "de": 75, "es": 50, "fr": 50, "zh": 100}


def _mix_rate_case() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_RATES.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


@query(
    "corpus_mixture_sample",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS mix_bucket
      FROM documents
    )
    SELECT doc_id, lang, mix_bucket
    FROM b
    WHERE mix_bucket < {_mix_rate_case()}
    ORDER BY doc_id
    """,
)
def corpus_mixture_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        SM.stratified_sample(docs, "lang", _MIX_RATES, id_col="doc_id")
        .select("doc_id", "lang", "mix_bucket")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Per-language quality gate: keep the top quartile of each language by the
# composite quality score. Integer-threshold rank test (no float percentile
# boundary); the rank itself comes from the range-partitioned two-pass rank,
# so a dominant language never becomes a single sort task.
# ---------------------------------------------------------------------------

# single-source oracle fragment for the composite quality score — shared
# with queries/text.py (where it is defined next to its Spark twin)
from .text import QUALITY_SQL as _QUALITY_SQL  # noqa: E402


@query(
    "quality_top_quartile",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM documents
    ),
    r AS (
      SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT doc_id, lang, quality
    FROM r
    WHERE (rk - 1) * 4 <= (n - 1)
    ORDER BY doc_id
    """,
)
def quality_top_quartile(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", T.quality_score(F.col("text")).alias("quality")
    )
    return (
        SM.group_top_fraction(
            scored, "lang", "quality", "doc_id", num=1, den=4
        )
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Post-dedup corpus: the documents that survive near-dedup under the
# keep-min-id policy — ngram-Jaccard pairs -> connected components -> drop
# non-canonical members. The oracle replays the same closure with a
# recursive CTE over the identical edge set (as dedup_clusters) and
# anti-selects the losers.
# ---------------------------------------------------------------------------


@query(
    "dedup_survivors",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, len(t) - 2),
               i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS s
      FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
      )
    ),
    e0 AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM e0
      UNION SELECT id_b, id_a FROM e0
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    lab AS (
      SELECT node, min(r) AS cluster FROM reach GROUP BY node
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM lab WHERE node <> cluster)
    ORDER BY d.doc_id
    """,
)
def dedup_survivors(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.9, shingle_n=3)
    return (
        D.survivors(docs, pairs)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# The assembled corpus build — the LLM-extension flagship: near-dedup
# (keep-min-id survivors) ∩ per-language top-quartile quality ∩ mixture
# sample, composed as ONE lazy plan (Catalyst fuses the three filters; the
# corpus is scanned once for scoring, once inside the dedup pair tier).
# The oracle replays all three stages over the identical fragments the
# stage-level oracles use, so the composition is verified end-to-end, not
# just piecewise.
# ---------------------------------------------------------------------------


@query(
    "corpus_build_pipeline",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, len(t) - 2),
               i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS s
      FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
      )
    ),
    e0 AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM e0
      UNION SELECT id_b, id_a FROM e0
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    lab AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
    scored AS (
      -- quality is scored over the DEDUPED corpus: per-language quartile
      -- thresholds shift when losers are excluded, matching pipeline order
      SELECT doc_id, lang, {_QUALITY_SQL} AS quality FROM documents
      WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> cluster)
    ),
    ranked AS (
      SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT r.doc_id, r.lang, r.quality,
           CAST('0x' || substr(md5('mix:' || CAST(r.doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 AS mix_bucket
    FROM ranked r
    WHERE (r.rk - 1) * 4 <= (r.n - 1)
      AND CAST('0x' || substr(md5('mix:' || CAST(r.doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 100 < {_mix_rate_case().replace('lang', 'r.lang')}
    ORDER BY r.doc_id
    """,
)
def corpus_build_pipeline(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.9, shingle_n=3)
    deduped = D.survivors(docs, pairs)
    scored = deduped.select(
        "doc_id", "lang", T.quality_score(F.col("text")).alias("quality")
    )
    gated = SM.group_top_fraction(scored, "lang", "quality", "doc_id", 1, 4)
    return (
        SM.stratified_sample(gated, "lang", _MIX_RATES, id_col="doc_id")
        .select("doc_id", "lang", "quality", "mix_bucket")
        .orderBy("doc_id")
    )


# Training-shard layout: deterministic global shuffle + shard assignment for
# the final corpus write. Both hashes are md5-derived, so the oracle
# reproduces the exact layout; pos is a per-shard dense 1..n sequence.


@query(
    "training_shard_assignments",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 8 AS INT) AS shard,
             CAST('0x' || substr(md5('order:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS ok
      FROM documents
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id) AS pos
    FROM h ORDER BY doc_id
    """,
)
def training_shard_assignments(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return SM.shard_assignments(docs, n_shards=8).orderBy("doc_id")


# Domain balancing: cap every source at 10 docs, selected by salted-hash
# order — the downsample-overrepresented-domains pass. The oracle replays
# the same 60-bit md5 sort key in a per-source row_number window.


@query(
    "domain_capped_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS ok
      FROM documents
    )
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY ok, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= 10
    ORDER BY doc_id
    """,
)
def domain_capped_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        SM.group_capped_sample(docs, "source", "doc_id", cap=10)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# Corpus composition report: the per-(lang, source) doc/token/char totals
# and shares a training-data curator reads before setting mixture weights.
# One groupBy over per-row native expressions; the share denominators ride
# the same frame via an unordered global window (input is the group frame,
# lang×source-sized — metadata weight, not the corpus).


@query(
    "corpus_composition_report",
    oracle="""
    WITH per_doc AS (
      SELECT lang, source,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
             length(text) AS n_chars
      FROM documents
    ), grouped AS (
      SELECT lang, source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM per_doc GROUP BY lang, source
    )
    SELECT lang, source, n_docs, total_tokens, total_chars,
           round(CAST(total_tokens AS DOUBLE)
                 / sum(total_tokens) OVER (), 6) AS token_share
    FROM grouped
    ORDER BY lang, source
    """,
)
def corpus_composition_report(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    grouped = (
        docs.select(
            "lang",
            "source",
            T.whitespace_token_count(F.col("text")).alias("n_tokens"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return grouped.select(
        "lang",
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        F.round(
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(Window.partitionBy()),
            6,
        ).alias("token_share"),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res): the
# size-biased corpus draw — longer documents proportionally likelier, no RNG
# state, the identical set on every re-run/engine. Selection is a sort-limit
# (TakeOrderedAndProject: per-partition top-k + merge), never a global
# window. The float key is md5-uniform^(1/w) with the SAME expression shape
# on both engines; the top-100 boundary gap is astronomically wider than a
# pow() ulp, and the emitted key is rounded to 6.
# ---------------------------------------------------------------------------


@query(
    "weighted_doc_sample",
    oracle="""
    SELECT doc_id, lang, n_chars,
           round(pow(
             (CAST('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) + 1) / 1152921504606846977.0,
             1.0 / CAST(n_chars AS DOUBLE)), 6) AS sample_key
    FROM documents
    ORDER BY pow(
             (CAST('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) + 1) / 1152921504606846977.0,
             1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id
    LIMIT 100
    """,
)
def weighted_doc_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    keyed = SM.weighted_sample_keys(docs, "doc_id", "n_chars", salt="es")
    return (
        keyed.orderBy(F.col("_wkey").desc(), "doc_id")
        .limit(100)
        .select(
            "doc_id", "lang", "n_chars",
            F.round("_wkey", 6).alias("sample_key"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling — the multilingual-LM mixing rule
# (p_s ∝ n_s^α, here α = 0.5 so the power is IEEE-exact sqrt): per-source
# keep rates T·p_s/n_s turn a target budget of T documents into a
# deterministic md5-Bernoulli filter. Up-weights tail sources relative to
# proportional sampling; rates cap at 1 (a tiny source can't be
# over-sampled without replacement). Plan: one tiny source-count aggregate
# broadcast back, then a map-only filter — the corpus never shuffles.
# ---------------------------------------------------------------------------

_TEMP_TARGET = 1000


@query(
    "temperature_mixture_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(sqrt(n)) AS z FROM counts),
    rates AS (
      SELECT source, least(1.0, {_TEMP_TARGET} * sqrt(n) / (z * n)) AS rate
      FROM counts CROSS JOIN tot
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE (CAST('0x' || substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 1000000) / 1000000.0 < r.rate
    ORDER BY d.doc_id
    """,
)
def temperature_mixture_sample(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    z = counts.agg(F.sum(F.sqrt("n")).alias("z"))
    rates = counts.crossJoin(F.broadcast(z)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(float(_TEMP_TARGET)) * F.sqrt("n") / (F.col("z") * F.col("n")),
        ).alias("rate"),
    )
    u = (
        SM.hash_bucket(F.col("doc_id"), salt="temp", modulus=1_000_000)
        / F.lit(1_000_000.0)
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(u < F.col("rate"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Length-bucketed training batches: sort the corpus by token count (doc_id
# tiebreak — a total order), cut into fixed-size batches, report each
# batch's padding waste (batch_size·max_len − Σ len: what a padded
# collate pays). Sorting by length is THE padding minimizer; the rank comes
# from the range-partitioned two-pass global rank — no single-task window
# over the corpus. Integer arithmetic end-to-end.
# ---------------------------------------------------------------------------

_BATCH_SIZE = 32


@query(
    "length_bucketed_batches",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS r
      FROM t
    )
    SELECT CAST(r // {_BATCH_SIZE} AS BIGINT) AS batch_id,
           count(*) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS padding_waste
    FROM ranked
    GROUP BY 1 ORDER BY 1
    """,
)
def length_bucketed_batches(spark, sf_dir):
    from ..operators.ranks import global_rank_distributed

    docs = table(spark, sf_dir, "documents")
    withn = docs.select(
        "doc_id", T.whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    ranked = global_rank_distributed(
        withn,
        ["n_tokens", "doc_id"],
        rank_col="_r",
    )
    return (
        ranked.groupBy(
            # integer div, not float /: exact past 2^53 ranks
            F.expr(f"(_r - 1) div {_BATCH_SIZE}")
            .cast("long")
            .alias("batch_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            (
                F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
            ).cast("long").alias("padding_waste"),
        )
        .orderBy("batch_id")
    )


# Attrition funnel: survivor counts through the corpus build stages —
# the curator's observability view of the same composition
# `corpus_build_pipeline` verifies row-by-row. At 100 TB these counts ride
# the single pipeline pass as `observe()` metrics (no extra jobs); the
# declared query recomputes each prefix so the funnel itself is
# oracle-checkable.


@query(
    "corpus_attrition_funnel",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, len(t) - 2),
               i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3])) AS s
      FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM documents
      )
    ),
    e0 AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM e0
      UNION SELECT id_b, id_a FROM e0
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    lab AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
    scored AS (
      SELECT doc_id, lang, {{q}} AS quality FROM documents
      WHERE doc_id NOT IN (SELECT node FROM lab WHERE node <> cluster)
    ),
    ranked AS (
      SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM scored
    ),
    gated AS (SELECT doc_id, lang FROM ranked WHERE (rk - 1) * 4 <= (n - 1)),
    mixed AS (
      SELECT doc_id FROM gated
      WHERE CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) % 100 < {{r}}
    ),
    counts AS (
              SELECT '1_raw' AS stage, count(*) AS n_docs FROM documents
    UNION ALL SELECT '2_dedup', count(*) FROM scored
    UNION ALL SELECT '3_quality', count(*) FROM gated
    UNION ALL SELECT '4_mixture', count(*) FROM mixed
    )
    SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           round(n_docs * 1.0 / max(n_docs) OVER (), 4) AS retained_pct
    FROM counts ORDER BY stage
    """.format(q=_QUALITY_SQL, r=_mix_rate_case()),
)
def corpus_attrition_funnel(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.9, shingle_n=3)
    deduped = D.survivors(docs, pairs)
    scored = deduped.select(
        "doc_id", "lang", T.quality_score(F.col("text")).alias("quality")
    )
    gated = SM.group_top_fraction(scored, "lang", "quality", "doc_id", 1, 4)
    mixed = SM.stratified_sample(gated, "lang", _MIX_RATES, id_col="doc_id")
    stages = [
        ("1_raw", docs),
        ("2_dedup", deduped),
        ("3_quality", gated),
        ("4_mixture", mixed),
    ]
    counts = None
    for name, frame in stages:
        c = frame.agg(
            F.lit(name).alias("stage"), F.count("*").alias("n_docs")
        )
        counts = c if counts is None else counts.unionByName(c)
    from pyspark.sql import Window

    # 4-row frame: the global window is metadata-sized
    return (
        counts.withColumn(
            "retained_pct",
            F.round(
                F.col("n_docs") / F.max("n_docs").over(Window.partitionBy()), 4
            ),
        )
        .orderBy("stage")
    )


# Data-scheduling epoch plan (the LLaMA/DoReMi-style table): given a total
# training token budget, temperature weights (p_s ∝ tok_s^0.5) decide each
# source's target tokens, and epochs = target / available says how many
# times that source repeats (epochs > 1 = upsampling, < 1 = subsampling).
# Shape: one groupBy to source-sized totals, then window shares over the
# 20-row plan frame — the corpus shuffles once, the plan math is metadata.
# Budget fixed at 2× the corpus so both regimes appear in the fixture.


@query(
    "source_epoch_plan",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ), totals AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS avail_tokens
      FROM per_doc GROUP BY source
    ), weighted AS (
      SELECT source, avail_tokens,
             sqrt(CAST(avail_tokens AS DOUBLE))
               / sum(sqrt(CAST(avail_tokens AS DOUBLE))) OVER () AS w,
             sum(avail_tokens) OVER () AS corpus_tokens
      FROM totals
    )
    SELECT source, avail_tokens,
           round(w, 6) AS weight,
           CAST(round(w * 2 * corpus_tokens, 0) AS BIGINT) AS target_tokens,
           round(w * 2 * corpus_tokens / avail_tokens, 6) AS epochs
    FROM weighted
    ORDER BY source
    """,
)
def source_epoch_plan(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    totals = (
        docs.select("source", T.whitespace_token_count(F.col("text")).alias("_nt"))
        .groupBy("source")
        .agg(F.sum("_nt").alias("avail_tokens"))
    )
    w_all = Window.partitionBy()
    sq = F.sqrt(F.col("avail_tokens").cast("double"))
    w = sq / F.sum(sq).over(w_all)
    corpus_tokens = F.sum("avail_tokens").over(w_all)
    target = w * F.lit(2) * corpus_tokens
    return totals.select(
        "source",
        "avail_tokens",
        F.round(w, 6).alias("weight"),
        F.round(target, 0).cast("long").alias("target_tokens"),
        F.round(target / F.col("avail_tokens"), 6).alias("epochs"),
    ).orderBy("source")
