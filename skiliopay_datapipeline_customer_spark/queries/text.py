"""Text-analysis queries over the documents table (LLM-pipeline family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..operators import textops as T
from . import query

# Token counting: whitespace tokens + BPE-ish subword estimate.


@query(
    "token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
           list_sum(list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def token_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).alias("n_tokens"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


# Heuristic language ID by stopword hits, deterministic tie order.


@query(
    "language_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> t IN ('the','a','of','and','to'))) AS s_en,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> t IN ('der','die','das','und','zu'))) AS s_de,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> t IN ('le','la','et','les','de'))) AS s_fr,
        len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> t IN ('el','la','y','los','que'))) AS s_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS detected_lang
    FROM scored
    ORDER BY doc_id
    """,
)
def language_id(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.detect_language(F.col("text")).alias("detected_lang")
    ).orderBy("doc_id")


# Quality scoring: length/stopword/punctuation composite.


@query(
    "quality_scores",
    oracle="""
    SELECT doc_id,
      round(
        least(length(text) / 200.0, 1.0) * 0.4
        + (len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
               t -> t IN ('the','a','of','and','to'))) * 1.0
           / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)) * 0.4
        + (1.0 - length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                 / greatest(length(text), 1)) * 0.2,
      6) AS quality
    FROM documents
    ORDER BY doc_id
    """,
)
def quality_scores(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


# Order-insensitive document fingerprint (md5 over sorted distinct tokens).


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def doc_fingerprints(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.doc_fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")
