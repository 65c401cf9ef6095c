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
           CAST(list_sum(list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
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


# The detection oracle fragment — shared by language_id and the confusion
# matrix below; mirrors operators/textops.py::detect_language and must
# change in lockstep.
LANG_DETECT_SQL = """
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
    ),
    pred AS (
      SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS detected_lang
      FROM scored
    )
"""


@query(
    "language_id",
    oracle=LANG_DETECT_SQL
    + """
    SELECT doc_id, detected_lang FROM pred ORDER BY doc_id
    """,
)
def language_id(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.detect_language(F.col("text")).alias("detected_lang")
    ).orderBy("doc_id")


# Classifier-evaluation view: the heuristic's predictions against the
# table's ground-truth lang label — the confusion matrix a curator reads
# before trusting language buckets for mixture sampling. One map-only
# detection pass + one tiny (langs x langs) groupBy; at 100 TB the matrix
# is the only thing that shuffles.


@query(
    "language_id_confusion",
    oracle=LANG_DETECT_SQL
    + """
    SELECT d.lang AS actual_lang, p.detected_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY actual_lang, detected_lang
    ORDER BY actual_lang, detected_lang
    """,
)
def language_id_confusion(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("actual_lang"),
            T.detect_language(F.col("text")).alias("detected_lang"),
        )
        .groupBy("actual_lang", "detected_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("actual_lang", "detected_lang")
    )


# Quality scoring: length/stopword/punctuation composite.


# The composite quality score's oracle fragment — the single source shared
# by quality_scores here and the corpus queries (queries/corpus.py); it
# mirrors operators/textops.py::quality_score and must change in lockstep.
QUALITY_SQL = """
      round(
        least(length(text) / 200.0, 1.0) * 0.4
        + (len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
               t -> t IN ('the','a','of','and','to'))) * 1.0
           / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)) * 0.4
        + (1.0 - length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                 / greatest(length(text), 1)) * 0.2,
      6)
"""


@query(
    "quality_scores",
    oracle=f"""
    SELECT doc_id, {QUALITY_SQL} AS quality
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


# TF-IDF term weighting (LLM-pipeline family). The idf factor is the
# log-free rational form tf · (N+1)/(df+1): same ranking order as
# log-idf for fixed N, but pure integer-ratio double arithmetic — bit-equal
# across engines (libm log implementations differ by ulps, which round(6)
# can't always absorb; ratios of ints < 2^53 are exact).


@query(
    "tfidf_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term,
           round(tf.tf * (n.n_docs + 1.0) / (df.df + 1.0), 6) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    WHERE tf.doc_id < 25
    ORDER BY tf.doc_id, tf.term
    """,
)
def tfidf_scores(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    # the corpus count rides as a broadcast 1-row cross join (the oracle's
    # CROSS JOIN n, literally) — no eager .count() job
    nrow = F.broadcast(docs.agg(F.count("*").alias("_n_docs")))
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(df_, "term")
        .filter(F.col("doc_id") < 25)
        .crossJoin(nrow)
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * (F.col("_n_docs") + 1.0) / (F.col("df") + 1.0), 6
            ).alias("tfidf"),
        )
        .orderBy("doc_id", "term")
    )


# Winnowing rolling-hash fingerprints (MOSS scheme): char 8-gram rolling
# hashes, min per 4-window, distinct — oracle replicates with a lateral
# range + windowed min over positions. Restricted to doc_id < 50 to keep
# the oracle's lateral expansion bounded at sf0.01.


@query(
    "rolling_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id, r.range AS pos,
             CAST('0x' || substr(md5(substr(text, CAST(r.range AS INT), 8)), 1, 15)
                  AS BIGINT) AS h,
             greatest(length(text) - 7, 1) AS n_grams
      FROM documents, range(1, 5001) r
      WHERE doc_id < 50 AND r.range <= greatest(length(text) - 7, 1)
    ),
    wins AS (
      SELECT doc_id, pos, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      FROM g
    )
    SELECT DISTINCT doc_id, wmin AS fingerprint
    FROM wins WHERE pos <= greatest(n_grams - 3, 1)
    ORDER BY doc_id, fingerprint
    """,
)
def rolling_fingerprints(spark, sf_dir):
    from ..operators.textops import rolling_fingerprint_rows

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return rolling_fingerprint_rows(docs, k=8, w=4).orderBy(
        "doc_id", "fingerprint"
    )


# Sequence packing for training-data assembly: documents → fixed-token-budget
# packs by cumulative-token start offset under the doc_id order. The cumsum
# is the distributed two-pass form (operators/ranks.py) — no single-task
# global window; assignment is offset-based (straddlers stay in the pack
# their offset starts in), which keeps it deterministic and oracle-exact.


@query(
    "token_pack_assignments",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(floor((cs - n_tokens) / 2048.0) AS BIGINT) AS pack_id
    FROM c ORDER BY doc_id
    """,
)
def token_pack_assignments(spark, sf_dir):
    from ..operators.ranks import pack_by_token_budget

    docs = table(spark, sf_dir, "documents")
    withn = docs.select(
        "doc_id", T.whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_by_token_budget(
        withn, 2048, "n_tokens", ["doc_id"]
    )
    return packed.select("doc_id", "n_tokens", "pack_id").orderBy("doc_id")


# C4-style normalization: the pre-dedup cleaning pass. Oracle mirrors the
# regex pipeline exactly (lower → strip non-alnum → collapse spaces → trim).


@query(
    "normalized_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')) AS norm_text
    FROM documents
    ORDER BY doc_id
    """,
)
def normalized_text(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.normalize_text(F.col("text")).alias("norm_text")
    ).orderBy("doc_id")


# Gopher-style quality filter signals + composite keep decision.


@query(
    "gopher_quality_filter",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
             list_sum(list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                      t -> length(t))) * 1.0
               / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)
               AS mwl,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
               / greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)
               AS sr
      FROM documents
    )
    SELECT doc_id,
           n_words,
           round(mwl, 6) AS mean_word_len,
           round(sr, 6) AS symbol_ratio,
           (n_words >= 5 AND n_words <= 100000
            AND mwl >= 2.0 AND mwl <= 12.0 AND sr < 0.5) AS keep
    FROM s
    ORDER BY doc_id
    """,
)
def gopher_quality_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    flags = T.gopher_quality_flags(F.col("text"))
    return docs.select(
        "doc_id",
        flags["n_words"].cast("long").alias("n_words"),
        flags["mean_word_len"].alias("mean_word_len"),
        flags["symbol_ratio"].alias("symbol_ratio"),
        flags["keep"].alias("keep"),
    ).orderBy("doc_id")


# Exact shared-substring near-dup pairs (the Lee et al. 2022 substring-dedup
# flavor): winnowing-fingerprint inverted index with a document-frequency
# cap — two docs sharing a span of >= k+w-1 chars share a fingerprint by the
# winnowing guarantee; ubiquitous grams (df > 10) index nothing, and pairs
# need >= 3 distinct rare fingerprints. Fully SQL-expressible -> oracled.


@query(
    "shared_span_pairs",
    oracle="""
    WITH g AS (
      SELECT doc_id, r.range AS pos,
             CAST('0x' || substr(md5(substr(text, CAST(r.range AS INT), 8)), 1, 15)
                  AS BIGINT) AS h,
             greatest(length(text) - 7, 1) AS n_grams
      FROM documents, range(1, 5001) r
      WHERE r.range <= greatest(length(text) - 7, 1)
    ),
    wins AS (
      SELECT doc_id, pos, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      FROM g
    ),
    fps AS (
      SELECT DISTINCT doc_id, wmin AS fingerprint
      FROM wins WHERE pos <= greatest(n_grams - 3, 1)
    ),
    rare AS (
      SELECT fingerprint FROM fps GROUP BY fingerprint HAVING count(*) <= 10
    ),
    rf AS (
      SELECT fps.doc_id, fps.fingerprint FROM fps JOIN rare USING (fingerprint)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM rf a JOIN rf b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 3
    ORDER BY id_a, id_b
    """,
)
def shared_span_pairs(spark, sf_dir):
    from ..operators.textops import shared_span_pairs as op

    return op(
        table(spark, sf_dir, "documents"), k=8, w=4, max_df=10, min_shared=3
    ).orderBy("id_a", "id_b")


# Within-doc repetition metrics (Gopher repetition family): duplicate-token
# fraction + most-frequent-bigram share — the boilerplate/spam signal that
# cross-doc dedup cannot see.


@query(
    "repetition_metrics",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    base AS (
      SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
      FROM t
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(t) - 1),
                    i -> t[i + 1] || ' ' || t[i + 2])) AS bg
      FROM t
    ),
    top AS (
      SELECT doc_id, max(c) AS top_bigram_cnt FROM (
        SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
      ) GROUP BY doc_id
    )
    SELECT base.doc_id, n_tokens, n_distinct,
           round(1.0 - n_distinct * 1.0 / n_tokens, 6) AS dup_token_ratio,
           CAST(coalesce(top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
           CASE WHEN n_tokens > 1
                THEN round(coalesce(top_bigram_cnt, 0) / (n_tokens - 1.0), 6)
                ELSE 0.0 END AS top_bigram_share
    FROM base LEFT JOIN top USING (doc_id)
    ORDER BY doc_id
    """,
)
def repetition_metrics(spark, sf_dir):
    from ..operators.textops import repetition_metrics as op

    return op(table(spark, sf_dir, "documents")).orderBy("doc_id")


# PII scrubbing over the corpus: typed-tag redaction + per-kind counts.
# The synthetic corpus is PII-free, so corpus-side this verifies the
# redaction chain is the identity on clean text (and that both engines
# compile the same patterns); the planted-fixture pytest carries the
# positive cases.


@query(
    "pii_redaction_report",
    oracle="""
    WITH s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
               '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    s2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(t1,
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS n_ipv4,
             regexp_replace(t1,
               '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
               '<IPV4>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id,
           regexp_replace(t2,
             '\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}(?:[- .][0-9]{2,4})?',
             '<PHONE>', 'g') AS redacted,
           n_email, n_ipv4,
           len(regexp_extract_all(t2,
             '\\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}(?:[- .][0-9]{2,4})?'))
             AS n_phone
    FROM s2
    ORDER BY doc_id
    """,
)
def pii_redaction_report(spark, sf_dir):
    from ..operators.textops import pii_counts, redact_pii

    docs = table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        redact_pii(F.col("text")).alias("redacted"),
        pii_counts(F.col("text")).alias("_c"),
    )
    return counted.select(
        "doc_id", "redacted", "_c.n_email", "_c.n_ipv4", "_c.n_phone"
    ).orderBy("doc_id")


# Train/test contamination: docs sharing any 4-token gram with a benchmark
# set (docs 0-9 stand in for the benchmark suite). Benchmark grams broadcast
# (model-sized next to a corpus); the corpus side never shuffles on its own
# size — the decontamination pass of a training-data pipeline.


@query(
    "benchmark_contamination",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(0, len(t) - 3),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])))
               AS gram
      FROM t
    ),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
    hits AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
      FROM g JOIN bg USING (gram)
      WHERE g.doc_id >= 10
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
           coalesce(h.n_shared_grams, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
    LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id
    """,
)
def benchmark_contamination(spark, sf_dir):
    from ..operators.textops import contamination_report

    docs = table(spark, sf_dir, "documents")
    return contamination_report(
        docs.filter(F.col("doc_id") >= 10),
        docs.filter(F.col("doc_id") < 10),
        n=4,
    ).orderBy("doc_id")


# Document chunking with overlap (16-token windows, stride 12): the
# splitting complement of sequence packing. Map-only sequence + posexplode;
# the oracle replays the identical window arithmetic with generate_series.


@query(
    "doc_chunk_assignments",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(0, greatest(n_tokens - 1 - 4, 0), 12))
               AS chunk_start
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY chunk_start)
                - 1 AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(least(16, n_tokens - chunk_start) AS BIGINT) AS chunk_len
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_assignments(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return T.chunk_assignments(
        docs, chunk_tokens=16, overlap=4
    ).orderBy("doc_id", "chunk_id")


@query(
    "doc_chunks_udtf",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(0, greatest(n_tokens - 1 - 4, 0), 12))
               AS chunk_start
      FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY chunk_start)
                - 1 AS BIGINT) AS chunk_id,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(least(16, n_tokens - chunk_start) AS BIGINT) AS chunk_len
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def doc_chunks_udtf(spark, sf_dir):
    """The §2.12 Python UDTF tier under the driver's full hash gate: the
    lateral-join table function (operators/udtf_ops.py) shares
    doc_chunk_assignments' oracle because the tiers are exact twins (the
    twin-equality pytest in tests/test_udtf.py is the licensing contract;
    this query makes the driver verify the UDTF output itself)."""
    from ..operators.udtf_ops import chunk_assignments_udtf

    docs = table(spark, sf_dir, "documents")
    return chunk_assignments_udtf(
        docs, chunk_tokens=16, overlap=4
    ).orderBy("doc_id", "chunk_id")


# Distributed BPE training surface. The per-round kernel (adjacent symbol-
# pair counts over the word-frequency working set) is oracle-checked, and so
# is the full 16-round merge LOOP: the rounds are UNROLLED into generated
# chained CTEs (the lsh_ann_topk literal-generation precedent). Each round
# re-derives pair counts, picks argmax on (count desc, l, r), and applies
# the merge via leftmost non-overlapping string replace over a
# control-char-bracketed symbol encoding (chr(2)·sym·chr(3) per symbol) —
# replace's scan semantics equal the greedy carry fold of
# operators/textops.py::_merge_pair_expr exactly (a merged symbol never
# re-pairs within its round), and the brackets make cross-symbol matches
# impossible. MATERIALIZED CTEs keep DuckDB's evaluation linear in rounds.
# Early-stop parity: a round only fires if the previous round chose a merge
# (EXISTS chain), mirroring bpe_train's pair_count >= 2 break.


@query(
    "bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
      SELECT w[i] AS l, w[i + 1] AS r, cnt
      FROM words, unnest(range(1, length(w))) AS t(i)
    )
    SELECT l, r, CAST(sum(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY l, r
    ORDER BY l, r
    """,
)
def bpe_pair_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    words = T.word_frequencies(docs)
    return T.symbol_pair_counts(words).orderBy("l", "r")


def _bpe_train_ctes(n_merges: int) -> list[str]:
    """The shared CTE chain deriving b0..b{n-1} (the per-round merge picks)
    and the evolving working sets w0..w{n} — prefix of both BPE oracles."""
    cte = [
        """words AS MATERIALIZED (
      SELECT w AS word, count(*) AS cnt FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    )""",
        """w0 AS MATERIALIZED (
      SELECT cnt,
             chr(2) || array_to_string(string_split_regex(word, ''),
                                       chr(3)||chr(2)) || chr(3) AS w
      FROM words
    )""",
    ]
    for i in range(n_merges):
        guard = "" if i == 0 else f"AND EXISTS (SELECT 1 FROM b{i-1})"
        cte.append(f"""p{i} AS MATERIALIZED (
      SELECT s[j] AS l, s[j+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT cnt,
                   string_split(trim(w, chr(2)||chr(3)), chr(3)||chr(2)) AS s
            FROM w{i}),
           unnest(range(1, len(s))) AS t(j)
      GROUP BY s[j], s[j+1]
    )""")
        cte.append(f"""b{i} AS MATERIALIZED (
      SELECT l, r FROM p{i} WHERE c >= 2 {guard}
      ORDER BY c DESC, l, r LIMIT 1
    )""")
        cte.append(f"""w{i+1} AS MATERIALIZED (
      SELECT f.cnt,
             CASE WHEN b.l IS NULL THEN f.w
                  ELSE replace(f.w,
                       chr(2)||b.l||chr(3)||chr(2)||b.r||chr(3),
                       chr(2)||b.l||b.r||chr(3)) END AS w
      FROM w{i} f LEFT JOIN b{i} b ON TRUE
    )""")
    return cte


def _bpe_merges_oracle(n_merges: int = 16) -> str:
    union = "\n      UNION ALL ".join(
        f'SELECT CAST({i} AS INTEGER) AS rank, '
        f'(SELECT l FROM b{i}) AS "left", (SELECT r FROM b{i}) AS "right"'
        for i in range(n_merges)
    )
    return (
        "WITH " + ",\n    ".join(_bpe_train_ctes(n_merges))
        + f'\n    SELECT rank, "left", "right" FROM ({union})\n'
        + '    WHERE "left" IS NOT NULL ORDER BY rank'
    )


@query("bpe_merges", oracle=_bpe_merges_oracle(16))
def bpe_merges(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    merges = T.bpe_train(docs, n_merges=16)
    return spark.createDataFrame(merges, "rank int, left string, right string")


# Encoding tier of the tokenizer: apply the trained merge rules to the
# corpus. ALSO oracle-checked: applying the rules in RANK ORDER (each via
# the same bracketed leftmost non-overlapping replace) equals the encoder's
# lowest-rank-first loop — a rank-k pair can never contain a later round's
# output symbol and a merged adjacency never re-forms, so exhausting rank 0
# before rank 1 replays the training order exactly. The oracle chains the
# shared training CTEs (the rules are data-derived) with one replace stage
# per rank over every word occurrence, then reassembles per-doc token lists
# in word order. Exact pure-Python reference parity and the reconstruction
# invariant are additionally asserted in tests/test_text_extra.py.


def _bpe_encoded_oracle(n_merges: int = 16) -> str:
    cte = _bpe_train_ctes(n_merges)
    cte.append("""enc0 AS MATERIALIZED (
      SELECT doc_id, i,
             chr(2) || array_to_string(string_split_regex(t[i], ''),
                                       chr(3)||chr(2)) || chr(3) AS e
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS t
            FROM documents),
           unnest(range(1, len(t) + 1)) AS u(i)
      WHERE t[i] <> ''
    )""")
    for i in range(n_merges):
        cte.append(f"""enc{i+1} AS MATERIALIZED (
      SELECT f.doc_id, f.i,
             CASE WHEN b.l IS NULL THEN f.e
                  ELSE replace(f.e,
                       chr(2)||b.l||chr(3)||chr(2)||b.r||chr(3),
                       chr(2)||b.l||b.r||chr(3)) END AS e
      FROM enc{i} f LEFT JOIN b{i} b ON TRUE
    )""")
    cte.append(f"""agg AS (
      SELECT doc_id,
             flatten(list(string_split(trim(e, chr(2)||chr(3)),
                                       chr(3)||chr(2)) ORDER BY i)) AS tokens
      FROM enc{n_merges} GROUP BY doc_id
    )""")
    return (
        "WITH " + ",\n    ".join(cte)
        + """
    SELECT d.doc_id,
           array_to_string(coalesce(a.tokens, CAST([] AS VARCHAR[])), ' ')
             AS tokens,
           CAST(coalesce(len(a.tokens), 0) AS INTEGER) AS n_tokens
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id"""
    )


@query("bpe_encoded_docs", oracle=_bpe_encoded_oracle(16))
def bpe_encoded_docs(spark, sf_dir):
    # The declared query projects tokens as a space-joined string: the
    # driver's pandas canonicalizer sort_values() raises on list cells
    # (unhashable type), so no declared oracle query may return an
    # array/map column (enforced in parity.compare_frames). Tokens are
    # subwords of whitespace-split words, so ' ' is collision-free. The
    # operator itself keeps the array<string> return for library users.
    docs = table(spark, sf_dir, "documents")
    merges = T.bpe_train(docs, n_merges=16)
    return (
        T.bpe_encode(docs, merges)
        .select(
            "doc_id",
            F.array_join("tokens", " ").alias("tokens"),
            "n_tokens",
        )
        .orderBy("doc_id")
    )


# UDTF surface: chunk TEXT via a SQL-visible Python table function in a
# LATERAL join (Generate node — same plan shape as the native posexplode).
# Boundaries are the same pure function as doc_chunk_assignments; the
# oracle re-derives the text by list-slicing the token array.


@query(
    "doc_chunk_texts",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1 - 4, 0), 12))
               AS s
      FROM t
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
                AS INT) AS chunk_id,
           CAST(s AS INT) AS chunk_start,
           array_to_string(toks[s + 1 : least(s + 16, len(toks))], ' ')
             AS chunk_text,
           CAST(least(16, len(toks) - s) AS INT) AS chunk_len
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def doc_chunk_texts(spark, sf_dir):
    spark.udtf.register("chunk_text", T.chunk_text_udtf())
    table(spark, sf_dir, "documents").createOrReplaceTempView("_chunk_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_start, c.chunk_text, c.chunk_len
        FROM _chunk_docs d, LATERAL chunk_text(d.text, 16, 4) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


# ---------------------------------------------------------------------------
# Statistical LM quality score — the CCNet-style perplexity proxy: train a
# unigram model on the corpus itself (one token-count shuffle; the vocab
# frame is tiny next to the corpus), then score each document by its mean
# token log-probability. Low scores = improbable token mixes (the gibberish
# tail a perplexity filter drops). Plan: explode → count (shuffle 1) →
# broadcast vocab back → per-doc aggregate (shuffle 2). At 100 TB the vocab
# broadcast becomes a hash join and rare tokens get a smoothing floor; the
# in-corpus vocab here has no OOV by construction.
# ---------------------------------------------------------------------------


@query(
    "unigram_doc_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln(CAST(v.n AS DOUBLE) / tt.total)) / count(*), 4)
             AS mean_logprob
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot tt
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def unigram_doc_logprob(spark, sf_dir):
    from ..operators.dedup import tokens

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = vocab.agg(F.sum("n").cast("double").alias("total"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.log(F.col("n").cast("double") / F.col("total")))
                / F.count(F.lit(1)),
                4,
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Decontaminated corpus — the REMOVAL composite over the contamination
# report: docs sharing any benchmark 4-gram drop (Lee et al.-style strict
# gate), the rest survive. Same gram-join plan as benchmark_contamination
# feeding a keep-filter; only surviving ids + metadata emit.
# ---------------------------------------------------------------------------


@query(
    "decontaminated_corpus",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(0, len(t) - 3),
               i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])))
               AS gram
      FROM t
    ),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
    dirty AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bg USING (gram)
      WHERE g.doc_id >= 10
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    WHERE d.doc_id >= 10 AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
    ORDER BY d.doc_id
    """,
)
def decontaminated_corpus(spark, sf_dir):
    from ..operators.textops import contamination_report

    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") >= 10)
    report = contamination_report(
        train, docs.filter(F.col("doc_id") < 10), n=4
    )
    dirty = report.filter(F.col("contaminated")).select("doc_id")
    return (
        train.join(dirty, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Token Zipf curve — the corpus-statistics sanity check curators plot before
# training: top-50 token frequencies with their rank, plus the fitted
# log-log slope (regr over ln rank / ln freq; Zipfian text ≈ −1). The rank
# is over the vocab-sized count frame (one token-count shuffle from the
# corpus); the slope is a 1-row aggregate of that frame.
# ---------------------------------------------------------------------------


@query(
    "token_zipf_curve",
    oracle="""
    WITH counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    ranked AS (
      SELECT tok, n,
             row_number() OVER (ORDER BY n DESC, tok) AS rank
      FROM counts
    ),
    slope AS (
      SELECT round(covar_pop(ln(CAST(rank AS DOUBLE)), ln(CAST(n AS DOUBLE)))
                   / var_pop(ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope
      FROM ranked
    )
    SELECT r.rank, r.tok, r.n, s.zipf_slope
    FROM ranked r CROSS JOIN slope s
    WHERE r.rank <= 50
    ORDER BY r.rank
    """,
)
def token_zipf_curve(spark, sf_dir):
    from ..operators.dedup import tokens as _tokens

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    # vocab-sized frame: the global window is metadata-cheap here
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    ranked = counts.withColumn("rank", F.row_number().over(w))
    lr = F.log(F.col("rank").cast("double"))
    ln = F.log(F.col("n").cast("double"))
    slope = ranked.agg(
        F.round(F.covar_pop(lr, ln) / F.var_pop(lr), 4).alias("zipf_slope")
    )
    return (
        ranked.filter(F.col("rank") <= 50)
        .crossJoin(F.broadcast(slope))
        .select("rank", "tok", "n", "zipf_slope")
        .orderBy("rank")
    )


# Corpus-wide exact span dedup with reassembly (C4/MassiveText line dedup):
# every 8-token span keeps only its first corpus occurrence (min (doc, pos)),
# docs rebuild from surviving spans in order.


@query(
    "line_dedup_docs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    spans AS (
      SELECT doc_id, CAST((i - 1) / 8 AS BIGINT) AS pos,
             array_to_string(t[i:i+7], ' ') AS line
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(t), 1), 8)) AS i
      )
    ),
    kept AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
      FROM spans
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text,
             count(*) AS kept
      FROM kept WHERE rn = 1 GROUP BY doc_id
    ),
    counts AS (
      SELECT doc_id, len(generate_series(1, greatest(len(t), 1), 8)) AS n_lines
      FROM toks
    )
    SELECT c.doc_id,
           coalesce(r.text, '') AS text,
           CAST(coalesce(r.kept, 0) AS BIGINT) AS lines_kept,
           CAST(c.n_lines - coalesce(r.kept, 0) AS BIGINT) AS lines_removed
    FROM counts c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id
    ORDER BY c.doc_id
    """,
)
def line_dedup_docs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return T.line_dedup(docs, line_tokens=8).orderBy("doc_id")


# Sentiment-lexicon scoring (SURVEY §7.2 item 9): AFINN-style weighted
# lexicon folded into one token pass; net score + hit counts + sign label.


@query(
    "sentiment_scores",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(lower(text)), '\\s+'),
               t -> CASE t WHEN 'fast' THEN 2 WHEN 'small' THEN 1
                           WHEN 'merge' THEN 1 WHEN 'slow' THEN -2
                           WHEN 'big' THEN -1 WHEN 'dup' THEN -3
                           ELSE 0 END) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(w), 0) AS BIGINT) AS sentiment,
           CAST(len(list_filter(w, x -> x > 0)) AS INT) AS pos_hits,
           CAST(len(list_filter(w, x -> x < 0)) AS INT) AS neg_hits,
           CASE WHEN coalesce(list_sum(w), 0) > 0 THEN 'positive'
                WHEN coalesce(list_sum(w), 0) < 0 THEN 'negative'
                ELSE 'neutral' END AS label
    FROM scored
    ORDER BY doc_id
    """,
)
def sentiment_scores(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    s = T.sentiment_terms(F.col("text"))
    return (
        docs.select("doc_id", s.alias("_s"))
        .select(
            "doc_id",
            F.col("_s.score").cast("long").alias("sentiment"),
            F.col("_s.pos_hits").alias("pos_hits"),
            F.col("_s.neg_hits").alias("neg_hits"),
            F.when(F.col("_s.score") > 0, "positive")
            .when(F.col("_s.score") < 0, "negative")
            .otherwise("neutral")
            .alias("label"),
        )
        .orderBy("doc_id")
    )
