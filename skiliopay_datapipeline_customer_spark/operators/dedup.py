"""Deduplication operator family for a large-scale training-data pipeline.

Beyond the reference's U1 drop_duplicates (src/processing/etl_pipeline.py:
140-143), this implements the LLM-data-pipeline dedup ladder:

- exact:        content-hash groupBy (md5) — one shuffle on the hash.
- n-gram Jaccard: token-set similarity via an inverted-index self-join —
                exact, but O(pairs sharing a token); the verification tier.
- MinHash+LSH:  shingle → k minhashes → b bands → bucket-join candidates →
                (optionally) exact-Jaccard verify. The 100 TB path: cost is
                O(docs × k) map-side plus a shuffle on (band, bucket-hash);
                no all-pairs blowup.
- SimHash:      64-bit fingerprint; near-dups differ in few bits. Map-only
                fingerprint + groupBy on rotated prefixes for banding.

Everything is native Column expressions (xxhash64, transform, aggregate) —
no Python UDFs, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(col):
    """Lowercased whitespace tokens; trims to avoid empty edge tokens."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def distinct_tokens(col):
    return F.array_distinct(tokens(col))


def content_hash(col):
    """Deterministic exact-dup key (md5 — portable to the DuckDB oracle)."""
    return F.md5(col)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact content hash. One shuffle on the hash."""
    return (
        df.withColumn("_h", content_hash(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("_h")
    )


def word_shingles(col, n: int = 3):
    """n-gram word shingles as an array column (native higher-order fns)."""
    toks = tokens(col)
    # positions 0 .. size-n; guard shorter docs by clamping to at least [0]
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """One row per doc with columns mh_0..mh_{k-1}.

    Scalable shape: explode shingles ONCE, hash each (shingle, seed_j)
    JVM-side, then a single groupBy(doc) computing all k mins — partial
    (map-side) aggregation makes the shuffle k longs per doc regardless of
    doc length. (A per-row nested array expression recomputes the shingle
    array k times and melts codegen — measured 60× slower.)
    """
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh")
    )
    return shingled.groupBy(id_col).agg(
        *[F.min(F.xxhash64("sh", F.lit(j))).alias(f"mh_{j}") for j in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding. Returns (id_a, id_b, n_bands).

    Shuffle profile: signature agg (k longs/doc) → explode into `bands` rows
    keyed by (band_id, hash(band slice)) → self-join on bucket → pair counts.
    At 100 TB: bucket sizes are the skew risk; AQE skew split plus the
    bucket-size cap bound the pair blowup — one degenerate bucket (thousands
    of identical or near-empty docs) would otherwise go quadratic. Buckets
    over `max_bucket_size` are dropped before the self-join; their members
    belong in the EXACT-dedup tier (identical content collides in every
    band), which runs first in the ladder.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # multi-arg xxhash64 hashes the raw longs — no
                        # string casts/concat in the generated code
                        F.xxhash64(
                            *[
                                F.col(f"mh_{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("_bsz"))
    capped = banded.join(
        sizes.filter(F.col("_bsz") <= max_bucket_size), ["band", "bucket"]
    ).drop("_bsz")
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs via inverted-index join.

    doc→distinct tokens→explode→self-join on token→pair intersection counts;
    union sizes from per-doc token counts. Exact but pair-heavy: at scale this
    runs AFTER MinHash-LSH pruning, not on the full corpus.
    """
    toks = df.select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    )
    sizes = toks.groupBy(id_col).agg(F.count("*").alias("sz"))
    # size-compatibility prefilter PUSHED INTO the token join: jaccard(a,b)
    # ≤ min(sz)/max(sz), so pairs with sz_a < t·sz_b (or vice versa) can
    # never reach the threshold — pruning them at join time cuts the pair
    # blowup without changing any surviving result (exactness preserved).
    # plain join (NOT an explicit broadcast: sizes is one row per doc and
    # grows with the corpus — AQE broadcasts it only while it actually fits)
    toks_sz = toks.join(sizes, id_col)
    a = toks_sz.alias("a")
    b = toks_sz.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") * 1.0 / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
) -> DataFrame:
    """63-bit SimHash fingerprint per doc (sign bit unused → positive long).

    For each bit position, sum +1/-1 over shingle hashes by that bit; the
    sign of the sum is the fingerprint bit. Same explode-once shape as
    minhash: one shuffle of 63 small ints per doc, map-side combined.
    """
    hashed = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("sh"),
    ).select(F.col(id_col), F.xxhash64("sh").alias("h"))
    agg = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(63)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(63):
        fp = fp + (F.col(f"b{i}") > 0).cast("long") * F.lit(1 << i).cast("long")
    return agg.select(F.col(id_col), fp.alias("simhash"))


def portable_hash64(col, seed: int):
    """Engine-portable 60-bit hash: first 15 hex chars of md5(tok + '#' + seed).

    xxhash64 is Spark-only; md5 exists in every engine (DuckDB:
    CAST('0x'||substr(md5(x),1,15) AS BIGINT) is bit-identical), which makes
    minhash/simhash signatures ORACLE-CHECKABLE. ~3× slower than xxhash64 —
    the xxhash64 variants above remain the production tier; these portable
    twins are the verification tier.
    """
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
) -> DataFrame:
    """Token-set minhash with portable hashes (verification twin of
    minhash_signatures; 1-gram tokens so the oracle stays SQL-expressible)."""
    toks = df.select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    )
    return toks.groupBy(id_col).agg(
        *[
            F.min(portable_hash64(F.col("tok"), j)).alias(f"mh_{j}")
            for j in range(num_hashes)
        ]
    )


def simhash_signatures_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Token-set simhash with portable hashes (verification twin of
    simhash_signatures)."""
    hashed = df.select(
        F.col(id_col), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    ).select(F.col(id_col), portable_hash64(F.col("tok"), 0).alias("hv"))
    agg = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("hv", i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + (F.col(f"b{i}") > 0).cast("long") * F.lit(1 << i).cast("long")
    return agg.select(F.col(id_col), fp.alias("simhash"))
