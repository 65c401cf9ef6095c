"""Embedding similarity-search queries (LLM-pipeline family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..operators import similarity as S
from . import query

# Exact brute-force cosine top-k against the vec_id=0 query vector.
# The oracle computes the same double-precision cosine via list functions.


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT e.vec_id,
             round(
               list_sum(list_transform(list_zip(e.embedding, q.qe),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qe,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos_sim
      FROM embeddings e, q
    )
    SELECT vec_id, cos_sim FROM sims
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def cosine_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0)
    return S.brute_force_topk(emb, qvec, k=10)


# L2 norms — the shared kernel, verifiable on its own.


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
)
def embedding_norms(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    v = S.as_double(F.col("embedding"))
    return emb.select(
        "vec_id", F.round(F.sqrt(S.dot(v, v)), 6).alias("l2_norm")
    ).orderBy("vec_id")


# Per-label centroid similarity: mean vector per label (posexplode + groupBy)
# then cosine of each label centroid against the global centroid.


@query(
    "label_centroid_norms",
    oracle="""
    SELECT label,
           round(sqrt(sum(mean_v * mean_v)), 6) AS centroid_norm
    FROM (
      SELECT label, i, avg(CAST(v AS DOUBLE)) AS mean_v
      FROM (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
      )
      GROUP BY label, i
    )
    GROUP BY label
    ORDER BY label
    """,
)
def label_centroid_norms(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "v")
    ).select("label", "i", F.col("v").cast("double").alias("v"))
    centroids = exploded.groupBy("label", "i").agg(F.avg("v").alias("mean_v"))
    return (
        centroids.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))), 6).alias("centroid_norm"))
        .orderBy("label")
    )


# ANN via random-hyperplane LSH bucketing — the 100 TB probe path: only the
# query's bucket (~corpus/2^planes rows) is scanned, then exact cosine.
# Oracle-checked: the md5-derived plane family folds into the SQL as the
# SAME literals, and both engines compute the projection as a sequential
# left fold (F.aggregate / list_sum), so the sign bits match bit-for-bit.


def _plane_list_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(c) for c in plane) + "]"


def _lsh_ann_topk_oracle(num_planes: int = 8, dim: int = 64, k: int = 10) -> str:
    bits = []
    for j, pl in enumerate(S.make_planes(num_planes, dim)):
        proj = (
            "list_sum(list_transform(list_zip(embedding, "
            f"{_plane_list_sql(pl)}), p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )
        bits.append(f"CAST({proj} > 0 AS INT) * {2 ** j}")
    bucket = "(" + "\n        + ".join(bits) + ")"
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
    ),
    q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT b.vec_id,
           round(
             list_sum(list_transform(list_zip(b.embedding, q.qe),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qe,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_sim
    FROM b JOIN q ON b.bucket = q.qb
    ORDER BY cos_sim DESC, vec_id LIMIT {k}
    """


@query("lsh_ann_topk", oracle=_lsh_ann_topk_oracle(num_planes=6))
def lsh_ann_topk(spark, sf_dir):
    # 6 planes: bucket occupancy ~corpus/64 — wide enough that the probe
    # ranks real neighbors at the sf0.01 driver check, not just the query
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0)
    return S.lsh_topk(emb, qvec, k=10, num_planes=6)


# IVF ANN — r10: moved from rows-only to a FULL-replay oracle. The float
# Lloyd refinement's per-dim double means accumulate in engine-specific
# order, so the old tier could never be replayed; the declared query now
# runs the exact-integer Lloyd coarse quantizer (ml/embeddings.py — the
# same replayable kernel as kmeans_cluster_profile), integer-L2 probe
# selection, and the sequential-fold cosine whose bit-parity with DuckDB
# list_sum the lsh_ann_topk oracle established. The float tier
# (S.ivf_topk + kmeans_refine_centroids) stays as the library path with
# its recall tests.


def _ivf_ann_topk_oracle(
    n_centroids: int = 8, iters: int = 2, n_probe: int = 2,
    dim: int = 64, k: int = 10,
) -> str:
    from .ml import _kmeans_cte_chain

    chain = _kmeans_cte_chain(k=n_centroids, iters=iters, dim=dim)
    rng = f"range(1, {dim + 1})"
    cos = """
             list_sum(list_transform(list_zip(emb.embedding, q.qv),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(emb.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qv,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
    return f"""
    WITH {chain},
    qi AS (SELECT e AS qe FROM e WHERE vec_id = 0),
    probe AS (
      SELECT c.j FROM c{iters} c, qi
      ORDER BY list_sum(list_transform({rng},
                 i -> (qi.qe[i] - c.c[i]) * (qi.qe[i] - c.c[i]))), c.j
      LIMIT {n_probe}
    )
    SELECT emb.vec_id, round({cos}, 6) AS cos_sim
    FROM af
    JOIN embeddings emb ON af.vec_id = emb.vec_id
    JOIN probe p ON CAST(af.kk % 16 AS INT) = p.j
    CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
    ORDER BY cos_sim DESC, emb.vec_id
    LIMIT {k}
    """


@query("ivf_ann_topk", oracle=_ivf_ann_topk_oracle())
def ivf_ann_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0)
    return S.ivf_topk_exact(
        emb, qvec, k=10, n_centroids=8, iters=2, n_probe=2
    )


# Embedding-cosine near-dup pairs — exact all-pairs tier, oracle-checked.
# Threshold 0.45: the synthetic embeddings are near-orthogonal (max pair
# cosine ~0.5), so a production-style 0.8 cut would make the check vacuous
# (0 rows); 0.45 exercises real pairs.


@query(
    "embedding_dup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(b.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           , 6) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def embedding_dup_pairs(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return S.cosine_dup_pairs(emb, threshold=0.45).orderBy("id_a", "id_b")


# Corpus-scale tiered near-dup pairs: banded hyperplane-LSH candidates +
# exact cosine verify, fully distributed (no driver materialization).
# The declared query runs the EXPR kernel — sequential left-fold projections
# whose IEEE add order the oracle replicates with the same md5-derived plane
# literals (list_sum is the fold DuckDB side; proven bit-compatible by the
# cosine oracles above) — so the full band→bucket→cap→self-join→verify
# pipeline is hash-checked, not rows-only. The numpy BLAS kernel (which may
# reorder the projection sum, flipping a sign that lands exactly on a
# hyperplane) is the production tier below (`lsh_dup_pairs_fast`); since r7
# it carries the SAME oracle — see the caveat at its @query — and the
# pytest suite additionally asserts recall ≥ 0.9 against the exact
# all-pairs tier.

_LSH_PLANES = 16
_LSH_BANDS = 4
_LSH_DIM = 64
_LSH_THRESHOLD = 0.45


def _lsh_dup_pairs_oracle() -> str:
    ppb = _LSH_PLANES // _LSH_BANDS
    band_exprs = []
    for band in range(_LSH_BANDS):
        planes = S.make_planes(ppb, _LSH_DIM, plane_offset=band * ppb)
        bits = []
        for j, pl in enumerate(planes):
            proj = (
                "list_sum(list_transform(list_zip(embedding, "
                f"{_plane_list_sql(pl)}), p -> CAST(p[1] AS DOUBLE) * p[2]))"
            )
            bits.append(f"CAST({proj} > 0 AS INT) * {2 ** j}")
        band_exprs.append("(" + "\n        + ".join(bits) + ")")
    bands_sql = ",\n      ".join(band_exprs)
    band_ids = ", ".join(str(b) for b in range(_LSH_BANDS))
    return f"""
    WITH bb AS (
      SELECT vec_id, embedding,
             unnest([{band_ids}]) AS band,
             unnest([
      {bands_sql}
             ]) AS bucket
      FROM embeddings
    ),
    sizes AS (
      SELECT band, bucket, count(*) AS bsz FROM bb GROUP BY band, bucket
    ),
    capped AS (
      SELECT bb.vec_id, bb.embedding, bb.band, bb.bucket
      FROM bb JOIN sizes USING (band, bucket) WHERE sizes.bsz <= 10000
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
             a.embedding AS va, b.embedding AS vb
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT id_a, id_b,
             round(list_sum(list_transform(list_zip(va, vb),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(va,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(vb,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
      FROM cand
    )
    SELECT id_a, id_b, cos_sim FROM sims
    WHERE cos_sim >= {_LSH_THRESHOLD}
    ORDER BY id_a, id_b
    """


@query("lsh_dup_pairs", oracle=_lsh_dup_pairs_oracle())
def lsh_dup_pairs(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    # dim passed explicitly: the oracle embeds 64-dim plane literals, so
    # the fixture dim is pinned — skips the one-row metadata probe job
    return S.lsh_dup_pairs(
        emb,
        threshold=_LSH_THRESHOLD,
        num_planes=_LSH_PLANES,
        bands=_LSH_BANDS,
        kernel="expr",
        dim=_LSH_DIM,
    ).orderBy("id_a", "id_b")


# r07 oracle upgrade: the numpy/BLAS kernel shares the plane family, bucket
# caps, and exact-cosine verify with the expr tier above, so the SAME oracle
# applies. The theoretical divergence (BLAS reorders the projection sum; a
# projection landing within float error of 0 could bucket differently) is a
# candidate-set concern only — and on the driver corpora it is now a
# MEASURED impossibility, not a hope: min |projection| across every
# (vector, plane) pair is 3.8e-6 (sf0.1) / 1.3e-4 (sf0.01) / 6.9e-6
# (sf0.001), i.e. 10^8-10^10 x the worst-case dim*eps summation-reorder
# error (~8e-15), so no BLAS/threading change can flip a bucket sign here.
# tests/test_similarity_extra.py::
# test_lsh_fast_blas_tier_matches_expr_tier_with_measured_margin re-asserts
# both the frame equality and that margin before every driver sweep; on
# arbitrary NEW data the caveat stands.


@query("lsh_dup_pairs_fast", oracle=_lsh_dup_pairs_oracle())
def lsh_dup_pairs_fast(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return S.lsh_dup_pairs(
        emb, threshold=_LSH_THRESHOLD, dim=_LSH_DIM
    ).orderBy("id_a", "id_b")


# The 100 TB configuration, exercised by the driver every rotation:
# num_planes="auto" derives planes-per-band from corpus occupancy (~64
# rows/bucket, candidate volume linear in N — the pinned 16/4 family above
# measured superlinear at sf1, 11.2x wall for the last 10x step) and bands
# from the threshold-anchored recall target. ROWS-ONLY BY CONTRACT: the
# plane count is runtime-derived from a corpus count, so no static SQL can
# embed the family's plane literals the way _lsh_dup_pairs_oracle() does —
# the correctness anchor is instead the pytest superset law
# (tests/test_similarity_extra.py::test_lsh_dup_pairs_auto_planes_scale_with_corpus:
# derived bands extend the pinned family's plane offsets, so every
# oracle-verified pinned pair must reappear here).


@query("lsh_dup_pairs_auto")
def lsh_dup_pairs_auto(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return S.lsh_dup_pairs(
        emb,
        threshold=_LSH_THRESHOLD,
        num_planes="auto",
        bands=_LSH_BANDS,
        dim=_LSH_DIM,
    ).orderBy("id_a", "id_b")


# Int8 scalar quantization of the embedding column (exploded layout, the
# PQ/IVF-builder input): per-dim min/max over the WHOLE corpus, codes for a
# bounded id range. Oracle replicates the two-pass shape as a plain join.


@query(
    "embedding_int8_codes",
    oracle="""
    WITH x AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    stats AS (
      SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY dim
    )
    SELECT x.vec_id, x.dim,
           CASE WHEN s.mx = s.mn THEN 0
                ELSE CAST(round((x.x - s.mn) / (s.mx - s.mn) * 255) AS INT)
           END AS code
    FROM x JOIN stats s ON x.dim = s.dim
    WHERE x.vec_id < 50
    ORDER BY x.vec_id, x.dim
    """,
)
def embedding_int8_codes(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    return (
        S.quantize_embeddings_int8(emb)
        .filter(F.col("vec_id") < 50)
        .orderBy("vec_id", "dim")
    )


# Semantic dedup survivors (SemDeDup shape — Abbas et al. 2023,
# arXiv:2303.09540): embedding-cosine near-dup pairs -> connected components
# -> keep the min-id representative of each semantic cluster. This is the
# embedding tier of the dedup ladder, with the SAME keep-min-id survivor
# semantics as the text tiers (reference keep='first' drop_duplicates,
# src/processing/etl_pipeline.py:141-149, lifted to near-dup clusters).
#
# Scale posture: at 100 TB the pair list comes from the banded-LSH tier
# (lsh_dup_pairs) instead of the exact all-pairs kernel; components are
# min-label propagation with checkpointed lineage (operators/dedup.py), and
# the survivor filter is one pair-sized anti-join against the corpus. The
# declared query runs the exact pair tier so the DuckDB oracle (transitive
# closure via recursive CTE) can hash-check the full composition.

_SEMDEDUP_THRESHOLD = 0.45


@query(
    "semantic_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE sims AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             , 6) >= {_SEMDEDUP_THRESHOLD}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sims
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM sims
    ),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
    ),
    labels AS (
      SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node
    )
    SELECT e.vec_id, e.label
    FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.node
    WHERE l.node IS NULL OR l.cluster = e.vec_id
    ORDER BY e.vec_id
    """,
)
def semantic_dedup_survivors(spark, sf_dir):
    from ..operators.dedup import survivors

    emb = table(spark, sf_dir, "embeddings")
    pairs = S.cosine_dup_pairs(emb, threshold=_SEMDEDUP_THRESHOLD)
    return (
        survivors(emb, pairs, id_col="vec_id")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


# IVF-PQ ANN — r10: moved from rows-only to a FULL-replay oracle. The old
# tier's numpy codebooks (float means, engine-specific accumulation order)
# could never be replayed; the declared query now runs the exact-integer
# pipeline end to end: unit-sphere integer quantization (the norm fold and
# division are bit-identical across engines — component-exact verified over
# the whole table), exact-Lloyd coarse quantizer AND per-subspace PQ
# codebooks, pure-integer ADC candidate cut, fold-kernel cosine re-rank.
# The numpy tier (S.pq_adc_topk) stays as the library path with its recall
# and shape tests.


def _norm_quant_sql(scale: int = 10**6, lo: int | None = None, hi: int | None = None) -> str:
    """SQL for the unit-normalized scaled-integer quantization (mirror of
    quantize_vec_expr(normalize=True)); [lo:hi] slices the result
    (1-based, inclusive — quantize-then-slice ≡ slice-then-quantize for an
    elementwise map)."""
    nrm = (
        "sqrt(list_sum(list_transform(embedding, "
        "y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))"
    )
    base = (
        "list_transform(embedding, x -> CAST(round("
        f"CASE WHEN {nrm} > 0 THEN CAST(x AS DOUBLE) / {nrm} "
        f"ELSE CAST(x AS DOUBLE) END * {float(scale)}) AS BIGINT))"
    )
    if lo is not None:
        base = f"({base})[{lo}:{hi}]"
    return base


def _ivf_pq_ann_topk_oracle(
    m: int = 8, n_codewords: int = 16, n_centroids: int = 8,
    iters: int = 2, n_probe: int = 2, rerank: int = 50,
    dim: int = 64, k: int = 10,
) -> str:
    from .ml import _kmeans_cte_chain

    dsub = dim // m
    chains = [
        _kmeans_cte_chain(
            k=n_centroids, iters=iters, dim=dim, salt="km", prefix="cv",
            vec_expr=_norm_quant_sql(),
        )
    ]
    for s in range(m):
        chains.append(
            _kmeans_cte_chain(
                k=n_codewords, iters=iters, dim=dsub, salt="pq",
                prefix=f"p{s}",
                vec_expr=_norm_quant_sql(lo=s * dsub + 1, hi=(s + 1) * dsub),
            )
        )
    rng_full = f"range(1, {dim + 1})"
    rng_sub = f"range(1, {dsub + 1})"
    ctes = [",\n    ".join(chains)]
    ctes.append("qe AS (SELECT e AS qe FROM cve WHERE vec_id = 0)")
    ctes.append(
        f"""probe AS (
      SELECT c.j FROM cvc{iters} c, qe
      ORDER BY list_sum(list_transform({rng_full},
                 i -> (qe.qe[i] - c.c[i]) * (qe.qe[i] - c.c[i]))), c.j
      LIMIT {n_probe}
    )"""
    )
    for s in range(m):
        ctes.append(
            f"""adt{s} AS (
      SELECT c.j, list_sum(list_transform({rng_sub},
               i -> (qe.qe[{s * dsub} + i] - c.c[i])
                  * (qe.qe[{s * dsub} + i] - c.c[i]))) AS d
      FROM p{s}c{iters} c, qe
    )"""
        )
    code_joins = "\n      ".join(
        f"JOIN p{s}af x{s} ON x{s}.vec_id = cvaf.vec_id "
        f"JOIN adt{s} a{s} ON a{s}.j = CAST(x{s}.kk % 16 AS INT)"
        for s in range(m)
    )
    adc_sum = " + ".join(f"a{s}.d" for s in range(m))
    ctes.append(
        f"""cand AS (
      SELECT cvaf.vec_id, ({adc_sum}) AS adc
      FROM cvaf
      JOIN probe pr ON CAST(cvaf.kk % 16 AS INT) = pr.j
      {code_joins}
      ORDER BY adc, cvaf.vec_id
      LIMIT {rerank}
    )"""
    )
    cos = """
             list_sum(list_transform(list_zip(emb.embedding, q.qv),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(emb.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qv,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT emb.vec_id, round({cos}, 6) AS cos_sim
    FROM cand
    JOIN embeddings emb ON cand.vec_id = emb.vec_id
    CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
    ORDER BY cos_sim DESC, emb.vec_id
    LIMIT {k}
    """
    )


# iters=1 in the declared query: each Lloyd round is a driver job whose
# toy-SF cost is dominated by planning overhead (~2 s/round for coarse +
# PQ), and one round after the deterministic seeding already yields a
# useful index — the final answer is an EXACT cosine re-rank either way.
# The operators keep iters=2 defaults for library users.
@query("ivf_pq_ann_topk", oracle=_ivf_pq_ann_topk_oracle(iters=1))
def ivf_pq_ann_topk(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0)
    return S.pq_adc_topk_exact(emb, qvec, k=10, iters=1)


# Per-dimension distribution stats over the embedding column — the
# sanity/monitoring pass before any ANN or quantization tier (a collapsed
# or drifted dimension shows up here first). posexplode multiplies rows by
# dim (64×) but each exploded row is 12 bytes and the map-side partial
# aggregate folds them to `dim` groups before the (tiny, 64-row) shuffle.


@query(
    "embedding_dim_stats",
    oracle="""
    SELECT i - 1 AS dim,
           round(avg(CAST(v AS DOUBLE)), 6) AS mean_v,
           round(stddev_samp(CAST(v AS DOUBLE)), 6) AS std_v,
           round(min(CAST(v AS DOUBLE)), 6) AS min_v,
           round(max(CAST(v AS DOUBLE)), 6) AS max_v
    FROM (SELECT unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY dim
    ORDER BY dim
    """,
)
def embedding_dim_stats(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(v), 6).alias("mean_v"),
            F.round(F.stddev_samp(v), 6).alias("std_v"),
            F.round(F.min(v), 6).alias("min_v"),
            F.round(F.max(v), 6).alias("max_v"),
        )
        .orderBy("dim")
    )


# Embedding-space train/eval leakage check (the semantic tier of benchmark
# decontamination): per held-out vector, its nearest TRAINING vector and
# max cosine — the distribution a curator inspects before trusting eval
# numbers. Split is md5-deterministic; the eval side is benchmark-sized in
# practice, so it BROADCASTS against the distributed train scan (the
# nested-loop is against the small side — the legitimate exact kernel; the
# corpus×corpus variant goes through `lsh_dup_pairs`). Tie-break: highest
# similarity, then highest train id (max-struct == ORDER BY sim DESC, id
# DESC on the oracle).


@query(
    "nearest_train_similarity",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             CAST('0x' || substr(md5('split:' || CAST(vec_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS b
      FROM embeddings
    ),
    pairs AS (
      SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
             round(
               list_sum(list_transform(list_zip(e.embedding, t.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(t.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS sim
      FROM s e JOIN s t ON e.b < 10 AND t.b >= 10
    ),
    ranked AS (
      SELECT eval_id, train_id, sim,
             row_number() OVER (PARTITION BY eval_id
                                ORDER BY sim DESC, train_id DESC) AS rn
      FROM pairs
    )
    SELECT eval_id, train_id AS nearest_train_id, sim AS max_train_sim,
           CAST(sim >= 0.45 AS INT) AS leaked
    FROM ranked WHERE rn = 1 ORDER BY eval_id
    """,
)
def nearest_train_similarity(spark, sf_dir):
    from ..operators.sampling import hash_bucket

    emb = table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn("_b", hash_bucket(F.col("vec_id"), salt="split"))
    # norms fold ONCE PER DOC before the quadratic stage (same left fold →
    # identical double → oracle-safe); inlining them in `sim` would re-run
    # two dim-term sqrt-folds on every eval×train pair
    ev = bucketed.filter(F.col("_b") < 10).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("_ev"),
        S.norm(S.as_double(F.col("embedding"))).alias("_ne"),
    )
    tr = bucketed.filter(F.col("_b") >= 10).select(
        F.col("vec_id").alias("train_id"),
        "embedding",
        S.norm(S.as_double(F.col("embedding"))).alias("_nt"),
    )
    sim = F.round(
        S.dot(S.as_double(F.col("_ev")), S.as_double(F.col("embedding")))
        / (F.col("_ne") * F.col("_nt")),
        6,
    )
    return (
        tr.crossJoin(F.broadcast(ev))
        .select("eval_id", "train_id", sim.alias("sim"))
        .groupBy("eval_id")
        .agg(F.max(F.struct("sim", "train_id")).alias("_m"))
        .select(
            "eval_id",
            F.col("_m.train_id").alias("nearest_train_id"),
            F.col("_m.sim").alias("max_train_sim"),
            (F.col("_m.sim") >= 0.45).cast("int").alias("leaked"),
        )
        .orderBy("eval_id")
    )
