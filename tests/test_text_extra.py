"""Planted-fixture coverage for the text operators whose corpus-side
behavior is vacuous on the clean synthetic documents: PII redaction
(corpus has no PII) and shared-span dedup guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.operators import textops as TX


def test_redact_pii_planted_fixtures(spark):
    rows = [
        (0, "contact jo.doe+x@test-site.org for details"),
        (1, "call +1 555 123 4567 or 555-867-5309 today"),
        (2, "server at 10.0.0.1 and 192.168.255.254 up"),
        (3, "clean text stays exactly as written"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["red"], r["c"]["n_email"], r["c"]["n_phone"], r["c"]["n_ipv4"])
        for r in df.select(
            "doc_id",
            TX.redact_pii(F.col("text")).alias("red"),
            TX.pii_counts(F.col("text")).alias("c"),
        ).collect()
    }
    assert got[0] == ("contact <EMAIL> for details", 1, 0, 0)
    assert got[1] == ("call <PHONE> or <PHONE> today", 0, 2, 0)
    assert got[2] == ("server at <IPV4> and <IPV4> up", 0, 0, 2)
    assert got[3] == ("clean text stays exactly as written", 0, 0, 0)


def test_shared_span_pairs_planted_span_and_ubiquity_guard(spark):
    """Two docs sharing a long literal span must pair; a phrase present in
    EVERY doc must index nothing (df cap) — no all-pairs blowup."""
    common = "alpha beta gamma delta"  # ubiquitous: in all docs
    span = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, f"{common} {span} unique zero tail words here"),
        (1, f"{common} {span} other one ending entirely different"),
        (2, f"{common} completely unrelated body of text body"),
        (3, f"{common} yet another separate document body text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in TX.shared_span_pairs(df, max_df=2, min_shared=2).collect()
    }
    assert (0, 1) in pairs
    # the ubiquitous-common-prefix docs must NOT all pair with each other
    assert (2, 3) not in pairs


def test_repetition_metrics_flags_repeated_doc(spark):
    rows = [
        (0, "spam spam spam spam spam spam"),
        (1, "one two three four five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in TX.repetition_metrics(df).collect()}
    assert got[0]["dup_token_ratio"] > 0.8 and got[0]["top_bigram_share"] == 1.0
    assert got[1]["dup_token_ratio"] == 0.0
    assert got[1]["top_bigram_share"] < 0.5


def test_contamination_report_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words then the quick brown fox jumps too"),  # 4-gram hit
            (11, "completely unrelated document body with other words"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared_grams"], r["contaminated"])
        for r in TX.contamination_report(corpus, bench, n=4).collect()
    }
    assert got[10][1] and got[10][0] >= 1
    assert got[11] == (0, False)


def _bpe_reference(texts, n_merges):
    """Pure-Python BPE with the same tiebreak (count desc, then (l, r))."""
    from collections import Counter

    freq = Counter(t for text in texts for t in text.strip().lower().split() if t)
    words = {w: list(w) for w in freq}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (l, r), _ = best
        merges.append((rank, l, r))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from skiliopay_datapipeline_customer_spark.operators.textops import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "wide wider widest wide",
        "low new wide lowest newest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = bpe_train(df, n_merges=12)
    want = _bpe_reference(texts, 12)
    assert got == want
    assert len(got) >= 8  # the fixture genuinely trains several merges


def test_bpe_train_on_documents_table(spark, sf_dir):
    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.textops import bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8, checkpoint_interval=3)
    assert len(merges) == 8
    ranks = [m[0] for m in merges]
    assert ranks == list(range(8))
    # merged tokens grow: later merges may reference earlier merge outputs
    assert all(isinstance(l, str) and isinstance(r, str) for _, l, r in merges)


def test_bpe_encode_matches_reference_and_reconstructs(spark):
    """Encoding invariants: (a) concatenating a word's subword tokens
    reproduces the word for every document; (b) the distributed encoder
    matches a pure-Python reference encoder applying the same rank-ordered
    merge rules; (c) encode() on the training corpus uses merged symbols
    (compression actually happened)."""
    from skiliopay_datapipeline_customer_spark.operators import textops as T

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cats sat on the mats"),
        (2, "that hat is the cat hat"),
        (3, "mats and hats and cats"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = T.bpe_train(df, n_merges=10)
    assert merges and merges[0][0] == 0

    got = {
        r.doc_id: list(r.tokens)
        for r in T.bpe_encode(df, merges).collect()
    }

    ranks = {(l, r): k for k, l, r in merges}

    def ref_word(word):
        syms = list(word)
        while len(syms) > 1:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    for doc_id, text in rows:
        words = text.lower().split()
        expected = [s for w in words for s in ref_word(w)]
        assert got[doc_id] == expected
        # reconstruction: tokens concatenate back to the original words
        assert "".join(expected) == "".join(words)

    # compression happened: at least one multi-char token appears
    assert any(len(t) > 1 for toks in got.values() for t in toks)


def test_chunk_text_udtf_matches_native_boundaries(spark):
    """The UDTF tier and the native offset tier must be the same pure
    function of the token count: identical (doc, chunk_id, start, len)
    sets, and each chunk_text reconstructs the token slice it claims —
    including the empty-doc and shorter-than-overlap edge cases."""
    from skiliopay_datapipeline_customer_spark.operators import textops as T

    rows = [
        (0, "one two three four five six seven eight nine ten"),
        (1, "a b"),          # shorter than the overlap: one chunk
        (2, ""),             # empty: one zero-length chunk row
        (3, " ".join(f"w{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    spark.udtf.register("chunk_text_t", T.chunk_text_udtf())
    df.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, c.* FROM _udtf_docs d, "
        "LATERAL chunk_text_t(d.text, 8, 3) c"
    ).collect()

    want = {
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_len)
        for r in T.chunk_assignments(df, chunk_tokens=8, overlap=3).collect()
    }
    assert {
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_len) for r in got
    } == want

    import re

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in rows}
    for r in got:
        back = re.split(r"\s+", r.chunk_text.strip())
        assert back == toks[r.doc_id][r.chunk_start : r.chunk_start + 8]


def test_unigram_logprob_ranks_gibberish_below_common_text(spark, tmp_path):
    """The perplexity-proxy contract: a document made of corpus-rare tokens
    must score a lower mean log-probability than one of corpus-common
    tokens (trained on the same corpus)."""
    import os

    from skiliopay_datapipeline_customer_spark.queries.text import (
        unigram_doc_logprob,
    )

    docs = [(i, "the cat sat on the mat", "en", "s", 22) for i in range(20)]
    docs.append((100, "zxqv wxyq qqzz zxqv", "en", "s", 19))
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    scores = {
        r.doc_id: r.mean_logprob
        for r in unigram_doc_logprob(spark, sf).collect()
    }
    common = max(v for k, v in scores.items() if k != 100)
    assert scores[100] < common < 0


def test_line_dedup_removes_later_occurrences_and_reassembles(spark):
    """First corpus occurrence of a span survives; later ones (across or
    within docs) are cut; docs rebuild in span order; a fully-duplicated
    doc empties."""
    shared = "a b c d e f g h"          # exactly one 8-token span
    docs = spark.createDataFrame(
        [
            (1, shared + " p q r s t u v w"),   # both spans first-seen
            (2, shared + " x y z zz"),          # span 0 duplicates doc 1's
            (3, shared),                        # fully duplicated -> empty
            (4, "p q r s t u v w " + shared),   # both spans seen earlier
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in TX.line_dedup(docs, line_tokens=8).collect()
    }
    assert out[1]["text"] == shared + " p q r s t u v w"
    assert (out[1]["lines_kept"], out[1]["lines_removed"]) == (2, 0)
    assert out[2]["text"] == "x y z zz"
    assert (out[2]["lines_kept"], out[2]["lines_removed"]) == (1, 1)
    assert out[3]["text"] == "" and out[3]["lines_removed"] == 1
    assert out[4]["text"] == "" and out[4]["lines_removed"] == 2


def test_sentiment_terms_weights_with_multiplicity(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "fast fast slow"), (2, "big dup"), (3, "table scan")], ["id", "t"]
    )
    rows = {
        r["id"]: r["s"]
        for r in df.select("id", TX.sentiment_terms(F.col("t")).alias("s")).collect()
    }
    assert (rows[1]["score"], rows[1]["pos_hits"], rows[1]["neg_hits"]) == (2, 2, 1)
    assert rows[2]["score"] == -4
    assert (rows[3]["score"], rows[3]["pos_hits"], rows[3]["neg_hits"]) == (0, 0, 0)
