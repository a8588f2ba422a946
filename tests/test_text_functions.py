"""Unit tests for the text-analysis Column functions (the oracle gate
checks them at corpus scale; these pin the micro-semantics)."""

from pyspark.sql import functions as F

from etl_orders_to_bq_spark.functions.text import (
    bpe_ish_token_count,
    char_ngrams,
    doc_fingerprint,
    language_id,
    normalize_text,
    quality_score,
    rolling_fingerprints,
    token_count,
    tokenize,
    word_ngrams,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col.alias("v")).first()["v"]


def test_tokenize_and_counts(spark):
    assert _one(spark, "  a  bb   ccc ", tokenize("text")) == ["a", "bb", "ccc"]
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "one-two, three!", token_count("text")) == 2
    # BPE-ish: 'hello' -> hell+o, digits and punct separate
    assert _one(spark, "hello 42!", bpe_ish_token_count("text")) == 5


def test_ngrams(spark):
    assert _one(spark, "a b c d", word_ngrams("text", 3)) == ["a b c", "b c d"]
    assert _one(spark, "a b", word_ngrams("text", 3)) == []
    assert _one(spark, "abcd", char_ngrams("text", 3)) == ["abc", "bcd"]


def test_language_id_votes(spark):
    assert _one(spark, "the cat and the dog is in that house", language_id("text")) == "en"
    assert _one(spark, "der hund und die katze ist nicht hier", language_id("text")) == "de"
    assert _one(spark, "zzz qqq www", language_id("text")) == "und"
    # tie between en and de resolves to the first language in dict order
    assert _one(spark, "the und", language_id("text")) == "en"


def test_quality_monotonic(spark):
    good = _one(
        spark,
        "the cat and the dog is in that house with the bird and the fish "
        * 4,
        quality_score("text"),
    )
    bad = _one(spark, "@@ ## $$ %%", quality_score("text"))
    assert good > 0.5 > bad


def test_fingerprints(spark):
    a = _one(spark, "Hello   World", doc_fingerprint("text"))
    b = _one(spark, "hello world", doc_fingerprint("text"))
    c = _one(spark, "hello worlds", doc_fingerprint("text"))
    assert a == b != c
    assert _one(spark, "  A  b ", normalize_text("text")) == "a b"
    rf1 = _one(spark, "the quick brown fox jumps over it", rolling_fingerprints("text"))
    rf2 = _one(spark, "the quick brown fox jumps over it!", rolling_fingerprints("text"))
    assert len(rf1) == 4
    # winnowing property: small edit keeps most min-hashes
    assert len(set(rf1) & set(rf2)) >= 2


def test_redact_pii_golden(spark):
    from etl_orders_to_bq_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-site.org now"),
            (2, "see https://ex.com/x?q=1 and http://b.io"),
            (3, "call +1 555-123-4567 or 555.987.6543"),
            (4, "host 192.168.1.254 up"),
            (5, "clean text stays clean"),
            (6, None),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["c"] for r in df.select("id", redact_pii("t").alias("c")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "see <URL> and <URL>"
    assert "<PHONE>" in got[3] and "4567" not in got[3] and "6543" not in got[3]
    assert got[4] == "host <IP> up"
    assert got[5] == "clean text stays clean"
    assert got[6] is None


def test_repetition_stats_golden(spark):
    from etl_orders_to_bq_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d"),            # all distinct words + bigrams
            (2, "a a a a"),            # fully repeated
            (3, "x y x y x"),          # alternating: "x y" appears twice
            (4, "solo"),               # single word, no bigrams
        ],
        "id long, t string",
    )
    got = {
        r["id"]: (r["r"]["n_words"], r["r"]["dup_word_frac"], r["r"]["top_bigram_frac"])
        for r in df.select("id", repetition_stats("t").alias("r")).collect()
    }
    assert got[1] == (4, 0.0, round(1 / 3, 4))
    assert got[2] == (4, 0.75, 1.0)
    # 5 words, 2 distinct -> dup 0.6; bigrams: x y, y x, x y, y x -> top 2/4
    assert got[3] == (5, 0.6, 0.5)
    assert got[4] == (1, 0.0, 0.0)


def test_hashed_linear_classifier_matches_reference(spark):
    """The fastText-shaped hashed linear scorer must reproduce a
    sequential python implementation exactly (md5 bucketing, unigram+
    bigram features, sigmoid at 6dp), handle empty documents via the
    sigmoid(bias) path, and respect the rounded-threshold keep rule."""
    import hashlib
    import math

    from etl_orders_to_bq_spark.operators.classifier import (
        hashed_linear_score,
        seeded_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "THE   Quick brown  fox jumps"),  # normalizes to doc 1
            (3, ""),
            (4, "zebra"),
        ],
        "doc_id long, text string",
    ).repartition(3)
    w = seeded_weights(128, seed=17)
    bias = 0.05
    got = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in hashed_linear_score(
            docs, w, bias=bias, threshold=0.5
        ).collect()
    }

    def ref(text):
        toks = " ".join(text.lower().split()).split()
        gs = [t + "|u" for t in toks] + [
            f"{a} {b}|b" for a, b in zip(toks, toks[1:])
        ]
        z = sum(
            w[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % len(w)]
            for g in gs
        ) + bias
        return round(1.0 / (1.0 + math.exp(-z)), 6)

    for i, t in [(1, "the quick brown fox jumps"), (3, ""), (4, "zebra")]:
        assert got[i] == (ref(t), ref(t) >= 0.5), (i, got[i], ref(t))
    # normalization: differing whitespace/case scores identically
    assert got[2] == got[1]
    # empty doc takes the bias-only path
    assert got[3][0] == round(1.0 / (1.0 + math.exp(-bias)), 6)


def test_hashed_linear_classifier_xxhash64_path(spark):
    """The xxhash64 production hash family must produce valid scores
    with the same structural contract as md5 — every doc scored once,
    scores in (0, 1), empty docs on the bias-only path, and identical
    normalization behavior — while distributing grams across buckets
    (family differs from md5 by design; weights are per-family)."""
    import math

    from etl_orders_to_bq_spark.operators.classifier import (
        hashed_features,
        hashed_linear_score,
        seeded_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "THE   Quick brown  fox jumps over the lazy dog"),
            (3, ""),
            (4, "zebra quagga okapi"),
        ],
        "doc_id long, text string",
    ).repartition(3)
    w = seeded_weights(128, seed=17)
    bias = 0.05
    got = {
        r["doc_id"]: r["score"]
        for r in hashed_linear_score(
            docs, w, bias=bias, hash_fn="xxhash64"
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert all(0.0 < s < 1.0 for s in got.values())
    assert got[2] == got[1]  # normalization holds on this family too
    assert got[3] == round(1.0 / (1.0 + math.exp(-bias)), 6)
    # buckets land in range and the family actually differs from md5
    feats = {
        fn: sorted(
            (r["doc_id"], r["bucket"])
            for r in hashed_features(docs, dim=128, hash_fn=fn).collect()
        )
        for fn in ("md5", "xxhash64")
    }
    assert all(0 <= b < 128 for _, b in feats["xxhash64"])
    assert feats["md5"] != feats["xxhash64"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_fn"):
        hashed_features(docs, hash_fn="sha9000")
