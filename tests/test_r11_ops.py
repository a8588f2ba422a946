"""Round-11 goldens: advisor fixes (structural encode guard, PSL
depth auto-derivation, vocabulary-arm MLM) and new operators."""

import pytest
from pyspark.sql import functions as F


def test_is_mojibake_structural_guard_survives_filter_pushdown(spark):
    """The strict Latin-1 encode must sit behind a STRUCTURAL CaseWhen
    guard: when is_mojibake is used as a FILTER predicate Catalyst
    splits and reorders conjuncts, and under Spark 4's strict
    codingErrorAction an unguarded encode('ISO-8859-1') THROWS on the
    CJK rows (MALFORMED_CHARACTER_CODING) instead of returning false.
    """
    from etl_orders_to_bq_spark.functions.encoding import (
        is_mojibake,
        sloppy_cp1252_mojibake,
    )

    damaged = sloppy_cp1252_mojibake("it’s “fine” – ok")
    rows = [
        (1, damaged),
        (2, "汉字テキスト한글"),  # unmappable: must not reach encode
        (3, "plain ascii"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    # the filter form is the dangerous one (predicate split/reorder)
    got = [r.id for r in df.filter(is_mojibake("text")).collect()]
    assert got == [1]
    # and through an extra unrelated conjunct that invites reordering
    got2 = [
        r.id
        for r in df.filter(
            is_mojibake("text") & (F.length("text") > 0)
        ).collect()
    ]
    assert got2 == [1]


def test_registrable_domain_default_depth_covers_supplied_rules(spark):
    """max_suffix_labels now defaults to the deepest rule actually
    supplied: a 5-label PSL rule must match without touching the knob
    (the r10 advisor finding — the old default of 4 silently never
    generated 5-label candidate keys)."""
    from etl_orders_to_bq_spark.functions.urls import registrable_domain

    rules = ["com", "a.b.c.d.e"]  # 5-label literal rule
    hosts = spark.createDataFrame(
        [("site.a.b.c.d.e",), ("deep.site.a.b.c.d.e",),
         ("www.example.com",)],
        ["host"],
    )
    got = {
        r.host: r.domain
        for r in registrable_domain(hosts, "host", rules).collect()
    }
    assert got["site.a.b.c.d.e"] == "site.a.b.c.d.e"
    assert got["deep.site.a.b.c.d.e"] == "site.a.b.c.d.e"
    assert got["www.example.com"] == "example.com"


def test_mlm_mask_vocab_arm_draws_from_corpus_vocabulary(spark):
    """mlm_mask(vocab_df=...) routes the 10% random-replacement arm
    through the supplied corpus vocabulary (the exact BERT recipe)
    instead of the document's own tokens; the mask/keep arms and the
    labels are IDENTICAL to the document-local default, and the run
    is deterministic."""
    from etl_orders_to_bq_spark.operators.lm import mlm_mask

    text = " ".join(f"tok{i}" for i in range(120))
    df = spark.createDataFrame([(1, text), (2, text + " extra")],
                               ["doc_id", "text"])
    vocab = spark.createDataFrame(
        [(f"vw{i}",) for i in range(32)], ["token"]
    )
    base = {r.doc_id: r for r in mlm_mask(df).collect()}
    withv = {r.doc_id: r
             for r in mlm_mask(df, vocab_df=vocab).collect()}
    again = {r.doc_id: r
             for r in mlm_mask(df, vocab_df=vocab).collect()}
    for d in (1, 2):
        # selection and labels are arm-independent
        assert withv[d].labels == base[d].labels
        assert withv[d].n_masked == base[d].n_masked
        assert withv[d].n_tokens == base[d].n_tokens
        # deterministic rerun
        assert again[d].masked_text == withv[d].masked_text
    # the vocab arm actually fires somewhere and uses vocab tokens
    all_masked = " ".join(withv[d].masked_text for d in (1, 2)).split()
    vocab_hits = [t for t in all_masked if t.startswith("vw")]
    assert vocab_hits, "random arm never drew from the vocabulary"
    # and no vocab token ever appears in the default run
    assert not any(
        t.startswith("vw")
        for d in (1, 2)
        for t in base[d].masked_text.split()
    )
