"""Round-10 goldens: oracle-generator fixes and new operators."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_autok_slice_oracle_matches_engine_at_unrealized_k(spark):
    """The count-driven slice oracle (_ivf_assign_autok_sql) must equal
    the engine's assignment at a k NO fixture realizes (n=1200 ->
    k=10) — the exact hole the r9 two-arm CASE left open (advisor
    finding: 1024 < n <= 1920 used k=16 while the engine uses 9..15).
    """
    import math

    from __spark_entry__ import _ivf_assign_autok_sql
    from etl_orders_to_bq_spark.operators.ann import (
        _hyperplanes,
        assign_ivf_clusters,
    )

    n, dim = 1200, 8
    # deterministic synthetic embeddings (LCG, same discipline as
    # _hyperplanes) — no fixture has 1024 < n <= 1920 rows
    state, rows = 12345, []
    for i in range(n):
        vec = []
        for _ in range(dim):
            state = (
                state * 6364136223846793005 + 1442695040888963407
            ) % (2**63)
            vec.append((state / float(2**63)) * 2.0 - 1.0)
        rows.append((i, vec))
    k = max(8, math.ceil(n / 128))
    assert k == 10  # the unrealized arm under test
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    eng = (
        assign_ivf_clusters(df, _hyperplanes(dim, k, 42), "embedding")
        .select("vec_id", "ivf_cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    sql = _ivf_assign_autok_sql(dim=dim, max_k=32, seed=42)
    ora = con.execute(
        f"select vec_id, {sql} as ivf_cluster from embeddings "
        "order by vec_id"
    ).df()
    assert list(eng["ivf_cluster"]) == list(ora["ivf_cluster"])


def test_autok_slice_oracle_nulls_loudly_past_bound():
    """Past n > target*max_k the slice expression must yield NULL (a
    loud sweep failure), never a silently truncated centroid set."""
    from __spark_entry__ import _ivf_assign_autok_sql

    con = duckdb.connect()
    con.execute(
        "create table embeddings as "
        "select i as vec_id, [0.1, 0.2]::DOUBLE[] as embedding "
        "from range(5000) t(i)"
    )
    sql = _ivf_assign_autok_sql(
        dim=2, max_k=4, seed=42, target=128
    )  # bound: 512 rows << 5000
    out = con.execute(
        f"select {sql} as b from embeddings limit 1"
    ).fetchone()
    assert out[0] is None


def test_kneser_ney_hand_computed_golden(spark):
    """Hand-derived interpolated-KN cascade on a 3-doc train corpus.

    Train: 'a b c', 'a b d', 'x b c' gives trigram types
    {(a,b,c),(a,b,d),(x,b,c)}, bigram types {(a,b):2,(b,c):2,(b,d):1,
    (x,b):1} (Btot=4), V=5. Hence Pc(c)=(1+1)/(4+5+1)=0.2,
    P(c|b) = (2-0.75)/3 + 0.75*2/3*0.2 = 31/60,
    P(c|a,b) = (1-0.75)/2 + 0.75*2/2*(31/60) = 0.5125.
    'q q q' never backs onto any table: Pc(q)=1/10 -> score -1.0 flat.
    'b c d' hits the foll3=0 guard ((b,c) is a bigram but never a
    trigram prefix) -> P(d|c) falls through mid(c)=0 to Pc(d)=0.2.
    """
    import math

    from etl_orders_to_bq_spark.operators.lm import kneser_ney_scores

    train = spark.createDataFrame(
        [(0, "a b c"), (2, "a b d"), (4, "x b c")], ["doc_id", "text"]
    )
    test = spark.createDataFrame(
        [(1, "a b c"), (3, "q q q"), (5, "a b c d")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.kn_logprob
        for r in kneser_ney_scores(test, train).collect()
    }
    p_abc = 0.25 / 2 + 0.75 * 2 / 2 * (1.25 / 3 + 0.75 * 2 / 3 * 0.2)
    assert abs(p_abc - 0.5125) < 1e-12
    assert got[1] == round(math.log10(0.5125), 6)
    assert got[3] == -1.0
    # doc 5: positions (a,b,c) -> 0.5125 and (b,c,d) -> Pc(d) = 0.2;
    # half-away mean of the micro-rounded pair
    v1 = round(math.log10(0.5125), 6)
    v2 = round(math.log10(0.2), 6)
    s = round(v1 * 1e6) + round(v2 * 1e6)
    m = -((2 * (-s) + 2) // 4) if s < 0 else (2 * s + 2) // 4
    assert got[5] == m / 1e6


def test_registrable_domain_psl_rules(spark):
    """PSL semantics: longest rule wins, implicit-* for unlisted TLDs,
    a bare suffix returns itself, single labels pass through."""
    from etl_orders_to_bq_spark.functions.urls import registrable_domain

    hosts = spark.createDataFrame(
        [
            ("cdn.alice.github.io",),
            ("a.b.example.co.uk",),
            ("example.com",),
            ("com",),
            ("weird.internal",),
            ("single",),
        ],
        ["host"],
    )
    got = {
        r.host: r.domain
        for r in registrable_domain(hosts, "host").collect()
    }
    assert got == {
        "cdn.alice.github.io": "alice.github.io",  # private multi-label
        "a.b.example.co.uk": "example.co.uk",  # ccTLD 2-label rule
        "example.com": "example.com",  # already eTLD+1
        "com": "com",  # bare suffix: itself
        "weird.internal": "weird.internal",  # implicit-* rule
        "single": "single",  # no dots: itself
    }


def test_mojibake_repair_damage_classes(spark):
    """ftfy-shape repair: Latin-1 and sloppy-cp1252 damage (incl. the
    UNDEFINED 0x9D byte) invert exactly; genuine accented text, CJK,
    invalid leads and plain ASCII pass through untouched."""
    from etl_orders_to_bq_spark.functions.encoding import (
        is_mojibake,
        repair_mojibake,
        sloppy_cp1252_mojibake,
    )
    from pyspark.sql import functions as F

    orig1 = "café crème — naïve…"
    orig2 = "it’s “fine” – ok"
    rows = [
        (1, orig1.encode("utf-8").decode("latin-1")),
        (2, sloppy_cp1252_mojibake(orig2)),
        (3, "déjà vu – café"),
        (4, "汉字 mixed"),
        (5, "broken Ã lone"),
        (6, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r.id: (r.hit, r.fixed)
        for r in df.select(
            "id",
            is_mojibake("text").alias("hit"),
            repair_mojibake("text").alias("fixed"),
        ).collect()
    }
    assert got[1] == (True, orig1)
    assert got[2] == (True, orig2)
    for i in (3, 4, 5, 6):
        assert got[i] == (False, rows[i - 1][1])


def test_mojibake_repair_false_positive_class_documented(spark):
    """The documented undecidable class: text that literally SPELLS a
    valid mojibake byte sequence is repaired — byte-level detection
    cannot distinguish it (the ftfy caveat, kept as the contract)."""
    from etl_orders_to_bq_spark.functions.encoding import repair_mojibake

    df = spark.createDataFrame(
        [(1, "literal \u00c3\u00a9 here")], ["id", "text"]
    )
    out = df.select(repair_mojibake("text").alias("t")).collect()[0].t
    assert out == "literal \u00e9 here"


def test_gopher_quality_flags_hand_goldens(spark):
    """Each Gopher rule flips on a purpose-built document."""
    from etl_orders_to_bq_spark.functions.text import (
        gopher_quality_flags,
    )
    from pyspark.sql import functions as F

    good = (
        "the quick brown fox jumps over that lazy dog and friends "
        * 6
    ).strip()  # 60 words, stopwords present, clean lines
    short = "the tiny and that doc"  # < 50 words
    symbols = ("the data and that " + "# " * 20 + "word " * 46).strip()
    bullets = "\n".join(
        "• the point and that " + str(i) + " word word word word"
        for i in range(10)
    )
    no_stop = ("alpha beta gamma delta epsilon zeta " * 10).strip()
    rows = [
        (1, good),
        (2, short),
        (3, symbols),
        (4, bullets),
        (5, no_stop),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    g = gopher_quality_flags("text")
    got = {
        r.id: r
        for r in df.select(
            "id",
            g["passes"].alias("passes"),
            g["word_count_ok"].alias("wc"),
            g["symbol_ratio_ok"].alias("sym"),
            g["bullet_ok"].alias("bul"),
            g["stopword_ok"].alias("stop"),
        ).collect()
    }
    assert got[1].passes
    assert not got[2].wc and not got[2].passes
    assert not got[3].sym and not got[3].passes
    assert not got[4].bul and not got[4].passes  # 10/10 bullet lines
    assert not got[5].stop and not got[5].passes


def test_c4_line_clean_hand_goldens(spark):
    """Line keep/drop per rule, page rules, empty-cleaned contract."""
    from etl_orders_to_bq_spark.functions.text import c4_line_clean
    from pyspark.sql import functions as F

    page = "\n".join(
        [
            "this line has enough words and punctuation.",  # keep
            "no terminal punctuation here at all",  # drop: punct
            "too short.",  # drop: < 5 words
            "please enable javascript to view this content.",  # drop
            "another perfectly reasonable sentence right here!",
            'a quoted line with plenty of words inside."',
        ]
    )
    lorem = page + "\nlorem ipsum dolor sit amet."
    braces = page + "\nfunction f() { return 1; } ok."
    nothing = "short.\nno punct here"
    rows = [(1, page), (2, lorem), (3, braces), (4, nothing)]
    df = spark.createDataFrame(rows, ["id", "text"])
    s = c4_line_clean("text")
    got = {
        r.id: r
        for r in df.select(
            "id",
            s["n_lines"].alias("nl"),
            s["n_kept"].alias("nk"),
            s["page_ok"].alias("ok"),
            s["cleaned"].alias("cleaned"),
        ).collect()
    }
    assert (got[1].nl, got[1].nk, got[1].ok) == (6, 3, True)
    assert got[1].cleaned.split("\n")[0].endswith("punctuation.")
    assert got[2].ok is False  # lorem ipsum page rule
    assert got[3].ok is False  # curly brace page rule
    assert (got[4].nk, got[4].ok, got[4].cleaned) == (0, False, "")


def test_mlm_mask_deterministic_and_recipe_shaped(spark):
    """Masking reproduces exactly across runs; the selected share is
    near 15% and every label position differs-or-keeps per its branch
    digit; n_masked == len(labels)."""
    from etl_orders_to_bq_spark.operators.lm import mlm_mask

    rows = [
        (i, " ".join(f"tok{j}" for j in range(40))) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = mlm_mask(df).orderBy("doc_id").collect()
    b = mlm_mask(df).orderBy("doc_id").collect()
    assert a == b  # bit-for-bit deterministic
    total = sum(r.n_tokens for r in a)
    masked = sum(r.n_masked for r in a)
    assert 0.10 < masked / total < 0.20  # ~15%
    for r in a:
        labs = r.labels.split(" ") if r.labels else []
        assert len(labs) == r.n_masked
        out_toks = r.masked_text.split(" ")
        assert len(out_toks) == r.n_tokens
        for lab in labs:
            pos, orig = lab.split(":", 1)
            got = out_toks[int(pos) - 1]
            # branch: mask token, an in-doc token, or kept original
            assert got == "[MASK]" or got.startswith("tok")


def test_registrable_domain_wildcard_and_exception_rules(spark):
    """Full PSL grammar: wildcard rules make every <x>.suffix its own
    public suffix; exception rules prevail and shorten by one label;
    NULL hosts are kept with NULL domain (not dropped)."""
    from etl_orders_to_bq_spark.functions.urls import registrable_domain

    rules = ["com", "*.ck", "!www.ck", "*.compute.example"]
    hosts = spark.createDataFrame(
        [
            ("a.b.ck",),
            ("www.ck",),
            ("foo.x.compute.example",),
            ("bar.com",),
            ("a.b.unknowntld",),
            (None,),
        ],
        "host string",
    )
    got = {
        r.host: r.domain
        for r in registrable_domain(hosts, "host", rules).collect()
    }
    assert got["a.b.ck"] == "a.b.ck"  # *.ck: b.ck is a suffix
    assert got["www.ck"] == "www.ck"  # !www.ck: suffix is ck
    assert got["foo.x.compute.example"] == "foo.x.compute.example"
    assert got["bar.com"] == "bar.com"
    assert got["a.b.unknowntld"] == "b.unknowntld"  # implicit *
    assert got[None] is None and len(got) == 6  # NULL kept


def test_domain_census_keeps_null_url_docs(spark):
    """A NULL url must not vanish from the census (r10 review)."""
    from pyspark.sql import functions as F

    from etl_orders_to_bq_spark.functions.urls import domain_census

    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x", "one two three"),
            (2, None, "four five six"),
        ],
        "doc_id long, url string, text string",
    )
    out = domain_census(df).collect()
    assert sum(r.n_docs for r in out) == 2


def test_autok_slice_oracle_nulls_when_k_exceeds_max_k():
    """n under target*max_k but k floor (8) above max_k must also be
    NULL, not a silently truncated slice (r10 review)."""
    import duckdb

    from __spark_entry__ import _ivf_assign_autok_sql

    con = duckdb.connect()
    con.execute(
        "create table embeddings as "
        "select i as vec_id, [0.1, 0.2]::DOUBLE[] as embedding "
        "from range(400) t(i)"
    )  # n=400 <= 512 = target*max_k, but k = max(8, 4) = 8 > max_k=4
    sql = _ivf_assign_autok_sql(dim=2, max_k=4, seed=42, target=128)
    assert (
        con.execute(
            f"select {sql} as b from embeddings limit 1"
        ).fetchone()[0]
        is None
    )


def test_jl_project_scale_and_determinism(spark):
    """Components equal sqrt(dim/out_dim) * <x, plane_j> computed in
    python from the same LCG planes; projecting a plane itself gives
    ~sqrt(dim/out_dim) on its own axis."""
    import math

    from etl_orders_to_bq_spark.operators.ann import _hyperplanes
    from etl_orders_to_bq_spark.operators.embstats import jl_project

    dim, out_dim, seed = 8, 4, 31
    planes = _hyperplanes(dim, out_dim, seed)
    vecs = [(0, planes[0]), (1, [0.5] * dim)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        (r.vec_id, r.component): r.value
        for r in jl_project(
            df, dim=dim, out_dim=out_dim, seed=seed
        ).collect()
    }
    scale = math.sqrt(dim / out_dim)
    for vid, v in vecs:
        for j, p in enumerate(planes):
            expect = round(
                sum(a * b for a, b in zip(v, p)) * scale, 6
            )
            assert got[(vid, j)] == expect
    # a unit plane projected onto itself carries the full JL factor
    assert abs(got[(0, 0)] - scale) < 1e-6


def test_vocab_coverage_hand_golden(spark):
    """Counts: a:4, b:2, c:1 (7 tokens). top-1 covers 4/7, top-2 6/7,
    top-5 everything with n_types clamped to 3."""
    from etl_orders_to_bq_spark.operators.lm import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b c a")], ["doc_id", "text"]
    )
    got = {
        r.k: (r.n_types, r.covered_tokens, r.total_tokens, r.coverage)
        for r in vocab_coverage(df, ks=(1, 2, 5)).collect()
    }
    # half-away micro: floor((2*4*1e6 + 7) / 14) / 1e6 = 0.571429
    assert got[1] == (1, 4, 7, 0.571429)
    assert got[2] == (2, 6, 7, 0.857143)
    assert got[5] == (3, 7, 7, 1.0)


def test_boilerplate_line_filter_hand_golden(spark):
    """The shared banner dies in every doc (including the first), the
    unique lines survive, an all-banner doc empties but is KEPT, and
    an empty doc censuses (0, 0, '') instead of vanishing."""
    from etl_orders_to_bq_spark.operators.paragraphs import (
        boilerplate_line_filter,
    )

    banner = "accept our cookies"
    rows = [
        (1, banner + "\nunique one"),
        (2, banner + "\nunique two"),
        (3, banner),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_lines, r.n_removed, r.cleaned)
        for r in boilerplate_line_filter(df, min_docs=3).collect()
    }
    assert got[1] == (2, 1, "unique one")
    assert got[2] == (2, 1, "unique two")
    assert got[3] == (1, 1, "")
    assert got[4] == (0, 0, "")


def test_boilerplate_line_filter_literal_delimiter(spark):
    """A regex metacharacter delimiter ('|') splits literally."""
    from etl_orders_to_bq_spark.operators.paragraphs import (
        boilerplate_line_filter,
    )

    df = spark.createDataFrame(
        [(1, "keep this|only here")], ["doc_id", "text"]
    )
    out = boilerplate_line_filter(
        df, min_docs=9, delimiter="|"
    ).collect()[0]
    assert out.n_lines == 2 and out.cleaned == "keep this|only here"


def test_span_corrupt_roundtrip_and_recipe(spark):
    """Determinism; spans non-overlap with ordered sentinels; and the
    T5 invariant: substituting each <extra_id_k> in `corrupted` with
    its targets span reconstructs the original token stream."""
    import re

    from etl_orders_to_bq_spark.operators.lm import span_corrupt

    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(80))) for i in range(20)
    ] + [(99, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = span_corrupt(df).orderBy("doc_id").collect()
    b = span_corrupt(df).orderBy("doc_id").collect()
    assert a == b
    got = {r.doc_id: r for r in a}
    assert (got[99].n_tokens, got[99].n_spans, got[99].corrupted) == (
        0, 0, "",
    )
    total_spans = 0
    for i in range(20):
        r = got[i]
        total_spans += r.n_spans
        # parse targets into {k: tokens}
        parts = re.split(r"<extra_id_(\d+)> ?", r.targets)
        spans = {}
        for k, seg in zip(parts[1::2], parts[2::2]):
            spans[int(k)] = seg.strip()
        assert sorted(spans) == list(range(r.n_spans))
        # reconstruct
        out = []
        for tk in r.corrupted.split(" ") if r.corrupted else []:
            m = re.fullmatch(r"<extra_id_(\d+)>", tk)
            if m:
                out.extend(spans[int(m.group(1))].split(" "))
            else:
                out.append(tk)
        assert out == rows[i][1].split(" "), f"doc {i} roundtrip"
    assert total_spans > 0  # the recipe actually fires


def test_temperature_sample_boosts_rare_sources(spark):
    """alpha=0.5: with n_big=400, n_rare=16, rates scale as
    sqrt(n)/n = 1/sqrt(n) -> the rare source's keep RATE is
    sqrt(400/16) = 5x the big one's; equal sizes give equal rates."""
    from etl_orders_to_bq_spark.operators.mix import temperature_sample

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "rare") for i in range(16)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = {
        r.source: r
        for r in temperature_sample(df, target_total=96).collect()
    }
    assert got["big"].n_docs == 400 and got["rare"].n_docs == 16
    # SW = 24; rare rate = 96*4/24/16 = 1.0 (the cap boundary),
    # big rate = 96*20/24/400 = 0.2 -> exactly the 5x = sqrt(400/16)
    assert got["rare"].rate_micro == 1000000
    assert got["big"].rate_micro == 200000
    assert got["rare"].n_kept == 16  # rate 1.0 keeps everything
    assert 55 <= got["big"].n_kept <= 105  # ~80 expected, md5 draw
