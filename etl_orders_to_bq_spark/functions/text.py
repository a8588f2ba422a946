"""Text-analysis Column functions for large-scale document pipelines.

All pure Column expressions (JVM-side, codegen'd) — no Python in the hot
path, so they hold up over billions of documents. Each has an exact
ANSI-SQL equivalent (used by the DuckDB correctness oracle).

The reference has no text analytics beyond name cleaning
(reference etl/orders_etl.py:173-192); these are the scale extensions
called for by the build plan (SURVEY.md §7 step 9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately small and fixed: language ID at 100 TB must be
# a cheap, deterministic scan-time expression, not a model call.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que"],
    "es": ["el", "los", "las", "es", "una", "que", "por", "con"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer: array of non-empty tokens.

    Engine-parity note: Java's ``\\S``/``\\s`` include vertical tab
    (U+000B); RE2's (DuckDB oracles) do not. The fixtures are VT-free
    so every tokenizing oracle agrees; a corpus with VT (OCR/PDF
    text) must either normalize VT upstream or spell the class
    explicitly — ``script_counts`` shows the explicit-class pattern.
    """
    return F.regexp_extract_all(_c(col), F.lit(r"\S+"), 0)


def token_count(col: Column | str) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Subword-ish token estimate: count word pieces + digits + punctuation
    runs (a BPE-flavored regex, not a real BPE vocabulary)."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), 0)
    )


def _ngram_zip(parts: Column, n: int, sep: str) -> Column:
    """n-grams of an array via a zip_with chain over shifted copies.

    The naive ``transform(sequence(1, size), i -> slice(src, i, n))``
    references the SOURCE EXPRESSION inside the element lambda, so the
    whole upstream chain (tokenize/normalize regexes) re-evaluates once
    per gram — O(len²) work per row, measured ~50x slower on real docs.
    zip_with evaluates its two array operands once per row, so this
    shape evaluates the source n times per row total. Shorter shifted
    copies are null-padded by zip_with; ``concat`` propagates the nulls
    and the final slice drops them.
    """
    out = parts
    for j in range(1, n):
        # length bound = size(parts): slice caps at array end (a huge
        # literal would overflow start+length in 32-bit and null out)
        shifted = F.slice(parts, j + 1, F.size(parts))
        out = F.zip_with(
            out, shifted, lambda x, y: F.concat(x, F.lit(sep), y)
        )
    return F.slice(out, 1, F.greatest(F.size(parts) - F.lit(n - 1), F.lit(0)))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of space-joined word n-grams (shingles) — the unit of
    MinHash / Jaccard dedup. Empty array when fewer than ``n`` tokens."""
    return _ngram_zip(tokenize(col), n, " ")


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of character n-grams of the input string."""
    return _ngram_zip(F.split(_c(col), ""), n, "")


def _stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Count of stopword occurrences (non-distinct), via one regex scan."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(pattern), 0))


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts,
    'und' when nothing matches. Ties break by LANG_STOPWORDS key order.
    One projection, no shuffle, no UDF."""
    c = _c(col)
    hits = {lang: _stopword_hits(c, ws) for lang, ws in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so that earlier languages win ties (last when() wins in a
    # chained otherwise, hence build from the lowest priority up)
    for lang in reversed(list(hits)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def quality_score(col: Column | str) -> Column:
    """Cheap document quality heuristic in [0, 1]:

    0.4 * stopword ratio (hits/tokens, clamped to 1)
    + 0.3 * alphabetic-character ratio
    + 0.3 * length score (tokens/50, clamped to 1)
    """
    c = _c(col)
    n_tokens = token_count(c)
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    stop_ratio = F.least(
        F.lit(1.0),
        _stopword_hits(c, all_stop) / F.greatest(n_tokens, F.lit(1)).cast("double"),
    )
    alpha_ratio = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")) / F.greatest(
        F.length(c), F.lit(1)
    ).cast("double")
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(50.0))
    return F.round(
        F.lit(0.4) * stop_ratio + F.lit(0.3) * alpha_ratio + F.lit(0.3) * length_score,
        6,
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    Equal fingerprint == exact (normalized) duplicate; group on it for
    exact dedup at any scale (hash-groupBy, map-side combinable)."""
    return F.md5(normalize_text(col))


def rolling_fingerprints(
    col: Column | str, k: int = 8, keep: int = 4, pre_normalized: bool = False
) -> Column:
    """Winnowing-style robust fingerprint: hash every char ``k``-gram of
    the normalized text and keep the ``keep`` smallest hashes (a
    deterministic sample stable under small edits). Returns
    ``array<string>`` of hex hashes.

    PERF: ``char_ngrams``' element lambda references its input
    expression, so an inline ``normalize_text`` re-runs the regex once
    PER GRAM (measured ~50x slower). Stage the normalized text as a
    real column behind a projection barrier (an exchange or
    localCheckpoint) and pass ``pre_normalized=True``.
    """
    src = _c(col) if pre_normalized else normalize_text(col)
    grams = char_ngrams(src, k)
    hashes = F.transform(grams, lambda g: F.md5(g))
    return F.slice(F.array_sort(hashes), 1, keep)


def redact_pii(col: Column | str) -> Column:
    """Redact common PII shapes (emails, URLs, US-style phone numbers,
    IPv4 addresses) with typed placeholders — the standard scrub pass
    before text enters a training corpus.

    Pure chained ``regexp_replace`` (codegen, no UDF); patterns stick
    to RE2-compatible syntax (no lookbehind) so the same regexes run on
    any engine. Order matters: URLs before emails (a URL can embed an
    @), IPs last (phone pattern must not eat dotted quads).
    """
    c = _c(col)
    c = F.regexp_replace(c, r"https?://\S+", "<URL>")
    c = F.regexp_replace(
        c, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    c = F.regexp_replace(c, r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>")
    c = F.regexp_replace(c, r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>")
    return c


def repetition_stats(col: Column | str) -> Column:
    """Gopher-style repetition signals as a struct — the standard
    "degenerate document" filters for training corpora (repeated words
    and repeated n-grams are the top predictor of low-quality scrape).

    Fields:

    - ``n_words``: whitespace token count
    - ``dup_word_frac``: 1 − distinct/total tokens (word-level
      repetition)
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams (phrase-level repetition)

    All in-row Column algebra — the most-frequent-bigram count is the
    longest equal-run in the SORTED bigram array, folded with one
    ``aggregate`` pass, so the whole thing is a projection: zero
    shuffles, zero UDFs, linear in document length. (The explode →
    groupBy(doc, bigram) → max formulation computes the same number but
    shuffles |tokens| rows — that is the shape to avoid at 100 TB.)
    """
    c = _c(col)
    words = tokenize(c)
    n = F.size(words)
    dup_word_frac = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(words))
        / F.greatest(n, F.lit(1)).cast("double"),
        4,
    )
    sorted_bi = F.array_sort(word_ngrams(c, 2))
    max_run = F.aggregate(
        sorted_bi,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda st, x: F.struct(
            x.alias("prev"),
            F.when(x == st.prev, st.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                st.best,
                F.when(x == st.prev, st.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda st: st.best,
    )
    top_bigram_frac = F.round(
        max_run / F.greatest(F.size(sorted_bi), F.lit(1)).cast("double"), 4
    )
    return F.struct(
        n.cast("long").alias("n_words"),
        dup_word_frac.alias("dup_word_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


def script_counts(col: Column | str) -> Column:
    """Per-string Unicode-script census as a struct of counts:
    ``(n_chars, latin, digit, space, cyrillic, han, other)``.

    The script-mix profile is the language-routing signal multilingual
    corpus pipelines (CCNet/mC4 shapes) cut on before any model-based
    language ID: a document that is 90% Han characters never needs the
    ngram classifier. Counts come from ``length(x) - length(
    regexp_replace(x, class, ''))`` — pure JVM column math, one pass
    per class, no tokenization. Java and RE2 spell the script classes
    differently (``\\p{IsHan}`` vs ``\\p{Han}``) but define them
    identically from the Unicode database; the whitespace class is
    spelled EXPLICITLY (``[ \\t\\n\\x0B\\f\\r]``) because the engines'
    ``\\s`` shorthands differ — Java includes vertical tab, RE2 does
    not — and an explicit class is identical on both.
    """
    s = _c(col)
    n = F.length(s)

    def cnt(pattern: str) -> Column:
        return n - F.length(F.regexp_replace(s, pattern, ""))

    latin = cnt(r"[A-Za-z]")
    digit = cnt(r"[0-9]")
    space = cnt(r"[ \t\n\x0B\f\r]")
    cyr = cnt(r"\p{IsCyrillic}")
    han = cnt(r"\p{IsHan}")
    other = n - latin - digit - space - cyr - han
    return F.struct(
        n.cast("long").alias("n_chars"),
        latin.cast("long").alias("latin"),
        digit.cast("long").alias("digit"),
        space.cast("long").alias("space"),
        cyr.cast("long").alias("cyrillic"),
        han.cast("long").alias("han"),
        other.cast("long").alias("other"),
    )


_CODE_KEYWORDS = [
    "def", "class", "import", "return", "function", "var", "const",
    "void", "int", "if", "else", "for", "while", "struct", "public",
    "static", "null", "true", "false", "print", "select", "from",
]


def code_likeness(col: Column | str, threshold: float = 0.25) -> Column:
    """Code-vs-prose heuristic — the corpus-routing signal an LLM
    data pipeline uses to send documents to a code-specific cleaning
    path (CodeParrot / The Stack preprocessing use exactly these
    surface statistics; public literature). Returns a struct
    ``(symbol_ratio, indent_ratio, keyword_ratio, score, is_code)``.

    Features (all exact integer counts, one rounded division each —
    no regex classes that diverge between Java and RE2, see
    ``tokenize``'s engine-parity note):

    * symbol_ratio — share of characters in ``{}();=<>[]`` (strip
      and length-diff, no regex);
    * indent_ratio — share of lines opening with 2+ spaces or a tab
      (plain substring tests over a ``\\n`` split);
    * keyword_ratio — share of lowercase tokens that are programming
      keywords (array membership over the whitespace tokens).

    score = 0.40*symbol + 0.35*indent + 0.25*keyword. ROUNDING-
    BOUNDARY-PROOF arithmetic: each ratio becomes an exact integer
    micro-unit count (ONE 0-digit round of 1e6*count/total — a
    weighted double sum re-rounded to 6dp can straddle a decimal
    midpoint where Spark's shortest-repr HALF_UP and DuckDB's
    scaled-multiply round disagree by 1e-6; integer weights over
    integer micro-units cannot). The score is the exact long
    40*s6 + 35*i6 + 25*k6 divided ONCE by 1e8; ``is_code`` compares
    the LONG against the integer threshold. Pure column expressions
    — whole-stage codegen, no UDF, linear per document.
    """
    c = _c(col)
    n_chars = F.greatest(F.length(c), F.lit(1)).cast("double")
    sym = (
        F.length(c)
        - F.length(F.translate(c, "{}();=<>[]", ""))
    ).cast("double")
    s6 = F.round(F.lit(1000000.0) * sym / n_chars, 0).cast("long")
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    indented = F.size(
        F.filter(
            lines,
            lambda ln: (F.substring(ln, 1, 2) == "  ")
            | (F.substring(ln, 1, 1) == "\t"),
        )
    ).cast("double")
    i6 = F.round(F.lit(1000000.0) * indented / n_lines, 0).cast("long")
    toks = tokenize(F.lower(c))
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    kw = F.size(
        F.filter(
            toks,
            lambda t: t.isin(_CODE_KEYWORDS),
        )
    ).cast("double")
    k6 = F.round(F.lit(1000000.0) * kw / n_toks, 0).cast("long")
    score_int = F.lit(40) * s6 + F.lit(35) * i6 + F.lit(25) * k6
    thresh_int = int(round(float(threshold) * 1e8))
    return F.struct(
        (s6 / F.lit(1000000.0)).alias("symbol_ratio"),
        (i6 / F.lit(1000000.0)).alias("indent_ratio"),
        (k6 / F.lit(1000000.0)).alias("keyword_ratio"),
        (score_int / F.lit(100000000.0)).alias("score"),
        (score_int >= F.lit(thresh_int)).alias("is_code"),
    )


def char_entropy(
    col: Column | str, ndigits: int = 6, pre_extracted: bool = False
) -> Column:
    r"""Character-distribution Shannon entropy (bits) of the
    NORMALIZED text — the classic cheap junk detector (near-zero
    entropy = repeated filler like 'aaaa…' or '=====', unusually
    high = base64/binary spill; both route to quarantine in corpus
    intake pipelines).

    Fully IN-ROW (no shuffle): chars via ``regexp_extract_all('.')``
    with the Unicode line terminators U+0085/U+2028/U+2029 stripped
    FIRST — Java '.' excludes all five line terminators while RE2
    '.' excludes only \n, and Java \s (which normalize_text
    collapses) is ASCII-only, so without the strip those three chars
    silently vanish Spark-side while the oracle counts them. After
    the strip the extraction is engine-identical. Per-char counts
    count occurrences over the distinct set (O(distinct·len),
    distinct bounded by the charset), then the mutual-information
    discipline: counts sorted ASCENDING AS LONGS, transformed to
    -(c/n)·log2(c/n), left-folded from 0.0 — the DuckDB oracle
    replays the identical fold. Empty text yields NULL.

    PERF: the higher-order lambdas capture the ``chars`` expression,
    so the normalize+extract chain re-evaluates ~2·distinct+1 times
    per row (the _ngram_zip capture trap). Fixture-fine; for a wide-
    charset corpus stage the extracted array behind a projection
    barrier and pass it with ``pre_extracted=True`` (the
    rolling_fingerprints convention).
    """
    if pre_extracted:
        chars = _c(col)
    else:
        c = F.regexp_replace(
            normalize_text(col), "[\u0085\u2028\u2029]", ""
        )
        chars = F.regexp_extract_all(c, F.lit("."), F.lit(0))
    n = F.size(chars)
    counts = F.transform(
        F.array_distinct(chars),
        lambda ch: F.size(F.filter(chars, lambda x: x == ch)).cast("long"),
    )
    terms = F.transform(
        F.sort_array(counts),
        lambda cc: -(cc.cast("double") / n.cast("double"))
        * F.log2(cc.cast("double") / n.cast("double")),
    )
    ent = F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t), ndigits
    )
    return F.when(n > 0, ent)


# the Gopher/MassiveWeb repetition-free stopword octet (Rae et al.
# 2021, Table A1 — public): a document passes the stop-word rule when
# it contains at least 2 DISTINCT members
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> Column:
    """The Gopher / MassiveWeb document-quality rule set (Rae et al.
    2021, Appendix A — the public filter battery most LLM corpus
    pipelines start from), as ONE struct column of booleans:

    - ``word_count_ok``: ``min_words <= n <= max_words``;
    - ``mean_word_len_ok``: mean word length in [3, 10] characters;
    - ``symbol_ratio_ok``: (# of '#' or '…'/'...' symbols) / words
      <= 0.1;
    - ``bullet_ok``: <= 90% of LINES start with a bullet marker;
    - ``ellipsis_ok``: <= 30% of lines end with an ellipsis;
    - ``alpha_ok``: >= 80% of words contain at least one alphabetic
      character;
    - ``stopword_ok``: >= 2 distinct members of the Gopher stop-word
      octet present;
    - ``passes``: the conjunction.

    Every ratio rule is evaluated as an exact INTEGER cross-multiply
    (``10 * symbols <= words`` instead of ``symbols/words <= 0.1``),
    so no float ever exists and the SQL oracle is trivially
    bit-exact. Lines split on newline; a document with no newline is
    one line. Pure Column math in one projection — at 100 TB this is
    scan-shaped with zero shuffle.
    """
    c = _c(col)
    words = tokenize(c)
    n_words = F.size(words)
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # mean in [3, 10]  <=>  3n <= total <= 10n (exact integers)
    mean_len_ok = (total_chars >= 3 * n_words) & (
        total_chars <= 10 * n_words
    )
    n_symbols = F.size(
        F.regexp_extract_all(c, F.lit(r"(#|\.\.\.|…)"), 0)
    )
    symbol_ok = 10 * n_symbols.cast("long") <= n_words.cast("long")
    lines = F.filter(
        F.split(c, r"\n"), lambda ln: F.trim(ln) != ""
    )
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).rlike(r"^([•‣▪-]\s)"),
        )
    )
    bullet_ok = (
        10 * n_bullet.cast("long") <= 9 * n_lines.cast("long")
    )
    n_ellipsis = F.size(
        F.filter(
            lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$")
        )
    )
    ellipsis_ok = (
        10 * n_ellipsis.cast("long") <= 3 * n_lines.cast("long")
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    alpha_ok = (
        5 * n_alpha_words.cast("long") >= 4 * n_words.cast("long")
    )
    distinct_stops = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                F.lower(c),
                F.lit(r"\b(" + "|".join(GOPHER_STOPWORDS) + r")\b"),
                0,
            )
        )
    )
    stopword_ok = distinct_stops >= 2
    word_count_ok = (n_words >= min_words) & (n_words <= max_words)
    passes = (
        word_count_ok
        & mean_len_ok
        & symbol_ok
        & bullet_ok
        & ellipsis_ok
        & alpha_ok
        & stopword_ok
    )
    return F.struct(
        n_words.cast("long").alias("n_words"),
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_word_len_ok"),
        symbol_ok.alias("symbol_ratio_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"),
        passes.alias("passes"),
    )


def c4_line_clean(
    col: Column | str,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    banned_line_re: str = r"(?i)javascript",
    banned_page_re: str = r"(?i)(lorem ipsum|\{)",
) -> Column:
    """The C4 line-level cleaning rules (Raffel et al. 2020 §2.2 —
    public) as one struct column:

    - a LINE is kept iff it ends in a terminal punctuation mark
      (``. ! ? "``), has at least ``min_words_per_line`` words, and
      does not match ``banned_line_re`` (the 'javascript' rule);
    - the PAGE is kept iff at least ``min_kept_lines`` lines survive
      (C4's three-sentence floor, counted on kept lines) and the raw
      text does not match ``banned_page_re`` (the 'lorem ipsum' /
      curly-brace rules);
    - ``cleaned`` is the kept lines re-joined with newlines ('' when
      nothing survives — the page flag is the drop signal).

    Returns struct ``(n_lines, n_kept, page_ok, cleaned)``. Pure
    in-row array combinators over the newline split: scan-shaped at
    any scale, no shuffle, no UDF; the SQL oracle replays the split,
    the three line predicates and the page rules verbatim.
    """
    c = _c(col)
    lines = F.filter(F.split(c, r"\n"), lambda ln: F.trim(ln) != "")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r"[.!?\"]$")
        & (F.size(tokenize(ln)) >= min_words_per_line)
        & ~ln.rlike(banned_line_re),
    )
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    page_ok = (n_kept >= min_kept_lines) & ~c.rlike(banned_page_re)
    return F.struct(
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        page_ok.alias("page_ok"),
        F.array_join(kept, "\n").alias("cleaned"),
    )
