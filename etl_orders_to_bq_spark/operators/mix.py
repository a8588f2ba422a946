"""Token-budget corpus mixing — the dataset-mixing step of a training
pipeline: given per-source token budgets (the mixture weights times the
total token target), keep a deterministic sample of each source until
its budget fills.

Mechanics: one window per source partition computes the running token
sum over a deterministic order; a row is kept while the cumulative
count BEFORE it is under budget, so the document that crosses the
budget line is the last one in ("fill until full" — budgets are
approximate by up to one document, never undershot while docs remain).

Ordering choices:
- ``md5(id)`` — an unbiased deterministic shuffle (the usual choice for
  mixing: every doc equally likely near the front, reproducible across
  runs and engines);
- a quality score descending — curation ("best docs first until the
  budget is spent");
any total order works as long as it is tie-broken to uniqueness.

Scale: ONE hash shuffle on the source key; the running sum is a
streaming frame (no whole-partition buffering). Hot sources are
bounded by their budget only after the shuffle — if one source is
90% of the corpus, pre-filter it (hash_sample) down to O(budget)
before mixing rather than shuffling rows the budget can never admit.

No counterpart in the reference engine (SURVEY.md §2.2 — the
reference has no sampling at all); standard practice in public
training-data pipelines (mixture weights over sources).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    token_col: str,
    budget: Column | int,
    order_cols: list,
    cum_col: str | None = None,
) -> DataFrame:
    """Keep rows per ``source_col`` group, in ``order_cols`` order,
    while the group's cumulative ``token_col`` before the row is under
    ``budget`` (an int for a uniform budget, or a Column — e.g. a map
    lookup on the source — for per-source budgets).

    Pass ``cum_col`` to keep the cumulative-tokens-before column in the
    output (useful for auditing how full each budget ran)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(source_col)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    budget_expr = budget if isinstance(budget, Column) else F.lit(budget)
    name = cum_col or "__cum_before"
    out = df.withColumn(name, cum_before).filter(F.col(name) < budget_expr)
    return out if cum_col else out.drop(name)


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_total: int = 300,
    seed: int = 17,
) -> DataFrame:
    """Temperature-scaled source sampling — the multilingual mixing
    recipe (mC4/mT5, Xue et al. 2021; also the GPT-3 dataset-weight
    shape): sample source s proportionally to ``p_s^alpha`` so
    low-resource sources are boosted relative to their natural share.
    This implementation pins ``alpha = 0.5``: the weight is then
    ``sqrt(n_s)``, and IEEE sqrt is CORRECTLY ROUNDED on every engine
    — an exactly-reproducible rate with no cross-engine ``pow``
    hazard (general alpha would put a libm pow in the rate; document
    the tolerance or precompute rates driver-side if you need it).

    Per-source keep rate: ``min(1, target_total * sqrt(n_s) / SW /
    n_s)`` with ``SW = sum over sources of sqrt(n_s)`` folded in
    SOURCE ORDER (a float sum over groups is shuffle-order-dependent
    — the repo's sorted-fold discipline), quantized to an integer
    micro-rate by ``floor(rate * 1e6)``. Each document keeps iff its
    md5 decision integer mod 1e6 falls under its source's micro-rate
    — deterministic across runs, engines and partitionings.

    Output census per source: ``(source, n_docs, rate_micro,
    n_kept)`` — expected kept ∝ sqrt(n_s), i.e. equal-share at equal
    sizes and boosted tails. The kept DOCUMENT SET is recoverable by
    re-applying the decision predicate; the census is the gated,
    size-stable surface.

    Scale: one count groupBy, one source-count-sized fold broadcast
    back, one scan with the decision predicate, one census groupBy —
    no corpus-sized shuffle beyond the counts.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    sw = counts.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(source_col).alias("s"),
                        F.sqrt(F.col("__n").cast("double")).alias(
                            "w"
                        ),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["w"],
        ).alias("__sw")
    )
    rate = (
        F.lit(float(target_total))
        * F.sqrt(F.col("__n").cast("double"))
        / F.col("__sw")
        / F.col("__n")
        * F.lit(1000000.0)
    )
    rates = counts.crossJoin(F.broadcast(sw)).select(
        source_col,
        F.col("__n"),
        F.least(
            F.floor(rate).cast("long"), F.lit(1000000).cast("long")
        ).alias("rate_micro"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":ts"),
                    F.lit(str(seed)),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    joined = df.select(id_col, source_col).join(rates, source_col)
    kept = (h % 1000000) < F.col("rate_micro")
    return joined.groupBy(source_col).agg(
        F.max("__n").cast("long").alias("n_docs"),
        F.max("rate_micro").alias("rate_micro"),
        F.sum(kept.cast("long")).alias("n_kept"),
    )


def doremi_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    rounds: int = 3,
    eta: float = 1.0,
    smoothing_c: float = 0.1,
    ndigits: int = 6,
) -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023,
    public — Domain Reweighting with Minimax Optimization): the
    exponentiated-gradient update that upweights HARD domains,

        alpha <- (1-c) * (alpha*exp(eta*excess)) / Z + c/k,

    with ``excess_h = max(0, L_h - L_ref)`` the domain's loss above
    the current MIXTURE-weighted reference ``L_ref = sum_h alpha_h
    L_h`` (so the reference moves every round, which is what makes
    the iteration non-trivial), run for ``rounds`` rounds. The full
    recipe's inner proxy-model retrain is out of scope — the
    per-domain loss here is the corpus unigram cross-entropy
    (-mean log10 p of the domain's tokens), fixed across rounds; a
    documented simplification, the update arithmetic is the paper's.

    Determinism: per-token logprobs are the unigram_logprob 6dp micro
    longs (one rounded log10 of an exact integer ratio each); domain
    losses are half-away integer means; everything after that lives
    in ONE row of domain-sorted arrays (k = domain count), where
    every float fold is left-to-right over the sorted order and
    exp is the engine's Taylor-Horner ``_det_exp`` kernel (shared
    literals with the SQL oracle) on shifted arguments
    eta*(excess - max_excess) <= 0 — inside its convergence region by
    construction, and invariant to the shift because Z renormalizes.

    Output per domain: ``(domain, n_tokens, loss, alpha)`` with loss
    the 6dp cross-entropy and alpha the final mixture weight
    (rounded ``ndigits``).

    Scale: one token-count groupBy (map-side combinable) + one
    domain-level groupBy; the array stage is k elements — domain
    count, never data — and the 2^6-duplicated Taylor subtree lives
    in interpreted HOF lambdas (k evaluations, not per-row codegen).
    """
    from ..functions.text import normalize_text, tokenize
    from .multitest import _EXP_COEFFS

    toks = df.select(
        F.col(domain_col).alias("__d"),
        F.explode(tokenize(normalize_text(text_col))).alias("__w"),
    )
    counts = toks.groupBy("__w").agg(F.count("*").alias("__c"))
    tot = counts.agg(F.sum("__c").alias("__t"))
    scored = (
        toks.join(counts, "__w")
        .crossJoin(F.broadcast(tot))
        .select(
            "__d",
            F.round(
                F.round(
                    F.log10(F.col("__c") / F.col("__t")), ndigits
                )
                * F.lit(float(10 ** ndigits)),
                0,
            )
            .cast("long")
            .alias("__lp"),
        )
    )
    dom = scored.groupBy("__d").agg(
        F.count("*").alias("__n"),
        # loss = -mean(lp): lp < 0, so -sum is positive and the
        # half-away mean needs no sign split
        F.floor(
            (2 * -F.sum("__lp") + F.count("*"))
            / (2.0 * F.count("*"))
        )
        .cast("long")
        .alias("__lm"),
    )
    one = dom.agg(
        F.sort_array(
            F.collect_list(F.struct("__d", "__n", "__lm"))
        ).alias("__a")
    )
    k = F.size("__a")
    one = one.withColumns(
        {
            "__k": k,
            "__L": F.transform(
                F.col("__a"), lambda x: x["__lm"] / 1_000_000.0
            ),
            "__alpha": F.transform(
                F.col("__a"), lambda x: F.lit(1.0) / k
            ),
        }
    )

    def _horner(y):
        w = y / 64.0
        t = F.lit(float(_EXP_COEFFS[-1]))
        for coef in reversed(_EXP_COEFFS[:-1]):
            t = t * w + F.lit(float(coef))
        return t

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    for _ in range(int(rounds)):
        one = one.withColumn(
            "__lref", _dot(F.col("__alpha"), F.col("__L"))
        )
        one = one.withColumn(
            "__ex",
            F.transform(
                F.col("__L"),
                lambda l: F.greatest(l - F.col("__lref"), F.lit(0.0)),
            ),
        )
        one = one.withColumn("__mx", F.array_max("__ex"))
        # exp(eta*(e - mx)) via the Taylor-Horner kernel with each
        # ^2 in its OWN projection (the with_det_exp staging — one
        # inline T(w)^64 duplicates the Horner subtree 2^6 times and
        # was measured to inflate the serialized plan to ~3 MB)
        one = one.withColumn(
            "__t",
            F.transform(
                F.col("__ex"),
                lambda e: _horner(
                    F.lit(float(eta)) * (e - F.col("__mx"))
                ),
            ),
        )
        for _ in range(6):
            one = one.withColumn(
                "__t",
                F.transform(F.col("__t"), lambda x: x * x),
            )
        one = one.withColumn(
            "__wgt",
            F.zip_with(
                F.col("__alpha"),
                F.col("__t"),
                lambda a, t: a * t,
            ),
        )
        one = one.withColumn(
            "__z",
            F.aggregate(
                F.col("__wgt"), F.lit(0.0), lambda acc, v: acc + v
            ),
        )
        one = one.withColumn(
            "__alpha",
            F.transform(
                F.col("__wgt"),
                lambda w: F.lit(1.0 - float(smoothing_c))
                * (w / F.col("__z"))
                + F.lit(float(smoothing_c)) / F.col("__k"),
            ),
        )
    ex = one.select(
        F.posexplode(
            F.arrays_zip(F.col("__a"), F.col("__alpha"))
        ).alias("__i", "__z2")
    )
    return ex.select(
        F.col("__z2.__a.__d").alias(domain_col),
        F.col("__z2.__a.__n").cast("long").alias("n_tokens"),
        (F.col("__z2.__a.__lm") / 1_000_000.0).alias("loss"),
        F.round(F.col("__z2.__alpha"), ndigits).alias("alpha"),
    ).orderBy(domain_col)
