"""Marketing attribution: assign each conversion event the first and
last touch event (ad click, page view, ...) that preceded it for the
same user.

This is the event-log shape of the as-of join: "latest touch at or
before the conversion time" (last-touch) and "earliest touch overall"
(first-touch), both per user. Rather than joining conversions against
touches (a range join that explodes on active users), the operator
unions both kinds into ONE per-user ordered stream and computes running
first/last non-null touch with a single window — one shuffle on the
user key, linear in events.

No counterpart in the reference engine (SURVEY.md §2.2 — no windows).

Scale notes
-----------
- One window shuffle on ``user_col``; the frame is
  ``rowsBetween(unboundedPreceding, currentRow)``, which Spark
  evaluates streamingly (running accumulator) — no per-row frame scan.
- Hot users (bots) concentrate a partition; cap or salt upstream like
  any hot aggregation key.
- Deterministic total order: ``(ts, is_conversion, event_id)`` — a
  touch that shares the conversion's timestamp sorts before it and is
  therefore attributable; ties between touches resolve by event id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribute_conversions(
    events: DataFrame,
    touch_types: Sequence[str] = ("click", "view"),
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per conversion: ``(conv_id, user, conv_ts, first_touch_id,
    first_touch_type, last_touch_id, last_touch_type)``.

    Conversions with no preceding touch keep null touch columns (the
    "direct / unattributed" bucket every attribution report carries).
    """
    if conversion_type in touch_types:
        # such a row would be both touch and conversion and attribute
        # to ITSELF as its own last touch — always a config error
        raise ValueError(
            f"conversion_type {conversion_type!r} must not appear in "
            f"touch_types {list(touch_types)!r}"
        )
    is_touch = F.col(type_col).isin(list(touch_types))
    is_conv = F.col(type_col) == conversion_type
    base = events.filter(is_touch | is_conv).select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        is_conv.cast("int").alias("__is_conv"),
        F.when(is_touch, F.col(id_col)).alias("__tid"),
        F.when(is_touch, F.col(type_col)).alias("__ttype"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, "__is_conv", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.select(
            F.col(id_col).alias("conv_id"),
            F.col(user_col),
            F.col(ts_col).alias("conv_ts"),
            F.col("__is_conv"),
            F.first("__tid", ignorenulls=True).over(w).alias("first_touch_id"),
            F.first("__ttype", ignorenulls=True).over(w).alias("first_touch_type"),
            F.last("__tid", ignorenulls=True).over(w).alias("last_touch_id"),
            F.last("__ttype", ignorenulls=True).over(w).alias("last_touch_type"),
        )
        .filter(F.col("__is_conv") == 1)
        .drop("__is_conv")
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cohort lifetime-value triangle — the revenue companion to the
    retention triangle (standard growth-accounting practice, public
    literature): users cohorted by first-active ISO week, revenue
    rolled up per (cohort, week offset), and the running cumulative
    divided by cohort size gives LTV-per-user at each age.

    Output: ``(cohort_week, week_offset, cohort_users,
    period_revenue, cum_revenue, ltv_per_user)``.

    Exactness: revenue sums and the running cumulative are DECIMAL —
    exact and order-free — collapsing to double once; LTV is one
    rounded division. The cumulative window partitions by cohort
    over week offsets (calendar-bounded, never data-sized).

    Scale: one per-user min (map-side combinable), one join to tag
    activity with its cohort, one (cohort, offset) groupBy; the
    triangle is |cohorts| x |offsets| rows.
    """
    wk = F.to_date(F.date_trunc("week", F.col(ts_col)))
    first = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(wk).alias("__cw")
    )
    dec = F.col(value_col).cast("decimal(18,2)")
    act = df.select(
        F.col(user_col).alias("__u"), wk.alias("__aw"), dec.alias("__v")
    )
    tagged = act.join(first, "__u")
    cells = tagged.groupBy(
        F.col("__cw").alias("cohort_week"),
        F.floor(F.datediff(F.col("__aw"), F.col("__cw")) / 7)
        .cast("int")
        .alias("week_offset"),
    ).agg(F.sum("__v").alias("__rev"))
    sizes = first.groupBy(F.col("__cw").alias("cohort_week")).agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        cells.withColumn("__cum", F.sum("__rev").over(w))
        .join(sizes, "cohort_week")
    )
    return out.select(
        "cohort_week",
        "week_offset",
        "cohort_users",
        F.col("__rev").cast("double").alias("period_revenue"),
        F.col("__cum").cast("double").alias("cum_revenue"),
        F.round(
            F.col("__cum").cast("double") / F.col("cohort_users"), ndigits
        ).alias("ltv_per_user"),
    )


_MK_START = "__START__"
_MK_CONV = "__CONV__"
_MK_NULL = "__NULL__"
_MK_MICRO = 1_000_000


def markov_transitions(
    events: DataFrame,
    touch_types: Sequence[str] = ("click", "view", "signup"),
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user journeys —
    the data-sized half of removal-effect attribution (Anderl et al.
    2014 shape, public literature).

    A journey is each user's ordered touch sequence STRICTLY BEFORE
    their first conversion (order ``(ts, id)`` — the attribution
    tie-break discipline), ending in ``__CONV__`` if the user
    converted, else ``__NULL__``; ``__START__`` precedes the first
    touch, and a touchless conversion contributes the direct
    ``__START__ -> __CONV__`` edge. Later conversions re-use no
    touches (first-journey-only, documented).

    Output: ``(src, dst, n)`` exact integer counts — a
    (|channels|+2)^2-bounded table.

    Scale: one filter, two keyed windows on the user key (lag +
    running min of the conversion stamp), one map-side-combinable
    groupBy. Hot users concentrate a partition like any keyed window
    — cap or salt upstream.
    """
    if conversion_type in touch_types:
        raise ValueError(
            f"conversion_type {conversion_type!r} must not appear in "
            f"touch_types {list(touch_types)!r}"
        )
    is_touch = F.col(type_col).isin(list(touch_types))
    is_conv = F.col(type_col) == conversion_type
    base = events.filter(is_touch | is_conv).select(
        F.col(user_col).alias("__u"),
        F.struct(F.col(ts_col), F.col(id_col)).alias("__k"),
        F.col(type_col).alias("__c"),
        is_conv.alias("__conv"),
    )
    per_user = base.groupBy("__u").agg(
        F.min(F.when(F.col("__conv"), F.col("__k"))).alias("__ck")
    )
    touches = (
        base.filter(~F.col("__conv"))
        .join(per_user, "__u")
        .filter(F.col("__ck").isNull() | (F.col("__k") < F.col("__ck")))
    )
    w = Window.partitionBy("__u").orderBy("__k")
    seq = touches.select(
        "__u",
        "__ck",
        F.coalesce(F.lag("__c").over(w), F.lit(_MK_START)).alias("src"),
        F.col("__c").alias("dst"),
        F.lead("__c").over(w).isNull().alias("__last"),
    )
    inner = seq.select("src", "dst")
    last = seq.filter(F.col("__last")).select(
        F.col("dst").alias("src"),
        F.when(F.col("__ck").isNotNull(), F.lit(_MK_CONV))
        .otherwise(F.lit(_MK_NULL))
        .alias("dst"),
    )
    direct = (
        touches.groupBy("__u").agg(F.count("*").alias("__nt"))
        .join(per_user.filter(F.col("__ck").isNotNull()), "__u", "right")
        .filter(F.col("__nt").isNull())
        .select(
            F.lit(_MK_START).alias("src"), F.lit(_MK_CONV).alias("dst")
        )
    )
    return (
        inner.unionByName(last)
        .unionByName(direct)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("n"))
    )


def markov_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("click", "view", "signup"),
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    rounds: int = 25,
) -> DataFrame:
    """Removal-effect multi-touch attribution over the first-order
    Markov journey model (Anderl et al. 2014, public literature) —
    the principled successor to first/last-touch
    (``attribute_conversions``): a channel's credit is how much the
    START -> CONV absorption probability DROPS when the channel is
    removed (its in-edges redirected to ``__NULL__``, its out-edges
    dropped).

    Determinism contract: the transition table is exact integers
    (``markov_transitions``); the absorption probabilities run
    ``rounds`` synchronous value-iteration steps in MICRO-INTEGER
    state — v_x <- half_away((sum_y n_xy * v_y) / out_x) on the 1e-6
    grid, the holt_linear integer-recurrence discipline — so every
    digit replays on both engines. ``rounds`` is a resolution knob
    (paths longer than ``rounds`` hops contribute nothing on either
    engine), not a data knob. The solve itself runs DRIVER-SIDE over
    the (|channels|+2)^2-bounded count table (the ridge/kmeans
    bounded-collect discipline, documented); Spark does the
    data-sized journey work.

    Output per channel: ``(channel, p_full, p_removed,
    removal_effect, share)`` — share = removal / sum(removals), NULL
    when no channel has positive removal effect; ordered by channel.
    """
    trans = markov_transitions(
        events, touch_types, conversion_type,
        user_col, ts_col, type_col, id_col,
    )
    rows = [(r["src"], r["dst"], r["n"]) for r in trans.collect()]
    chans = sorted(
        {f for f, _, _ in rows if f != _MK_START}
        | {t for _, t, _ in rows if t not in (_MK_CONV, _MK_NULL)}
    )

    def _absorb(removed: str | None) -> int:
        tr: dict[str, dict[str, int]] = {}
        for f, t, n in rows:
            if f == removed:
                continue
            tt = _MK_NULL if t == removed else t
            tr.setdefault(f, {})
            tr[f][tt] = tr[f].get(tt, 0) + n
        v = {f: 0 for f in tr}
        v[_MK_CONV] = _MK_MICRO
        v[_MK_NULL] = 0
        for _ in range(rounds):
            nv = {}
            for f, outs in tr.items():
                out = sum(outs.values())
                ssum = sum(n * v.get(t, 0) for t, n in outs.items())
                nv[f] = (2 * ssum + out) // (2 * out)
            v.update(nv)
        return v.get(_MK_START, 0)

    p_full = _absorb(None)
    rem = {c: max(p_full - _absorb(c), 0) for c in chans}
    tot = sum(rem.values())
    out_rows = []
    for c in chans:
        share = (
            (2 * rem[c] * _MK_MICRO + tot) // (2 * tot) if tot > 0 else None
        )
        out_rows.append(
            (
                c,
                p_full / _MK_MICRO,
                (p_full - rem[c]) / _MK_MICRO,
                rem[c] / _MK_MICRO,
                share / _MK_MICRO if share is not None else None,
            )
        )
    return events.sparkSession.createDataFrame(
        out_rows,
        schema="channel string, p_full double, p_removed double, "
        "removal_effect double, share double",
    )


def shapley_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_channels: int = 16,
    ndigits: int = 6,
) -> DataFrame:
    """Shapley-value multi-touch attribution (Shapley 1953; the
    coalition formulation standard in marketing measurement, public
    literature) — the OTHER principled multi-touch split next to
    ``markov_attribution``'s removal effects: credit channel i with
    its average marginal contribution over all orderings,

        phi_i = sum over S not containing i of
                |S|! (C-|S|-1)! / C! * (v(S+i) - v(S))

    with the standard set-function v(S) = converted users whose
    touched-channel set is contained in S (a user converts with a
    coalition iff the coalition covers every channel they touched).
    Efficiency holds by construction: sum phi_i = v(all channels) =
    the attributable conversions (pytest-pinned).

    Exactness: per-user channel masks and per-mask converted-user
    counts are exact integers; the subset-sum (zeta) transform and
    the factorial-weighted numerators run in unbounded Python ints on
    the driver over the <= 2^C mask table (the ridge/markov
    bounded-collect discipline — ``max_channels`` guards the 2^C
    blowup, C = |distinct touch types| is model-sized by contract);
    each phi is ONE exact half-away micro division by C!. Users who
    converted with NO prior touch are the unattributable bucket,
    reported per row.

    Output per channel (name order): ``(channel, shapley,
    n_attributable, n_unattributable)``.

    Scale: one distinct (user, channel) projection + one user-mask
    groupBy (map-side combinable) + a <= 2^C collect; nothing
    downstream of the groupBy grows with the data.
    """
    is_conv = F.col(type_col) == conversion_type
    touches = (
        events.filter(~is_conv & F.col(type_col).isNotNull())
        .select(F.col(user_col).alias("__u"), F.col(type_col).alias("__c"))
        .distinct()
    )
    channels = sorted(
        r["__c"] for r in touches.select("__c").distinct().collect()
    )
    C = len(channels)
    if C > int(max_channels):
        raise ValueError(
            f"{C} channels exceeds max_channels={max_channels}: "
            "Shapley enumerates 2^C coalitions — bucket channels "
            "upstream or raise the guard deliberately"
        )
    idx = {c: i for i, c in enumerate(channels)}
    conv_users = (
        events.filter(is_conv)
        .select(F.col(user_col).alias("__u"))
        .distinct()
    )
    # per-user mask from the touch rows alone (joining conversions
    # to touches first would feed a NULL channel through the bit map
    # for untouched converters — they must land at mask 0 instead)
    user_masks = touches.groupBy("__u").agg(
        F.sum(
            F.element_at(
                F.array(*[F.lit(1 << idx[c]) for c in channels]),
                # element_at is 1-based; map channel -> its ordinal
                F.array_position(
                    F.array(*[F.lit(c) for c in channels]),
                    F.col("__c"),
                ).cast("int"),
            )
        ).cast("long").alias("__mask")
    )
    masks = (
        conv_users.join(user_masks, "__u", "left")
        .select(F.coalesce(F.col("__mask"), F.lit(0)).alias("__mask"))
        .groupBy("__mask")
        .agg(F.count("*").cast("long").alias("__n"))
    )
    rows = masks.collect()
    cnt = {int(r["__mask"]): int(r["__n"]) for r in rows}
    unattributable = cnt.get(0, 0)
    # zeta transform: v[S] = sum of cnt[m] over m subset of S
    v = [0] * (1 << C)
    for m, n in cnt.items():
        if m > 0:
            v[m] = n
    for b in range(C):
        bit = 1 << b
        for s in range(1 << C):
            if s & bit:
                v[s] += v[s ^ bit]
    import math

    cfact = math.factorial(C)
    out_rows = []
    total_attr = v[(1 << C) - 1] if C else 0
    for c in channels:
        bit = 1 << idx[c]
        num = 0
        for s in range(1 << C):
            if s & bit:
                continue
            w = math.factorial(bin(s).count("1")) * math.factorial(
                C - 1 - bin(s).count("1")
            )
            num += w * (v[s | bit] - v[s])
        micro = (2 * num * 10**ndigits + cfact) // (2 * cfact)
        out_rows.append(
            (
                c,
                micro / float(10**ndigits),
                int(total_attr),
                int(unattributable),
            )
        )
    return events.sparkSession.createDataFrame(
        out_rows,
        schema="channel string, shapley double, "
        "n_attributable long, n_unattributable long",
    )
