"""Sequential-pattern support mining over event streams.

``seq_pattern_support`` counts, for every ordered pair of event
types (a, b), how many users fired an `a` strictly before a `b` —
the support statistic at the base of sequence mining (the length-2
case of GSP / PrefixSpan, Srikant & Agrawal 1996 / Pei et al. 2001,
public literature) and the everyday "do users who see X later do Y"
product question. Unlike the Markov `event_transitions` operator
(CONSECUTIVE pairs only), this counts non-adjacent precedence: an
`a ... anything ... b` user supports (a, b).

Algorithm — no per-event self-join:
1. sequence-number each user's events by (ts, id) with a PER-USER
   window (never global);
2. collapse to one row per (user, type): first and last sequence
   positions — |users| x |types| rows, types are a bounded domain;
3. self-join the tiny per-user summaries on the user key:
   (a, b) is supported iff first_pos(a) < last_pos(b) (this also
   makes (a, a) mean "a fired at least twice" — the repeat-behavior
   diagonal, kept deliberately);
4. one groupBy to supports, plus the user total broadcast back.

The ONLY shuffles are the user-key window, the (user, type)
groupBy, and the bounded-domain support rollup — event rows never
pair with event rows, so a heavy user costs |types|² summary
comparisons, not (events/user)².

Exactness: positions are integers from a deterministic total order;
support counts are integers; ``support_ratio`` is one rounded
division. The SQL oracle replays the identical row_number /
min / max / join pipeline.

No counterpart in the reference engine (surface =
`etl/orders_etl.py:17-198`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .staging import stage


def seq_pattern_support(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    min_support: int = 1,
    ndigits: int = 6,
    checkpoint_path: str | None = None,
) -> DataFrame:
    """Support table ``(from_type, to_type, n_users,
    support_ratio)`` for ordered type pairs; ``support_ratio``
    divides by the number of distinct users with any event."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pos = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.row_number().over(w).alias("rn"),
    )
    # the summary feeds BOTH join branches and the user total —
    # stage it so the window + groupBy pipeline runs once, not 3x
    summary = stage(
        pos.groupBy("u", "t").agg(
            F.min("rn").alias("first_rn"),
            F.max("rn").alias("last_rn"),
        ),
        checkpoint_path,
        "seq_summary",
        eager=False,
    )
    a = summary.select(
        "u", F.col("t").alias("from_type"), "first_rn"
    )
    b = summary.select(
        F.col("u").alias("u2"),
        F.col("t").alias("to_type"),
        "last_rn",
    )
    supported = a.join(
        b, (a.u == b.u2) & (F.col("first_rn") < F.col("last_rn"))
    )
    totals = F.broadcast(
        summary.agg(F.count_distinct("u").alias("__n_users"))
    )
    return (
        supported.groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_users"))
        .filter(F.col("n_users") >= min_support)
        .crossJoin(totals)
        .select(
            "from_type",
            "to_type",
            "n_users",
            F.round(
                F.col("n_users") / F.col("__n_users"), ndigits
            ).alias("support_ratio"),
        )
    )
