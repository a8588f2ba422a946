"""Name-cleaning function (reference O6, etl/orders_etl.py:173-192).

Reference semantics per value, in order:
  1. ``html.unescape`` (``&#039;`` -> ``'``)
  2. lowercase
  3. delete every digit
  4. apply the blanking pattern: delete digits/whitespace anywhere and
     blank the whole value when it is a lone ``-``, a single ``\\w``
     char, all-vowels, or all-consonants
     (vowel class = Latin ``aoueiy`` + Cyrillic ``аяєоуиіїе``).

Everything except html-unescape is native Column work (lower +
regexp_replace chain — codegen'd, JVM-side). ``html.unescape`` has no
Spark builtin, so it is the one Arrow-vectorized pandas UDF in the
reference-parity path; ``clean_name(col, unescape=False)`` gives the
pure-Column variant (used where an ANSI-SQL oracle must reproduce the
function, and as the scale path when inputs are known entity-free).
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Reference pattern (etl/orders_etl.py:185). Java regex accepts it as-is.
# NB: only a *lone* dash is blanked; inner hyphens survive
# (reference tests/test_orders_etl.py:88,101 — "іванова-шипак" survives).
BLANK_PATTERN = (
    r"\d|\s|^(-)$|(^\w{1}$)|(^[aoueiyаяєоуиіїе]{0,}$)|(^[^aoueiyаяєоуиіїе]{0,}$)"
)


# DataType object (not DDL string) so the decorator works without an
# active SparkSession at import time
@pandas_udf(T.StringType())
def html_unescape(s: pd.Series) -> pd.Series:
    """Arrow-batched ``html.unescape`` (full entity table, unlike a
    hand-rolled replace chain)."""
    return s.map(lambda v: html.unescape(v) if v is not None else None)


def clean_name(col: Column | str, unescape: bool = True) -> Column:
    """Composite clean-name Column function (reference O6)."""
    c = F.col(col) if isinstance(col, str) else col
    if unescape:
        c = html_unescape(c)
    c = F.lower(c)
    c = F.regexp_replace(c, r"\d", "")
    c = F.regexp_replace(c, BLANK_PATTERN, "")
    return c
