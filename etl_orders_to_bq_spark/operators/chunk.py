"""Document chunking — the training-data primitive that turns long
documents into overlapping fixed-token windows (context-window packing,
embedding inputs, retrieval corpus construction).

Pure Column work: tokenize once, slice per chunk index, posexplode.
Cost is linear in output tokens; no shuffle, no UDF. At 100 TB this is
a scan-shaped map stage — run it before any shuffle so downstream
stages see the (smaller-keyed) chunk rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Split each document into chunks of ``chunk_tokens`` whitespace
    tokens with ``overlap`` tokens shared between neighbors.

    Output: (id_col, chunk_idx, chunk_text, n_tokens). Documents with
    zero tokens produce no rows. The last chunk may be short (never
    empty). chunk count = ceil((n - overlap) / stride), stride =
    chunk_tokens - overlap.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap

    toks = tokenize(text_col)
    n = F.size(toks)
    n_chunks = F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_tokens), " "
        ),
    )
    staged = df.select(
        F.col(id_col), chunks.alias("__chunks"), n.alias("__n_doc")
    ).filter(F.col("__n_doc") > 0)
    exploded = staged.select(
        id_col,
        F.col("__n_doc"),
        F.posexplode("__chunks").alias("chunk_idx", "chunk_text"),
    )
    # chunk i holds slice(toks, i*stride+1, chunk_tokens), so its token
    # count is known arithmetically — re-tokenizing the (overlap-
    # inflated) output text with the regex splitter costs ~35% of the
    # whole operator for the same number
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.least(
            F.lit(chunk_tokens),
            F.col("__n_doc") - F.col("chunk_idx") * stride,
        ).cast("int").alias("n_tokens"),
    )


def cdc_chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    divisor: int = 64,
    max_len: int = 256,
) -> DataFrame:
    """CONTENT-DEFINED chunking (the rolling-hash boundary idea behind
    LBFS/rsync/FastCDC, public literature): a chunk boundary falls
    after position p whenever the hash of the ``window`` characters
    ending at p is ≡ 0 mod ``divisor`` — so boundaries move WITH the
    content, and two documents sharing a long substring produce
    identical chunks for its interior regardless of how insertions
    shifted the offsets. Fixed-size chunking (``chunk_documents``)
    loses all alignment after one inserted character; CDC is what
    makes chunk-hash dedup robust to near-duplicate text.

    Expected chunk length is ``divisor`` characters; chunks longer
    than ``max_len`` (hash never fired) are force-split at fixed
    offsets. No minimum-length gate: a greedy min-length skip is a
    sequential fold, and omitting it keeps boundaries strictly
    content-local (documented departure from FastCDC's min/max
    normalization; the max here is a hard cap, applied AFTER the
    content boundaries, so it only touches degenerate runs).

    The boundary hash here is md5 of the w-char window (one in-row
    ``transform``; exact, oracle-replayable). At production scale the
    same plan swaps in a gear/buzhash ROLLING hash — O(1) per
    position instead of O(w) — without changing anything downstream.

    Output: one row per chunk ``(id, chunk_idx, chunk_start,
    chunk_len, chunk_hash)`` (1-based start; hash = md5 of the chunk
    text). Empty documents produce no rows.

    Scale: scan-shaped in-row array work, no shuffle at all — the
    chunk table feeds whatever groupBy the caller needs (dedup census
    by chunk_hash, per-doc stats). Memory per row is O(n) positions,
    the same order as the text itself.
    """
    t = F.col(text_col)
    n = F.length(t)
    # boundary AFTER position p (p = window..n-1): md5 of the window
    # ending at p, taken as the usual first-8-hex integer
    hpos = lambda p: F.conv(
        F.substring(F.md5(F.substring(t, p - window + 1, F.lit(window))), 1, 8),
        16,
        10,
    ).cast("long")
    bounds = F.when(
        n >= window + 1,
        F.filter(
            F.sequence(F.lit(window), n - 1),
            lambda p: hpos(p) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # chunk bounds: 0 ++ content boundaries ++ n, then each (s, e)
    # force-split at max_len offsets
    # STAGE the cut list as a real column BEFORE any lambda touches
    # it: `cuts` embeds the whole per-position md5 boundary scan, and
    # referencing it via element_at inside the pair lambdas
    # re-evaluates that scan PER ELEMENT (interpreted HOFs get no CSE
    # — the r6/r10 measured trap; here it was 253 s -> ~3 s at sf0.1)
    cuts = F.concat(
        F.array(F.lit(0).cast("int")),
        bounds.cast("array<int>"),
        F.array(n.cast("int")),
    )
    # empty docs are dropped HERE with the cheap length predicate: a
    # post-hoc filter on size(pairs) is semantically identical but
    # Catalyst pushes it below any upstream exchange with the whole
    # pairs-expression (boundary scan included) inlined into the
    # predicate — the executed plan then runs the hash chain twice,
    # once per side of the exchange (measured 13 s vs 1.2 s at
    # sf0.1). length(text) > 0 pushes down to the scan for free and
    # guarantees >= 1 pair per surviving row.
    cut_df = df.filter(F.length(t) > 0).select(
        F.col(id_col),
        t.alias("__t"),
        cuts.alias("__cuts"),
    )
    # zip the cut list with its own tail instead of element_at
    # indexing: element_at(cc, i+2) inside the lambda re-evaluates
    # the (possibly re-inlined) cut expression PER ELEMENT —
    # CollapseProject can fold the staging projection away, and the
    # measured cost was 47 s vs ~3 s at sf0.1. The zip form touches
    # cc a constant number of times per row no matter what the
    # optimizer inlines.
    cc = F.col("__cuts")
    pairs = F.flatten(
        F.zip_with(
            F.slice(cc, 1, F.size(cc) - 1),
            F.slice(cc, 2, F.size(cc) - 1),
            lambda s, e: F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(
                        (e - s) / F.lit(float(max_len))
                    ).cast("int")
                    - 1,
                ),
                lambda j: F.struct(
                    (s + j * max_len).alias("s"),
                    F.least(e, s + (j + 1) * max_len).alias("e"),
                ),
            ),
        )
    )
    staged = cut_df.select(
        F.col(id_col), F.col("__t"), pairs.alias("__ps")
    )
    # posexplode_OUTER, deliberately: InferFiltersFromGenerate adds a
    # size(__ps) > 0 filter under a plain posexplode and pushes it
    # below any upstream exchange with the whole pairs expression
    # inlined — the single-split double-evaluation all over again
    # (verified in the executed plan). The outer variant infers no
    # filter, and every surviving row has >= 1 pair anyway.
    ex = staged.select(
        id_col,
        "__t",
        F.posexplode_outer("__ps").alias("chunk_idx", "__p"),
    )
    s, e = F.col("__p.s"), F.col("__p.e")
    return ex.select(
        id_col,
        F.col("chunk_idx"),
        (s + 1).cast("long").alias("chunk_start"),
        (e - s).cast("long").alias("chunk_len"),
        F.md5(F.substring(F.col("__t"), s + 1, e - s)).alias(
            "chunk_hash"
        ),
    )
