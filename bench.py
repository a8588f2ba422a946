"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the `noop` sink — full plan execution
(scan → shuffle → agg) without driver-side collection, so the number
measures the engine, not result transfer.

Methodology (r12): every headline entry runs n=3 and reports the
MIN as the headline scalar (r11's driver sessions showed 2-17x
median swings on UNCHANGED code from host contention; min-of-n is
the standard contention-robust statistic — a query can run slow by
accident, never fast by accident). The three runs are INTERLEAVED
across queries (pass 1 over all queries, then pass 2, then pass 3)
so a transient host-load burst contaminates at most one pass of
every query instead of all three runs of a few. `queries_detail` /
`stress_detail` still carry {median, min, runs} per entry. A
host-noise CANARY — a fixed-size single-thread numpy matmul plus a
fixed Spark range-sum job — is timed at suite start, middle, and
end and recorded under `canary` in BENCH_full.json: on a quiet host
the three samples agree within ~20%, so a contaminated session is
self-labeling. The `stress_sf1` section scales the corpus 10x and
re-times the pair-stage dedup operators (growth = t_10x /
min(t_1x)); set SPARK_GRAFT_SKIP_SF1=1 to skip it.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: covers the ETL path (cast/repair, dedup, join), the
# relational core (agg, window, topk), and the scale extensions
# (minhash, ann, text). Names match queries() in __spark_entry__.py.
HEADLINE = [
    "o2_cast_repair",
    "o4_dedup_first",
    "o6_clean_name",
    "o7_left_join",
    "o11_similarity",
    "q1_pricing_summary",
    "q3_top_revenue",
    "window_rank",
    "rollup_agg",
    "topk_orders",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_simhash",
    "text_quality",
    "text_language_id",
    "ann_cosine_topk",
    "embedding_neighbors",
    "events_window",
    "sessionize",
    "asof_join",
    "window_frames",
    "q7_nation_volume",
    "q18_large_orders",
    "q21_suppliers_waiting",
    "pagerank",
    "corpus_pipeline",
    # round-4 curation additions (each heavy enough to track)
    "span_dedup",
    "dedup_embedding",
    "semdedup",
    "entity_resolution",
    # round-5: SemDeDup over learned Lloyd centroids (fit + dedup),
    # and the fastText-shaped hashed linear quality filter
    "semdedup_kmeans",
    "quality_classifier",
    # round-4 analytics additions (linear ops over the big fixtures)
    "simhash_hamming",
    "skipgram_pairs",
    "attribution",
    "interval_merge",
    # round-6: PQ compression+ADC search, wedge-join link prediction,
    # grid-mapped quantile normalization, image-fingerprint dedup
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "adamic_adar",
    "quantile_normalize",
    "phash_neardup",
    # round-7: overlapping-window repeated-span mining, HITS link
    # analysis, per-bucket medoid coreset sampling, containment verify
    "repeated_ngram_spans",
    "hits_scores",
    "diverse_sample",
    "ngram_containment",
    # round-7 batch 2: corpus-scale encoders/index + summary-join
    # sequence mining + two-pass decile scoring
    "feature_hash",
    "inverted_index",
    "seq_patterns",
    "rfm_segments",
    "perplexity_buckets",
    # round-7 batch 3: scalable rank statistics (two-pass cumulative,
    # no global window), constraint-discovery audits, code routing
    "mann_whitney",
    "fk_coverage",
    "code_detect",
    # round-8: degeneracy-robust SemDeDup default (count + probe +
    # conditional Lloyd at construction), two-stage Matryoshka
    # retrieval, MMR diversity re-rank (grouped Arrow greedy),
    # robust trend + sequential test + TWAP over events.
    # set_similarity_join is deliberately NOT a headline: exact
    # all-pairs on this fixture's 31-word vocab is inherently
    # sum(df^2)-bound (~28 s at sf0.1, measured) — SCALING.md records
    # the trade instead of hiding it in the suite total.
    "semdedup_auto",
    "ann_matryoshka",
    "mmr_rerank",
    "theilsen_trend",
    "holt_linear",
    "msprt",
    "twap",
    "dispersion_index",
    # round-8 batch 3: per-user funnel fold, triple smoothing,
    # changepoint localizer, and the 3-round BPE training loop
    # (rarity_weighted_jaccard joins set_similarity_join on the
    # excluded list — same sum(df^2) fixture bound, see SCALING.md)
    "window_funnel",
    "holt_winters",
    "changepoint",
    "bpe_merges",
    "gini_stump",
    # round-9: stride-1 exact substring dedup (two-stage window
    # group-count + island merge), CCNet per-paragraph curation,
    # eval-set n-gram decontamination, integer-exact distributed PCA
    "exact_substring_dedup",
    "paragraph_quality_filter",
    "benchmark_decontaminate",
    "pca_pc1",
    # round-9 batch 2: held-out trigram LM scoring, BPE inference,
    # region-blocked hard-negative mining, Zipf head fit
    "stupid_backoff",
    "bpe_encode",
    "hard_negatives",
    "zipf_slope",
    # round-10: Kneser-Ney LM, domain governance census, ftfy repair,
    # MLM masking, JL projection, vocab coverage, boilerplate lines
    "kneser_ney",
    "domain_census",
    "mojibake_repair",
    "mlm_mask",
    "jl_project",
    "vocab_coverage",
    "boilerplate_lines",
    "span_corrupt",
    "temperature_mix",
    # round-11: Hilbert layout census, closed-form ridge, classical
    # decomposition, Neyman sampling, content-defined chunking,
    # randomization test, split-conformal, calibration bins
    "hilbert_layout",
    "ridge_normal",
    "stl_decompose",
    "neyman_sample",
    "cdc_chunks",
    "permutation_test",
    "conformal_interval",
    "calibration_bins",
    "roc_curve",
    "doremi_mix",
    "adaboost_stumps",
    "isotonic_calibration",
    "bradley_terry",
    # round-12: k-group rank/variance tests, rank correlation, robust
    # location, counts-of-counts smoothing, stratified IPW, truss
    # cohesion, WordPiece maximal munch, rater agreement, Markov
    # removal-effect attribution
    "kruskal_wallis",
    "anova_oneway",
    "hodges_lehmann",
    "spearman_corr",
    "kendall_tau",
    "good_turing",
    "chao1_richness",
    "ipw_ate",
    "k_truss",
    "wordpiece_encode",
    "cohens_kappa",
    "mcnemar",
    "markov_attribution",
    "pacf_durbin",
    "burrows_delta",
    "ransac_line",
    "friedman_test",
    "silhouette",
    "cochran_q",
    "dunn_posthoc",
    "streaming_funnel",
    "jackknife_ratio",
    "james_stein",
    "dunning_llr",
    "hill_diversity",
    "capture_recapture",
    "mann_kendall",
    "theil_index",
    "log_rank",
    "inclusion_deps",
    "metric_corr",
    "wasserstein",
    "cliffs_delta",
    "two_proportion",
    # r13 additions
    "ransac_subsampled",
    "unigram_lm",
    "unigram_encode",
    "cramers_v",
    "mood_median",
    "benford_mad",
    "fd_discovery",
    "lof_outliers",
    "dbscan",
    "jaro_winkler_pairs",
    "shapley_attribution",
    "holm_bonferroni",
    "pps_systematic",
    # r14 additions (the 16 round-13 operators)
    "benjamini_yekutieli",
    "brunner_munzel",
    "jonckheere_terpstra",
    "cochran_armitage",
    "fleiss_kappa",
    "krippendorff_alpha",
    "jensen_shannon",
    "rouge_n",
    "sax_symbolize",
    "sax_mindist",
    "mahalanobis_outliers",
    "page_trend",
    "brown_forsythe",
    "bartlett",
    "welch_anova",
    "quade_test",
    "ansari_bradley",
    "grubbs_test",
    "dixon_q",
    "durbin_watson",
    "ljung_box",
    "runs_test",
    "jarque_bera",
    "chatterjee_xi",
    "rosner_esd",
    "cramer_von_mises",
    "kuiper_two_sample",
    "hbos_outliers",
    "ecod_outliers",
    "theta_forecast",
    "croston_forecast",
    "hurst_exponent",
    "nelson_aalen",
    "rdd_estimate",
    "personalized_pagerank",
    "slope_one",
    "lb_keogh",
    "fisher_exact",
    "wilcoxon_signed_rank",
    "sign_test",
    "partial_correlation",
    "lins_ccc",
    "icc_oneway",
    "adf_test",
    "kpss_test",
    "dtw_distance",
    "logistic_irls",
    "closeness_centrality",
    "granger_lag1",
    "gmm_em",
    "gamma_somers_d",
    "effect_sizes",
    "brier_decomposition",
    "anderson_darling",
    "mantel_haenszel",
    "fligner_killeen",
]

# Iterative queries run driver-side rounds (with checkpoints) while the
# DataFrame is CONSTRUCTED, so the timer must wrap construction + force
# and rebuild per run — forcing a prebuilt frame would time only the
# final projection over already-materialized checkpoint blocks.
ITERATIVE = {
    "pagerank",
    "corpus_pipeline",
    # CC rounds + the staged SemDeDup assignment run at construction
    "entity_resolution",
    "semdedup",
    # Lloyd rounds collect centroids during construction
    "semdedup_kmeans",
    # the symmetrized edge list is staged (localCheckpoint) and the PQ
    # query vector collected at construction
    "adamic_adar",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    # HITS stages per-round label frames (localCheckpoint) and collects
    # the max at construction
    "hits_scores",
    # scalable_ntile collects per-partition counts at construction
    "rfm_segments",
    "perplexity_buckets",
    # count/probe jobs + conditional Lloyd fit run at construction
    "semdedup_auto",
    "diverse_sample",
    # verify='auto' runs a candidate-stats collect probe and lazy
    # localCheckpoints at construction (advisor r8): rebuild per run
    # so the timer charges probe + checkpoint materialization
    "ngram_containment",
    # the query vector is collected at construction
    "ann_matryoshka",
    # the 3 training rounds (pair-count argmax collects) run at
    # construction; the returned frame is a driver-local shim
    "bpe_merges",
    # the scatter-matrix collect + power iteration run at construction
    "pca_pc1",
    # vocab-fold staging (localCheckpoints) runs at construction
    "bpe_encode",
    # region count/probe jobs run at construction
    "hard_negatives",
    # r11: the 9-sum collect + driver Cramer run at construction
    "ridge_normal",
    # r11: 3 boosting rounds of argmin/total collects at construction
    "adaboost_stumps",
    # r11: 3 MM rounds with per-round localCheckpoints at construction
    "bradley_terry",
    # r12: the peel loop (local toPandas fast path or staged rounds)
    # runs at construction
    "k_truss",
    # r12: the bounded transition collect + driver micro-solve run at
    # construction
    "markov_attribution",
    # r12: the lag-covariance collect + driver Durbin-Levinson run at
    # construction
    "pacf_durbin",
    # r12: the complete-block census count runs at construction
    "friedman_test",
    # r13: the sorted-distinct treatment/group collects and
    # complete-block census counts run at construction
    "jonckheere_terpstra",
    "page_trend",
    "quade_test",
    # r13: the constant-rater-count validation .first() runs at
    # construction
    "fleiss_kappa",
    # r12: the Lloyd fit's per-round centroid collects run at
    # construction
    "silhouette",
    # r12: the complete-block census count runs at construction
    "cochran_q",
    # r12: the two distinct counts + overlap count run at construction
    "capture_recapture",
    # r13: EM-round staging (localCheckpoints) runs at construction
    "unigram_lm",
    "unigram_encode",
    # r13b: global_cumsum/row_number offset collects (and for the
    # combinatoric tails, the 2x2/count .first()) run at construction
    "fisher_exact",
    "sign_test",
    "wilcoxon_signed_rank",
    "adf_test",
    "kpss_test",
    "granger_lag1",
    "anderson_darling",
    "fligner_killeen",
    # r13b: the per-iteration 9-sum collects + driver Cramer solves
    # (logistic) / 7-sum EM collects (gmm) run at construction
    "logistic_irls",
    "gmm_em",
    # r13b: the top-k source collect + BFS frontier loop run at
    # construction
    "closeness_centrality",
    # r13: eps-graph localCheckpoint + CC rounds run at construction
    "dbscan",
    # r13: the 2^C mask collect + driver zeta/Shapley run at
    # construction
    "shapley_attribution",
    # r13: global_cumsum_before's per-partition totals collect runs
    # at construction
    "mood_median",
    "pps_systematic",
}
# Entries whose CONSTRUCTION also runs real Spark jobs (r13 job-name
# census over the status store, footer-read jobs excluded: the
# global_cumsum family's range-sample + stage + totals-collect, lazy
# checkpoints' AQE stage materialization, probe first()s). r13 kept
# their `queries` numbers exec-only (the historic methodology) and
# recorded construction separately in `ctor_detail`. r14 PROMOTES
# them to the ITERATIVE methodology — the headline number now wraps
# construction + force, ending the split accounting (r13 verdict
# item: exec-only flattered entries like hbos_outliers whose
# optimization moved jobs into construction). The transition is
# recorded once: `ctor_detail` in BENCH_full.json keeps per-pass
# {ctor, exec} component runs, so the old exec-only series remains
# derivable for cross-round comparison against BENCH_r13.
CTOR_TIMED = {
    "ann_cosine_topk",
    "seq_patterns",
    "mann_whitney",
    "gini_stump",
    "vocab_coverage",
    "hilbert_layout",
    "roc_curve",
    "kruskal_wallis",
    "dunn_posthoc",
    "streaming_funnel",
    "log_rank",
    "wasserstein",
    "cliffs_delta",
    "brunner_munzel",
    "ansari_bradley",
    "runs_test",
    "chatterjee_xi",
    "cramer_von_mises",
    "kuiper_two_sample",
    "hbos_outliers",
    "ecod_outliers",
    "nelson_aalen",
    "personalized_pagerank",
}



def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _canary(spark) -> dict:
    """Host-noise probe: a fixed-size single-thread numpy matmul and a
    fixed Spark range-sum job (codegen + 32-way scheduling). Pure CPU,
    zero data dependence — identical work every call. On a quiet host
    repeated samples agree within ~20%; spread across the suite's
    start/middle/end samples labels the session as contaminated by
    external load, so a slow round is distinguishable from a slow
    engine without re-running anything."""
    import numpy as np

    a = np.arange(512 * 512, dtype=np.float64).reshape(512, 512) / 1e6
    eye = np.eye(512)
    t0 = time.perf_counter()
    for _ in range(8):
        a = a @ eye
    np_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.range(20_000_000).selectExpr("sum(id * 3 + 1) as s").collect()
    jvm_s = time.perf_counter() - t0
    return {"numpy_sec": round(np_s, 3), "jvm_sec": round(jvm_s, 3)}


def _timed(build, runs: int = 3, rebuild: bool = True) -> dict:
    """{median, min, runs} over ``runs`` executions. ``rebuild`` re-runs
    the builder each time (needed when construction itself does work —
    iterative operators, checkpointing operators); otherwise one frame
    is built and re-forced."""
    frame = None if rebuild else build()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _force(build() if rebuild else frame)
        ts.append(round(time.perf_counter() - t0, 3))
    return {
        "median": round(statistics.median(ts), 3),
        "min": round(min(ts), 3),
        "runs": ts,
    }


def _timed10(build, runs: int = 2) -> float:
    """min-of-``runs`` wall for the scaled (10x/4x) side of a growth
    row. The 1x side was always a min-of-2, but the scaled side used
    to be ONE sample — so a single host-load burst could masquerade as
    superlinear growth (r12: span_dedup was flagged at "11.6x"; a
    min-of-3 remeasure with a work census gave 1.76x over perfectly
    linear span/dup-group counts). Growth rows now apply the same
    min-of-n discipline to BOTH sides."""
    return _timed(build, runs=runs)["min"]


def _scaled_corpus(spark, sf_dir: str, out_dir: str, copies: int = 10):
    """Write a ``copies``x scaled corpus derived from ``sf_dir`` into
    ``out_dir``: documents with every word suffixed by the copy index
    (shingles/spans are disjoint ACROSS copies, so the per-copy dup
    structure — the thing dedup work is linear in — replicates instead
    of forming cross-copy near-dup cliques that would quadratically
    inflate the WORKLOAD rather than the data), and embeddings offset
    by copies*1e-3 (same cluster geometry, no exact dups)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # closure factories: a default-arg lambda would change the lambda
    # arity and pyspark would feed the array index as the 2nd arg
    def _suffixer(k: int):
        return lambda w: F.concat(w, F.lit(str(k)))

    def _offsetter(k: int):
        return lambda x: x + F.lit(float(k) * 0.001)

    parts = [
        docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(F.split("text", r"\s+"), _suffixer(k)), " "
            ).alias("text"),
        )
        for k in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    eparts = [
        emb.select(
            (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
            F.transform("embedding", _offsetter(k)).alias("embedding"),
        )
        for k in range(copies)
    ]
    bige = eparts[0]
    for p in eparts[1:]:
        bige = bige.unionByName(p)
    bige.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def _sf1_stress(spark, sf_dir: str, cpus: int) -> dict:
    """Scale-growth probe for the pair-stage dedup operators: time each
    at 1x (the sf_dir fixture) and on a 10x derived corpus, and report
    growth = t_10x / min(t_1x). Sub-quadratic means growth stays
    ~O(copies) (the judge bound: <= ~12x wall for 10x data). Bucket
    guards are COUNTED, not silent: the section reports how many LSH
    band buckets the max_bucket cap dropped and the largest SemDeDup
    cluster under each bucket-bits setting (the documented knob that
    keeps cluster population flat as the corpus grows)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from etl_orders_to_bq_spark.operators.ann import _hyperplanes
    from etl_orders_to_bq_spark.operators.dedup import (
        minhash_band_keys,
        minhash_lsh_candidates,
        simhash_hamming_pairs,
    )
    from etl_orders_to_bq_spark.operators.fuzzy import fuzzy_join
    from etl_orders_to_bq_spark.operators.graph import connected_components
    from etl_orders_to_bq_spark.operators.semdedup import semdedup_keep
    from etl_orders_to_bq_spark.operators.spans import span_dedup

    out: dict = {}
    tmp = tempfile.mkdtemp(prefix="bench_sf1_")
    try:
        t0 = time.perf_counter()
        _scaled_corpus(spark, sf_dir, tmp, copies=10)
        out["gen_10x_corpus"] = round(time.perf_counter() - t0, 3)

        d1 = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(cpus)
            .localCheckpoint()
        )
        d10 = (
            spark.read.parquet(f"{tmp}/documents.parquet")
            .localCheckpoint()
        )
        e1 = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .localCheckpoint()
        )
        e10 = spark.read.parquet(f"{tmp}/embeddings.parquet").localCheckpoint()

        # synthetic entity table (same builder as the gated query), 10
        # prefixed copies: the copy letter is the FIRST char, so fuzzy
        # blocking keys split across copies and blocks stay bounded
        ents1 = entry._synth_entities(spark, sf_dir).localCheckpoint()
        eparts = [
            ents1.select(
                (F.col("ent_id") + k * 1_000_000).alias("ent_id"),
                F.concat(F.lit(chr(97 + k) + "x "), F.col("name")).alias(
                    "name"
                ),
            )
            for k in range(10)
        ]
        ents10 = eparts[0]
        for p in eparts[1:]:
            ents10 = ents10.unionByName(p)
        ents10 = ents10.localCheckpoint()

        def er(ents):
            reps = ents.groupBy("name").agg(F.min("ent_id").alias("rep_id"))
            l = reps.select(
                F.col("rep_id").alias("id_a"), F.col("name").alias("name_a")
            )
            r = reps.select(
                F.col("rep_id").alias("id_b"), F.col("name").alias("name_b")
            )
            pairs = (
                fuzzy_join(l, r, "name_a", "name_b", max_dist=2)
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
            )
            comp = connected_components(pairs, "id_a", "id_b")
            canon = reps.join(comp, reps.rep_id == comp.id, "left").select(
                "name",
                F.coalesce("component", F.col("rep_id")).alias(
                    "canonical_id"
                ),
            )
            return ents.join(F.broadcast(canon), "name").select(
                "ent_id", "name", "canonical_id"
            )

        from etl_orders_to_bq_spark.multimodal import perceptual_hash
        from etl_orders_to_bq_spark.operators.classifier import (
            hashed_linear_score,
            seeded_weights,
        )
        from etl_orders_to_bq_spark.operators.dedup import hamming_pairs
        from etl_orders_to_bq_spark.operators.lm import (
            bigram_logprob_scores,
            kneser_ney_scores,
            mlm_mask,
        )

        def _phash_pairs(d):
            media = d.select(
                F.col("doc_id").alias("id"),
                F.encode("text", "UTF-8").alias("content"),
            )
            ph = perceptual_hash(media, codec="stub")
            return hamming_pairs(ph, "phash", "id", bits=64, max_dist=3)

        from etl_orders_to_bq_spark.functions.urls import (
            url_canonical_dedup,
        )
        from etl_orders_to_bq_spark.operators.spans import (
            repeated_ngram_spans,
        )

        def _url_probe(d):
            raw = d.select(
                "doc_id",
                F.concat(
                    F.lit("HTTPS://h"),
                    (F.col("doc_id") % 97).cast("string"),
                    F.lit(".Example.COM:443/p/"),
                    (F.col("doc_id") / 3).cast("long").cast("string"),
                    F.lit("?b=2&utm_source=x&a=1"),
                ).alias("url"),
            )
            return url_canonical_dedup(raw, "url", "doc_id")

        clf_w = seeded_weights(1024, seed=17)
        probes = {
            "minhash_lsh_128x16_numpy": lambda d: minhash_lsh_candidates(
                d, text_col="text", id_col="doc_id",
                num_hashes=128, bands=16, hash_fn="numpy",
            ),
            "span_dedup": lambda d: span_dedup(d, span_tokens=20),
            "simhash32_hamming3": lambda d: simhash_hamming_pairs(
                d, text_col="text", id_col="doc_id", bits=32, max_dist=3
            ),
            # the two linear text ops: no pair stage, so growth should
            # track the data ratio (~O(copies)); classifier runs the
            # gated md5 family (the honest fixed-config growth)
            "quality_classifier_md5": lambda d: hashed_linear_score(
                d, clf_w, bias=0.05, threshold=0.5
            ),
            "bigram_logprob": lambda d: bigram_logprob_scores(d),
            # image-fingerprint dedup: payload -> 8-byte hash is the
            # map stage, pigeonhole join the pair stage
            "phash_hamming3": _phash_pairs,
            # round-7 linear ops: in-row windowing + one fingerprint
            # shuffle / regex canonicalization + one rollup shuffle —
            # growth must track the data ratio
            "repeated_ngram_spans": lambda d: repeated_ngram_spans(
                d, span_tokens=20, stride=10
            ),
            "url_canonical_dedup": _url_probe,
            # r10: held-out KN scoring (type censuses + 7-table score
            # join — the heaviest new entry) and the linear MLM
            # masking projection; both split even-train/odd-score
            # inside the probe so train AND score sides scale together
            "kneser_ney": lambda d: kneser_ney_scores(
                d.filter(F.col("doc_id") % 2 == 1),
                d.filter(F.col("doc_id") % 2 == 0),
            ),
            "mlm_mask": lambda d: mlm_mask(d),
        }
        # warm the Arrow worker pool once (numpy path) so the 10x run
        # does not charge daemon startup to the operator
        _force(
            minhash_lsh_candidates(
                d1, text_col="text", id_col="doc_id",
                num_hashes=8, bands=2, hash_fn="numpy",
            )
        )
        for name, probe in probes.items():
            t1 = _timed(lambda p=probe: p(d1), runs=2)
            t10 = _timed10(lambda: probe(d10))
            out[f"{name}_1x"] = t1["min"]
            out[f"{name}_10x"] = t10
            out[f"{name}_growth"] = round(t10 / max(t1["min"], 1e-9), 1)

        # span_dedup WORK CENSUS (r12 verdict #1): growth must be
        # attributable to work, not taken from the wall alone — count
        # the spans hashed, the fingerprint groups shuffled, and the
        # duplicate groups (the join fan-in). The suffixed 10x corpus
        # replicates per-copy dup structure, so every census row must
        # read ~10x its 1x value; a superlinear WALL against a linear
        # census is host noise, not the operator.
        from etl_orders_to_bq_spark.operators.chunk import chunk_documents

        for tag, d in (("1x", d1), ("10x", d10)):
            sp = chunk_documents(
                d, text_col="text", id_col="doc_id",
                chunk_tokens=20, overlap=0,
            ).select(F.md5("chunk_text").alias("fp"))
            row = (
                sp.groupBy("fp").agg(F.count("*").alias("n"))
                .agg(
                    F.coalesce(F.sum("n"), F.lit(0)).alias("spans"),
                    F.count("*").alias("groups"),
                    F.coalesce(
                        F.sum((F.col("n") > 1).cast("long")), F.lit(0)
                    ).alias("dup_groups"),
                )
                .first()
            )
            out[f"span_dedup_{tag}_spans"] = int(row["spans"])
            out[f"span_dedup_{tag}_fp_groups"] = int(row["groups"])
            out[f"span_dedup_{tag}_dup_groups"] = int(row["dup_groups"])

        # SemDeDup NEGATIVE CONTROLS (deliberately kept, deliberately
        # labeled): fixed 8-bit buckets at both scales and the 11-bit
        # "knob" at 10x are the documented fixed-config trap that
        # semdedup_auto (the shipped default, measured below) routes
        # around — a superlinear growth HERE is the trap reproducing,
        # not the shipped plan regressing.
        t1 = _timed(
            lambda: semdedup_keep(
                e1, _hyperplanes(dim=64, bits=8, seed=7), threshold=0.75
            ),
            runs=2,
        )
        out["semdedup_bits8_control_1x"] = t1["min"]
        for bits in (8, 11):
            t10 = _timed10(lambda: semdedup_keep(
                    e10, _hyperplanes(dim=64, bits=bits, seed=7),
                    threshold=0.75,
                ))
            out[f"semdedup_bits{bits}_control_10x"] = t10
            out[f"semdedup_bits{bits}_control_growth"] = round(
                t10 / max(t1["min"], 1e-9), 1
            )

        # AUTO-K: the production configuration — k-means cluster COUNT
        # grows linearly with the corpus (k = n/target), holding the
        # per-cluster population (the quadratic term) flat regardless
        # of how the data clumps. This fixture's embeddings are
        # DEGENERATE for hyperplane LSH (occupied buckets ~ bits, not
        # 2^bits — pair work scales n^2/bits, no log-bits policy can
        # hold it linear; see SCALING.md), which is exactly why
        # SemDeDup's paper design is k-means: centroids go where the
        # density is. This growth number is the one that must stay
        # sub-2.5x.
        from etl_orders_to_bq_spark.operators.ann import lloyd_kmeans

        n1, n10 = e1.count(), e10.count()
        k1_, k10_ = max(8, n1 // 128), max(8, n10 // 128)
        out["semdedup_autok_cfg"] = f"1x:k={k1_}/10x:k={k10_}"

        def autok(e, k):
            cents, _ = lloyd_kmeans(
                e, _hyperplanes(64, k, seed=7), rounds=2,
                round_ndigits=6, method="numpy",
            )
            return semdedup_keep(
                e, cents, threshold=0.75, assign_method="numpy"
            )

        t1 = _timed(lambda: autok(e1, k1_), runs=2)
        t10 = _timed10(lambda: autok(e10, k10_))
        out["semdedup_autok_1x"] = t1["min"]
        out["semdedup_autok_10x"] = t10
        out["semdedup_autok_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # AUTO entry point (r8): NO caller-chosen config — k derived
        # from n, probe histogram decides seeds-vs-Lloyd. This is the
        # default a user gets, so ITS growth is the number that has to
        # hold (<= ~2x; the fixed-bits rows above stay as the recorded
        # anti-pattern).
        from etl_orders_to_bq_spark.operators.semdedup import (
            semdedup_auto,
        )

        t1 = _timed(
            lambda: semdedup_auto(e1, dim=64, threshold=0.75, seed=7),
            runs=2,
        )
        t10 = _timed10(lambda: semdedup_auto(e10, dim=64, threshold=0.75, seed=7))
        out["semdedup_auto_1x"] = t1["min"]
        out["semdedup_auto_10x"] = t10
        out["semdedup_auto_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # r8 stress rows for the two heavy headline entries that had
        # none: RFM (three scalable_ntile passes over orders — growth
        # should track data, the two-pass rank machinery is per-pass
        # fixed cost) and diverse_sample. r8 MEASURED the fixed-bits
        # medoid trap on the driver box (bits=6: 3.9x, bits=9: 3.0x at
        # 10x data — per-bucket population grows with the corpus at
        # fixed 2^bits buckets), so r9 ships bucket_medoids_auto as
        # the default: region count k = n/target grows with n, probe +
        # Lloyd fallback, same policy as semdedup_auto. The shipped
        # default's growth is the diverse_sample row; the fixed-bits
        # rows stay below as labeled negative controls.
        from etl_orders_to_bq_spark.operators.encode import rfm_segments
        from etl_orders_to_bq_spark.operators.semdedup import (
            bucket_medoids,
            bucket_medoids_auto,
        )

        ofull1 = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .localCheckpoint()
        )
        rest = [
            c for c in ofull1.columns
            if c not in ("o_orderkey", "o_custkey")
        ]
        ofull10 = ofull1
        for k in range(1, 10):
            ofull10 = ofull10.unionByName(
                ofull1.select(
                    (F.col("o_orderkey") + k * 100_000_000).alias(
                        "o_orderkey"
                    ),
                    (F.col("o_custkey") + k * 10_000_000).alias(
                        "o_custkey"
                    ),
                    *rest,
                )
            )
        ofull10 = ofull10.repartition(cpus).localCheckpoint()
        t1 = _timed(lambda: rfm_segments(ofull1), runs=2)
        t10 = _timed10(lambda: rfm_segments(ofull10))
        out["rfm_segments_1x"] = t1["min"]
        out["rfm_segments_10x"] = t10
        out["rfm_segments_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # the SHIPPED default (bucket_medoids_auto: count + probe +
        # conditional Lloyd run at construction, so rebuild per run)
        t1 = _timed(
            lambda: bucket_medoids_auto(
                e1, dim=64, seed=42, pair_method="numpy"
            ),
            runs=2,
        )
        t10 = _timed10(lambda: bucket_medoids_auto(
                e10, dim=64, seed=42, pair_method="numpy"
            ))
        out["diverse_sample_1x"] = t1["min"]
        out["diverse_sample_10x"] = t10
        out["diverse_sample_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        # NEGATIVE CONTROLS: caller-fixed LSH bits (the r8 trap the
        # auto default routes around) — bits=6 frozen and the bits=9
        # "knob"; superlinear growth here is the documented trap, not
        # the shipped plan
        t1c = _timed(
            lambda: bucket_medoids(
                e1, dim=64, bits=6, seed=42, pair_method="numpy"
            ),
            runs=2,
        )
        out["diverse_sample_bits6_control_1x"] = t1c["min"]
        for bits in (6, 9):
            t10 = _timed10(lambda: bucket_medoids(
                    e10, dim=64, bits=bits, seed=42, pair_method="numpy"
                ))
            out[f"diverse_sample_bits{bits}_control_10x"] = t10
            out[f"diverse_sample_bits{bits}_control_growth"] = round(
                t10 / max(t1c["min"], 1e-9), 1
            )

        t1 = _timed(lambda: er(ents1), runs=2)
        t10 = _timed10(lambda: er(ents10))
        out["entity_resolution_1x"] = t1["min"]
        out["entity_resolution_10x"] = t10
        out["entity_resolution_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        # candidate census: the in-block pair count IS the quadratic
        # term fuzzy blocking governs — counted, never silent
        from etl_orders_to_bq_spark.operators.fuzzy import fuzzy_join

        reps10 = ents10.groupBy("name").agg(
            F.min("ent_id").alias("rep_id")
        )
        cand = fuzzy_join(
            reps10.select(
                F.col("rep_id").alias("id_a"),
                F.col("name").alias("name_a"),
            ),
            reps10.select(
                F.col("rep_id").alias("id_b"),
                F.col("name").alias("name_b"),
            ),
            "name_a",
            "name_b",
            max_dist=2,
        )
        # ordered pairs only — the raw self-join also meets (x, x) and
        # both orientations, which would double-count the quadratic term
        out["er_10x_verified_pairs"] = cand.filter(
            F.col("id_a") < F.col("id_b")
        ).count()

        # -- 10x growth rows for the round-6 additions: each probe is
        # the gated query's operator on a 10x input built the same
        # disjoint-copy way (shifted keys split blocks/nodes across
        # copies, so sub-quadratic plans must show ~O(copies) wall) --
        from etl_orders_to_bq_spark.operators.ann import (
            ann_topk_multiprobe_pq,
            pq_codebooks,
        )
        from etl_orders_to_bq_spark.operators.fuzzy import (
            linkage_score,
            sorted_neighborhood_pairs,
        )
        from etl_orders_to_bq_spark.operators.graph import adamic_adar

        o1 = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(
                (F.col("o_custkey") % 150).alias("src"),
                (F.lit(1000) + F.col("o_orderkey") % 97).alias("dst"),
            )
            .localCheckpoint()
        )
        o10 = o1
        for k in range(1, 10):
            o10 = o10.unionByName(
                o1.select(
                    (F.col("src") + k * 10_000).alias("src"),
                    (F.col("dst") + k * 10_000).alias("dst"),
                )
            )
        o10 = o10.localCheckpoint()
        t1 = _timed(lambda: adamic_adar(o1), runs=2)
        # r9 drift postmortem: the single-shot 10x numerator swung the
        # growth ratio 3.9 -> 5.0 at an identical wedge census — take
        # the same 2-run median as the denominator
        t10 = _timed(lambda: adamic_adar(o10), runs=2)["min"]
        out["adamic_adar_1x"] = t1["min"]
        out["adamic_adar_10x"] = t10
        out["adamic_adar_growth"] = round(t10 / max(t1["min"], 1e-9), 1)
        # wedge census: sum_z C(deg(z), 2) IS the join's work — with
        # disjoint copies it grows exactly 10x, so wall growth above
        # it means plan overhead, below it means improving throughput
        for tag, edges in (("1x", o1), ("10x", o10)):
            sym = (
                edges.filter(F.col("src") != F.col("dst"))
                .select("src", "dst")
                .unionByName(
                    edges.select(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                    ).filter(F.col("src") != F.col("dst"))
                )
                .distinct()
            )
            w = (
                sym.groupBy("src")
                .agg(F.count("*").alias("d"))
                .agg(
                    F.sum(
                        F.col("d") * (F.col("d") - 1) / 2
                    ).alias("wedges")
                )
                .first()
            )
            out[f"adamic_adar_{tag}_wedges"] = int(w["wedges"] or 0)

        books = pq_codebooks(dim=64, subspaces=8, codewords=16, seed=23)
        qvec = [
            (((i * 37 + 11) % 97) / 96.0) * 2.0 - 1.0 for i in range(64)
        ]

        def ivfpq(e):
            return ann_topk_multiprobe_pq(
                e, books, qvec, dim=64, bits=4, k=10
            )

        t1 = _timed(lambda: ivfpq(e1), runs=2)
        t10 = _timed10(lambda: ivfpq(e10))
        out["ann_ivfpq_1x"] = t1["min"]
        out["ann_ivfpq_10x"] = t10
        out["ann_ivfpq_growth"] = round(t10 / max(t1["min"], 1e-9), 1)

        # linkage: customer pairs blocked on (nation, segment); copies
        # shift nationkey so blocks stay copy-disjoint (pair count
        # grows ~O(copies), the honest blocked-ER shape)
        c1 = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select(
                "c_custkey", "c_nationkey", "c_mktsegment",
                F.substring("c_name", 1, 4).alias("name4"),
                (F.col("c_acctbal") >= 0).alias("bal_pos"),
                F.floor(F.col("c_acctbal") / 1000).cast("long").alias(
                    "bal_k"
                ),
            )
            .localCheckpoint()
        )
        c10 = c1
        for k in range(1, 10):
            c10 = c10.unionByName(
                c1.select(
                    (F.col("c_custkey") + k * 1_000_000).alias("c_custkey"),
                    (F.col("c_nationkey") + k * 100).alias("c_nationkey"),
                    "c_mktsegment", "name4", "bal_pos", "bal_k",
                )
            )
        c10 = c10.localCheckpoint()

        def fs(c):
            a = c.select(
                F.col("c_custkey").alias("id_a"),
                F.col("c_nationkey").alias("nk"),
                F.col("c_mktsegment").alias("seg"),
                F.col("name4").alias("ph_a"),
                F.col("bal_pos").alias("bp_a"),
                F.col("bal_k").alias("bk_a"),
            )
            b = c.select(
                F.col("c_custkey").alias("id_b"),
                F.col("c_nationkey").alias("nk"),
                F.col("c_mktsegment").alias("seg"),
                F.col("name4").alias("ph_b"),
                F.col("bal_pos").alias("bp_b"),
                F.col("bal_k").alias("bk_b"),
            )
            pairs = a.join(b, ["nk", "seg"]).filter(
                F.col("id_a") < F.col("id_b")
            )
            return linkage_score(
                pairs,
                [("ph_a", "ph_b"), ("bp_a", "bp_b"), ("bk_a", "bk_b")],
                m_probs=[0.85, 0.95, 0.8],
                u_probs=[0.1, 0.5, 0.15],
                threshold=2.0,
            ).select("id_a", "id_b", "fs_score", "is_match")

        t1 = _timed(lambda: fs(c1), runs=2)
        t10 = _timed10(lambda: fs(c10))
        out["linkage_score_1x"] = t1["min"]
        out["linkage_score_10x"] = t10
        out["linkage_score_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        def snp(ents):
            return sorted_neighborhood_pairs(
                ents, "name", "ent_id", window=3, max_dist=2
            )

        t1 = _timed(lambda: snp(ents1), runs=2)
        t10 = _timed10(lambda: snp(ents10))
        out["sorted_neighborhood_1x"] = t1["min"]
        out["sorted_neighborhood_10x"] = t10
        out["sorted_neighborhood_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # round-7 heavies: HITS on the disjoint-copy graph (per-round
        # shuffles keyed on int ids — ~O(copies) expected) and
        # containment verify on LSH-bounded candidates
        from etl_orders_to_bq_spark.operators.dedup import (
            ngram_containment,
        )
        from etl_orders_to_bq_spark.operators.graph import hits_scores

        t1 = _timed(lambda: hits_scores(o1, rounds=2), runs=2)
        t10 = _timed10(lambda: hits_scores(o10, rounds=2))
        out["hits_scores_1x"] = t1["min"]
        out["hits_scores_10x"] = t10
        out["hits_scores_growth"] = round(t10 / max(t1["min"], 1e-9), 1)

        t1 = _timed(
            lambda: ngram_containment(d1, num_hashes=4, bands=2), runs=2
        )
        t10 = _timed10(lambda: ngram_containment(d10, num_hashes=4, bands=2))
        out["ngram_containment_1x"] = t1["min"]
        out["ngram_containment_10x"] = t10
        out["ngram_containment_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        # candidate census: wall growth here is CANDIDATE growth (the
        # word-suffixed copies band together within a copy), not plan
        # growth — measured r7: verify stage flat 1.7->1.4s while
        # candidates grew ~8.7x
        for tag, d in (("1x", d1), ("10x", d10)):
            out[f"ngram_containment_{tag}_candidates"] = (
                minhash_lsh_candidates(
                    d, num_hashes=4, bands=2
                ).count()
            )

        # round-7 batch-2 linear corpus ops: explode + bounded groupBys
        # — growth should track the 10x token volume, nothing more
        from etl_orders_to_bq_spark.operators.bm25 import inverted_index
        from etl_orders_to_bq_spark.operators.encode import feature_hash

        t1 = _timed(lambda: feature_hash(d1, "doc_id", "text"), runs=2)
        t10 = _timed10(lambda: feature_hash(d10, "doc_id", "text"))
        out["feature_hash_1x"] = t1["min"]
        out["feature_hash_10x"] = t10
        out["feature_hash_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        t1 = _timed(lambda: inverted_index(d1), runs=2)
        t10 = _timed10(lambda: inverted_index(d10))
        out["inverted_index_1x"] = t1["min"]
        out["inverted_index_10x"] = t10
        out["inverted_index_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # round-7 batch-3 rank-statistics primitive: the two-pass
        # global_cumsum_before under a 10x distinct-value domain —
        # growth should track the distinct-value count (the range
        # shuffle + per-pid windows are linear in it), never n^2
        from etl_orders_to_bq_spark.operators.multitest import (
            mann_whitney_u,
        )

        ev1 = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_type", "value"
        )
        ev_parts = [ev1]
        for i in range(1, 10):
            # shift each copy so the DISTINCT-VALUE domain really
            # grows 10x (plain duplication would only grow counts)
            ev_parts.append(
                ev1.withColumn(
                    "value", F.col("value") + F.lit(i * 0.0001)
                )
            )
        ev10 = ev_parts[0]
        for p in ev_parts[1:]:
            ev10 = ev10.unionByName(p)
        ev1 = ev1.localCheckpoint()
        ev10 = ev10.localCheckpoint()
        t1 = _timed(
            lambda: mann_whitney_u(
                ev1, "event_type", "value", "click", "error"
            ),
            runs=2,
        )
        t10 = _timed10(lambda: mann_whitney_u(ev10, "event_type", "value", "click", "error"))
        out["mann_whitney_1x"] = t1["min"]
        out["mann_whitney_10x"] = t10
        out["mann_whitney_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # r9 stress rows for the remaining heavy headline entries that
        # had none (verdict r8 item 3): the flagship multi-stage corpus
        # pipeline, the LSH embedding near-dup pair generator, and the
        # unigram-perplexity decile table
        from etl_orders_to_bq_spark.operators.lm import perplexity_buckets
        from etl_orders_to_bq_spark.operators.semdedup import (
            embedding_neardup_pairs,
        )
        from etl_orders_to_bq_spark.pipeline.corpus import (
            build_training_corpus,
        )

        def corpus(d):
            planted = d.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq ww ee")).alias("text"),
            )
            return build_training_corpus(
                d.unionByName(planted),
                lang="en",
                min_quality=0.5,
                chunk_tokens=64,
                overlap=8,
            )

        # d10's every-word copy suffix defeats the stopword language
        # ID, so ALL its docs die at the first filter — a vacuous
        # workload. Build a lang-safe 10x instead: suffix every THIRD
        # word with the copy digit. Every word 3-gram then contains a
        # suffixed word (shingles stay copy-disjoint — no cross-copy
        # near-dup cliques) while ~82% of docs still pass the
        # language/quality gates (survivor census recorded below so
        # the growth denominator is explicit).
        def _suffix3(k: int):
            w = F.split("text", r"\s+")
            return F.array_join(
                F.zip_with(
                    w,
                    F.sequence(F.lit(0), F.size(w) - 1),
                    lambda t, i: F.when(
                        i % 3 == 0, F.concat(t, F.lit(str(k)))
                    ).otherwise(t),
                ),
                " ",
            )

        dc10 = d1
        for k in range(1, 10):
            dc10 = dc10.unionByName(
                d1.select(
                    (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                    _suffix3(k).alias("text"),
                )
            )
        dc10 = dc10.repartition(cpus).localCheckpoint()
        # r10: the >10x extrapolation demo for the flagship dedup
        # composition — 30 lang-safe disjoint copies (the same
        # every-3rd-word suffix family, so the survivor census scales
        # with the copies and shingles stay copy-disjoint)
        dc30 = d1
        for k in range(1, 30):
            dc30 = dc30.unionByName(
                d1.select(
                    (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                    _suffix3(k).alias("text"),
                )
            )
        dc30 = dc30.repartition(cpus).localCheckpoint()
        t1 = _timed(lambda: corpus(d1), runs=2)
        t10 = _timed(lambda: corpus(dc10), runs=2)["min"]
        t30 = _timed(lambda: corpus(dc30), runs=2)["min"]
        out["corpus_pipeline_1x"] = t1["min"]
        out["corpus_pipeline_10x"] = t10
        out["corpus_pipeline_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        out["corpus_pipeline_30x"] = t30
        out["corpus_pipeline_30x_growth"] = round(
            t30 / max(t1["min"], 1e-9), 1
        )
        from etl_orders_to_bq_spark.functions.text import (
            language_id,
            quality_score,
        )

        for tag, d in (("1x", d1), ("10x", dc10), ("30x", dc30)):
            out[f"corpus_pipeline_{tag}_gate_survivors"] = d.filter(
                (language_id("text") == "en")
                & (quality_score("text") >= 0.5)
            ).count()

        def neardup(e):
            return embedding_neardup_pairs(
                e, dim=64, threshold=0.75, bits=8, seed=42
            )

        t1 = _timed(lambda: neardup(e1), runs=2)
        t10 = _timed10(lambda: neardup(e10))
        out["dedup_embedding_1x"] = t1["min"]
        out["dedup_embedding_10x"] = t10
        out["dedup_embedding_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        # candidate census: within-bucket ordered pairs ARE the
        # operator's work term — wall growth must track this, and a
        # fixed-bits bucket count growing it superlinearly is the
        # documented knob (grow bits with the corpus), not plan decay
        from etl_orders_to_bq_spark.operators.ann import with_lsh_bucket

        for tag, e in (("1x", e1), ("10x", e10)):
            sizes = (
                with_lsh_bucket(e, dim=64, bits=8, seed=42)
                .groupBy("bucket")
                .agg(F.count("*").alias("n"))
                .agg(
                    F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p")
                )
                .first()
            )
            out[f"dedup_embedding_{tag}_candidates"] = int(sizes["p"] or 0)

        # r9: stride-1 exact substring dedup — window extraction is
        # scan-shaped and the word-suffixed copies keep windows
        # copy-disjoint, so the per-copy dup structure replicates and
        # growth should track data; the dup-window census is the
        # operator's work term
        from etl_orders_to_bq_spark.operators.suffix import (
            _dup_window_hits,
            exact_substring_dedup,
        )

        t1 = _timed(lambda: exact_substring_dedup(d1, min_tokens=15), runs=2)
        t10 = _timed10(lambda: exact_substring_dedup(d10, min_tokens=15))
        out["exact_substring_1x"] = t1["min"]
        out["exact_substring_10x"] = t10
        out["exact_substring_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )
        for tag, d in (("1x", d1), ("10x", d10)):
            _, hits = _dup_window_hits(d, 15, "text", "doc_id")
            out[f"exact_substring_{tag}_dup_windows"] = hits.count()

        def perp(d):
            return perplexity_buckets(
                d.withColumn("n_chars", F.length("text")), n_buckets=10
            )

        t1 = _timed(lambda: perp(d1), runs=2)
        t10 = _timed10(lambda: perp(d10))
        out["perplexity_buckets_1x"] = t1["min"]
        out["perplexity_buckets_10x"] = t10
        out["perplexity_buckets_growth"] = round(
            t10 / max(t1["min"], 1e-9), 1
        )

        # guard accounting at 10x — caps must be counted, never silent
        bucket_sizes = (
            minhash_band_keys(
                d10, text_col="text", id_col="doc_id",
                num_hashes=128, bands=16, hash_fn="numpy",
            )
            .groupBy("band", "bk")
            .agg(F.count("*").alias("n"))
        )
        agg = bucket_sizes.agg(
            F.sum((F.col("n") > 1000).cast("long")).alias("dropped"),
            F.max("n").alias("max_bucket"),
        ).first()
        out["lsh_10x_buckets_over_cap"] = int(agg["dropped"] or 0)
        out["lsh_10x_max_bucket"] = int(agg["max_bucket"] or 0)
        from etl_orders_to_bq_spark.operators.ann import assign_ivf_clusters

        for bits in (8, 11):
            planes = _hyperplanes(dim=64, bits=bits, seed=7)
            sizes = (
                assign_ivf_clusters(e10, planes)
                .groupBy("ivf_cluster")
                .agg(F.count("*").alias("n"))
                .agg(F.max("n").alias("mx"))
                .first()
            )
            out[f"semdedup_10x_max_cluster_bits{bits}"] = int(sizes["mx"])

        # r11: content-defined chunking is char-linear scan work with
        # zero shuffle — growth must track the char census (the
        # per-position window md5 is the work term; the gear-hash
        # production swap removes the O(w) factor, not the O(n))
        from etl_orders_to_bq_spark.operators.chunk import (
            cdc_chunk_documents,
        )

        t1 = _timed(lambda: cdc_chunk_documents(d1), runs=2)
        t10 = _timed10(lambda: cdc_chunk_documents(d10))
        out["cdc_chunks_1x"] = t1["min"]
        out["cdc_chunks_10x"] = t10
        out["cdc_chunks_growth"] = round(t10 / max(t1["min"], 1e-9), 1)
        for tag, d in (("1x", d1), ("10x", d10)):
            out[f"cdc_chunks_{tag}_chars"] = int(
                d.agg(F.sum(F.length("text"))).first()[0] or 0
            )

        # r12: k-truss peeling — node-offset copies of the mod-1000
        # lineitem projection give DISJOINT graphs (the prefix-copy
        # discipline: edge/wedge work replicates instead of saturating
        # the bounded node domain); the triangle census is the work
        # term. 4 copies suffice to push past the 2^20-edge local
        # bound (10 copies = 810M wedges = minutes of probe for no
        # extra information); growth is judged distributed-vs-
        # distributed — the shipped 1x config is ALSO recorded, since
        # mixing backends would fake a cliff
        from etl_orders_to_bq_spark.operators.graph import k_truss

        li1 = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(
                (F.col("l_orderkey") % 1000).alias("src"),
                (F.col("l_partkey") % 1000).alias("dst"),
            )
            .repartition(cpus)
            .localCheckpoint()
        )
        li4 = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .crossJoin(
                spark.range(4).select(F.col("id").alias("__copy"))
            )
            .select(
                (F.col("l_orderkey") % 1000 + F.col("__copy") * 1000)
                .alias("src"),
                (F.col("l_partkey") % 1000 + F.col("__copy") * 1000)
                .alias("dst"),
            )
            .repartition(cpus)
            .localCheckpoint()
        )
        t1 = _timed(lambda: k_truss(li1, k=8), runs=2)
        t1d = _timed(
            lambda: k_truss(li1, k=8, local_threshold=None), runs=2
        )
        t4 = _timed10(lambda: k_truss(li4, k=8))
        out["k_truss_1x"] = t1["min"]
        out["k_truss_1x_distributed"] = t1d["min"]
        out["k_truss_4x"] = t4
        out["k_truss_growth"] = round(t4 / max(t1d["min"], 1e-9), 1)

        # r12: MULTI-ROUND cascade probe — the dense fixtures above
        # converge in a handful of rounds, so they never exercise the
        # incremental-maintenance win (advisor r11: the old peel
        # re-ran the full wedge census every round). The cascade
        # chain (tests/test_rank_stats_ops.py:_truss_cascade_chain —
        # path edges at exactly the k=4 support margin, each round's
        # removal un-supporting the next edge) peels ONE edge per
        # round per end: n=9 -> 5 rounds, n=33 -> 17 rounds. Growth
        # at ~3.4x the rounds should be ~linear in rounds (per-round
        # cost is now bounded by the removed edges' degree sum, not
        # the census); the old plan was rounds x full census here.
        def _cascade_edges(n: int):
            import itertools as _it

            ed = list(_it.combinations(range(6), 2))
            v = [100 + i for i in range(n)]
            for i, x in enumerate(v):
                for c in (0, 1, 2) if i % 2 == 0 else (3, 4, 5):
                    ed.append((c, x))
            ed += [(v[i], v[i + 1]) for i in range(n - 1)]
            ed += [(v[i], v[i + 2]) for i in range(n - 2)]
            return spark.createDataFrame(
                ed, "src bigint, dst bigint"
            ).localCheckpoint()

        c1, c4 = _cascade_edges(9), _cascade_edges(33)
        tc1 = _timed10(lambda: k_truss(c1, k=4, local_threshold=None, max_rounds=30))
        tc4 = _timed10(lambda: k_truss(c4, k=4, local_threshold=None, max_rounds=30))
        out["k_truss_cascade_5r"] = tc1
        out["k_truss_cascade_17r"] = tc4
        out["k_truss_cascade_rounds_growth"] = round(
            tc4 / max(tc1, 1e-9), 1
        )
        from etl_orders_to_bq_spark.operators.graph import triangle_count

        for tag, li in (("1x", li1), ("4x", li4)):
            out[f"k_truss_{tag}_triangles"] = int(
                triangle_count(li, "src", "dst")
                .agg((F.sum("n_triangles") / 3).cast("long"))
                .first()[0]
                or 0
            )

        # r12: RANSAC — trial expansion is rows x n_trials with
        # map-side struct-min combine; 10 pid-offset copies replicate
        # the scan linearly, so growth must track rows
        from etl_orders_to_bq_spark.operators.ridge import ransac_line

        def _ransac_pts(mult):
            o = spark.read.parquet(f"{sf_dir}/orders.parquet")
            if mult > 1:
                o = o.crossJoin(
                    spark.range(mult).select(F.col("id").alias("__c"))
                ).select(
                    (F.col("o_orderkey") * mult + F.col("__c")).alias(
                        "o_orderkey"
                    )
                )
            return (
                o.select(
                    F.col("o_orderkey").alias("pid"),
                    (F.col("o_orderkey") % 100).cast("double").alias("x"),
                    (
                        3.0 * (F.col("o_orderkey") % 100).cast("double")
                        + 5.0
                        + ((F.col("o_orderkey") % 3) - 1).cast("double")
                        * 0.5
                    ).alias("y"),
                )
                .repartition(cpus)
                .localCheckpoint()
            )

        r1 = _ransac_pts(1)
        r10 = _ransac_pts(10)
        t1 = _timed(
            lambda: ransac_line(r1, "x", "y", "pid", eps=2.0), runs=2
        )
        t10 = _timed10(lambda: ransac_line(r10, "x", "y", "pid", eps=2.0))
        out["ransac_1x"] = t1["min"]
        out["ransac_10x"] = t10
        out["ransac_growth"] = round(t10 / max(t1["min"], 1e-9), 1)
        out["ransac_1x_rows"] = r1.count()
        out["ransac_10x_rows"] = r10.count()
        # trial-expansion WORK CENSUS (r12 verdict #2): the draw and
        # score stages each expand rows x n_trials, so the attributable
        # work at each scale is 2 * rows * 64 expansion rows (the
        # subsampled variant draws AND scores on rows/16, plus one
        # full-data recount of the winning line). A wall that moves
        # while these rows don't is suite/host state, not the operator
        # (r12's 8.5 s headline reproduced at 2.9 s standalone with an
        # identical census).
        out["ransac_1x_expansion_rows"] = 2 * out["ransac_1x_rows"] * 64
        out["ransac_10x_expansion_rows"] = (
            2 * out["ransac_10x_rows"] * 64
        )
        out["ransac_sub16_1x_expansion_rows"] = (
            2 * (out["ransac_1x_rows"] // 16) * 64
            + out["ransac_1x_rows"]
        )
        out["ransac_sub16_10x_expansion_rows"] = (
            2 * (out["ransac_10x_rows"] // 16) * 64
            + out["ransac_10x_rows"]
        )

        # r12 (advisor): the subsample-scored variant — trials score
        # on the deterministic 1/16 subset, only the argmax line is
        # re-counted on the full data, so scoring work drops ~16x and
        # the 10x growth should read near-overhead instead of the
        # exhaustive path's work-dominated ~10
        t1s = _timed(
            lambda: ransac_line(
                r1, "x", "y", "pid", eps=2.0, subsample_mod=16
            ),
            runs=2,
        )
        t10s = _timed10(lambda: ransac_line(r10, "x", "y", "pid", eps=2.0, subsample_mod=16))
        out["ransac_sub16_1x"] = t1s["min"]
        out["ransac_sub16_10x"] = t10s
        out["ransac_sub16_growth"] = round(
            t10s / max(t1s["min"], 1e-9), 1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entry
    from etl_orders_to_bq_spark.session import get_spark

    # a 32-thread local "cluster" on an 8g heap is under-provisioned
    # (production sizes ~1g/core); the truss growth probe's partial
    # aggregation maps OOM'd it — match heap to the thread count
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # Spark's generated-class cache holds only 100 entries by
        # default; a 200-query interleaved suite evicts constantly and
        # re-pays janino compilation on every pass (measured: 28s
        # in-suite vs 3.8s standalone for ransac_line, whose 64-arm
        # trial expansion is compile-heavy). Size the cache to the
        # workload — the same knob a wide production workload tunes.
        # r13 second pass: the cache must hold the WHOLE suite's
        # sources or interleaved passes still thrash — measured ~35
        # generated classes per query (CodegenMetrics: 1107 compiles
        # for 31 queries), so 200 entries x 3 passes needs ~7000;
        # 2000 was measured still re-compiling fresh plan instances
        # (phash_neardup 5.7s vs 1.2s compiled-hot). 16384 fits with
        # headroom at ~30KB/class (~300MB of the 32g heap).
        extra_conf={
            "spark.sql.codegen.cache.maxEntries": "16384",
            # r14 attribution (scripts/jit_probe.py, full-suite run):
            # the 200-entry suite generates ~4200 janino classes whose
            # JIT'd methods exceed the JDK-17 default 240MB reserved
            # code cache (the two nmethod segments plateaued at the
            # sweeper threshold, ~160MB, with methods being flushed
            # and recompiled all suite long — 557s of cumulative
            # compiler-thread time). 1g reserve measured: warm-pass
            # total 433.8s -> 348.6s (-20%) on the same 200x2
            # interleave. The residual sporadic 10-70s stalls are a
            # DIFFERENT mechanism (see OPTIMIZATION_r14.md: a single
            # deoptimized decimal-sum hashAgg task burning CPU alone,
            # jstack-pinned) — attacked operator-side by narrowing
            # hot decimal sums. Production counterpart: raising
            # ReservedCodeCacheSize is the standard JVM tuning for
            # codegen-wide Spark workloads; engine sessions
            # (session.py) keep JVM defaults.
            "spark.driver.extraJavaOptions": (
                "-XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()

    # JVM/codegen warmup on the smallest fixture (not counted)
    _force(qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    # Interleaved passes: pass p runs every query once, so a transient
    # host-load burst hits at most one of each query's three samples.
    # Non-iterative queries reuse one built frame across passes (plan
    # construction is not the thing being timed); ITERATIVE entries
    # rebuild per run because their work happens at construction.
    _canary(spark)  # untimed probe warmup: the first range-sum pays
    # codegen + numpy thread-pool spinup; without this the start
    # sample reads 5-7x the steady state and the spread false-flags
    # a quiet host
    canary_samples = [_canary(spark)]
    run_lists: dict[str, list[float]] = {n: [] for n in HEADLINE}
    ctor_lists: dict[str, list[float]] = {n: [] for n in CTOR_TIMED}
    frames: dict[str, object] = {}
    n_passes = 3
    for p in range(n_passes):
        for name in HEADLINE:
            if name in ITERATIVE:
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir))
            elif name in CTOR_TIMED:
                # r14: headline = construction + force (the ITERATIVE
                # methodology — one accounting for every entry whose
                # construction does work). Components still recorded
                # per pass into ctor_detail for the one-round
                # transition table (old exec-only series = the exec
                # component).
                t0 = time.perf_counter()
                f = qs[name](spark, sf_dir)
                t_ctor = round(time.perf_counter() - t0, 3)
                t1 = time.perf_counter()
                _force(f)
                ctor_lists[name].append(
                    {
                        "ctor": t_ctor,
                        "exec": round(time.perf_counter() - t1, 3),
                    }
                )
            else:
                if name not in frames:
                    frames[name] = qs[name](spark, sf_dir)
                t0 = time.perf_counter()
                _force(frames[name])
            run_lists[name].append(round(time.perf_counter() - t0, 3))
        if p == n_passes - 2:
            canary_samples.append(_canary(spark))
    canary_samples.append(_canary(spark))
    frames.clear()
    ctor_detail = {
        name: {
            # the old (pre-r14) exec-only headline series is exec_min;
            # the headline `queries` value is now min(ctor + exec)
            "ctor_min": round(min(d["ctor"] for d in ts), 3),
            "exec_min": round(min(d["exec"] for d in ts), 3),
            "runs": ts,
        }
        for name, ts in ctor_lists.items()
        if ts
    }
    for name, ts in run_lists.items():
        detail[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "runs": ts,
        }
        timings[name] = detail[name]["min"]

    # end-to-end reference-parity pipeline (CSV scan -> repair -> dedup
    # -> clean -> broadcast join -> parquet sink) on the reference data;
    # the reference's own pandas run of the same work is the
    # single-node baseline this must match or beat
    import shutil
    import tempfile

    from etl_orders_to_bq_spark.pipeline import OrdersEtl

    out_dir = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        etl = OrdersEtl(
            spark,
            "/root/reference/input_data/orders_s.csv",
            "/root/reference/input_data/products_s.csv",
            table_name=f"{out_dir}/out",
        )
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            etl.process()
            etl.write(if_exists="replace")
            ts.append(round(time.perf_counter() - t0, 3))
        d = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "runs": ts,
        }
        timings["orders_pipeline_e2e"] = d["min"]
        detail["orders_pipeline_e2e"] = d
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # dedup at production parameters (128 hashes, 16 bands — the demo
    # gate queries use 4/2): asserts the signature+banding cost stays
    # linear and the bucket-size guard holds at real LSH settings.
    # Reported SEPARATELY from the headline total (it's a stress probe,
    # not a headline query): md5 = the oracle-portable path, xxhash64 =
    # the production fast path.
    from pyspark.sql import functions as F

    from etl_orders_to_bq_spark.operators.dedup import minhash_lsh_candidates
    from etl_orders_to_bq_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents").repartition(int(cpus))
    # warm the Python/Arrow worker pool before timing the numpy path:
    # md5/xxhash64 are pure-Column (no Python workers), so without this
    # the numpy number charges daemon startup to the operator (~2.5s
    # observed cold vs ~0.9s warm at sf0.1)
    _force(
        minhash_lsh_candidates(
            docs, text_col="text", id_col="doc_id",
            num_hashes=8, bands=2, hash_fn="numpy",
        )
    )
    stress: dict[str, float] = {}
    stress_detail: dict[str, dict] = {}

    def stress_timed(name: str, build, rebuild: bool = True) -> None:
        d = _timed(build, runs=3, rebuild=rebuild)
        stress[name] = d["min"]
        stress_detail[name] = d

    for fn in ("md5", "xxhash64", "numpy"):
        # rebuild per run: the operator checkpoints signatures, so
        # re-forcing one frame would time the cache, not the work
        stress_timed(
            f"dedup_minhash_lsh_128x16_{fn}",
            lambda f=fn: minhash_lsh_candidates(
                docs, text_col="text", id_col="doc_id",
                num_hashes=128, bands=16, hash_fn=f,
            ),
        )

    # classifier hash-family stress: the md5+conv bucket chain vs the
    # built-in xxhash64 production family (same two-family discipline
    # as MinHash above — the family is part of the model contract, so
    # the gated query stays md5; this pair quantifies what a
    # production deployment buys by training under xxhash64)
    from etl_orders_to_bq_spark.operators.classifier import (
        hashed_linear_score,
        seeded_weights,
    )

    clf_w = seeded_weights(1024, seed=17)
    for fn in ("md5", "xxhash64"):
        stress_timed(
            f"classifier_1024_{fn}",
            lambda f=fn: hashed_linear_score(
                docs, clf_w, bias=0.05, threshold=0.5, hash_fn=f
            ),
        )

    # k-core peel stress: the registry's fixed k=93 does ZERO peel
    # rounds on the much denser sf0.1 graph (min degree is far above
    # it), so the iterative path is timed here with a DATA-DEPENDENT k
    # (p75 of degrees) that guarantees real peeling at this fixture
    from etl_orders_to_bq_spark.operators.graph import kcore

    kli = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 1000).alias("src"),
        (F.col("l_partkey") % 1000).alias("dst"),
    )
    kdeg = (
        kli.select("src", "dst")
        .unionByName(kli.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("d"))
    )
    k75 = int(kdeg.agg(F.percentile_approx("d", 0.75)).first()[0])
    stress_timed("kcore_peel_p75", lambda: kcore(kli, k=k75))

    # skew stress: one hot key carrying 90% of sf0.1 lineitem, so the
    # SCALING.md skew-mitigation claims are tracked numbers, not prose.
    # Three join configs isolate each mitigation: the naive plan (AQE
    # skew split off), manual salting (operators/skew.py) under the
    # same handicap, and AQE's automatic skew-join split. Broadcast is
    # disabled throughout — a broadcastable dim would dodge the skew
    # entirely, and the helpers exist for the broadcast-INELIGIBLE
    # case. The agg pair documents that map-side partial aggregation
    # already absorbs algebraic hot-key aggs (salting is for the
    # non-combinable shapes).
    from etl_orders_to_bq_spark.operators.skew import salted_agg, salted_left_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    skewed = li.withColumn(
        "k",
        F.when(F.rand(seed=7) < 0.9, F.lit(0).cast("long")).otherwise(
            (F.rand(seed=11) * 1000).cast("long")
        ),
    ).localCheckpoint(eager=True)
    dim = (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
        .localCheckpoint(eager=True)
    )

    conf = spark.conf
    prev_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        stress_timed(
            "skew_join_hotkey_naive", lambda: skewed.join(dim, "k", "left")
        )
        stress_timed(
            "skew_join_hotkey_salted",
            lambda: salted_left_join(skewed, dim, "k", buckets=16),
        )
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        stress_timed(
            "skew_join_hotkey_aqe_split",
            lambda: skewed.join(dim, "k", "left"),
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    stress_timed(
        "skew_agg_hotkey_direct",
        lambda: skewed.groupBy("k").agg(
            F.sum("l_extendedprice").alias("s"),
            F.count("l_orderkey").alias("n"),
        ),
    )
    stress_timed(
        "skew_agg_hotkey_salted",
        lambda: salted_agg(
            skewed, ["k"], {"l_extendedprice": "sum", "l_orderkey": "count"}
        ),
    )

    # AMPLIFIED skew join — the crossover demo. At sf0.1 the hot key is
    # ~540k rows and every config finishes in ~0.5s (the sf0.1 rows
    # above document THAT honestly); the mitigations only pay once one
    # task's probe side is big enough to dominate the stage, so this
    # block synthesizes 10M rows with 95% on one key (hot task ~150MB)
    # and re-times the same three configs. The AQE row also documents
    # the knob reality: the default skewedPartitionThresholdInBytes
    # (256MB) is cluster-sized and never fires here — the tuned row
    # lowers it to 16MB, which is what an operator would do on a real
    # cluster whose partitions are under the default threshold.
    amp = (
        spark.range(10_000_000)
        .select(
            F.when(F.rand(seed=7) < 0.95, F.lit(0))
            .otherwise((F.rand(seed=11) * 1000).cast("long"))
            .alias("k"),
            (F.col("id") % 1000003).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    prev_thr = conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_adv = conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        stress_timed(
            "skew_amp_join_naive", lambda: amp.join(dim, "k", "left")
        )
        stress_timed(
            "skew_amp_join_salted",
            lambda: salted_left_join(amp, dim, "k", buckets=32),
        )
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16m",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        stress_timed(
            "skew_amp_join_aqe_tuned", lambda: amp.join(dim, "k", "left")
        )
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            prev_thr,
        )
        conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_adv
        )
    amp.unpersist()

    stress_sf1: dict = {}
    if not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        stress_sf1 = _sf1_stress(spark, sf_dir, int(cpus))

    # final canary sample after ALL timed work (the middle samples
    # bracket the headline passes; this one brackets stress + sf1)
    canary_samples.append(_canary(spark))
    canary = {
        "probe": "512x512 numpy matmul x8 (single-thread) + "
                 "spark.range(20M) sum collect",
        "samples": canary_samples,
        "spread": round(
            max(s["jvm_sec"] for s in canary_samples)
            / max(min(s["jvm_sec"] for s in canary_samples), 1e-9),
            2,
        ),
    }

    total = round(sum(timings.values()), 3)
    # The round driver captures only the LAST ~2 KB of stdout (r7/r8
    # BENCH records came back parsed:null because the one fat JSON
    # line overflowed that window). So: full detail goes to an early
    # line AND to BENCH_full.json on disk (the canonical record —
    # growth tables, run lists, censuses live there); a growth-only
    # compact line prints second-to-last (best effort: the tail
    # window catches whatever of it fits behind the final line); the
    # FINAL line is the parseable driver record — metric, total,
    # per-query medians at 2dp, and a pointer to the full file.
    # metric transition record (advisor r12): the headline scalar
    # switched from median-of-3 (r01-r11) to min-of-3 in r12, so
    # cross-round totals straddling r12 are metric-changed. Emit BOTH
    # totals so any round can be compared on either basis.
    median_total = round(
        sum(
            d["median"] for d in detail.values()
            if isinstance(d, dict) and "median" in d
        ),
        3,
    )
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_basis": "min_of_3",
        "median_total": median_total,
        "unit": "sec",
        "queries": timings,
        "queries_detail": detail,
        "ctor_detail": ctor_detail,
        "stress": stress,
        "stress_detail": stress_detail,
        "stress_sf1": stress_sf1,
        "canary": canary,
        "sf": sf,
    }
    print(json.dumps(full))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_full.json"), "w"
        ) as fh:
            json.dump(full, fh)
    except OSError:
        pass
    growth = {
        k.removesuffix("_growth"): v
        for k, v in stress_sf1.items()
        if k.endswith("_growth")
    }
    print(json.dumps({"metric": "stress_10x_growth", "growth": growth},
                     separators=(",", ":")))
    # the driver's stdout window is ~2 KB; degrade precision, then
    # drop the cheapest entries (full detail is always in
    # BENCH_full.json) rather than ever overflowing into parsed:null
    def _final_line(qmap: dict) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": qmap,
                "full": "BENCH_full.json",
                "canary_spread": canary["spread"],
                "sf": sf,
            },
            separators=(",", ":"),
        )

    qmap = {k: round(v, 2) for k, v in timings.items()}
    if len(_final_line(qmap)) > 1850:
        qmap = {k: round(v, 1) for k, v in timings.items()}
    while len(_final_line(qmap)) > 1850 and len(qmap) > 8:
        cheapest = min(
            (k for k in qmap if k != "omitted"),
            key=lambda k: timings[k],
        )
        del qmap[cheapest]
        qmap["omitted"] = qmap.get("omitted", 0) + 1
    if len(_final_line(qmap)) > 1850:
        # 8 pathologically long names can still overflow: last
        # resort, drop the queries map entirely — the totals alone
        # always fit, and BENCH_full.json keeps the detail
        qmap = {"omitted": len(timings)}
    print(_final_line(qmap))


if __name__ == "__main__":
    main()
