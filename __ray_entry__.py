"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
function here (or in webvalid) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"

# Queries already driver-green (rows+schema+hash all true) in
# CORRECTNESS_r01..r03. The driver's correctness window covers only the
# FIRST 50 keys of queries(), and it covered the same first-50 for three
# rounds — so queries() rotates these to the BACK and puts the
# never-driver-checked oracle-equipped queries first (VERDICT r3 next-
# steps #2). no_oracle queries go between: they only get a weak
# rows-only row, so they shouldn't displace an oracle-equipped check,
# but they should still cycle through eventually.
_DRIVER_GREEN_R3 = frozenset({
    "asof_clicks_purchases_events", "avg_value_by_event_type",
    "bigram_topk_documents", "column_stats_lineitem",
    "components_events_users", "components_star_events_users",
    "cooccurrence_lang_source_documents", "dedup_exact_documents",
    "distinct_exact_part_brand", "embedding_near_dups",
    "events_type_by_day", "events_type_by_day_jsonl",
    "grouped_quantiles_lineitem", "hash_split_documents",
    "histogram_lang_documents", "orders_by_nation",
    "partitioned_write_documents", "pricing_summary_lineitem",
    "props_k_by_type_events", "rayjoin_orders_customer",
    "referential_bloom_documents", "referential_orders_customer",
    "rolling_avg_value_events", "salted_join_orders_customer",
    "search_tokens_documents", "sessionize_events_users",
    "similarity_topk_embeddings", "sliding_2h_hourly_events",
    "stratified_sample_documents", "text_stats_documents",
    "token_totals_by_lang", "top_orders_per_customer",
    "tumbling_hourly_events", "unigram_topk_documents",
    "unigram_topk_sketch_documents", "uniqueness_events_user",
})

# Queries with no oracle_sql() entry (approximate / iterative /
# non-SQL-expressible — each has a checked twin or pytest coverage).
# tests/test_pipeline_e2e.py asserts this set == queries() - oracle_sql().
_NO_ORACLE = frozenset({
    "audio_features_documents", "cdcstream_segments_events",
    "cdda_segments_events", "compression_ratio_documents",
    "containment_documents", "dedup_clusters_documents",
    "dedup_minhash_documents", "dedup_simhash_documents",
    "dedup_verified_documents", "distinct_hll_documents",
    "fingerprint_documents", "kmeans_embeddings", "langid_documents",
    "logreg_error_events", "overlap_users_click_purchase",
    "quality_documents", "quantiles_tdigest_lineitem",
    "similarity_ivf_embeddings", "webpages_validation_suite",
})


def _driver_green() -> frozenset:
    """Union of fully-passing query names across every CORRECTNESS_r*.json
    the driver has written so far — keeps the rotation current in later
    rounds without hand-editing. Falls back to the r3 snapshot if the
    files are unreadable."""
    import glob
    import json
    import os
    import re

    # LAST-write-wins per query, not a union: a query green in an old
    # round but red (or unseen) later must rotate back into the window
    # for re-verification, or a regression ships unchecked forever.
    # Rounds are ordered by their NUMERIC index (r2 < r10), and a corrupt
    # file skips only itself — lexicographic order or a whole-loop except
    # would let one bad file freeze every later round's verdicts.
    verdicts: dict[str, bool] = {k: True for k in _DRIVER_GREEN_R3}
    here = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))

    def round_no(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for p in sorted(paths, key=round_no):
        try:
            with open(p) as f:
                d = json.load(f)
            items = d.items()
        except Exception:
            continue
        for k, v in items:
            try:
                verdicts[k] = bool(v.get("rows_match") and
                                   v.get("schema_match") and
                                   v.get("hash_match"))
            except Exception:
                continue
    return frozenset(k for k, ok in verdicts.items() if ok)


# Names pulled to the very front of the unverified group: the flagship
# suite's SQL twin and the checked twins of approximate/iterative ops —
# one driver row here certifies a whole operator family, so they beat
# ordinary relational queries for window slots.
_WINDOW_PRIORITY = [
    "asof_partitioned_clicks_purchases",   # r3's one red row: re-verify
    "webpages_verdicts_sql_subset",        # flagship suite twin
    "distinct_hll_checked_documents",
    "quantiles_tdigest_checked_lineitem",
    "overlap_users_checked_events",
    "kmeans_checked_embeddings",
    "logreg_separable_events",
    "jaccard_pairs_exact_documents",
    "similarity_ivf_checked_embeddings",
    "audio_checked_documents",
    "langid_trained_checked_documents",
    "video_frames_checked_documents",
    "decode_png_documents",
    "decode_jpeg_documents",
    "decode_gif_documents",
    "resize_images_documents",
    "bpe_tokens_documents",
]

# Names pushed to the BACK of the unverified group: with 53 unverified
# oracle-equipped queries and a 50-slot window, 3 must miss — pick the
# 3 whose operator family already has a driver-green value-exact twin,
# so no family is left driver-unverified:
#   quantile_disc — quantiles family covered by grouped_quantiles +
#     tdigest-checked (both green); quantile_cont keeps its slot
#   hmean — power-mean family; geomean keeps its slot
#   sink_roundtrip — sink family covered by partitioned_write (green)
_WINDOW_DEPRIORITY = [
    "quantile_disc_price_lineitem",
    "hmean_chars_by_lang",
    "sink_roundtrip_events",
]


def _rotate_for_driver_window(base: dict) -> dict:
    """Order queries() so the driver's 50-entry window verifies what it
    has never seen: priority twins first, then the other unverified
    oracle-equipped queries, then depriority overflow, then no_oracle,
    then already-driver-green."""
    green = _driver_green()
    prio = {k: base[k] for k in _WINDOW_PRIORITY
            if k in base and k not in green and k not in _NO_ORACLE}
    front = {k: v for k, v in base.items()
             if k not in green and k not in _NO_ORACLE and k not in prio
             and k not in _WINDOW_DEPRIORITY}
    overflow = {k: base[k] for k in _WINDOW_DEPRIORITY
                if k in base and k not in green and k not in _NO_ORACLE}
    mid = {k: v for k, v in base.items() if k in _NO_ORACLE}
    back = {k: v for k, v in base.items() if k in green}
    return {**prio, **front, **overflow, **mid, **back}


def entry() -> Any:
    """Flagship: full validation suite.

    Runs the webvalid validation engine end-to-end on a deterministic
    synthetic Common-Crawl-style webpages table (BASELINE.json
    input_hint schema, seeded generator) AND sanity-checks the driver
    testdata: the returned verdicts table covers schema, column stats,
    uniqueness, referential integrity, text parity and the
    CDCStream/CDDA/chi2/KS drift detectors.
    """
    import os
    import tempfile

    import pandas as pd

    from webvalid.checks.base import CheckConfig
    from webvalid.gen import generate_webpages
    from webvalid.pipeline import run_validation
    from webvalid.queries import histogram_lang_documents

    # v2: parity fingerprint scheme changed — stale caches would flood
    # text_parity
    base = os.path.join(tempfile.gettempdir(), "webvalid_entry_v2")
    fix_dir = os.path.join(base, "fixture")
    out_dir = os.path.join(base, "out")
    # text_hashes.parquet is generated LAST — its presence implies a
    # complete fixture
    marker = os.path.join(fix_dir, "text_hashes.parquet")
    if not os.path.exists(marker):
        generate_webpages(fix_dir, n_rows=5_000, block_size=500, seed=7)
    info = {
        "pages_dir": os.path.join(fix_dir, "webpages"),
        "ref_langs": os.path.join(fix_dir, "ref_langs.parquet"),
        "text_hashes": os.path.join(fix_dir, "text_hashes.parquet"),
    }
    from webvalid.gen import TS_LO, TS_HI

    cfg = CheckConfig(block_size=500, ts_range=(int(TS_LO), int(TS_HI)))
    res = run_validation(
        info["pages_dir"], out_dir, cfg=cfg,
        ref_langs=info["ref_langs"], text_hashes=info["text_hashes"],
    )
    # also exercise the driver testdata path (sf0.001) and the multimodal
    # decode plumbing over the fixture's html binary column
    _ = histogram_lang_documents(SF0001)
    import glob

    import ray.data

    from webvalid.ops.multimodal import decode_images

    first = sorted(glob.glob(os.path.join(info["pages_dir"], "*.parquet")))[0]
    decoded = decode_images(
        ray.data.read_parquet(first, columns=["url", "html"]), concurrency=2
    )
    assert decoded.count() > 0
    return res["verdicts"]


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from webvalid import queries as q

    base = {
        # flagship: full webpages validation suite (rows-only)
        "webpages_validation_suite": q.webpages_validation_suite,
        # column statistics (SURVEY §2.5 A1/A8 + north_rule stats)
        "column_stats_lineitem": q.column_stats_lineitem,
        # uniqueness / referential (north_rule §2.4/§2.7)
        "uniqueness_events_user": q.uniqueness_events_user,
        "referential_orders_customer": q.referential_orders_customer,
        "referential_bloom_documents": q.referential_bloom_documents,
        # per-partition histograms / co-occurrence (A9 / A2)
        "histogram_lang_documents": q.histogram_lang_documents,
        "cooccurrence_lang_source_documents": q.cooccurrence_lang_source_documents,
        # grouped aggregation + broadcast join machinery
        "pricing_summary_lineitem": q.pricing_summary_lineitem,
        "orders_by_nation": q.orders_by_nation,
        "events_type_by_day": q.events_type_by_day,
        "events_type_by_day_jsonl": q.events_type_by_day_jsonl,
        "distinct_exact_part_brand": q.distinct_exact_part_brand,
        "avg_value_by_event_type": q.avg_value_by_event_type,
        "props_k_by_type_events": q.props_k_by_type_events,
        # rank/window + as-of join operator families
        "top_orders_per_customer": q.top_orders_per_customer,
        "rolling_avg_value_events": q.rolling_avg_value_events,
        "asof_clicks_purchases_events": q.asof_clicks_purchases_events,
        "asof_partitioned_clicks_purchases": q.asof_partitioned_clicks_purchases,
        # event-time windows (windows-as-data; Ray has no native windows)
        "tumbling_hourly_events": q.tumbling_hourly_events,
        "sliding_2h_hourly_events": q.sliding_2h_hourly_events,
        "sessionize_events_users": q.sessionize_events_users,
        # bucketed + hot-key-salted hash join (ops/joins.py)
        "salted_join_orders_customer": q.salted_join_orders_customer,
        # true all-to-all hash join (Ray Dataset.join — both sides huge)
        "rayjoin_orders_customer": q.rayjoin_orders_customer,
        # dedup family
        "dedup_exact_documents": q.dedup_exact_documents,
        "dedup_minhash_documents": q.dedup_minhash_documents,
        "dedup_simhash_documents": q.dedup_simhash_documents,
        "dedup_verified_documents": q.dedup_verified_documents,
        "embedding_near_dups": q.embedding_near_dups_gate,
        # text analysis
        "text_stats_documents": q.text_stats_documents,
        "token_totals_by_lang": q.token_totals_by_lang,
        "langid_documents": q.langid_documents,
        "quality_documents": q.quality_documents,
        # similarity search
        "similarity_topk_embeddings": q.similarity_topk_embeddings,
        "similarity_ivf_embeddings": q.similarity_ivf_embeddings,
        # document fingerprinting
        "fingerprint_documents": q.fingerprint_documents,
        # sketches (approximate — rows-only checks)
        "distinct_hll_documents": q.distinct_hll_documents,
        "quantiles_tdigest_lineitem": q.quantiles_tdigest_lineitem,
        # reference drift detectors (CDCStream / CDDA) over events
        "cdcstream_segments_events": q.cdcstream_segments_events,
        "cdda_segments_events": q.cdda_segments_events,
        # deterministic content-hash splitting / stratified sampling
        "hash_split_documents": q.hash_split_documents,
        "stratified_sample_documents": q.stratified_sample_documents,
        # corpus n-gram frequency (word-count shape)
        "unigram_topk_documents": q.unigram_topk_documents,
        "bigram_topk_documents": q.bigram_topk_documents,
        "unigram_topk_sketch_documents": q.unigram_topk_sketch_documents,
        # distributed connected components (dup-cluster assignment)
        "components_events_users": q.components_events_users,
        "components_star_events_users": q.components_star_events_users,
        "dedup_clusters_documents": q.dedup_clusters_documents,
        # exact grouped quantiles via the full groupby shuffle path
        "grouped_quantiles_lineitem": q.grouped_quantiles_lineitem,
        # partitioned parquet sink round-trip (resumable layout)
        "partitioned_write_documents": q.partitioned_write_documents,
        # vectorized substring search
        "search_tokens_documents": q.search_tokens_documents,
        # corpus-DF boilerplate strip (two-pass rewrite)
        "remove_boilerplate_documents": q.remove_boilerplate_documents,
        # distributed total-order sort + limit
        "global_topk_orders": q.global_topk_orders,
        # eval-decontamination scan (benchmark n-gram overlap)
        "contamination_documents": q.contamination_documents,
        # composed corpus-prep pipeline (dedup -> boilerplate -> split)
        "prep_corpus_documents": q.prep_corpus_documents,
        # join variants: left outer (null-fill polarity) + semi (membership)
        "left_join_orders_customer": q.left_join_orders_customer,
        "semi_join_orders_customer": q.semi_join_orders_customer,
        # reshape: crosstab pivot + streaming unpivot/melt
        "pivot_day_by_type_events": q.pivot_day_by_type_events,
        "unpivot_lineitem_measures": q.unpivot_lineitem_measures,
        # distributed set ops (EXCEPT via shuffle, INTERSECT via driver)
        "except_en_src0_documents": q.except_en_src0_documents,
        "intersect_en_src0_documents": q.intersect_en_src0_documents,
        # per-key window functions: LAG / running total
        "lag_value_events": q.lag_value_events,
        "cumsum_value_events": q.cumsum_value_events,
        # distributed zipWithIndex (global total-order row number)
        "row_number_orders": q.row_number_orders,
        # TF-IDF (DF pass + broadcast score pass)
        "tfidf_max_documents": q.tfidf_max_documents,
        # text normalization (lower / whitespace collapse / trim)
        "normalize_text_documents": q.normalize_text_documents,
        # GROUP BY ROLLUP levels from one pass
        "rollup_lang_source_documents": q.rollup_lang_source_documents,
        # NTILE deciles over a global sort
        "ntile_orders": q.ntile_orders,
        # Gopher-style repetition/quality profile
        "repetition_documents": q.repetition_documents,
        # LEAD + DENSE_RANK window functions
        "lead_value_events": q.lead_value_events,
        "dense_rank_lineitem": q.dense_rank_lineitem,
        # FULL OUTER join (left outer ∪ right-only)
        "full_join_orders_customer": q.full_join_orders_customer,
        # composed prep v2: dedup → repetition filter → boilerplate → split
        "prep_corpus_v2_documents": q.prep_corpus_v2_documents,
        # deterministic bottom-k (KMV) uniform sample
        "sample_bottomk_documents": q.sample_bottomk_documents,
        # equi-width numeric histogram via the mergeable sketch
        "histogram_price_lineitem": q.histogram_price_lineitem,
        # PERCENT_RANK + per-key FIRST/LAST_VALUE window functions
        "percent_rank_orders": q.percent_rank_orders,
        "first_last_value_events": q.first_last_value_events,
        # RANK (competition) + CUME_DIST + multi-reducer rolling frames
        "rank_lineitem": q.rank_lineitem,
        "cume_dist_orders": q.cume_dist_orders,
        "rolling_minmax_value_events": q.rolling_minmax_value_events,
        # broadcast interval/range join (busiest-day windows)
        "range_join_events_days": q.range_join_events_days,
        # GROUP BY CUBE from one finest-partials pass
        "cube_lang_source_documents": q.cube_lang_source_documents,
        # grouped mode / entropy / correlation (profile aggregates)
        "mode_event_type_by_user": q.mode_event_type_by_user,
        "entropy_event_type_by_user": q.entropy_event_type_by_user,
        "corr_qty_price_lineitem": q.corr_qty_price_lineitem,
        # per-group ordered string_agg + per-group arg-max
        "stringagg_docs_by_lang_source": q.stringagg_docs_by_lang_source,
        "argmax_chars_documents": q.argmax_chars_documents,
        # temporal profile (ISO dow × hour)
        "events_dow_hour": q.events_dow_hour,
        # PII redaction + fixed-token-window chunking (training-data ops)
        "redact_pii_documents": q.redact_pii_documents,
        "chunk_tokens_documents": q.chunk_tokens_documents,
        # exact quantile selection (histogram bisection — no sort)
        "quantile_disc_price_lineitem": q.quantile_disc_price_lineitem,
        # per-key exact distinct count + min-max feature scaling
        "distinct_users_by_type": q.distinct_users_by_type,
        "normalize_value_events": q.normalize_value_events,
        # gap-filled (densified) hourly counts
        "densify_hourly_events": q.densify_hourly_events,
        # vector-column statistics (per-label embedding norms)
        "embedding_norms_by_label": q.embedding_norms_by_label,
        # funnel conversion (sequence analytics) + grouped heavy hitters
        "funnel_click_purchase_events": q.funnel_click_purchase_events,
        "top_tokens_by_lang": q.top_tokens_by_lang,
        # weighted mean / ratio-to-report / equi-depth composition
        "weighted_avg_price_lineitem": q.weighted_avg_price_lineitem,
        "share_by_priority_orders": q.share_by_priority_orders,
        "equidepth_buckets_price_lineitem": q.equidepth_buckets_price_lineitem,
        # higher moments / outlier scan / interpolated quantiles
        "skew_kurtosis_price_lineitem": q.skew_kurtosis_price_lineitem,
        "zscore_outliers_price_lineitem": q.zscore_outliers_price_lineitem,
        "quantile_cont_price_lineitem": q.quantile_cont_price_lineitem,
        # keep-best canonical dedup + per-group rebalancing cap
        "dedup_keep_best_documents": q.dedup_keep_best_documents,
        "cap_per_lang_documents": q.cap_per_lang_documents,
        # anti join, imputation (LOCF + group mean), geomean, regex extract
        "anti_join_customers_no_orders": q.anti_join_customers_no_orders,
        "fill_forward_value_events": q.fill_forward_value_events,
        "impute_group_mean_events": q.impute_group_mean_events,
        "geomean_chars_by_lang": q.geomean_chars_by_lang,
        "extract_first_number_documents": q.extract_first_number_documents,
        # robust stats, edit-distance verify, per-key rate
        "median_mad_price_lineitem": q.median_mad_price_lineitem,
        "edit_distance_adjacent_documents": q.edit_distance_adjacent_documents,
        "rate_value_events": q.rate_value_events,
        # sliding-window COUNT DISTINCT (trailing-3h active users)
        "sliding_3h_distinct_users_events": q.sliding_3h_distinct_users_events,
        # paragraph(chunk)-level exact dedup with document rebuild
        "dedup_paragraphs_documents": q.dedup_paragraphs_documents,
        # gaps-and-islands run stats per user
        "streaks_events_users": q.streaks_events_users,
        # winsorized grouped mean (exact global PERCENTILE_CONT fences)
        "winsorized_mean_price_lineitem": q.winsorized_mean_price_lineitem,
        # per-type least-squares trend (mergeable moment partials)
        "trend_value_by_type_events": q.trend_value_by_type_events,
        # time-RANGE window frame (trailing-hour sum incl. peers)
        "rolling_1h_sum_value_events": q.rolling_1h_sum_value_events,
        # cohort retention matrix (first-day partials + broadcast)
        "retention_cohorts_events": q.retention_cohorts_events,
        # distributed Lloyd k-means (rows-only: iterative)
        "kmeans_embeddings": q.kmeans_embeddings,
        # PSI drift magnitude per source vs pooled rest
        "psi_lang_by_source_documents": q.psi_lang_by_source_documents,
        # interval-union coverage (merged 15-min activity windows)
        "coverage_15min_events_users": q.coverage_15min_events_users,
        # Benford first-digit profile (exact integer digit extraction)
        "benford_price_lineitem": q.benford_price_lineitem,
        # per-key exponential moving average (recursive scan)
        "ewma_value_events": q.ewma_value_events,
        # deterministic PPS sampling (integer cumulative weights)
        "weighted_sample_documents": q.weighted_sample_documents,
        # daily new users + cumulative distinct
        "new_users_daily_events": q.new_users_daily_events,
        # chi2 independence + Cramér's V (categorical association)
        "chi2_lang_source_documents": q.chi2_lang_source_documents,
        # grouped harmonic mean
        "hmean_chars_by_lang": q.hmean_chars_by_lang,
        # snapshot regression diff (added/removed/changed keys)
        "snapshot_diff_documents": q.snapshot_diff_documents,
        # Mann-Whitney rank-sum drift test (tie-corrected)
        "ranksum_error_value_events": q.ranksum_error_value_events,
        # mutual information (categorical association, nats)
        "mutual_info_lang_source_documents": q.mutual_info_lang_source_documents,
        # storage-partitioned (bucketed-layout) join — no shuffle
        "storage_join_orders_customer": q.storage_join_orders_customer,
        # REAL WAV decode through the actor pool (rows-only)
        "audio_features_documents": q.audio_features_documents,
        # HLL audience overlap via inclusion-exclusion (rows-only)
        "overlap_users_click_purchase": q.overlap_users_click_purchase,
        # zlib compression-ratio quality signal (rows-only)
        "compression_ratio_documents": q.compression_ratio_documents,
        # declarative expectation suite (config-driven checks)
        "expectations_lineitem": q.expectations_lineitem,
        # rolling z-score anomaly scan on the hourly series
        "anomalous_hours_events": q.anomalous_hours_events,
        # distributed full-batch logistic regression (rows-only)
        "logreg_error_events": q.logreg_error_events,
        # schema-evolution-tolerant parquet read (union schema)
        "schema_evolution_documents": q.schema_evolution_documents,
        # CSV + JSONL sink round-trip
        "sink_roundtrip_events": q.sink_roundtrip_events,
        # corpus bigram-LM quality scores (perplexity filter)
        "lm_scores_documents": q.lm_scores_documents,
        # winnowing-fingerprint containment pairs (rows-only)
        "containment_documents": q.containment_documents,
        # checked twins: approximate/iterative ops asserted against
        # exact answers computed in the same run (flags must be TRUE)
        "distinct_hll_checked_documents": q.distinct_hll_checked_documents,
        "quantiles_tdigest_checked_lineitem": q.quantiles_tdigest_checked_lineitem,
        "overlap_users_checked_events": q.overlap_users_checked_events,
        "kmeans_checked_embeddings": q.kmeans_checked_embeddings,
        "logreg_separable_events": q.logreg_separable_events,
        "jaccard_pairs_exact_documents": q.jaccard_pairs_exact_documents,
        "webpages_verdicts_sql_subset": q.webpages_verdicts_sql_subset,
        # real image decode through the actor pool (pure-NumPy codecs)
        "decode_png_documents": q.decode_png_documents,
        "decode_gif_documents": q.decode_gif_documents,
        "decode_jpeg_documents": q.decode_jpeg_documents,
        "bpe_tokens_documents": q.bpe_tokens_documents,
        "resize_images_documents": q.resize_images_documents,
        "similarity_ivf_checked_embeddings": q.similarity_ivf_checked_embeddings,
        "audio_checked_documents": q.audio_checked_documents,
        # trained char-trigram lang-ID, held-out accuracy checked twin
        "langid_trained_checked_documents": q.langid_trained_checked_documents,
        # REAL MJPEG/AVI video frame sampling (container parse + JPEG)
        "video_frames_checked_documents": q.video_frames_checked_documents,
        # Gopher duplicate-trigram fraction (registered LAST on purpose:
        # round-5 additions must not displace the 50 rotation targets)
        "dup_ngram_documents": q.dup_ngram_documents,
        # per-group HLL distinct, checked vs exact (also a round-5 add)
        "grouped_distinct_hll_checked_events":
            q.grouped_distinct_hll_checked_events,
    }
    return _rotate_for_driver_window(base)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible queries (same column names)."""
    from webvalid import queries as q

    # the suite-verdict twin's SQL reads the fixture parquet by path —
    # make sure it exists even if the driver evaluates oracles first
    fixture_base = q.ensure_suite_fixture()
    langid_fixture = q.ensure_langid_fixture()
    return {
        "langid_trained_checked_documents": f"""
            SELECT lang, COUNT(*) AS n_eval, TRUE AS acc_ok
            FROM read_parquet('{langid_fixture}')
            WHERE split = 'test' GROUP BY lang ORDER BY lang
        """,
        "video_frames_checked_documents": """
            SELECT doc_id, CAST(f.fi AS INTEGER) AS frame_idx,
                   32 AS width, 32 AS height, TRUE AS luma_ok
            FROM documents, (VALUES (0), (2), (4)) AS f(fi)
            WHERE doc_id < 300
            ORDER BY doc_id, frame_idx
        """,
        "column_stats_lineitem": """
            SELECT "column", n_rows, n_nulls, min_val, max_val FROM (
                SELECT 'l_discount' AS "column", COUNT(*) AS n_rows,
                       COUNT(*) - COUNT(l_discount) AS n_nulls,
                       MIN(l_discount) AS min_val, MAX(l_discount) AS max_val FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
                       MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
                UNION ALL
                SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
                       MIN(l_quantity), MAX(l_quantity) FROM lineitem
                UNION ALL
                SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
                       MIN(l_tax), MAX(l_tax) FROM lineitem
            ) ORDER BY "column"
        """,
        "uniqueness_events_user": """
            SELECT user_id, COUNT(*) AS cnt FROM events
            GROUP BY user_id HAVING COUNT(*) > 1 ORDER BY user_id
        """,
        "referential_orders_customer": """
            SELECT o_custkey, COUNT(*) AS cnt FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
            GROUP BY o_custkey ORDER BY o_custkey
        """,
        "referential_bloom_documents": """
            SELECT doc_id, source FROM documents
            WHERE source NOT IN (
                SELECT DISTINCT source FROM documents WHERE source <> 'src0'
            ) ORDER BY doc_id
        """,
        "histogram_lang_documents": """
            SELECT doc_id // 100 AS partition_id, lang, COUNT(*) AS cnt
            FROM documents GROUP BY 1, 2
        """,
        "cooccurrence_lang_source_documents": """
            SELECT doc_id // 100 AS partition_id, lang, source, COUNT(*) AS cnt
            FROM documents GROUP BY 1, 2, 3
        """,
        "pricing_summary_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   COUNT(*) AS count_order,
                   MIN(l_extendedprice) AS min_price,
                   MAX(l_extendedprice) AS max_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "orders_by_nation": """
            SELECT n_name, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "events_type_by_day": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "distinct_exact_part_brand": """
            SELECT COUNT(DISTINCT p_brand) AS n_distinct FROM part
        """,
        "tumbling_hourly_events": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
                   event_type, COUNT(*) AS cnt,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
        """,
        "sliding_2h_hourly_events": """
            WITH bounds AS (
                -- "- 2": reaches the engine's lowest (floor-derived)
                -- window even for negative non-aligned minima; the
                -- inner join drops any extra empty grid point
                SELECT (MIN(epoch_us(ts)) // 3600000000 - 2) * 3600000000 AS lo,
                       (MAX(epoch_us(ts)) // 3600000000) * 3600000000 AS hi
                FROM events
            ), wins AS (
                SELECT unnest(generate_series(lo, hi, 3600000000)) AS window_start
                FROM bounds
            )
            SELECT w.window_start, COUNT(*) AS cnt,
                   MIN(e.value) AS min_value, MAX(e.value) AS max_value
            FROM wins w JOIN events e
              ON epoch_us(e.ts) >= w.window_start
             AND epoch_us(e.ts) <  w.window_start + 7200000000
            GROUP BY w.window_start ORDER BY w.window_start
        """,
        "sessionize_events_users": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us,
                       LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                               ORDER BY epoch_us(ts)) AS prev_ts
                FROM events
            ), flagged AS (
                SELECT user_id, ts_us,
                       CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 3600000000
                            THEN 1 ELSE 0 END AS new_s
                FROM e
            ), sess AS (
                SELECT user_id, ts_us,
                       CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                             ROWS UNBOUNDED PRECEDING) - 1
                            AS BIGINT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id,
                   MIN(ts_us) AS session_start, MAX(ts_us) AS session_end,
                   COUNT(*) AS n_events
            FROM sess GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "salted_join_orders_customer": """
            SELECT c_mktsegment, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "events_type_by_day_jsonl": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "rayjoin_orders_customer": """
            SELECT c_mktsegment, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "avg_value_by_event_type": """
            SELECT event_type,
                   ROUND(AVG(value), 4) AS avg_value,
                   ROUND(STDDEV_POP(value), 4) AS std_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "props_k_by_type_events": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS BIGINT) AS rn
                FROM orders
            ) WHERE rn <= 3 ORDER BY o_custkey, rn
        """,
        "rolling_avg_value_events": """
            SELECT event_id, user_id,
                   ROUND(AVG(value) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) + 1e-9, 6) AS rolling_avg
            FROM events ORDER BY event_id
        """,
        # Deterministic as-of oracle: DuckDB's ASOF JOIN tie-pick among
        # right rows with equal (user_id, ts) is unspecified, so spell
        # out the engine's tie-break (max event_id among max-ts rows).
        "asof_clicks_purchases_events": """
            SELECT l.event_id AS click_id, epoch_us(l.ts) AS ts_us, l.user_id,
                   r.event_id AS purchase_id, r.value AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY l.event_id
                ORDER BY r.ts DESC NULLS LAST, r.event_id DESC NULLS LAST
            ) = 1
            ORDER BY click_id
        """,
        "asof_partitioned_clicks_purchases": """
            SELECT l.event_id AS click_id, epoch_us(l.ts) AS ts_us, l.user_id,
                   r.event_id AS purchase_id, r.value AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY l.event_id
                ORDER BY r.ts DESC NULLS LAST, r.event_id DESC NULLS LAST
            ) = 1
            ORDER BY click_id
        """,
        "dedup_exact_documents": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper, COUNT(*) AS cnt
            FROM documents GROUP BY md5(text) ORDER BY text_md5
        """,
        "text_stats_documents": """
            SELECT doc_id, LENGTH(text) AS n_chars_computed,
                   LEN(STR_SPLIT(text, ' ')) AS n_tokens
            FROM documents
        """,
        "token_totals_by_lang": """
            SELECT lang, CAST(SUM(LEN(STR_SPLIT(text, ' '))) AS BIGINT) AS total_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "embedding_near_dups": """
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
            ORDER BY doc_a, doc_b
        """,
        "similarity_topk_embeddings": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings ORDER BY vec_id LIMIT 5
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
                FROM q CROSS JOIN embeddings e
            ), ranked AS (
                SELECT query_id, vec_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rn
                FROM scored
            )
            SELECT query_id, vec_id, ROUND(sim, 6) AS cosine
            FROM ranked WHERE rn <= 10
            ORDER BY query_id, cosine DESC, vec_id
        """,
        # 0.8/0.1/0.1 split: cum thresholds 0.8→0xcccc, 0.9→0xe666 of the
        # first 16 md5 bits; fixed-width lowercase hex compares numerically
        "hash_split_documents": """
            SELECT doc_id,
                   CASE WHEN substr(md5(text), 1, 4) < 'cccc' THEN 'train'
                        WHEN substr(md5(text), 1, 4) < 'e666' THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id
        """,
        # rates en=0.25 (0x4000), es=0.5 (0x8000), default 1.0 (keep all)
        "stratified_sample_documents": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(text), 1, 4) <
                  CASE lang WHEN 'en' THEN '4000'
                            WHEN 'es' THEN '8000'
                            ELSE 'zzzz' END
            ORDER BY doc_id
        """,
        "unigram_topk_documents": """
            SELECT ngram, cnt FROM (
                SELECT token AS ngram, COUNT(*) AS cnt FROM (
                    SELECT unnest(str_split(text, ' ')) AS token FROM documents
                ) GROUP BY token
            ) ORDER BY cnt DESC, ngram LIMIT 50
        """,
        "unigram_topk_sketch_documents": """
            SELECT ngram, cnt FROM (
                SELECT token AS ngram, COUNT(*) AS cnt FROM (
                    SELECT unnest(str_split(text, ' ')) AS token FROM documents
                ) GROUP BY token
            ) ORDER BY cnt DESC, ngram LIMIT 50
        """,
        "bigram_topk_documents": """
            SELECT ngram, cnt FROM (
                SELECT bigram AS ngram, COUNT(*) AS cnt FROM (
                    SELECT unnest(list_transform(
                               generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                    FROM (SELECT str_split(text, ' ') AS toks FROM documents)
                ) GROUP BY bigram
            ) ORDER BY cnt DESC, ngram LIMIT 50
        """,
        # min-reachable-label components of the functional graph
        # u <-> (2u mod 150), via transitive closure
        "components_events_users": """
            WITH RECURSIVE base AS (
                SELECT DISTINCT user_id AS a, (user_id * 2) % 150 AS b FROM events
            ), undirected AS (
                SELECT a, b FROM base UNION SELECT b, a FROM base
                UNION SELECT a, a FROM base UNION SELECT b AS a, b FROM base
            ), reach(a, b) AS (
                SELECT a, b FROM undirected
                UNION
                SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a
            )
            SELECT a AS node, MIN(b) AS component FROM reach
            GROUP BY a ORDER BY node
        """,
        "components_star_events_users": """
            WITH RECURSIVE base AS (
                SELECT DISTINCT user_id AS a, (user_id * 2) % 150 AS b FROM events
            ), undirected AS (
                SELECT a, b FROM base UNION SELECT b, a FROM base
                UNION SELECT a, a FROM base UNION SELECT b AS a, b FROM base
            ), reach(a, b) AS (
                SELECT a, b FROM undirected
                UNION
                SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a
            )
            SELECT a AS node, MIN(b) AS component FROM reach
            GROUP BY a ORDER BY node
        """,
        "grouped_quantiles_lineitem": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "partitioned_write_documents": """
            SELECT lang, COUNT(*) AS n_docs FROM documents
            GROUP BY lang ORDER BY lang
        """,
        "search_tokens_documents": """
            SELECT doc_id FROM documents
            WHERE text LIKE '%spark window%' ORDER BY doc_id
        """,
        # strip tokens with document frequency > 0.78 * n_docs and
        # reassemble each doc in token order; all-hot docs drop out
        "remove_boilerplate_documents": """
            WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
            df AS (
                SELECT token, COUNT(DISTINCT doc_id) AS df FROM (
                    SELECT doc_id, unnest(str_split(text, ' ')) AS token
                    FROM documents
                ) GROUP BY token
            ),
            hot AS (SELECT token FROM df, n WHERE df > 0.78 * n_docs),
            tok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token,
                       unnest(generate_series(1, len(str_split(text, ' ')))) AS ord
                FROM documents
            )
            SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.ord) AS clean_text
            FROM tok t LEFT JOIN hot h ON t.token = h.token
            WHERE h.token IS NULL
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        "global_topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        # docs (id >= 5) sharing any bigram with the "benchmark" docs 0-4;
        # n_hits = count of DISTINCT shared bigrams
        "contamination_documents": """
            WITH bench AS (
                SELECT DISTINCT bigram FROM (
                    SELECT unnest(list_transform(
                               generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                    FROM (SELECT str_split(text, ' ') AS toks
                          FROM documents WHERE doc_id < 5)
                )
            ),
            doc_bigrams AS (
                SELECT DISTINCT doc_id, bigram FROM (
                    SELECT doc_id, unnest(list_transform(
                               generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                    FROM (SELECT doc_id, str_split(text, ' ') AS toks
                          FROM documents WHERE doc_id >= 5)
                )
            )
            SELECT d.doc_id, COUNT(*) AS n_hits
            FROM doc_bigrams d JOIN bench b USING (bigram)
            GROUP BY d.doc_id ORDER BY d.doc_id
        """,
        # composed pipeline oracle: exact dedup (min doc per text) ->
        # df>0.78-of-kept boilerplate strip (all-hot docs drop) ->
        # md5 split on the ORIGINAL text
        "prep_corpus_documents": """
            WITH kept_ids AS (
                SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            kd AS (
                SELECT d.doc_id, d.text FROM documents d
                JOIN kept_ids k USING (doc_id)
            ),
            n AS (SELECT COUNT(*) AS n_docs FROM kd),
            df AS (
                SELECT token, COUNT(DISTINCT doc_id) AS df FROM (
                    SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM kd
                ) GROUP BY token
            ),
            hot AS (SELECT token FROM df, n WHERE df > 0.78 * n_docs),
            tok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token,
                       unnest(generate_series(1, len(str_split(text, ' ')))) AS ord
                FROM kd
            ),
            clean AS (
                SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.ord) AS clean_text
                FROM tok t LEFT JOIN hot h ON t.token = h.token
                WHERE h.token IS NULL GROUP BY t.doc_id
            )
            SELECT c.doc_id,
                   CASE WHEN substr(md5(d.text), 1, 4) < 'cccc' THEN 'train'
                        WHEN substr(md5(d.text), 1, 4) < 'e666' THEN 'valid'
                        ELSE 'test' END AS split,
                   c.clean_text
            FROM clean c JOIN documents d USING (doc_id)
            ORDER BY c.doc_id
        """,
        "left_join_orders_customer": """
            SELECT COALESCE(c_mktsegment, 'UNMATCHED') AS segment,
                   COUNT(*) AS n_orders
            FROM orders LEFT JOIN (
                SELECT c_custkey, c_mktsegment FROM customer
                WHERE c_custkey % 3 <> 0
            ) c ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY segment
        """,
        "semi_join_orders_customer": """
            SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
            )
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "pivot_day_by_type_events": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
            FROM events GROUP BY 1 ORDER BY day
        """,
        "unpivot_lineitem_measures": """
            SELECT measure, COUNT(*) AS n_rows,
                   MIN(val) AS min_val, MAX(val) AS max_val
            FROM (
                SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
                UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
                UNION ALL SELECT 'l_discount', l_discount FROM lineitem
                UNION ALL SELECT 'l_tax', l_tax FROM lineitem
            ) GROUP BY measure ORDER BY measure
        """,
        "except_en_src0_documents": """
            SELECT DISTINCT doc_id FROM documents
            WHERE lang = 'en' AND doc_id NOT IN (
                SELECT doc_id FROM documents WHERE source = 'src0'
            ) ORDER BY doc_id
        """,
        "intersect_en_src0_documents": """
            SELECT DISTINCT doc_id FROM documents
            WHERE lang = 'en' AND doc_id IN (
                SELECT doc_id FROM documents WHERE source = 'src0'
            ) ORDER BY doc_id
        """,
        "lag_value_events": """
            SELECT event_id, user_id,
                   ROUND(LAG(value) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ), 6) AS lagged
            FROM events ORDER BY event_id
        """,
        "cumsum_value_events": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS UNBOUNDED PRECEDING
                   ) + 1e-9, 6) AS cum_value
            FROM events ORDER BY event_id
        """,
        "row_number_orders": """
            SELECT o_orderkey,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders ORDER BY rn
        """,
        "tfidf_max_documents": """
            WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
            tok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token
                FROM documents
            ),
            tf AS (
                SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
            ),
            df AS (
                SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
            )
            SELECT tf.doc_id,
                   ROUND(MAX(tf.tf * ln(n.n_docs / df.df)), 6) AS max_tfidf
            FROM tf JOIN df USING (token), n
            GROUP BY tf.doc_id ORDER BY tf.doc_id
        """,
        "normalize_text_documents": """
            SELECT doc_id,
                   TRIM(regexp_replace(
                       lower(' ' || chr(9) ||
                             replace(upper(text), ' ', '  ') ||
                             chr(9) || ' '),
                       '\\s+', ' ', 'g')) AS norm_text
            FROM documents ORDER BY doc_id
        """,
        "rollup_lang_source_documents": """
            SELECT COALESCE(lang, 'ALL') AS lang,
                   COALESCE(source, 'ALL') AS source,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY ROLLUP (lang, source)
            ORDER BY lang, source
        """,
        "ntile_orders": """
            SELECT bucket, COUNT(*) AS n_orders,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price
            FROM (
                SELECT o_totalprice,
                       CAST(NTILE(10) OVER (
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS BIGINT) AS bucket
                FROM orders
            ) GROUP BY bucket ORDER BY bucket
        """,
        "repetition_documents": """
            WITH tok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token
                FROM documents
            ),
            tc AS (
                SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
            ),
            t1 AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       MAX(c) AS max_tok
                FROM tc GROUP BY doc_id
            ),
            big AS (
                SELECT doc_id, unnest(list_transform(
                           generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1])) AS bg
                FROM (SELECT doc_id, str_split(text, ' ') AS toks
                      FROM documents)
            ),
            bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
            b1 AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                       MAX(c) AS max_bg
                FROM bc GROUP BY doc_id
            )
            SELECT t1.doc_id, t1.n_tokens,
                   ROUND(t1.max_tok / t1.n_tokens + 1e-9, 6)
                       AS top_token_frac,
                   ROUND(COALESCE(b1.max_bg / b1.n_bigrams, 0) + 1e-9, 6)
                       AS top_bigram_frac
            FROM t1 LEFT JOIN b1 USING (doc_id)
            ORDER BY t1.doc_id
        """,
        "lead_value_events": """
            SELECT event_id, user_id,
                   ROUND(LEAD(value) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ), 6) AS led
            FROM events ORDER BY event_id
        """,
        "dense_rank_lineitem": """
            SELECT l_orderkey, l_linenumber,
                   CAST(DENSE_RANK() OVER (
                       PARTITION BY l_orderkey ORDER BY l_quantity
                   ) AS BIGINT) AS drank
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "full_join_orders_customer": """
            SELECT COALESCE(c_mktsegment, 'UNMATCHED') AS segment,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS right_only
            FROM orders FULL JOIN (
                SELECT c_custkey, c_mktsegment FROM customer
                WHERE c_custkey % 3 <> 0
            ) c ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY segment
        """,
        # prep v2 oracle: dedup (min doc per text) -> repetition filter
        # (top-token frac <= 0.15 AND >= 20 tokens) -> df>0.78-of-
        # FILTERED boilerplate strip -> md5 split on ORIGINAL text
        "prep_corpus_v2_documents": """
            WITH kept_ids AS (
                SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            ),
            kd AS (
                SELECT d.doc_id, d.text FROM documents d
                JOIN kept_ids k USING (doc_id)
            ),
            reptok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM kd
            ),
            reptc AS (
                SELECT doc_id, token, COUNT(*) AS c FROM reptok GROUP BY 1, 2
            ),
            rep AS (
                SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       MAX(c) AS max_tok
                FROM reptc GROUP BY doc_id
            ),
            fd AS (
                SELECT kd.doc_id, kd.text FROM kd JOIN rep USING (doc_id)
                WHERE rep.max_tok / rep.n_tokens <= 0.15
                  AND rep.n_tokens >= 20
            ),
            n AS (SELECT COUNT(*) AS n_docs FROM fd),
            df AS (
                SELECT token, COUNT(DISTINCT doc_id) AS df FROM (
                    SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM fd
                ) GROUP BY token
            ),
            hot AS (SELECT token FROM df, n WHERE df > 0.78 * n_docs),
            tok AS (
                SELECT doc_id, unnest(str_split(text, ' ')) AS token,
                       unnest(generate_series(1, len(str_split(text, ' ')))) AS ord
                FROM fd
            ),
            clean AS (
                SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.ord) AS clean_text
                FROM tok t LEFT JOIN hot h ON t.token = h.token
                WHERE h.token IS NULL GROUP BY t.doc_id
            )
            SELECT c.doc_id,
                   CASE WHEN substr(md5(d.text), 1, 4) < 'cccc' THEN 'train'
                        WHEN substr(md5(d.text), 1, 4) < 'e666' THEN 'valid'
                        ELSE 'test' END AS split,
                   c.clean_text
            FROM clean c JOIN documents d USING (doc_id)
            ORDER BY c.doc_id
        """,
        "sample_bottomk_documents": """
            SELECT doc_id FROM (
                SELECT doc_id FROM documents
                ORDER BY md5(text), doc_id LIMIT 100
            ) ORDER BY doc_id
        """,
        # bin arithmetic mirrors the engine exactly:
        # TRUNC(((x - lo) / (hi - lo)) * bins), clipped into [0, bins-1]
        "histogram_price_lineitem": """
            SELECT bin, COUNT(*) AS cnt FROM (
                SELECT CASE
                    WHEN l_extendedprice < 0.0 THEN -1
                    WHEN l_extendedprice >= 100000.0 THEN 20
                    ELSE LEAST(CAST(TRUNC(((l_extendedprice - 0.0)
                                           / 100000.0) * 20.0) AS BIGINT), 19)
                END AS bin
                FROM lineitem
            ) GROUP BY bin ORDER BY bin
        """,
        "percent_rank_orders": """
            SELECT o_orderkey,
                   ROUND(PERCENT_RANK() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ), 6) AS pr
            FROM orders ORDER BY o_orderkey
        """,
        "first_last_value_events": """
            SELECT DISTINCT user_id,
                   FIRST_VALUE(value) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id
                   ) AS first_value,
                   FIRST_VALUE(value) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC
                   ) AS last_value
            FROM events ORDER BY user_id
        """,
        "rank_lineitem": """
            SELECT l_orderkey, l_linenumber,
                   CAST(RANK() OVER (
                       PARTITION BY l_orderkey ORDER BY l_quantity
                   ) AS BIGINT) AS rnk
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "cume_dist_orders": """
            SELECT o_orderkey,
                   ROUND(CUME_DIST() OVER (
                       ORDER BY o_totalprice DESC, o_orderkey
                   ), 6) AS cd
            FROM orders ORDER BY o_orderkey
        """,
        "rolling_minmax_value_events": """
            SELECT event_id, user_id,
                   ROUND(MIN(value) OVER w + 1e-9, 6) AS roll_min,
                   ROUND(MAX(value) OVER w + 1e-9, 6) AS roll_max,
                   ROUND(SUM(value) OVER w + 1e-9, 6) AS roll_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "range_join_events_days": """
            WITH d AS (
                SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
                       epoch_us(ts) AS ts_us, value
                FROM events
            ),
            top5 AS (
                SELECT day_us AS win_start,
                       day_us + 86400000000 AS win_end
                FROM (SELECT day_us, COUNT(*) AS c FROM d GROUP BY 1
                      ORDER BY c DESC, day_us LIMIT 5)
            )
            SELECT t.win_start, COUNT(*) AS n_events,
                   ROUND(SUM(e.value), 4) AS sum_value
            FROM d e JOIN top5 t
              ON e.ts_us >= t.win_start AND e.ts_us < t.win_end
            GROUP BY 1 ORDER BY 1
        """,
        "cube_lang_source_documents": """
            SELECT COALESCE(lang, 'ALL') AS lang,
                   COALESCE(source, 'ALL') AS source,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY CUBE (lang, source)
            ORDER BY lang, source
        """,
        "mode_event_type_by_user": """
            SELECT user_id, mode_val, n FROM (
                SELECT user_id, event_type AS mode_val, COUNT(*) AS n,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY COUNT(*) DESC, event_type
                       ) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1 ORDER BY user_id
        """,
        "entropy_event_type_by_user": """
            WITH c AS (
                SELECT user_id, event_type, COUNT(*) AS c
                FROM events GROUP BY 1, 2
            ),
            t AS (
                SELECT user_id, CAST(SUM(c) AS DOUBLE) AS n
                FROM c GROUP BY 1
            )
            SELECT c.user_id,
                   ROUND(SUM(-(c.c / t.n) * ln(c.c / t.n)), 6) AS entropy
            FROM c JOIN t USING (user_id)
            GROUP BY c.user_id ORDER BY user_id
        """,
        "corr_qty_price_lineitem": """
            SELECT l_returnflag,
                   ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
                   CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                       AS n_pairs
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "stringagg_docs_by_lang_source": """
            SELECT lang, source,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS doc_ids
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "argmax_chars_documents": """
            SELECT lang, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn = 1 ORDER BY lang
        """,
        "events_dow_hour": """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # messy derivation mirrors the engine's gate exactly; counting
        # order is part of the contract (emails first, then phones on
        # the email-redacted text); both engines are RE2
        "redact_pii_documents": """
            WITH m AS (
                SELECT doc_id,
                       text || ' contact-' || CAST(doc_id AS VARCHAR)
                            || '@example.com call +1-555-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           AS mt
                FROM documents
            ),
            s1 AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(mt,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                           AS BIGINT) AS n_emails,
                       regexp_replace(mt,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS t1
                FROM m
            )
            SELECT doc_id, n_emails,
                   CAST(len(regexp_extract_all(t1, '\\+1-555-[0-9]{4}'))
                        AS BIGINT) AS n_phones,
                   regexp_replace(t1, '\\+1-555-[0-9]{4}', '[PHONE]', 'g')
                       AS red_text
            FROM s1 ORDER BY doc_id
        """,
        "chunk_tokens_documents": """
            WITH t AS (
                SELECT doc_id, str_split(text, ' ') AS toks FROM documents
            ),
            c AS (
                SELECT doc_id, toks,
                       unnest(generate_series(
                           0, CAST((len(toks) - 1) // 32 AS BIGINT)
                       )) AS chunk_id
                FROM t
            )
            SELECT doc_id, chunk_id,
                   CAST(len(list_slice(toks, chunk_id * 32 + 1,
                                       chunk_id * 32 + 32)) AS BIGINT)
                       AS n_tokens,
                   array_to_string(list_slice(toks, chunk_id * 32 + 1,
                                              chunk_id * 32 + 32), ' ')
                       AS chunk_text
            FROM c ORDER BY doc_id, chunk_id
        """,
        "quantile_disc_price_lineitem": """
            SELECT q, value FROM (
                SELECT 0.25 AS q,
                       quantile_disc(l_extendedprice, 0.25) AS value
                FROM lineitem
                UNION ALL
                SELECT 0.5, quantile_disc(l_extendedprice, 0.5) FROM lineitem
                UNION ALL
                SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem
            ) ORDER BY q
        """,
        "distinct_users_by_type": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "normalize_value_events": """
            SELECT event_id, user_id,
                   ROUND((value - MIN(value) OVER w)
                         / NULLIF(MAX(value) OVER w - MIN(value) OVER w, 0),
                         6) AS norm_value
            FROM events
            WINDOW w AS (PARTITION BY user_id)
            ORDER BY event_id
        """,
        "densify_hourly_events": """
            WITH b AS (
                SELECT (MIN(epoch_us(ts)) // 3600000000) * 3600000000 AS lo,
                       (MAX(epoch_us(ts)) // 3600000000) * 3600000000 AS hi
                FROM events
            ),
            g AS (
                SELECT unnest(generate_series(lo, hi, 3600000000))
                    AS window_start
                FROM b
            )
            SELECT g.window_start, CAST(COUNT(e.ts) AS BIGINT) AS cnt
            FROM g LEFT JOIN events e
              ON (epoch_us(e.ts) // 3600000000) * 3600000000 = g.window_start
            GROUP BY 1 ORDER BY 1
        """,
        "embedding_norms_by_label": """
            SELECT CAST(label AS BIGINT) AS label,
                   COUNT(*) AS n_vecs,
                   ROUND(AVG(sqrt(list_sum(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> x * x)))), 6)
                       AS avg_norm
            FROM embeddings GROUP BY 1 ORDER BY 1
        """,
        "funnel_click_purchase_events": """
            WITH c AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
                WHERE event_type = 'click'
            ),
            p AS (
                SELECT user_id, epoch_us(ts) AS ts FROM events
                WHERE event_type = 'purchase'
            ),
            conv AS (
                SELECT c.event_id, c.user_id,
                       MAX(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END)
                           AS converted
                FROM c LEFT JOIN p
                  ON p.user_id = c.user_id
                 AND p.ts >= c.ts AND p.ts <= c.ts + 3600000000
                GROUP BY c.event_id, c.user_id
            )
            SELECT user_id, COUNT(*) AS n_clicks,
                   CAST(SUM(converted) AS BIGINT) AS n_conversions
            FROM conv GROUP BY user_id ORDER BY user_id
        """,
        "top_tokens_by_lang": """
            SELECT lang, token, cnt, CAST(rn AS BIGINT) AS rn FROM (
                SELECT lang, token, cnt,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang ORDER BY cnt DESC, token
                       ) AS rn
                FROM (
                    SELECT lang, token, COUNT(*) AS cnt FROM (
                        SELECT lang, unnest(str_split(text, ' ')) AS token
                        FROM documents
                    ) GROUP BY lang, token
                )
            ) WHERE rn <= 3 ORDER BY lang, rn
        """,
        "weighted_avg_price_lineitem": """
            SELECT l_returnflag,
                   ROUND(SUM(l_extendedprice * l_quantity)
                         / SUM(CASE WHEN l_extendedprice IS NOT NULL
                               THEN l_quantity END), 6) AS wavg_price
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "share_by_priority_orders": """
            SELECT o_orderpriority, COUNT(*) AS n_orders,
                   ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS share
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "equidepth_buckets_price_lineitem": """
            WITH q AS (
                SELECT quantile_disc(l_extendedprice, 0.25) AS q1,
                       quantile_disc(l_extendedprice, 0.5) AS q2,
                       quantile_disc(l_extendedprice, 0.75) AS q3
                FROM lineitem
            )
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                SELECT CASE WHEN l_extendedprice <= q1 THEN 0
                            WHEN l_extendedprice <= q2 THEN 1
                            WHEN l_extendedprice <= q3 THEN 2
                            ELSE 3 END AS bucket
                FROM lineitem, q WHERE l_extendedprice IS NOT NULL
            ) GROUP BY bucket ORDER BY bucket
        """,
        "skew_kurtosis_price_lineitem": """
            SELECT l_returnflag,
                   ROUND(skewness(l_extendedprice), 6) AS skew,
                   ROUND(kurtosis(l_extendedprice), 6) AS kurt
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "zscore_outliers_price_lineitem": """
            WITH s AS (
                SELECT l_returnflag, AVG(l_extendedprice) AS m,
                       STDDEV_SAMP(l_extendedprice) AS sd
                FROM lineitem GROUP BY 1
            )
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN ABS(l.l_extendedprice - s.m) / s.sd > 2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   CAST(SUM(CASE WHEN l.l_extendedprice IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_rows
            FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
            GROUP BY 1 ORDER BY 1
        """,
        "quantile_cont_price_lineitem": """
            SELECT q, ROUND(value, 6) AS value FROM (
                SELECT 0.1 AS q,
                       quantile_cont(l_extendedprice, 0.1) AS value
                FROM lineitem
                UNION ALL SELECT 0.25,
                       quantile_cont(l_extendedprice, 0.25) FROM lineitem
                UNION ALL SELECT 0.5,
                       quantile_cont(l_extendedprice, 0.5) FROM lineitem
                UNION ALL SELECT 0.75,
                       quantile_cont(l_extendedprice, 0.75) FROM lineitem
                UNION ALL SELECT 0.9,
                       quantile_cont(l_extendedprice, 0.9) FROM lineitem
            ) ORDER BY q
        """,
        "dedup_keep_best_documents": """
            SELECT text_md5, doc_id, n_chars, cnt FROM (
                SELECT md5(text) AS text_md5, doc_id, n_chars,
                       COUNT(*) OVER (PARTITION BY md5(text)) AS cnt,
                       ROW_NUMBER() OVER (
                           PARTITION BY md5(text)
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn = 1 ORDER BY text_md5
        """,
        "cap_per_lang_documents": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang ORDER BY md5(text), doc_id
                       ) AS rn
                FROM documents
            ) WHERE rn <= 40 ORDER BY lang, doc_id
        """,
        "anti_join_customers_no_orders": """
            SELECT c_mktsegment, COUNT(*) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
            )
            GROUP BY 1 ORDER BY 1
        """,
        "fill_forward_value_events": """
            WITH m AS (
                SELECT event_id, user_id,
                       CASE WHEN event_id % 7 < 3 THEN NULL
                            ELSE value END AS value
                FROM events
            )
            SELECT event_id, user_id,
                   last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS filled
            FROM m ORDER BY event_id
        """,
        "impute_group_mean_events": """
            WITH m AS (
                SELECT event_id, user_id,
                       CASE WHEN event_id % 7 < 3 THEN NULL
                            ELSE value END AS value
                FROM events
            )
            SELECT event_id, user_id,
                   ROUND(COALESCE(value,
                         AVG(value) OVER (PARTITION BY user_id))
                         + 0.000000001, 6) AS filled
            FROM m ORDER BY event_id
        """,
        "geomean_chars_by_lang": """
            SELECT lang, ROUND(EXP(AVG(LN(n_chars))), 6) AS geomean
            FROM documents WHERE n_chars > 0
            GROUP BY 1 ORDER BY 1
        """,
        "extract_first_number_documents": """
            SELECT doc_id,
                   NULLIF(regexp_extract(text, '[0-9]+'), '') AS first_num
            FROM documents ORDER BY doc_id
        """,
        "median_mad_price_lineitem": """
            SELECT l_returnflag,
                   ROUND(median(l_extendedprice), 6) AS median,
                   ROUND(mad(l_extendedprice), 6) AS mad
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "edit_distance_adjacent_documents": """
            WITH w AS (
                SELECT lang, doc_id,
                       LEAD(doc_id) OVER (
                           PARTITION BY lang ORDER BY doc_id) AS next_id,
                       substr(text, 1, 120) AS t,
                       LEAD(substr(text, 1, 120)) OVER (
                           PARTITION BY lang ORDER BY doc_id) AS nt
                FROM documents
            )
            SELECT lang, doc_id, next_id, levenshtein(t, nt) AS dist
            FROM w WHERE next_id IS NOT NULL ORDER BY lang, doc_id
        """,
        "rate_value_events": """
            WITH w AS (
                SELECT event_id, user_id, value,
                       epoch_us(ts) AS ts_us,
                       LAG(value) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS pv,
                       LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS pt
                FROM events
            )
            SELECT event_id, user_id,
                   (value - pv) / NULLIF(ts_us - pt, 0) AS rate
            FROM w ORDER BY event_id
        """,
        "sliding_3h_distinct_users_events": """
            WITH e AS (
                SELECT epoch_us(ts) // 3600000000 AS hb, user_id FROM events
            ),
            hours AS (SELECT DISTINCT hb FROM e)
            SELECT h.hb * 3600000000 AS window_end,
                   COUNT(DISTINCT e.user_id) AS n_users
            FROM hours h JOIN e ON e.hb BETWEEN h.hb - 2 AND h.hb
            GROUP BY 1 ORDER BY 1
        """,
        "dedup_paragraphs_documents": """
            WITH t AS (
                SELECT doc_id, str_split(text, ' ') AS toks FROM documents
                WHERE text IS NOT NULL
            ),
            c AS (
                SELECT doc_id, toks,
                       unnest(generate_series(
                           0, CAST((len(toks) - 1) // 16 AS BIGINT)
                       )) AS chunk_id
                FROM t
            ),
            chunks AS (
                SELECT doc_id, chunk_id,
                       array_to_string(list_slice(toks, chunk_id * 16 + 1,
                                                  chunk_id * 16 + 16), ' ')
                           AS chunk_text
                FROM c
            ),
            ranked AS (
                SELECT doc_id, chunk_id, chunk_text,
                       ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                                          ORDER BY doc_id, chunk_id) AS rn
                FROM chunks
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text_dedup
            FROM ranked WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id
        """,
        "streaks_events_users": """
            WITH e AS (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn,
                       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS rnt
                FROM events
            ),
            isl AS (
                SELECT user_id, COUNT(*) AS len
                FROM e GROUP BY user_id, event_type, rn - rnt
            )
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
                   CAST(COUNT(*) AS BIGINT) AS n_runs
            FROM isl GROUP BY user_id ORDER BY user_id
        """,
        "winsorized_mean_price_lineitem": """
            WITH f AS (
                SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
                       quantile_cont(l_extendedprice, 0.95) AS hi
                FROM lineitem
            )
            SELECT l_returnflag,
                   ROUND(AVG(LEAST(GREATEST(l_extendedprice, f.lo), f.hi))
                         + 1e-9, 6) AS wmean,
                   COUNT(l_extendedprice) AS n
            FROM lineitem, f
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "trend_value_by_type_events": """
            WITH e AS (
                SELECT event_type, value,
                       (epoch_us(ts) - 1704067200000000) // 3600000000 AS xh
                FROM events
            ),
            s AS (
                SELECT event_type,
                       CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(SUM(xh) AS DOUBLE) AS sx,
                       SUM(value) AS sy,
                       SUM(xh * value) AS sxy,
                       CAST(SUM(xh * xh) AS DOUBLE) AS sxx
                FROM e GROUP BY event_type
            )
            SELECT event_type,
                   ROUND((n * sxy - sx * sy)
                         / NULLIF(n * sxx - sx * sx, 0) + 1e-9, 6) AS slope,
                   ROUND((sy - (n * sxy - sx * sy)
                               / NULLIF(n * sxx - sx * sx, 0) * sx) / n
                         + 1e-9, 6) AS icept,
                   CAST(n AS BIGINT) AS n
            FROM s ORDER BY event_type
        """,
        "rolling_1h_sum_value_events": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                       + 1e-9, 6) AS range_sum
            FROM events ORDER BY event_id
        """,
        "retention_cohorts_events": """
            WITH d AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events
            ),
            f AS (
                SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
            )
            SELECT f.cohort_day,
                   d.day - f.cohort_day AS day_offset,
                   COUNT(DISTINCT d.user_id) AS n_users
            FROM d JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "psi_lang_by_source_documents": """
            WITH c AS (
                SELECT source, lang, COUNT(*) AS cnt
                FROM documents GROUP BY source, lang
            ),
            grid AS (
                SELECT s.source, l.lang
                FROM (SELECT DISTINCT source FROM documents) s
                CROSS JOIN (SELECT DISTINCT lang FROM documents) l
            ),
            f AS (
                SELECT g.source, g.lang, COALESCE(c.cnt, 0) AS a
                FROM grid g LEFT JOIN c USING (source, lang)
            ),
            tot AS (SELECT lang, SUM(a) AS t FROM f GROUP BY lang),
            x AS (
                SELECT f.source, f.lang, CAST(f.a AS DOUBLE) AS a,
                       CAST(tot.t - f.a AS DOUBLE) AS r
                FROM f JOIN tot USING (lang)
            ),
            s AS (
                SELECT source, SUM(a) AS sa, SUM(r) AS sr, COUNT(*) AS k
                FROM x GROUP BY source
            )
            SELECT x.source,
                   ROUND(SUM(((a + 0.5) / (sa + 0.5 * k)
                              - (r + 0.5) / (sr + 0.5 * k))
                             * LN(((a + 0.5) / (sa + 0.5 * k))
                                  / ((r + 0.5) / (sr + 0.5 * k))))
                         + 1e-9, 6) AS psi
            FROM x JOIN s USING (source)
            GROUP BY x.source ORDER BY x.source
        """,
        "coverage_15min_events_users": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + 900000000 AS e
                FROM events
            ),
            m AS (
                SELECT user_id, s, e,
                       MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pmax
                FROM iv
            ),
            g AS (
                SELECT user_id, s, e,
                       SUM(CASE WHEN pmax IS NULL OR s > pmax
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY s, e) AS grp
                FROM m
            ),
            isl AS (
                SELECT user_id, grp, MIN(s) AS s0, MAX(e) AS e1
                FROM g GROUP BY user_id, grp
            )
            SELECT user_id, CAST(SUM(e1 - s0) AS BIGINT) AS covered_us,
                   CAST(COUNT(*) AS BIGINT) AS n_intervals
            FROM isl GROUP BY user_id ORDER BY user_id
        """,
        "benford_price_lineitem": """
            WITH d AS (
                SELECT CAST(LEFT(CAST(CAST(ROUND(l_extendedprice * 100)
                                           AS BIGINT) AS VARCHAR), 1)
                            AS BIGINT) AS digit
                FROM lineitem
                WHERE l_extendedprice IS NOT NULL
                  AND ROUND(l_extendedprice * 100) > 0
            ),
            c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
            t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c)
            SELECT digit, n,
                   ROUND(n / t.total + 1e-9, 6) AS frac,
                   ROUND(LOG10(1.0 + 1.0 / digit) + 1e-9, 6) AS expected
            FROM c, t ORDER BY digit
        """,
        "ewma_value_events": """
            WITH e AS (
                SELECT user_id, event_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events WHERE value IS NOT NULL
            )
            SELECT a.event_id, a.user_id,
                   ROUND(SUM(CASE WHEN b.rn = 1
                                  THEN POWER(0.75, a.rn - 1) * b.value
                                  ELSE 0.25 * POWER(0.75, a.rn - b.rn)
                                       * b.value END)
                         + 1e-9, 6) AS ewma
            FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
            GROUP BY a.event_id, a.user_id ORDER BY a.event_id
        """,
        "weighted_sample_documents": """
            WITH c AS (
                SELECT doc_id, n_chars,
                       COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cb
                FROM documents
            )
            SELECT doc_id, n_chars FROM c
            WHERE cb // 5000 < (cb + n_chars) // 5000
            ORDER BY doc_id
        """,
        "new_users_daily_events": """
            WITH f AS (
                SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day
                FROM events GROUP BY user_id
            )
            SELECT day, COUNT(*) AS n_new,
                   CAST(SUM(COUNT(*)) OVER (ORDER BY day) AS BIGINT) AS n_cum
            FROM f GROUP BY day ORDER BY day
        """,
        "chi2_lang_source_documents": """
            WITH c AS (
                SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS cnt
                FROM documents GROUP BY lang, source
            ),
            grid AS (
                SELECT l.lang, s.source
                FROM (SELECT DISTINCT lang FROM documents) l
                CROSS JOIN (SELECT DISTINCT source FROM documents) s
            ),
            f AS (
                SELECT g.lang, g.source, COALESCE(c.cnt, 0) AS obs
                FROM grid g LEFT JOIN c USING (lang, source)
            ),
            rt AS (SELECT lang, SUM(obs) AS r FROM f GROUP BY lang),
            ct AS (SELECT source, SUM(obs) AS c2 FROM f GROUP BY source),
            nn AS (SELECT SUM(obs) AS n FROM f),
            dims AS (SELECT (SELECT COUNT(*) FROM rt) AS R,
                            (SELECT COUNT(*) FROM ct) AS C),
            stat AS (
                SELECT SUM(CASE WHEN rt.r * ct.c2 > 0
                                THEN POWER(f.obs - rt.r * ct.c2 / nn.n, 2)
                                     / (rt.r * ct.c2 / nn.n)
                                ELSE 0 END) AS chi2
                FROM f JOIN rt USING (lang) JOIN ct USING (source), nn
            )
            SELECT ROUND(stat.chi2 + 1e-9, 6) AS chi2,
                   CAST((dims.R - 1) * (dims.C - 1) AS BIGINT) AS dof,
                   ROUND(SQRT(stat.chi2
                              / (nn.n * LEAST(dims.R - 1, dims.C - 1)))
                         + 1e-9, 6) AS cramers_v
            FROM stat, dims, nn
        """,
        "hmean_chars_by_lang": """
            SELECT lang,
                   ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(1.0 / n_chars)
                         + 1e-9, 6) AS hmean
            FROM documents WHERE n_chars > 0
            GROUP BY lang ORDER BY lang
        """,
        "snapshot_diff_documents": """
            WITH newt AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 101 = 0 THEN text || ' EDITED'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 97 <> 0
                UNION ALL
                SELECT (SELECT MAX(doc_id) FROM documents) + gs, 'new doc'
                FROM unnest(generate_series(1, 3)) AS t(gs)
            ),
            o AS (SELECT doc_id, text FROM documents),
            j AS (
                SELECT COALESCE(o.doc_id, n.doc_id) AS key,
                       CASE WHEN n.doc_id IS NULL THEN 'removed'
                            WHEN o.doc_id IS NULL THEN 'added'
                            WHEN o.text IS DISTINCT FROM n.text
                                THEN 'changed'
                            ELSE '' END AS status
                FROM o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
            )
            SELECT key, status FROM j WHERE status <> '' ORDER BY key
        """,
        "ranksum_error_value_events": """
            WITH c AS (
                SELECT value,
                       COUNT(*) FILTER (WHERE event_type = 'error') AS n1v,
                       COUNT(*) AS tv
                FROM events WHERE value IS NOT NULL GROUP BY value
            ),
            r AS (
                SELECT value, n1v, tv,
                       COALESCE(SUM(tv) OVER (ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) + (tv + 1) / 2.0 AS avgrank
                FROM c
            ),
            s AS (
                SELECT SUM(n1v * avgrank) AS r1,
                       CAST(SUM(n1v) AS DOUBLE) AS n1,
                       CAST(SUM(tv) AS DOUBLE) AS n,
                       SUM(CAST(tv AS DOUBLE) * tv * tv - tv) AS tie
                FROM r
            )
            SELECT ROUND(r1 - n1 * (n1 + 1) / 2.0 + 1e-9, 6) AS u1,
                   CAST(n1 AS BIGINT) AS n1,
                   CAST(n - n1 AS BIGINT) AS n2,
                   ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * (n - n1) / 2.0)
                         / SQRT(n1 * (n - n1) / 12.0
                                * ((n + 1) - tie / (n * (n - 1.0))))
                         + 1e-9, 6) AS z
            FROM s
        """,
        "mutual_info_lang_source_documents": """
            WITH c AS (
                SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS cnt
                FROM documents GROUP BY lang, source
            ),
            nn AS (SELECT SUM(cnt) AS n FROM c),
            pa AS (SELECT lang, SUM(cnt) AS ca FROM c GROUP BY lang),
            pb AS (SELECT source, SUM(cnt) AS cb FROM c GROUP BY source),
            mi AS (
                SELECT SUM((c.cnt / nn.n)
                           * LN((c.cnt / nn.n)
                                / ((pa.ca / nn.n) * (pb.cb / nn.n)))) AS mi
                FROM c JOIN pa USING (lang) JOIN pb USING (source), nn
            ),
            ha AS (SELECT -SUM((ca / nn.n) * LN(ca / nn.n)) AS h FROM pa, nn),
            hb AS (SELECT -SUM((cb / nn.n) * LN(cb / nn.n)) AS h FROM pb, nn)
            SELECT ROUND(mi.mi + 1e-9, 6) AS mi,
                   ROUND(mi.mi / SQRT(ha.h * hb.h) + 1e-9, 6) AS nmi
            FROM mi, ha, hb
        """,
        "storage_join_orders_customer": """
            SELECT c.c_mktsegment,
                   COUNT(o.o_totalprice) AS n_orders,
                   ROUND(SUM(o.o_totalprice) + 1e-9, 2) AS sum_total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1 ORDER BY 1
        """,
        "expectations_lineitem": """
            WITH rows_ AS (
                SELECT 'null_frac_le' AS expectation,
                       'l_discount' AS "column",
                       ROUND(CAST(COUNT(*) - COUNT(l_discount) AS DOUBLE)
                             / COUNT(*) + 1e-9, 6) AS metric,
                       0.5 AS threshold,
                       (CAST(COUNT(*) - COUNT(l_discount) AS DOUBLE)
                        / COUNT(*)) <= 0.5 AS pass
                FROM lineitem
                UNION ALL
                SELECT 'min_ge', 'l_extendedprice',
                       ROUND(MIN(l_extendedprice) + 1e-9, 6), 0.0,
                       MIN(l_extendedprice) >= 0.0
                FROM lineitem
                UNION ALL
                SELECT 'max_le', 'l_quantity',
                       ROUND(MAX(l_quantity) + 1e-9, 6), 100.0,
                       MAX(l_quantity) <= 100.0
                FROM lineitem
                UNION ALL
                SELECT 'mean_between', 'l_extendedprice',
                       ROUND(AVG(l_extendedprice) + 1e-9, 6), 1e6,
                       AVG(l_extendedprice) BETWEEN 1.0 AND 1e6
                FROM lineitem
                UNION ALL
                SELECT 'in_set', 'l_returnflag',
                       ROUND(SUM(CASE WHEN l_returnflag IS NOT NULL
                                       AND l_returnflag NOT IN ('A','N','R')
                                      THEN 1 ELSE 0 END) + 1e-9, 6), 0.0,
                       SUM(CASE WHEN l_returnflag IS NOT NULL
                                 AND l_returnflag NOT IN ('A','N','R')
                                THEN 1 ELSE 0 END) = 0
                FROM lineitem
                UNION ALL
                SELECT 'match_frac_ge', 'l_returnflag',
                       ROUND(CAST(SUM(CASE WHEN regexp_matches(
                                       l_returnflag, '^[ANR]$')
                                      THEN 1 ELSE 0 END) AS DOUBLE)
                             / COUNT(l_returnflag) + 1e-9, 6), 0.99,
                       CAST(SUM(CASE WHEN regexp_matches(
                                    l_returnflag, '^[ANR]$')
                                THEN 1 ELSE 0 END) AS DOUBLE)
                       / COUNT(l_returnflag) >= 0.99
                FROM lineitem
            )
            SELECT * FROM rows_ ORDER BY expectation, "column"
        """,
        "anomalous_hours_events": """
            WITH h AS (
                SELECT epoch_us(ts) // 3600000000 AS hb, COUNT(*) AS c
                FROM events GROUP BY hb
            ),
            grid AS (
                SELECT unnest(generate_series((SELECT MIN(hb) FROM h),
                                              (SELECT MAX(hb) FROM h))) AS hb
            ),
            f AS (
                SELECT g.hb, COALESCE(h.c, 0) AS cnt
                FROM grid g LEFT JOIN h USING (hb)
            ),
            w AS (
                SELECT hb, cnt,
                       AVG(cnt) OVER (ORDER BY hb
                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS m,
                       STDDEV_SAMP(cnt) OVER (ORDER BY hb
                           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s
                FROM f
            )
            SELECT hb * 3600000000 AS window_start, cnt,
                   ROUND((cnt - m) / NULLIF(s, 0) + 1e-9, 6) AS zscore,
                   COALESCE(ABS((cnt - m) / NULLIF(s, 0)) > 3, FALSE)
                       AS is_anomaly
            FROM w ORDER BY window_start
        """,
        "schema_evolution_documents": """
            SELECT CASE WHEN doc_id % 2 = 1 THEN '__none__'
                        ELSE source END AS source,
                   COUNT(*) AS n
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "sink_roundtrip_events": """
            SELECT fmt, event_type, COUNT(*) AS n
            FROM events, (SELECT unnest(['csv', 'jsonl']) AS fmt)
            GROUP BY fmt, event_type ORDER BY fmt, event_type
        """,
        "lm_scores_documents": """
            WITH toks AS (
                SELECT doc_id, str_split(text, ' ') AS w FROM documents
            ),
            uni AS (
                SELECT t, COUNT(*) AS cu
                FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t
            ),
            vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
            big AS (
                SELECT doc_id, w[gs] AS w1, w[gs] || ' ' || w[gs + 1] AS bg
                FROM toks,
                     unnest(generate_series(1, len(w) - 1)) AS s(gs)
            ),
            bigc AS (SELECT bg, COUNT(*) AS cb FROM big GROUP BY bg)
            SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   ROUND(AVG(LN((bigc.cb + 1.0) / (uni.cu + vv.v)))
                         + 1e-9, 6) AS avg_logp
            FROM big b JOIN bigc USING (bg) JOIN uni ON uni.t = b.w1, vv
            GROUP BY b.doc_id ORDER BY b.doc_id
        """,
        "distinct_hll_checked_documents": """
            SELECT col AS column, dce AS distinct_exact, TRUE AS hll_in_bound
            FROM (
                SELECT 'lang' AS col, COUNT(DISTINCT lang) AS dce, 1 AS o
                FROM documents
                UNION ALL SELECT 'source', COUNT(DISTINCT source), 2
                FROM documents
                UNION ALL SELECT 'text', COUNT(DISTINCT text), 3
                FROM documents
            ) ORDER BY o
        """,
        "grouped_distinct_hll_checked_events": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS distinct_exact,
                   TRUE AS hll_in_bound
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "quantiles_tdigest_checked_lineitem": """
            SELECT q, ROUND(value, 6) AS value, TRUE AS rank_err_ok FROM (
                SELECT 0.01 AS q,
                       quantile_cont(l_extendedprice, 0.01) AS value
                FROM lineitem
                UNION ALL SELECT 0.25,
                       quantile_cont(l_extendedprice, 0.25) FROM lineitem
                UNION ALL SELECT 0.5,
                       quantile_cont(l_extendedprice, 0.5) FROM lineitem
                UNION ALL SELECT 0.75,
                       quantile_cont(l_extendedprice, 0.75) FROM lineitem
                UNION ALL SELECT 0.99,
                       quantile_cont(l_extendedprice, 0.99) FROM lineitem
            ) ORDER BY q
        """,
        "overlap_users_checked_events": """
            SELECT
                (SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE event_type = 'click') AS n_click,
                (SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE event_type = 'purchase') AS n_purchase,
                (SELECT COUNT(*) FROM (
                    SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'click'
                    INTERSECT
                    SELECT DISTINCT user_id FROM events
                    WHERE event_type = 'purchase')) AS n_overlap,
                TRUE AS hll_in_bound
        """,
        "kmeans_checked_embeddings": """
            SELECT COUNT(*) AS n_points, 8 AS k_nonempty,
                   TRUE AS inertia_monotone
            FROM embeddings
        """,
        "logreg_separable_events": """
            SELECT COUNT(*) AS n_points, 0 AS n_errors
            FROM events WHERE value IS NOT NULL AND ABS(value - 35) >= 15
        """,
        "jaccard_pairs_exact_documents": """
            WITH d AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id < 400 AND text IS NOT NULL AND length(text) >= 5
            ), pos AS (
                SELECT doc_id, text,
                       unnest(range(1, length(text) - 3)) AS i
                FROM d
            ), g AS (
                SELECT DISTINCT doc_id,
                       substring(text, CAST(i AS INT), 5) AS gram
                FROM pos
            ), sz AS (
                SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
                FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY da, db
            )
            SELECT da AS doc_a, db AS doc_b,
                   ROUND(c / (sa.n + sb.n - c) + 1e-9, 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = da
            JOIN sz sb ON sb.doc_id = db
            WHERE c / (sa.n + sb.n - c) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "webpages_verdicts_sql_subset": f"""
            WITH w AS (
                SELECT *, CAST(row_index // 800 AS BIGINT) AS pid
                FROM read_parquet('{fixture_base}/webpages/*.parquet')
            ), refs AS (
                SELECT lang FROM read_parquet('{fixture_base}/ref_langs.parquet')
            ), dup_urls AS (
                SELECT url FROM w GROUP BY url HAVING COUNT(*) > 1
            ), nf AS (
                SELECT pid AS partition_id, 'null_frac' AS "check",
                       'html' AS "column",
                       (COUNT(*) FILTER (html IS NULL))
                           / CAST(COUNT(*) AS DOUBLE) <= 0.05 AS pass,
                       (COUNT(*) FILTER (html IS NULL))
                           / CAST(COUNT(*) AS DOUBLE) AS metric,
                       'limit=0.05' AS detail
                FROM w GROUP BY pid
                UNION ALL
                SELECT pid, 'null_frac', 'text',
                       (COUNT(*) FILTER (text IS NULL))
                           / CAST(COUNT(*) AS DOUBLE) <= 0.06,
                       (COUNT(*) FILTER (text IS NULL))
                           / CAST(COUNT(*) AS DOUBLE),
                       'limit=0.06'
                FROM w GROUP BY pid
            ), tr AS (
                SELECT pid, 'ts_range', 'warc_ts',
                       MIN(epoch_us(warc_ts)) >= 1704067200000000
                           AND MAX(epoch_us(warc_ts)) < 1706659200000000,
                       CAST(MIN(epoch_us(warc_ts)) AS DOUBLE),
                       'window=[1704067200000000,1706659200000000)'
                FROM w GROUP BY pid
            ), rl AS (
                SELECT pid, 'referential_lang', 'lang',
                       COUNT(*) FILTER (lang IS NULL
                           OR lang NOT IN (SELECT lang FROM refs)) = 0,
                       CAST(COUNT(*) FILTER (lang IS NULL
                           OR lang NOT IN (SELECT lang FROM refs)) AS DOUBLE),
                       'orphan keys'
                FROM w GROUP BY pid
            ), uq AS (
                SELECT pid, 'uniqueness', 'url',
                       COUNT(*) FILTER (url IN (SELECT url FROM dup_urls)) = 0,
                       CAST(COUNT(*) FILTER (
                           url IN (SELECT url FROM dup_urls)) AS DOUBLE),
                       'dup rows in partition'
                FROM w GROUP BY pid
            )
            SELECT * FROM (
                SELECT * FROM nf UNION ALL SELECT * FROM tr
                UNION ALL SELECT * FROM rl UNION ALL SELECT * FROM uq
            ) ORDER BY "check", "column", partition_id
        """,
        "decode_png_documents": """
            WITH d AS (
                SELECT doc_id AS d, 16 + doc_id % 13 AS w,
                       16 + (doc_id // 13) % 11 AS h
                FROM documents WHERE doc_id < 200
            ), px AS (
                SELECT d, w, h, unnest(range(0, w * h)) AS i FROM d
            ), v AS (
                SELECT d, w, h, ((i % w) + 2 * (i // w) + d) % 256 AS val
                FROM px
            )
            SELECT d AS doc_id, MIN(w) AS width, MIN(h) AS height,
                   ROUND(SUM(val) / CAST(MIN(w) * MIN(h) AS DOUBLE) / 255.0
                         + 1e-9, 6) AS mean_q6
            FROM v GROUP BY d ORDER BY doc_id
        """,
        "decode_gif_documents": """
            WITH d AS (
                SELECT doc_id AS d, 16 + doc_id % 13 AS w,
                       16 + (doc_id // 13) % 11 AS h
                FROM documents WHERE doc_id < 200
            ), px AS (
                SELECT d, w, h, unnest(range(0, w * h)) AS i FROM d
            ), v AS (
                SELECT d, w, h, ((i % w) + 2 * (i // w) + d) % 256 AS val
                FROM px
            )
            SELECT d AS doc_id, MIN(w) AS width, MIN(h) AS height,
                   ROUND(SUM(val) / CAST(MIN(w) * MIN(h) AS DOUBLE) / 255.0
                         + 1e-9, 6) AS mean_q6
            FROM v GROUP BY d ORDER BY doc_id
        """,
        "decode_jpeg_documents": """
            SELECT doc_id, CAST(16 + doc_id % 13 AS INT) AS width,
                   CAST(16 + (doc_id // 13) % 11 AS INT) AS height,
                   TRUE AS mean_in_bound
            FROM documents WHERE doc_id < 200 ORDER BY doc_id
        """,
        "bpe_tokens_documents": """
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN 0
                        ELSE length(list_filter(str_split(text, ' '),
                                                x -> x <> '')) END
                       AS n_words,
                   TRUE AS bounds_ok
            FROM documents ORDER BY doc_id
        """,
        "resize_images_documents": """
            WITH d AS (
                SELECT doc_id AS d, 16 + doc_id % 13 AS w,
                       16 + (doc_id // 13) % 11 AS h
                FROM documents WHERE doc_id < 200
            ), px AS (
                SELECT d, w, h, unnest(range(0, 24 * 24)) AS i FROM d
            ), v AS (
                -- nearest: src = floor((dst + 0.5) * in / out), clamped
                SELECT d,
                       ((LEAST(CAST(floor(((i % 24) + 0.5) * w / 24)
                                    AS BIGINT), w - 1))
                        + 2 * (LEAST(CAST(floor(((i // 24) + 0.5) * h / 24)
                                          AS BIGINT), h - 1))
                        + d) % 256 AS val
                FROM px
            )
            SELECT d AS doc_id, 24 AS width, 24 AS height,
                   ROUND(SUM(val) / 576.0 / 255.0 + 1e-9, 6) AS mean_q6
            FROM v GROUP BY d ORDER BY doc_id
        """,
        "similarity_ivf_checked_embeddings": """
            SELECT vec_id AS query_id, 10 AS n_results, TRUE AS recall_ok
            FROM embeddings ORDER BY vec_id LIMIT 5
        """,
        "audio_checked_documents": """
            SELECT doc_id, 8000 AS sample_rate, 1 AS n_channels,
                   0.25 AS duration_sec, TRUE AS rms_ok, TRUE AS zcr_ok
            FROM documents ORDER BY doc_id
        """,
        "dup_ngram_documents": """
            WITH tri AS (
                SELECT doc_id, unnest(list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i + 1] || ' '
                                || toks[i + 2])) AS tg
                FROM (SELECT doc_id, str_split(text, ' ') AS toks
                      FROM documents)
            ),
            tc AS (SELECT doc_id, tg, COUNT(*) AS c FROM tri GROUP BY 1, 2)
            SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ngrams,
                   ROUND(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END)
                         / SUM(c) + 1e-9, 6) AS dup_ngram_frac
            FROM tc GROUP BY doc_id ORDER BY doc_id
        """,
    }
