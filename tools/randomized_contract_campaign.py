"""Randomized-corpus campaign for the certificate contracts.

The fixed sf0.001/0.01/0.1 parity sweeps verify the four certified
contracts (l15 packing, l35 PageRank, l32b PCA, l3f trained IVF) on
three corpus shapes. This campaign verifies them on RANDOM synthetic
corpora — tiny (1-2 rows), degenerate (identical embeddings, all-same
token counts), skewed (heavy-tail token lengths, clustered vectors) —
through the exact check_parity compare (column-sorted, value-exact),
so a certificate that only holds on TPC-H-shaped data fails here.

Seeded and deterministic; writes one JSON line. Not part of the pytest
suite (runs real Spark + DuckDB per corpus, ~10 min); run ad hoc:

    python tools/randomized_contract_campaign.py [n_corpora] [seed]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark
from tools.check_parity import compare

DOC_QUERIES = ["l15_sequence_packing", "l39_weighted_sample"]
EMB_QUERIES = [
    "l32b_pca_project",
    "l3f_ann_ivf_trained",
    "l35_pagerank_centrality",
    "l3j_mmr_rerank",
]
# The r11 equals-batch streaming twins that read only the events table.
# Random microsecond-precision timestamps over random spans are the
# adversarial case for the watermark's ms-truncation arithmetic and for
# empty-closed-window sets (a span shorter than the 1 h delay closes
# nothing — both sides must agree on the empty set).
# r12 --docs tier: EVERY documents-only full-oracle query (61 names —
# the text/dedup/sampling/packing/curation/media-codec tiers). The
# trial that admitted them ran each on 2-doc and 40-doc random corpora
# with Unicode and empty source values: 122/122 green. Running them
# here makes corpus-shape independence a standing per-round claim for
# the whole text tier, not just the certificate contracts.
DOC_TIER = [
    "f5_array_functions", "f5b_higher_order_arrays", "f9_hash_functions",
    "l10_fingerprint", "l11_deterministic_sample", "l11b_split_assignment",
    "l11c_mixture_sample", "l11d_stratified_sample", "l12_chunking",
    "l13_tfidf_top_terms", "l14_text_cleaning", "l16_decontamination",
    "l17_repetition_filter", "l18_domain_stats", "l1_exact_dedup",
    "l1b_incremental_dedup", "l20_curation_pipeline", "l21_bigram_lm_score",
    "l22_pii_redaction", "l25_zipf_slope", "l26_epoch_shuffle",
    "l27_budget_select", "l28_boilerplate_scrub", "l2b_jaccard_exact",
    "l2g_jaccard_prefix", "l31_substring_dedup", "l34_inverted_index",
    "l36_mixture_weights", "l37_bm25", "l38_corpus_report",
    "l41_ngram_novelty", "l43_containment_neardup", "l5_text_stats",
    "l5b_corpus_stats", "l5c_regex_tokens", "l6_quality_filter",
    "l7_term_frequency", "l7b_bigrams", "l8_multimodal_features",
    "l8b_frame_sample", "l8c_resize", "l8d_frame_hash_dedup",
    "l8e_blob_manifest_join", "l8f_media_sniff", "l8g_pixel_resize",
    "l8h_audio_decode", "l8i_video_frame_sample", "l8j_png_decode",
    "l8k_gif_decode", "l8l_jpeg_decode", "l8m_tiff_decode",
    "l8n_media_dispatch", "l8o_jpeg_color_decode", "l8p_flac_decode",
    "l8q_jpeg_progressive_decode", "l9_language_id", "s21_gzip_text_scan",
    "x2_pandas_udf", "x5_python_udtf",
]

# r12 --events tier: every events-only full-oracle BATCH query (40
# names — windows, time-series, retention/attribution, geo, exact
# quantiles, sketches, storage roundtrips; plus the t17 streaming
# heavy-hitters twin). Trial admitted them on 1/9/400-event random
# corpora: 120/120 green.
EVENT_TIER = [
    "a16_heavy_hitters", "a18_hll_rollup", "a19_sketch_overlap",
    "a21_grouped_exact_median", "a22_grouped_exact_percentile",
    "a23_grouped_mode", "a25_windowed_hll", "a26_ks_test",
    "f10_variant_extract", "f7_json_extract", "g1_subtree_rollup",
    "g2_spatial_join", "g3_geohash_encode", "g4_kanon_cells",
    "j8_asof_latest_event", "s12_partitioned_scan",
    "s15_dynamic_partition_pruning", "s16_compaction",
    "s3b_multiformat_roundtrip", "s6_zorder_scan", "s9_schema_evolution",
    "t11_gap_fill", "t14_retention_matrix", "t15_attribution",
    "t17_stream_heavy_hitters", "t19_anomaly_zscore",
    "t1_tumbling_window", "t21_max_concurrency", "t2_sliding_window",
    "t3_session_window", "t3b_event_funnel", "w10_longest_streak",
    "w2_lag_lead", "w3_running_total", "w4_moving_average",
    "w4b_range_frame", "w8_zscore_outliers", "w9_sliding_distinct",
    "x3_pandas_udaf", "x4_apply_in_pandas",
]

STREAM_QUERIES = [
    "t4_stream_tumbling_watermark",
    "t5_stream_dedup",
    "t9_stream_session_window",
    "t12_stream_stream_join",
    "t20_stream_anomaly_zscore",
]


def _doc_corpus(rng: random.Random, n: int) -> list[tuple]:
    shapes = rng.choice(
        [
            lambda: rng.randint(1, 300),          # heavy spread across cap=128
            lambda: 64,                           # all exactly half-cap
            lambda: rng.choice([1, 64, 65, 128]), # boundary mix
        ]
    )
    rows = []
    langs = ["en", "de", "fr", "xx"]
    srcs = ["web", "\u4e66", "wiki", ""]  # incl. non-ASCII and empty
    for i in range(n):
        text = " ".join("w%d" % rng.randint(0, 9) for _ in range(shapes()))
        # n_chars is l39's sampling weight — emit the real length so the
        # quantized A-ES key sees adversarial weights (incl. ties);
        # lang/source feed the stratified/mixture/domain-stats tier.
        rows.append((i, text, rng.choice(langs), rng.choice(srcs), len(text)))
    return rows


def _emb_corpus(rng: random.Random, n: int) -> list[tuple[int, list[float]]]:
    kind = rng.choice(["uniform", "clustered", "identical"])
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(max(4, n // 8))]
    rows = []
    for i in range(n):
        if kind == "uniform":
            v = [rng.uniform(-1, 1) for _ in range(64)]
        elif kind == "identical":
            v = base[0]
        else:  # clustered: a base vector + small jitter
            b = base[rng.randrange(len(base))]
            v = [x + rng.uniform(-0.01, 0.01) for x in b]
        rows.append((i, [float(x) for x in v]))
    return rows


def _events_corpus(rng: random.Random, n: int) -> list[tuple]:
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    span_s = rng.choice([60, 1800, 3 * 3600, 14 * 86400])  # < and > the 1 h delay
    vocab = ["click", "view", "signup", "error", "purchase"]
    rows = []
    for i in range(n):
        ts = base + dt.timedelta(
            seconds=rng.uniform(0, span_s), microseconds=rng.randint(0, 999)
        )
        rows.append(
            (
                i,
                ts,
                rng.randint(0, max(1, n // 10)),  # skewed user ids
                rng.choice(vocab),
                round(rng.uniform(-50, 500), 2),
                '{"k": %d}' % rng.randint(0, 99),
            )
        )
    return rows


def main() -> int:
    n_corpora = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0FFEE
    with_streaming = "--streaming" in sys.argv
    with_docs = "--docs" in sys.argv
    with_events = "--events" in sys.argv
    rng = random.Random(seed)
    registry.load_all()
    spark = get_spark()
    t0 = time.time()
    n_checks, failures = 0, []

    for c in range(n_corpora):
        d = tempfile.mkdtemp(prefix="lws_randcert_")
        try:
            n_docs = rng.choice([1, 2, 7, 33, 200])
            n_vecs = rng.choice([1, 2, 15, 17, 120])
            spark.createDataFrame(
                _doc_corpus(rng, n_docs), "doc_id long, text string, lang string, source string, n_chars long"
            ).coalesce(1).write.parquet(f"{d}/documents.parquet")
            spark.createDataFrame(
                _emb_corpus(rng, n_vecs), "vec_id long, embedding array<float>"
            ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
            names = DOC_QUERIES + EMB_QUERIES
            if with_docs:
                names = names + DOC_TIER
            if with_events:
                n_events = rng.choice([1, 9, 400, 3000])
                spark.createDataFrame(
                    _events_corpus(rng, n_events),
                    "event_id long, ts timestamp, user_id long,"
                    " event_type string, value double, props string",
                ).coalesce(1).write.parquet(f"{d}/events.parquet")
                names = names + EVENT_TIER
            if with_streaming:
                if not with_events:
                    n_events = rng.choice([1, 9, 400, 3000])
                    spark.createDataFrame(
                        _events_corpus(rng, n_events),
                        "event_id long, ts timestamp, user_id long,"
                        " event_type string, value double, props string",
                    ).coalesce(1).write.parquet(f"{d}/events.parquet")
                names = names + STREAM_QUERIES

            con = duckdb.connect()
            tables = ("documents", "embeddings") + (
                ("events",) if (with_streaming or with_events) else ()
            )
            for t in tables:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet/*.parquet')"
                )
            for name in names:
                spark_pdf = registry.QUERIES[name](spark, d).toPandas()
                oracle_pdf = con.execute(registry.ORACLES[name]).fetchdf()
                problems = compare(name, spark_pdf, oracle_pdf)
                n_checks += 1
                if problems:
                    failures.append(
                        {"corpus": c, "n_docs": n_docs, "n_vecs": n_vecs,
                         "query": name, "problems": problems}
                    )
            con.close()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(json.dumps({
        "n_corpora": n_corpora, "seed": seed, "n_checks": n_checks,
        "n_failures": len(failures), "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
