"""Randomized-corpus campaign for the certificate contracts.

The fixed sf0.001/0.01/0.1 parity sweeps verify the four certified
contracts (l15 packing, l35 PageRank, l32b PCA, l3f trained IVF) on
three corpus shapes. This campaign verifies them on RANDOM synthetic
corpora — tiny (1-2 rows), degenerate (identical embeddings, all-same
token counts), skewed (heavy-tail token lengths, clustered vectors) —
through the exact check_parity compare (column-sorted, value-exact),
so a certificate that only holds on TPC-H-shaped data fails here.

Seeded and deterministic; writes one JSON line (incl. per-corpus drawn
shapes, r12 verdict #8). Not part of the pytest suite (runs real Spark
+ DuckDB per corpus, ~10 min); run ad hoc:

    python tools/randomized_contract_campaign.py [n_corpora] [seed] \
        [--docs] [--events] [--streaming] [--relational]

--relational (r13) adds random adversarial STAR-SCHEMA corpora (empty
dims, 1-row facts, all-null/dangling FKs, single-customer order books,
hot-key lineitem skew) and runs all 112 star-only full-oracle queries
on them.
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

# r13 --relational tier (r12 verdict #2): every full-oracle query whose
# table footprint is star-schema-only (region/nation/customer/supplier/
# part/orders/lineitem — 112 names: joins, aggregates, windows, sets,
# cohorts, TPC-H shapes, storage roundtrips, paging). These only ever
# saw the fixed TPC-H-shaped testdata; the campaign method that caught
# l3j's single-candidate empty-join bug now runs them on random
# adversarial star corpora — empty dims, 1-row facts, all-null FKs,
# dangling FKs, single-customer order books, skewed lineitem keys —
# through the exact check_parity compare.
RELATIONAL_TIER = [
    "a10_collect_array", "a13_pivot", "a14_unpivot", "a15_correlation",
    "a17_approx_percentile", "a1_count_distinct", "a20_exact_median",
    "a24_equidepth_histogram", "a2_approx_count_distinct",
    "a3_faceted_counts", "a4_numeric_stats", "a5_histogram",
    "a5b_percentiles", "a8_rollup", "a8b_cube", "a8c_grouping_sets",
    "a9_conditional_agg", "f1_string_functions", "f1b_string_distance",
    "f2_datetime_functions", "f3_math_functions", "f4_decimal_money",
    "f6_map_functions", "f8_conditional_null", "j10_fuzzy_join",
    "j11_binned_interval_join", "j12_skew_salted_join",
    "j13_record_linkage", "j1_inner_join", "j2_broadcast_dim_join",
    "j3_semi_join", "j4_anti_join", "j5_left_outer_join",
    "j5b_full_outer_join", "j6_star_join_revenue", "j7_theta_join",
    "j7b_range_join", "j9_cross_join", "o1_global_sort",
    "o2_limit_offset_page", "o3_keyset_page", "o4_top_k",
    "o5_top_k_per_group", "p1_projection", "p3_range_predicate",
    "p4_set_membership", "p5_temporal_predicate", "p6_null_presence",
    "p7_compound_boolean", "p8_text_search", "p9_correlated_subquery",
    "q10_returned_items", "q11_important_stock", "q12_lateness_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_supplier_count", "q17_small_quantity_revenue",
    "q18_large_orders", "q19_discounted_revenue", "q1_pricing_summary",
    "q20_excess_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "s10_asof_read", "s10b_asof_scd2", "s11_codelist_decode",
    "s13_incremental_mv", "s14_bucketed_join", "s17_snapshot_expiry",
    "s20_bloom_pruned_join", "s2_point_lookup", "s3_sink_roundtrip",
    "s3b_upsert_merge", "s3c_validate_import", "s5b_catalog_describe",
    "s5c_profile", "s7_snapshot_diff", "s8_scd2_history",
    "u1_union_distinct", "u2_intersect", "u2b_intersect_all",
    "u3_except", "u3b_except_all", "u4_distinct", "u5_cohort_count",
    "u5_cohort_count_fused", "u5_cohort_count_naive", "u5_cohort_facets",
    "u5_cohort_members", "u5b_cohort_visit_counts",
    "u5c_cohort_visit_facets", "u5d_cohort_visit_counts_fused",
    "u5e_cohort_count_auto", "u6_temporal_cohort", "u7_washout_cohort",
    "u8_incidence_curve", "w1_ranking", "w5_distribution",
    "w6_first_last", "w7_rank_family", "x1_python_udf", "x6_arrow_udf",
]

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem",
)


def _doc_corpus(rng: random.Random, n: int) -> list[tuple]:
    shapes = rng.choice(
        [
            lambda: rng.randint(1, 300),          # heavy spread across cap=128
            lambda: 64,                           # all exactly half-cap
            lambda: rng.choice([1, 64, 65, 128]), # boundary mix
            # r13: zero-token docs in the mix — empty text is a real
            # crawl-data shape and every ratio denominator (tokens,
            # distinct tokens, chars) must stay guarded under ANSI
            # (probe: 67 doc-tier queries green on empty/whitespace).
            lambda: rng.choice([0, 0, 1, 128]),
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


def _star_corpus(rng: random.Random) -> tuple[dict[str, list[tuple]], dict]:
    """Random adversarial star-schema corpus (testdata-domain values so
    the queries' literal predicates — r_name='ASIA', Brand#, PROMO,
    date windows — still select rows sometimes). Returns (tables,
    shape_summary); the summary travels in the artifact (r12 verdict
    #8: 'the single-candidate shape was covered' must be provable
    without re-running the seed)."""
    import datetime as dt

    # Dimension cardinalities: empty dims are a first-class shape.
    n_region = rng.choice([0, 1, 5])
    n_nation = rng.choice([0, 1, 3, 25])
    n_customer = rng.choice([0, 1, 3, 40, 250])
    n_supplier = rng.choice([1, 2, 15])
    n_part = rng.choice([1, 4, 80])
    n_orders = rng.choice([0, 1, 12, 400, 2500])
    # FK regime for orders->customer: valid keys, every FK dangling,
    # every FK NULL, or the whole order book on ONE customer.
    fk_mode = rng.choice(["valid", "dangling", "all_null", "single_customer"])
    # lineitem key skew: uniform across orders vs ~80% on one order.
    skew = rng.choice(["uniform", "hot_order"])
    lines_per_order = rng.choice([0, 1, 4])

    region_names = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    region = [(i, region_names[i]) for i in range(n_region)]
    nation = [
        (i, f"NATION_{i}", rng.randrange(n_region) if n_region else 99)
        for i in range(n_nation)
    ]
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    customer = [
        (
            i,
            f"Customer#{i:09d}",
            rng.randrange(n_nation) if n_nation else 99,
            round(rng.uniform(-999, 9999), 2),
            rng.choice(segs),
        )
        for i in range(n_customer)
    ]
    supplier = [
        (
            i,
            f"Supplier#{i:09d}",
            rng.randrange(n_nation) if n_nation else 99,
            round(rng.uniform(-999, 9999), 2),
        )
        for i in range(n_supplier)
    ]
    colors = ["small", "red", "blue", "hot", "large", "green"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "cog"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    part = [
        (
            i,
            f"{rng.choice(colors)} {rng.choice(nouns)}",
            f"Brand#{rng.randint(1, 50)}",
            rng.choice(types),
            rng.randint(1, 50),
            round(rng.uniform(900, 2000), 2),
        )
        for i in range(n_part)
    ]
    base = dt.datetime(1995, 1, 1)
    span_days = rng.choice([0, 30, 2400])  # single-day and full-window books
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    hot_cust = rng.randrange(n_customer) if n_customer else 0

    def custkey() -> int | None:
        if fk_mode == "all_null":
            return None
        if fk_mode == "dangling":
            return 10_000_000 + rng.randint(0, 5)
        if fk_mode == "single_customer":
            return hot_cust
        return rng.randrange(n_customer) if n_customer else 0

    orders = [
        (
            i,
            custkey(),
            rng.choice(statuses),
            round(rng.uniform(900, 200_000), 2),
            base + dt.timedelta(days=rng.uniform(0, span_days)),
            rng.choice(prios),
        )
        for i in range(n_orders)
    ]
    hot_ord = rng.randrange(n_orders) if n_orders else 0
    lineitem = []
    n_lines_target = n_orders * lines_per_order
    for j in range(n_lines_target):
        if skew == "hot_order" and rng.random() < 0.8:
            okey = hot_ord
        else:
            okey = rng.randrange(n_orders)
        odate = orders[okey][4]
        lineitem.append(
            (
                okey,
                rng.randrange(n_part) if n_part else 0,
                rng.randrange(n_supplier) if n_supplier else 0,
                j,
                float(rng.randint(1, 50)),
                round(rng.uniform(900, 105_000), 2),
                round(rng.randint(0, 10) / 100, 2),
                round(rng.randint(0, 8) / 100, 2),
                rng.choice(["A", "N", "R"]),
                rng.choice(["F", "O"]),
                odate + dt.timedelta(days=rng.randint(1, 120)),
            )
        )
    tables = {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
    }
    shape = {
        "n_region": n_region, "n_nation": n_nation,
        "n_customer": n_customer, "n_supplier": n_supplier,
        "n_part": n_part, "n_orders": n_orders,
        "n_lineitem": len(lineitem), "fk_mode": fk_mode,
        "lineitem_skew": skew, "span_days": span_days,
    }
    return tables, shape


STAR_SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    ),
}


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
    with_relational = "--relational" in sys.argv
    rng = random.Random(seed)
    registry.load_all()
    spark = get_spark()
    t0 = time.time()
    n_checks, failures = 0, []
    # r12 verdict #8: the artifact must carry the drawn corpus shapes,
    # not just seeds — "shape X was covered" must be readable without
    # re-running the campaign.
    corpora_shapes: list[dict] = []

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
            shape: dict = {"corpus": c, "n_docs": n_docs, "n_vecs": n_vecs}
            names = DOC_QUERIES + EMB_QUERIES
            if with_docs:
                names = names + DOC_TIER
            if with_events or with_streaming:
                n_events = rng.choice([1, 9, 400, 3000])
                shape["n_events"] = n_events
                spark.createDataFrame(
                    _events_corpus(rng, n_events),
                    "event_id long, ts timestamp, user_id long,"
                    " event_type string, value double, props string",
                ).coalesce(1).write.parquet(f"{d}/events.parquet")
                if with_events:
                    names = names + EVENT_TIER
                if with_streaming:
                    names = names + STREAM_QUERIES
            if with_relational:
                star, star_shape = _star_corpus(rng)
                shape["star"] = star_shape
                for t, rows in star.items():
                    spark.createDataFrame(
                        rows, STAR_SCHEMAS[t]
                    ).coalesce(1).write.parquet(f"{d}/{t}.parquet")
                names = names + RELATIONAL_TIER
            corpora_shapes.append(shape)

            con = duckdb.connect()
            tables = ("documents", "embeddings") + (
                ("events",) if (with_streaming or with_events) else ()
            ) + (STAR_TABLES if with_relational else ())
            for t in tables:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet/*.parquet')"
                )
            for name in names:
                # r13: an engine exception on an adversarial corpus is a
                # FINDING (recorded with the corpus shape), not a reason
                # to abort the remaining corpora mid-campaign.
                try:
                    spark_pdf = registry.QUERIES[name](spark, d).toPandas()
                    oracle_pdf = con.execute(registry.ORACLES[name]).fetchdf()
                    problems = compare(name, spark_pdf, oracle_pdf)
                except Exception as exc:  # noqa: BLE001
                    problems = [f"raised: {exc!r}"[:500]]
                n_checks += 1
                if problems:
                    failures.append(
                        {**shape, "query": name, "problems": problems}
                    )
            con.close()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(json.dumps({
        "n_corpora": n_corpora, "seed": seed, "n_checks": n_checks,
        "n_failures": len(failures), "failures": failures,
        "corpora_shapes": corpora_shapes,
        "elapsed_s": round(time.time() - t0, 1),
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
