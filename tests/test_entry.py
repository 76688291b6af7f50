"""Driver-contract invariants that need no SparkSession.

The driver's correctness gate keys on registry NAMES: an entry that
disappears or renames is formally 'untested' even if the code is fine
(round-2 lesson — 10 judge-green queries missed the gate file).  This test
freezes the full round-3 name set and keeps enumeration cheap: building
queries()/oracle_sql() must not create a SparkSession or touch data.
"""

import time

# frozen at round 3 — names may be ADDED, never removed or renamed
FROZEN_REGISTRY = {
    "ann_cosine_topk", "ann_cosine_topk_batch", "ann_ivf_topk", "ann_lsh_topk",
    "approx_distinct_hll", "asof_last_purchase", "call_pipeline",
    "contamination_check", "contamination_check_packed", "cosine_dup_pairs",
    "counter_by_type", "cube_counts", "curation_e2e", "curation_incremental",
    "dedup_components",
    "dedup_exact", "distinct_users", "doc_fingerprint", "drop_filter",
    "edge_detect", "embedding_decontam", "embedding_norms", "enrich_lookup",
    "es_bulk_payload",
    "events_per_minute", "except_users", "gauge_last", "grouping_sets_counts",
    "heavy_hitters_users",
    "json_extract", "lang_id_score", "mangle_chain", "match_extract",
    "minhash_pairs", "ngram_jaccard_adjacent", "pack_payloads",
    "pack_sequences", "paragraph_dedup", "pii_redact", "pivot_user_types",
    "python_rewrite_expr", "python_rewrite_sql", "quality_cutoff_filter",
    "asof_tolerance",
    "quality_top_quantile", "quarantine_unparsed", "range_join_windows",
    "repetition_signals", "replace_redact", "rollup_timeseries",
    "revenue_by_nation", "rollup_counts", "route_fanout", "running_count",
    "sampled_counter", "semi_anti_join", "session_window_counts", "sessionize",
    "set_template", "simhash_dups", "simhash_near_dups", "stable_order_rownum",
    "statsd_wire_lines", "stratified_sample", "syslog_pri_decode",
    "syslog_reemit", "text_quality", "timer_percentiles", "to_json_payload",
    "tool_invocations", "top_order_per_customer", "topk_users", "tpch_q1",
    "upsample_strata",
}


def test_registry_names_frozen_and_enumeration_cheap():
    t0 = time.time()
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert time.time() - t0 < 20  # import + dict build only — no session
    missing = FROZEN_REGISTRY - set(qs)
    assert not missing, f"registry entries vanished from the driver gate: {missing}"
    assert set(osql) <= set(qs)  # every oracle has a query
    # rows-only set stays small and intentional (sketch/LSH ops only)
    rows_only = set(qs) - set(osql)
    assert rows_only <= {
        "ann_ivf_topk", "ann_lsh_topk", "approx_distinct_hll",
        "simhash_dups", "simhash_near_dups",
        # r5: real-codec decode output is engine-opaque binary → no SQL oracle
        "media_decode_features",
    }, f"unexpected rows-only entries (add an oracle): {rows_only}"
