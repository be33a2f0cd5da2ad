"""Plan audits: the scale properties each headline query must keep.

A failure here means a 100 TB regression (lost pushdown, broadcast turned
into a shuffle join, an extra exchange), even if results are still correct.
"""

import pytest

from bulker_spark.plans import audit
from bulker_spark.plans.queries import (
    QUERIES,
    dedup_last_wins,
    doc_exact_dedup,
    doc_token_stats,
    flatten_json_events,
    tpch_q1,
    tpch_q3,
    tpch_q5,
    tpch_q6,
)

SF = "/root/testdata/sf0.001"


def test_q1_pushdown_and_pruning(spark):
    df = tpch_q1(spark, SF)
    # shipdate filter reaches the parquet scan
    assert audit.has_pushed_filter(df, "l_shipdate"), audit.pushed_filters(df)
    # only the 7 needed columns of 11 are read
    assert audit.pruned_to(df, 7), audit.read_schemas(df)


def test_q6_pushdown(spark):
    df = tpch_q6(spark, SF)
    filters = " ".join(audit.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in filters, filters
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_q3_broadcasts_customer(spark):
    df = tpch_q3(spark, SF)
    assert audit.broadcast_join_count(df) >= 1, audit.explain_str(df, "simple")
    assert audit.has_pushed_filter(df, "c_mktsegment")


def test_q5_join_strategy(spark):
    df = tpch_q5(spark, SF)
    rep = audit.audit_report(df)
    assert rep["broadcast_joins"] >= 2  # nation + region at minimum
    assert audit.has_pushed_filter(df, "r_name")


def test_dedup_single_shuffle(spark):
    df = dedup_last_wins(spark, SF)
    # window dedup must cost exactly one exchange (the PK hash partition)
    assert audit.exchange_count(df) == 1, audit.explain_str(df, "simple")


def test_flatten_no_shuffle(spark):
    df = flatten_json_events(spark, SF)
    assert audit.exchange_count(df) == 0


def test_exact_dedup_partial_agg(spark):
    df = doc_exact_dedup(spark, SF)
    # hash aggregate with map-side combine: one exchange, codegen'd
    assert audit.exchange_count(df) == 1
    assert audit.has_partial_aggregate(df)
    assert audit.codegen_stage_count(df) >= 1


def test_token_stats_stays_jvm(spark):
    df = doc_token_stats(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_udfs_anywhere(spark, name):
    """No query may fall back to row-at-a-time Python evaluation."""
    df = QUERIES[name][0](spark, SF)
    assert "BatchEvalPython" not in audit.explain_str(df, "simple")


# --- extended catalog (analytics.py) audits --------------------------------

from bulker_spark.plans.analytics import (  # noqa: E402
    doc_winnow_fingerprint,
    doc_winnow_pairs,
    events_log_range,
    tpch_q7,
    tpch_q8,
    tpch_q9,
    tpch_q13,
    tpch_q17,
)


def test_q7_broadcasts_both_nation_roles(spark):
    df = tpch_q7(spark, SF)
    rep = audit.audit_report(df)
    assert rep["broadcast_joins"] >= 3, audit.explain_str(df, "simple")
    assert audit.has_pushed_filter(df, "l_shipdate")


def test_q8_dims_broadcast_fact_shuffles_once(spark):
    df = tpch_q8(spark, SF)
    rep = audit.audit_report(df)
    assert rep["broadcast_joins"] >= 4  # part, supplier, nations, region
    assert audit.has_pushed_filter(df, "p_type")
    assert audit.has_pushed_filter(df, "o_orderdate")


def test_q9_name_filter_pushed(spark):
    df = tpch_q9(spark, SF)
    assert audit.has_pushed_filter(df, "p_name")
    assert audit.audit_report(df)["broadcast_joins"] >= 3


def test_q13_outer_join_keeps_partial_agg(spark):
    df = tpch_q13(spark, SF)
    assert audit.has_partial_aggregate(df)
    assert audit.pruned_to(df, 2), audit.read_schemas(df)


def test_q17_part_avg_reused_not_rescanned_per_row(spark):
    df = tpch_q17(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert txt.count("FileScan parquet") <= 3  # lineitem x2 + part, no blowup
    assert audit.has_pushed_filter(df, "p_brand")


def test_events_log_limit_and_pushdown(spark):
    df = events_log_range(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "GlobalLimit" in txt or "TakeOrderedAndProject" in txt
    assert audit.has_pushed_filter(df, "event_id")


def test_q4_broadcasts_orders_not_fact(spark):
    from bulker_spark.plans.queries import tpch_q4

    df = tpch_q4(spark, SF)
    txt = audit.explain_str(df, "formatted")
    # the broadcast build side must be the filtered orders slice; building
    # from lineitem cannot broadcast at scale and degrades to a full
    # fact-table shuffle
    assert audit.broadcast_join_count(df) >= 1, txt
    import re

    for m in re.finditer(r"BroadcastExchange[\s\S]{0,400}?Scan parquet[^\n]*", txt):
        frag = m.group(0)
        assert "lineitem" not in frag, frag
    assert audit.has_pushed_filter(df, "o_orderdate")


def test_winnow_fingerprint_single_doc_shuffle(spark):
    df = doc_winnow_fingerprint(spark, SF)
    txt = audit.explain_str(df, "simple")
    # window min + per-doc digest share the doc_id hash partition: one
    # hash exchange (plus the final presentation range sort)
    assert txt.count("hashpartitioning") <= 1, txt


def test_winnow_pairs_no_cartesian_no_fact_rescans(spark):
    df = doc_winnow_pairs(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    # the gram hashing must run once: pairs come from collected doc lists,
    # not a three-branch self-join that recomputes the md5 arrays
    assert txt.count("FileScan parquet") == 1, txt


def test_tfidf_partial_agg_no_cartesian(spark):
    from bulker_spark.plans.queries import doc_tfidf_top_terms

    df = doc_tfidf_top_terms(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "CartesianProduct" not in txt
    # the n_docs scalar joins via broadcast, never a shuffled cross
    assert audit.has_partial_aggregate(df)


def test_length_quantiles_single_exchange(spark):
    from bulker_spark.plans.queries import doc_length_quantiles

    df = doc_length_quantiles(spark, SF)
    txt = audit.explain_str(df, "simple")
    # histogram form: (lang, n_chars) partial-agged exchange + the lang
    # window/final-agg exchange — nothing wide beyond the histogram
    assert txt.count("hashpartitioning") <= 2, txt
    assert audit.has_partial_aggregate(df), txt  # map-side histogram
    assert audit.pruned_to(df, 2), audit.read_schemas(df)  # lang, n_chars


def test_contamination_prunes_text_from_source_side(spark):
    from bulker_spark.plans.analytics import doc_source_contamination

    df = doc_source_contamination(spark, SF)
    txt = audit.explain_str(df, "formatted")
    assert "CartesianProduct" not in txt
    # the doc->source mapping scan must not re-read text
    import re

    schemas = audit.read_schemas(df)
    assert any("source" in s and "text" not in s for s in schemas), schemas


def test_semdedup_single_wide_exchange(spark):
    from bulker_spark.plans.analytics import emb_semdedup

    df = emb_semdedup(spark, SF)
    txt = audit.explain_str(df, "simple")
    # one cluster-keyed shuffle for the prune; assignment is map-side only
    assert txt.count("hashpartitioning") == 1, txt
    assert "CartesianProduct" not in txt
    assert "SortMergeJoin" not in txt


def test_anomaly_zscore_broadcasts_moments(spark):
    from bulker_spark.plans.analytics import events_anomaly_zscore

    df = events_anomaly_zscore(spark, SF)
    # the per-type moments join back via broadcast, not a fact shuffle
    assert audit.broadcast_join_count(df) == 1
    assert audit.sortmerge_join_count(df) == 0
    # only the moments agg shuffles (tiny): one hash exchange total
    txt = audit.explain_str(df, "simple")
    assert txt.count("hashpartitioning") <= 1, txt


def test_train_val_split_zero_wide_shuffle_before_agg(spark):
    from bulker_spark.plans.analytics import doc_train_val_split

    df = doc_train_val_split(spark, SF)
    # hash-bucket assignment is pure map-side; only the summary agg + final
    # sort exchange
    assert audit.exchange_count(df) <= 2, audit.explain_str(df, "simple")
    # text column never read: only doc_id, lang, n_chars
    assert audit.pruned_to(df, 3), audit.read_schemas(df)


def test_props_variant_no_python(spark):
    from bulker_spark.plans.analytics import events_props_variant

    df = events_props_variant(spark, SF)
    txt = audit.explain_str(df, "simple")
    # variant_get path extraction stays JVM-side
    assert "BatchEvalPython" not in txt
    assert "PythonUDF" not in txt


def test_chunk_overlap_zero_exchanges(spark):
    from bulker_spark.plans.analytics import doc_chunk_overlap

    df = doc_chunk_overlap(spark, SF)
    # pure map stage: scan -> generate -> project, nothing shuffles
    assert audit.exchange_count(df) == 0, audit.explain_str(df, "simple")
    # only doc_id/text/n_chars read
    assert audit.pruned_to(df, 3), audit.read_schemas(df)


def test_topk_ngrams_single_shuffle_takeordered(spark):
    from bulker_spark.plans.analytics import doc_topk_ngrams

    df = doc_topk_ngrams(spark, SF)
    # partial-agg before the one bigram-count exchange; top-k via
    # TakeOrdered (per-partition heaps), never a global sort
    assert audit.exchange_count(df) == 1, audit.explain_str(df, "simple")
    assert audit.has_partial_aggregate(df)
    txt = audit.explain_str(df, "simple")
    assert "TakeOrderedAndProject" in txt
    assert "rangepartitioning" not in txt, txt


def test_hopping_window_expands_in_scan_stage(spark):
    from bulker_spark.plans.analytics import events_hopping_active_users

    df = events_hopping_active_users(spark, SF)
    txt = audit.explain_str(df, "simple")
    # window() fan-out happens map-side (Expand/Generate before the first
    # exchange); the distinct-agg costs the standard two hash exchanges
    assert audit.exchange_count(df) <= 2, txt
    assert audit.has_partial_aggregate(df)
    assert "BatchEvalPython" not in txt


def test_fuzzy_dedup_survivors_broadcast_anti(spark):
    from bulker_spark.plans.analytics import doc_fuzzy_dedup_keep

    df = doc_fuzzy_dedup_keep(spark, SF)
    txt = audit.explain_str(df, "simple")
    # the corpus-side anti-join against the (tiny) dropped set broadcasts
    import re

    assert re.search(r"BroadcastHashJoin .*LeftAnti", txt), txt


def test_copurchase_in_row_pairs_no_self_join(spark):
    from bulker_spark.plans.analytics2 import parts_copurchase

    df = parts_copurchase(spark, SF)
    rep = audit.audit_report(df)
    # pair expansion is in-row (transform/slice), so: one broadcast dim
    # join, no sort-merge self-join, one scan per table, two exchanges
    # (basket collect_set + pair count)
    assert rep["sortmerge_joins"] == 0, audit.explain_str(df, "simple")
    assert rep["broadcast_joins"] >= 1
    assert rep["exchanges"] <= 2, audit.explain_str(df, "simple")
    assert len(rep["read_schemas"]) == 2, rep["read_schemas"]
    txt = audit.explain_str(df, "simple")
    assert "TakeOrderedAndProject" in txt


def test_scd2_reconstruction_single_exchange(spark):
    from bulker_spark.plans.analytics2 import customer_priority_scd2

    df = customer_priority_scd2(spark, SF)
    # all three windows + the run groupBy share the o_custkey hash
    # partitioning: the whole history rebuild is ONE shuffle
    assert audit.exchange_count(df) <= 1, audit.explain_str(df, "simple")
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_knn_join_broadcasts_query_block(spark):
    from bulker_spark.plans.analytics2 import emb_knn_join

    df = emb_knn_join(spark, SF)
    txt = audit.explain_str(df, "simple")
    # query block broadcasts (nested-loop against the candidate scan);
    # the only exchange is the per-query top-k window
    assert "BroadcastNestedLoopJoin" in txt, txt
    assert audit.exchange_count(df) <= 1, txt
    # vec_id range predicates reach the parquet scan
    filters = " ".join(audit.pushed_filters(df))
    assert "vec_id" in filters


def test_block_dedup_hashed_keys_cross_shuffle(spark):
    from bulker_spark.plans.analytics2 import doc_block_dedup

    df = doc_block_dedup(spark, SF)
    rep = audit.audit_report(df)
    # block->frequency agg partial-aggregates map-side; the join back is
    # keyed on xxhash64 so 64-bit ints cross the exchanges, not strings
    assert audit.has_partial_aggregate(df)
    assert "xxhash64" in audit.explain_str(df, "formatted")
    assert rep["sortmerge_joins"] <= 1


def test_interarrival_two_phase_bounded(spark):
    """Round 7: the lag rides the bucketed two-phase pass (hot-key
    splittable), so the plan carries the (user, day) window + per-bucket
    summary + join-back — a BOUNDED handful of exchanges (measured 4),
    one slim equi-join, never a pair-blowup shape, still no Python."""
    from bulker_spark.plans.analytics2 import events_interarrival_stats

    df = events_interarrival_stats(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert audit.exchange_count(df) <= 5, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BatchEvalPython" not in plan
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_user_features_two_phase_bounded(spark):
    """Round 7: the session-boundary lag is bucketed two-phase; the
    extraction is a bounded exchange family (measured 5) with the
    user_id filter still pushed to the scan."""
    from bulker_spark.plans.analytics2 import events_user_features

    df = events_user_features(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert audit.exchange_count(df) <= 6, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert audit.has_pushed_filter(df, "user_id")


def test_trailing_prefix_probe_bounded(spark):
    """Round 7: the range frame became prefix sums + boundary probes
    (O(rows), rate-independent) — a 3x union, the bucketed running-sum
    pass, and two slim row_id equi-joins (measured 8 exchanges, all on
    slim int frames). The ban is on pair-blowup shapes and sliding
    re-aggregation, not on exchange count alone."""
    from bulker_spark.plans.analytics2 import events_trailing_1h

    df = events_trailing_1h(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert audit.exchange_count(df) <= 10, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_resample_grid_broadcasts(spark):
    from bulker_spark.plans.analytics2 import events_resample_hourly

    df = events_resample_hourly(spark, SF)
    rep = audit.audit_report(df)
    # hour-grid generation is in-row; the grid<->counts join broadcasts
    # (grid is bounded by calendar span, not event count)
    assert rep["broadcast_joins"] >= 1, audit.explain_str(df, "simple")
    assert rep["sortmerge_joins"] == 0
    assert rep["exchanges"] <= 2


def test_markov_single_user_shuffle(spark):
    """The lag window and everything after must ride ONE user_id exchange
    plus the tiny 25-key aggregation/window exchanges — the plan must not
    re-shuffle event-scale data."""
    from bulker_spark.plans.analytics3 import events_markov_transitions

    df = events_markov_transitions(spark, SF)
    # round 7: bucketed two-phase lag (window + summary + join-back) +
    # transition agg + row-normalize window — measured 5, all post-lag
    # exchanges carry <= 25-key constant-size frames
    plan = audit.explain_str(df, "simple")
    assert audit.exchange_count(df) <= 6, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_attribution_no_touch_join(spark):
    """Attribution must be the carry-forward, not a purchase x touch
    join (which explodes on active users). Round 7: the carry is
    bucketed two-phase, so ONE slim summary equi-join is legitimate —
    the banned shapes are the pair-emitting joins."""
    from bulker_spark.plans.analytics3 import events_attribution_last_touch

    df = events_attribution_last_touch(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert plan.count("Join") <= 1, plan
    assert audit.has_pushed_filter(df, "event_type")


def test_novelty_hashes_cross_shuffle(spark):
    """Shingle text must be hashed before any exchange — strings crossing
    the first-occurrence shuffle would 8× the shuffle bytes."""
    from bulker_spark.plans.analytics3 import doc_ngram_novelty

    df = doc_ngram_novelty(spark, SF)
    assert audit.has_partial_aggregate(df), audit.explain_str(df, "formatted")
    plan = audit.explain_str(df, "formatted")
    assert "xxhash64" in plan


def test_shipping_delay_partial_agg(spark):
    from bulker_spark.plans.analytics3 import orders_shipping_delay

    df = orders_shipping_delay(spark, SF)
    assert audit.has_partial_aggregate(df)
    # join on orderkey: lineitem pruned to 2 columns
    assert audit.pruned_to(df, 3), audit.read_schemas(df)


def test_top_paths_constant_after_first_shuffle(spark):
    from bulker_spark.plans.analytics3 import events_top_paths

    df = events_top_paths(spark, SF)
    # round 8: ONE fused bucketed lag pass (offsets 1+2 share a single
    # summary join, verdict r7 #3 — was 12 exchanges as two chained
    # passes) + <=125-key agg + top-k boundary — measured 4 exchanges,
    # each carrying (user, ts, event_id, type)-slim or constant frames
    plan = audit.explain_str(df, "simple")
    assert audit.exchange_count(df) <= 5, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert audit.has_partial_aggregate(df)


def test_dau_wau_fans_out_pairs_not_events(spark):
    """The 7× explode must sit ABOVE the per-day distinct (pairs), not on
    raw events — check the distinct aggregate appears below the explode
    in the plan tree."""
    from bulker_spark.plans.analytics3 import events_dau_wau

    df = events_dau_wau(spark, SF)
    plan = audit.explain_str(df, "formatted")
    gen = plan.index("Generate")  # the explode
    assert "HashAggregate" in plan[gen:], plan[:500]
    assert audit.has_partial_aggregate(df)


def test_similar_pairs_blocked_join_no_cartesian(spark):
    """The ER join must be a per-block equi-join over DISTINCT names —
    no CartesianProduct/NestedLoop, and the distinct dedup partial-aggs
    before its exchange (names shuffle, not rows)."""
    from bulker_spark.plans.analytics4 import part_name_similar_pairs

    df = part_name_similar_pairs(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # map-side distinct: a keyed HashAggregate below AND above each
    # exchange (bare DISTINCT has no partial_ functions to grep for)
    assert plan.count("HashAggregate") >= 4, plan
    # only p_name is scanned — the candidate shuffle moves names, not rows
    assert audit.pruned_to(df, 1), audit.read_schemas(df)
    # edit distance stays JVM-side (no Python eval in the plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ab_arms_assignment_is_projection(spark):
    """Arm assignment must be in-row (a Project over the scan), with the
    only wide work the 2-key distinct rollup; no join, no window."""
    from bulker_spark.plans.analytics4 import events_ab_arms

    df = events_ab_arms(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert audit.has_partial_aggregate(df)
    # countDistinct expand: ≤3 exchanges (partial/distinct/final merge)
    assert audit.exchange_count(df) <= 3, plan


def test_label_centroids_partial_agg_in_scan_stage(spark):
    """posexplode fans out inside the scan stage and the aggregation
    partial-sums before its single exchange — vectors never shuffle."""
    from bulker_spark.plans.analytics4 import emb_label_centroids

    df = emb_label_centroids(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert audit.has_partial_aggregate(df), plan
    assert "Join" not in plan
    # one hash exchange (the (label, pos) agg) + the presentation sort
    assert audit.exchange_count(df) <= 2, plan
    assert audit.pruned_to(df, 2), audit.read_schemas(df)


def test_mixture_temperature_constant_tail(spark):
    """One lang-keyed aggregation with map-side partials; the
    normalization window runs over |langs| rows (single partition is
    fine at that size)."""
    from bulker_spark.plans.analytics4 import doc_mixture_temperature

    df = doc_mixture_temperature(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert audit.has_partial_aggregate(df), plan
    assert "Join" not in plan
    assert audit.pruned_to(df, 2), audit.read_schemas(df)  # lang, text


def test_pq_codebook_in_row_no_joins(spark):
    """r08: PQ encoding computes the per-(vec, m) argmin IN-ROW over the
    collected codebook literals — no codebook join, no rank-1 window; the
    only exchanges are the (m, code) aggregation (with map-side partials)
    and the presentation sort. A join or window reappearing here is a
    100 TB regression (it would reshuffle every subvector per centroid)."""
    from bulker_spark.plans.analytics7 import emb_pq_codebooks

    df = emb_pq_codebooks(spark, SF)
    plan = audit.explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert audit.has_partial_aggregate(df), plan
    assert audit.exchange_count(df) <= 2, plan


def test_pq_adc_distance_table_broadcasts(spark):
    """ADC search: the in-row distance table (r08) leaves exactly one
    join — the broadcast lookup of the query distance table against the
    candidate codes; the candidate side must never shuffle to meet it."""
    from bulker_spark.plans.analytics7 import emb_pq_adc_topk

    df = emb_pq_adc_topk(spark, SF)
    assert audit.broadcast_join_count(df) >= 1, audit.explain_str(
        df, "simple"
    )
    assert audit.sortmerge_join_count(df) == 0, audit.explain_str(
        df, "simple"
    )


def test_pq_ivf_fuse_routes(spark):
    """r09: the PQ scan fuse is size-routed (spark.bulker.pqfuse.mode).
    The FUSED route (the 100 TB shape) must keep: zero corpus-scale
    joins (no SortMergeJoin/ShuffledHashJoin), and — the r08
    12x-regression guard (ADVICE r08) — no inferred ``size(``-filter
    re-inlining the in-row encode into scan DataFilters (the
    InferFiltersFromGenerate + alias-substitution disease; explode_outer
    is what keeps it off). The JOIN route (bench scale) must produce
    identical rows. Both shapes pinned here; both strict-oracled."""
    from bulker_spark.plans.analytics7 import (
        emb_pq_ivf_adc,
        emb_pq_ivf_residual,
    )

    prev = spark.conf.get("spark.bulker.pqfuse.mode", None)
    try:
        for fn in (emb_pq_ivf_adc, emb_pq_ivf_residual):
            spark.conf.set("spark.bulker.pqfuse.mode", "fused")
            df = fn(spark, SF)
            plan = audit.explain_str(df, "formatted")
            assert audit.sortmerge_join_count(df) == 0, plan
            assert "ShuffledHashJoin" not in plan, plan
            assert "size(" not in plan, (
                "inferred size()-filter re-inlined the PQ encode "
                "(InferFiltersFromGenerate regression)"
            )
            # the Generate (codes explode) must sit BELOW the broadcast
            # probe join so the encode runs once per corpus row, not
            # once per match
            gen = plan.index("Generate")
            bhj = plan.index("BroadcastHashJoin")
            assert gen > bhj, "explode is above the broadcast joins"
            fused_rows = sorted(map(tuple, df.collect()))

            spark.conf.set("spark.bulker.pqfuse.mode", "join")
            dfj = fn(spark, SF)
            jplan = audit.explain_str(dfj, "formatted")
            assert "size(" not in jplan, jplan
            assert fused_rows == sorted(map(tuple, dfj.collect()))
    finally:
        if prev is None:
            spark.conf.unset("spark.bulker.pqfuse.mode")
        else:
            spark.conf.set("spark.bulker.pqfuse.mode", prev)


def test_contamination_scan_prunes_to_text(spark):
    """The shingle pass reads only (doc_id, text); partial aggregation
    runs before the per-doc shuffle."""
    from bulker_spark.plans.analytics7 import doc_contamination

    df = doc_contamination(spark, SF)
    assert audit.pruned_to(df, 2), audit.read_schemas(df)
    assert audit.has_partial_aggregate(df), audit.explain_str(df, "simple")


def test_length_deciles_histogram_collapse(spark):
    """Exact quantiles off the (lang, n_chars) HISTOGRAM (r08, routed
    past the spark.bulker.lowcard size threshold): the corpus collapses
    in a map-side partial aggregate before any exchange — no
    corpus-scale per-lang sort (the row_number form put 1/|langs| of the
    corpus in one window task), no join, and the scan reads only
    (lang, n_chars). Below the threshold (`auto` on test data) the
    naive keyed-sort shape must come back — both shapes pinned."""
    from bulker_spark.plans.analytics7 import doc_length_deciles

    prev = spark.conf.get("spark.bulker.lowcard.mode", None)
    try:
        spark.conf.set("spark.bulker.lowcard.mode", "histogram")
        df = doc_length_deciles(spark, SF)
        plan = audit.explain_str(df, "simple")
        assert "Join" not in plan
        assert audit.has_partial_aggregate(df), plan
        assert "row_number" not in plan
        assert audit.pruned_to(df, 2), audit.read_schemas(df)

        spark.conf.set("spark.bulker.lowcard.mode", "auto")
        naive = doc_length_deciles(spark, SF)  # tiny corpus → window
        nplan = audit.explain_str(naive, "simple")
        assert "row_number" in nplan, nplan
        # identical values either way
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, naive.collect())
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.bulker.lowcard.mode")
        else:
            spark.conf.set("spark.bulker.lowcard.mode", prev)
