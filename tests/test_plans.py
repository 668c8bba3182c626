"""Physical-plan invariants for the headline queries.

The 100 TB posture claims in README/BENCH (pushdown, pruning, broadcast
choice, no cartesian blowups, partial aggregation) are asserted here
against the ACTUAL `explain("formatted")` output, so a regression in
plan shape fails the suite even while results stay correct. Plan shape
is checked at sf0.001 — Catalyst's static decisions (pushdown, pruning,
join strategy from parquet size stats) are what we pin; AQE runtime
re-planning only ever improves on them.

tools/plan_audit.py renders the same plans into PLANS.md for human
review.
"""

import pytest

from kapra_timeseries_anonymization_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    fn, _ = REGISTRY[name]
    df = fn(spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def scan_block(plan: str, table: str) -> str:
    """The formatted-plan node block for the parquet scan of `table`."""
    blocks = plan.split("\n\n")
    for b in blocks:
        if "Scan parquet" in b and f"{table}.parquet" in b:
            return b
    raise AssertionError(f"no parquet scan of {table} in plan:\n{plan}")


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    scan = scan_block(plan, "lineitem")
    # the shipdate predicate reaches the parquet reader
    assert "LessThanOrEqual(l_shipdate" in scan, scan
    # column pruning: a 2-measure/2-key/1-filter query must not read the
    # wide remainder of lineitem
    assert "l_comment" not in scan and "l_shipmode" not in scan, scan
    # map-side combine: partial aggregate below the exchange
    assert "partial_sum" in plan, plan
    # exactly one shuffle for a single groupBy
    n_exchanges = sum(
        1 for line in plan.splitlines()
        if line.strip().startswith("(") and line.strip().endswith("Exchange")
    )
    assert n_exchanges == 1, plan


def test_q3_broadcasts_dimension_and_prunes(spark):
    plan = plan_of(spark, "q3_segment_revenue")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scan = scan_block(plan, "lineitem")
    # only join key + two measures from the fact table
    for col in ("l_orderkey", "l_extendedprice", "l_discount"):
        assert col in scan, scan
    assert "l_shipdate" not in scan and "l_comment" not in scan, scan
    cscan = scan_block(plan, "customer")
    assert "c_name" not in cscan and "c_address" not in cscan, cscan


def test_top10_uses_take_ordered(spark):
    plan = plan_of(spark, "q_top10_orders")
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject, never a
    # global sort of the full aggregate
    assert "TakeOrderedAndProject" in plan, plan


def test_rollup_1m_single_shuffle_partial_agg(spark):
    plan = plan_of(spark, "events_rollup_1m")
    assert "partial_" in plan, plan
    n_exchanges = sum(
        1 for line in plan.splitlines()
        if line.strip().startswith("(") and line.strip().endswith("Exchange")
    )
    assert n_exchanges == 1, plan


def test_simhash_no_cartesian(spark):
    plan = plan_of(spark, "doc_simhash_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the banded self-join must be an equi-join
    assert any(j in plan for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), plan


def test_passthrough_scan_is_pruned(spark):
    plan = plan_of(spark, "transcripts_turn_rate_1m")
    scan = scan_block(plan, "events")
    # turn-rate needs (user_id, ts, event_id) for the stable turn order +
    # role; the text/tool inputs (value, event_type, props) must be pruned
    # through the derivation's select
    assert "props" not in scan, scan
    assert "value" not in scan, scan


def test_stratified_sample_narrow_no_shuffle(spark):
    plan = plan_of(spark, "doc_stratified_sample")
    scan = scan_block(plan, "documents")
    # the wide text column must be pruned out of the scan
    assert "text" not in scan, scan
    # hash-threshold sampling is one narrow projection+filter: no shuffle
    assert "Exchange" not in plan, plan


def test_whole_stage_codegen_on_relational_core(spark):
    # codegen spans are the `*(n)` prefixes; under AQE they only appear
    # in the FINAL plan, so execute first
    for name in ("q1_pricing_summary", "q3_segment_revenue",
                 "events_latency_stats"):
        fn, _ = REGISTRY[name]
        df = fn(spark, SF)
        df.collect()
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        assert "isFinalPlan=true" in plan, (name, plan)
        assert "*(" in plan, (name, plan)
