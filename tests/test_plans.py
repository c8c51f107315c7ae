"""plans.plan_report: structured plan facts match known plan shapes."""

from __future__ import annotations

from covsonar_spark.plans import plan_report
from covsonar_spark.registry import REGISTRY

SF = "/root/testdata/sf0.01"


def test_report_on_star_join(spark):
    spark.catalog.clearCache()
    r = plan_report(REGISTRY["q5_local_supplier_volume"][0](spark, SF))
    assert r.broadcast_hash_joins >= 3
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    assert r.scan_count("lineitem") == 1
    assert r.python_free


def test_report_on_scan_agg(spark):
    r = plan_report(REGISTRY["q6_forecast_revenue"][0](spark, SF))
    assert r.wide_exchanges == 0          # pure scan-agg, zero shuffles
    assert r.pushed_filters and any("l_shipdate" in f for f in r.pushed_filters)


def test_report_counts_python_stages(spark):
    r = plan_report(REGISTRY["dedup_minhash_lsh"][0](spark, SF))
    assert not r.python_free              # the minhash shingle stage
    r2 = plan_report(REGISTRY["q1_pricing_summary"][0](spark, SF))
    assert r2.python_free


def test_report_topk_and_window(spark):
    r = plan_report(REGISTRY["q18_large_orders"][0](spark, SF))
    assert r.top_k >= 1
    rw = plan_report(REGISTRY["window_rank_per_group"][0](spark, SF))
    assert rw.windows >= 1
