"""Plan-shape regression tests (SURVEY §4): the properties that decide
100×-scale behavior — scan pushdown, column pruning, broadcast vs
nested-loop strategy, exchange counts — pinned so a refactor can't
silently regress them."""

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    from prohap_spark.queries import queries

    return queries()


def test_scan_pushdown_and_pruning(spark, qs):
    from prohap_spark.plans import pushed_filters, read_schema_columns

    df = qs["s1_scan_pushdown_projection"](spark, SF)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf)
    assert any("l_discount" in f for f in pf)
    # 11-column table, scan reads only the 5 referenced columns
    (cols,) = read_schema_columns(df)
    assert len(cols) <= 5


def test_q1_partial_aggregation_single_shuffle(spark, qs):
    from prohap_spark.plans import plan_report

    rep = plan_report(qs["q1_pricing_summary"](spark, SF))
    assert rep["exchanges"] <= 2  # partial→final agg, nothing else
    (cols,) = rep["scan_columns"]
    assert len(cols) == 7  # 7 of 11 columns


def test_star_join_broadcasts_dims(spark, qs):
    from prohap_spark.plans import plan_report

    rep = plan_report(qs["j3_star_dim_join"](spark, SF))
    assert rep["broadcast_joins"] >= 2
    assert rep["sortmerge_joins"] == 0
    assert rep["bnl_joins"] == 0


def test_binned_interval_join_avoids_nested_loop(spark, qs):
    """THE J1 property: the binned rewrite must plan as a hash equi-join,
    not the BroadcastNestedLoopJoin a naive range predicate produces."""
    from prohap_spark.plans import plan_report

    rep = plan_report(qs["j1_interval_join_binned"](spark, SF))
    assert rep["bnl_joins"] == 0
    assert rep["broadcast_joins"] + rep["sortmerge_joins"] >= 1


def test_lsh_ann_avoids_cross_join(spark, qs):
    from prohap_spark.plans import plan_report

    brute = plan_report(qs["sim_bruteforce_topk"](spark, SF))
    ann = plan_report(qs["sim_lsh_ann"](spark, SF))
    assert brute["bnl_joins"] >= 1  # the baseline IS a cross join
    assert ann["bnl_joins"] == 0  # the scale path must not be


def test_kernel_is_single_python_stage(spark):
    """The U1-U3 kernel must appear as exactly one Python stage with no
    groupBy shuffle feeding it (mapInPandas design)."""
    from pyspark.sql import functions as F

    from prohap_spark.kernels.spark_kernels import annotate_items
    from prohap_spark.plans import formatted_plan, plan_report

    df = spark.createDataFrame(
        [("T1", "i1", "+", [{"start": 1, "end": 30}], 1, "ATGAAA", [])],
        "transcript_id string, item_id string, strand string, "
        "exons array<struct<start:long,end:long>>, start_codon long, "
        "cdna string, changes array<struct<pos:long,ref:string,alt:string,vcf_id:string>>",
    )
    out = annotate_items(df)
    rep = plan_report(out)
    assert rep["python_stages"] == 1
    assert "Exchange" not in formatted_plan(out)


def test_dedup_exact_single_exchange(spark, qs):
    from prohap_spark.plans import plan_report

    rep = plan_report(qs["dedup_exact_docs"](spark, SF))
    assert rep["exchanges"] <= 1
