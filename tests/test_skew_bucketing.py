"""Skew-salting and bucketed-layout tests: result equivalence + the
plan property each exists for (spread reducers / no exchange)."""

from pyspark.sql import functions as F


def test_salted_aggregate_equals_plain(spark):
    from prohap_spark.operators.skew import salted_aggregate

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    plain = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": (F.count(F.lit(1)), "count"), "s": (F.sum("l_quantity"), "sum")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    from prohap_spark.operators.skew import salted_join

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").limit(5000)
    parts = spark.read.parquet("/root/testdata/sf0.01/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = li.join(parts, "l_partkey").count()
    salted = salted_join(li, parts, ["l_partkey"], n_salts=8).count()
    assert salted == plain > 0


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT a shuffle —
    the scan's bucket layout satisfies the join's distribution."""
    from prohap_spark.plans import plan_nodes
    from prohap_spark.sources.bucketed import read_table, write_bucketed

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 8)
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)

    bl, bo = read_table(spark, "b_lineitem"), read_table(spark, "b_orders")
    joined = bl.join(bo.hint("merge"), bl["l_orderkey"] == bo["o_orderkey"])
    nodes = plan_nodes(joined)
    assert "SortMergeJoin" in nodes
    assert "Exchange" not in nodes  # bucket layout replaces the shuffle
    assert joined.count() > 0


def test_aqe_splits_skewed_join_partition(spark):
    """The 100x story for the binned interval join claims AQE
    skew-splitting handles hot bins. Pin the mechanism itself: a
    deliberately skewed sort-merge equi-join (one key carries ~95% of
    the rows) under lowered AQE skew thresholds must show
    skew=true in the final adaptive plan — i.e. AQE actually split
    the hot partition instead of serializing it through one task."""
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    left = s.range(0, 200_000).select(
        # ~95% of rows on key 0; the rest spread over keys 1-9 (id % 10
        # would be 0 whenever id % 20 is, collapsing EVERYTHING to one
        # key — the degenerate all-one-key case, not a skewed mix)
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise((F.floor(F.col("id") / 20) % 9) + 1)
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = s.range(0, 10).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    joined = left.join(right, "k")
    # execute THIS DataFrame's queryExecution (count() would build a
    # separate aggregate plan and leave the join's adaptive plan
    # unfinalized)
    assert len(joined.collect()) == 200_000
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]


def test_spread_scan_widens_single_split_and_noops_when_parallel(spark):
    """spread_scan: a 1-split input is repartitioned to cluster width
    (identical rows), an already-parallel input is returned AS-IS (no
    exchange added — the 100 TB no-op guarantee)."""
    from prohap_spark.operators.skew import spread_scan

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert docs.rdd.getNumPartitions() == 1  # one row group = one split

    spread = spread_scan(docs, "doc_id")
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # identical multiset of rows
    assert spread.exceptAll(docs).count() == 0
    assert docs.exceptAll(spread).count() == 0

    # already-parallel input: returned unchanged (same plan object)
    wide = docs.repartition(spark.sparkContext.defaultParallelism + 4, "doc_id")
    assert spread_scan(wide, "doc_id") is wide
