"""Scale-machinery tests: salted joins are result-identical to plain
joins and actually spread hot keys; bucketed tables join without an
Exchange (the pay-the-shuffle-once layout for recurring fact joins)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dags_spark.io import table
from dags_spark.operators.scale import bucketed_join, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    left = o.withColumnRenamed("o_custkey", "k")
    right = c.withColumnRenamed("c_custkey", "k")
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k").groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_spreads_hot_key(spark):
    # one pathological key with 1000 rows; salts must split it
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "x")], "k INT, attr STRING")
    out = salted_join(hot, dim, "k")
    assert out.count() == 1000
    n_shards = (
        hot.withColumn(
            "__salt", (F.abs(F.xxhash64("k", "payload")) % 8).cast("int")
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_shards == 8, "hot key not spread across salt shards"


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o.withColumnRenamed("o_orderkey", "k"), "t_orders_b", "k", 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "t_lineitem_b", "k", 8)
    # force the non-broadcast path: at 100 TB neither fact side
    # broadcasts — that's exactly when bucketing matters
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it returns the same rows as the plain join
        plain = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_zorder_bits_interleave(spark):
    from dags_spark.operators.scale import zorder_bits

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (1023, 1023)], "a BIGINT, b BIGINT"
    )
    from pyspark.sql import functions as F

    got = [
        r.z for r in df.select(F.expr(zorder_bits("div", "a", "b")).alias("z"))
        .orderBy("a", "b").collect()
    ]
    # z(0,1)=2, z(1,0)=1, z(3,3)=15, z(1023,1023)=2^20-1
    assert got == [2, 1, 15, (1 << 20) - 1]


def test_write_zordered_roundtrip_and_clustering(spark, sf_dir, tmp_path):
    from dags_spark.operators.scale import write_zordered, zorder_bits
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("a"),
        (F.col("o_orderkey") % 1024).alias("b"),
    )
    out = str(tmp_path / "zord")
    write_zordered(o, out, "a", "b", n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # clustering property: per-file z ranges are near-disjoint — the
    # max lower-bound overlap across the 4 range-partitioned files is
    # bounded (range partitioner boundaries are exact).
    z = F.expr(zorder_bits("div", "a", "b"))
    per_file = (
        back.withColumn("f", F.input_file_name()).withColumn("z", z)
        .groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "z-ranges of range-partitioned files must not overlap"
