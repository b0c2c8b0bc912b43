"""Scale-layout strategies: bucketed co-located joins (zero shuffle
under the join) and salted skew joins (hot key spread over n_salts
partitions, output identical to the plain join)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from trail_condition_etl_spark import catalog, plans
from trail_condition_etl_spark.operators import bucketing, skew

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free_under_the_join(spark):
    df = bucketing.bucketed_join_query(spark, SF)
    plan = plans.formatted_plan(df)
    assert len(re.findall(r"Bucketed: true", plan)) == 2
    # the ONLY exchange is the final aggregation; the join itself reads
    # co-located buckets on both sides
    assert plans.count_exchanges(df) == 1
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark):
    bucketed = {
        (r.o_orderpriority, r.n_items, r.revenue)
        for r in bucketing.bucketed_join_query(spark, SF).collect()
    }
    li = catalog.load_table(spark, SF, "lineitem")
    orders = catalog.load_table(spark, SF, "orders")
    plain = {
        (r.o_orderpriority, r.n_items, r.revenue)
        for r in bucketing.colocated_join(
            li.select("l_orderkey", "l_extendedprice", "l_discount"),
            orders.select("o_orderkey", "o_orderpriority"),
        ).collect()
    }
    assert bucketed == plain


def test_salted_join_parity_with_plain_join(spark):
    events = catalog.load_table(spark, SF, "events")
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    salted = skew.salted_join(events, dim, "user_id", "event_id", n_salts=4)
    plain = events.join(dim, "user_id")
    assert sorted(
        (r.event_id, r.t) for r in salted.select("event_id", "t").collect()
    ) == sorted((r.event_id, r.t) for r in plain.select("event_id", "t").collect())


def test_salt_spreads_hot_key_and_stays_in_range(spark):
    events = catalog.load_table(spark, SF, "events")
    n = 8
    salted = events.withColumn("_salt", skew.salt_column("event_id", n))
    per_key = (
        salted.groupBy("user_id")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .collect()
    )
    # every hot user's rows now span (nearly) all salt values
    assert all(r.n_salts >= n - 1 for r in per_key)
    rng = salted.agg(F.min("_salt"), F.max("_salt")).collect()[0]
    assert rng[0] >= 0 and rng[1] <= n - 1


def test_salted_join_plan_joins_on_key_and_salt(spark):
    events = catalog.load_table(spark, SF, "events")
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    df = skew.salted_join(events, dim, "user_id", "event_id", n_salts=4)
    plan = plans.formatted_plan(df)
    m = re.search(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert m is not None and "_salt" in m.group(1)
    assert not plans.has_single_partition_exchange(df)
