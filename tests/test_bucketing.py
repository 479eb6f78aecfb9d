"""Bucketed co-located join: the plan must contain NO shuffle Exchange.

This is the 100 TB design claim made concrete: with both sides bucketed on
the join key at the same bucket count, sort-merge join reads bucket files
directly.  Broadcast is disabled for the assertion so the no-Exchange plan
can only come from bucketing.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.plans.bucketing import (
    bucketed_join, write_bucketed)

SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest "
              f"LOCATION '{tmp_path}/bktest'")
    o = spark.read.parquet(f"{SF001}/orders.parquet")
    c = spark.read.parquet(f"{SF001}/customer.parquet")
    write_bucketed(o, "bktest.orders_b", "o_custkey", 8,
                   path=f"{tmp_path}/orders_b")
    write_bucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
                   "bktest.customer_b", "o_custkey", 8,
                   path=f"{tmp_path}/customer_b")
    yield "bktest.orders_b", "bktest.customer_b"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # same answer as the plain (shuffling) join
        o = spark.read.parquet(f"{SF001}/orders.parquet")
        c = (spark.read.parquet(f"{SF001}/customer.parquet")
             .withColumnRenamed("c_custkey", "o_custkey"))
        assert j.count() == o.join(c, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join over raw parquet must shuffle (so the
    no-Exchange assertion above is meaningful)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF001}/orders.parquet")
        c = (spark.read.parquet(f"{SF001}/customer.parquet")
             .withColumnRenamed("c_custkey", "o_custkey"))
        plan = (o.join(c, "o_custkey")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
