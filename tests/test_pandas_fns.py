"""Arrow pandas-UDF reference instances (SURVEY §2.8 U1/U2)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datalake_ingestion_system_spark.functions.pandas_fns import (
    geo_mean, sigmoid)


def test_sigmoid_scalar_udf(spark):
    out = (spark.range(-2, 3)
           .select(F.col("id").cast("double").alias("x"))
           .select("x", sigmoid("x").alias("s"))
           .orderBy("x").collect())
    for r in out:
        assert abs(r.s - 1 / (1 + math.exp(-r.x))) < 1e-12
    assert out[2].s == 0.5


def test_geo_mean_grouped_agg(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("b", 7.0)], "g string, v double")
    got = {r.g: r.m for r in
           df.groupBy("g").agg(geo_mean("v").alias("m")).collect()}
    assert abs(got["a"] - 10.0) < 1e-9   # sqrt(1*100)
    assert abs(got["b"] - 7.0) < 1e-9
