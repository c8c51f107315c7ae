"""Salting helpers must be result-equivalent to their plain forms on a
deliberately skewed dataset (one key holding half the rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covsonar_spark.operators.skew import salted_collect_list, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(50_000).select(
        F.lit(7).alias("k"), (F.col("id") * 3).alias("v"))
    cold = spark.range(50_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold).cache()


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(997).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label"))
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, "k", n_salt=8).groupBy("k", "label").count()
    a = {(r["k"], r["label"]): r["count"] for r in plain.collect()}
    b = {(r["k"], r["label"]): r["count"] for r in salted.collect()}
    assert a == b


def test_salted_collect_list_equals_plain(spark, skewed):
    plain = {r["k"]: sorted(r["vs"]) for r in
             skewed.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()}
    salted = {r["k"]: sorted(r["v_list"]) for r in
              salted_collect_list(skewed, "k", "v", n_salt=8).collect()}
    assert salted == plain
    # the hot key's state actually spread: >1 distinct salt produced it
    n = skewed.where("k = 7").withColumn(
        "_s", F.pmod(F.xxhash64("v"), F.lit(8))).select("_s").distinct().count()
    assert n > 1
