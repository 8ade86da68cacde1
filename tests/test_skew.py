"""Salted join: result-equivalence with the plain join + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rustic_witcher_spark.operators.skew import salted_join


def _fixtures(spark):
    # skewed: 90% of fact rows carry key 1
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else i, float(i)) for i in range(1000)], ["row_id", "k", "v"]
    )
    dim = spark.createDataFrame([(k, f"name_{k}") for k in range(0, 1000, 10)] + [(1, "name_1")], ["k", "name"])
    return fact, dim

def test_salted_join_equals_plain_join(spark):
    fact, dim = _fixtures(spark)
    plain = {tuple(r) for r in fact.join(dim, ["k"]).select("row_id", "k", "v", "name").collect()}
    salted = {tuple(r) for r in salted_join(fact, dim, ["k"], n_salts=8).select("row_id", "k", "v", "name").collect()}
    assert salted == plain and plain


def test_salted_left_join_keeps_unmatched(spark):
    fact, dim = _fixtures(spark)
    plain = {tuple(r) for r in fact.join(dim, ["k"], "left").select("row_id", "name").collect()}
    salted = {tuple(r) for r in salted_join(fact, dim, ["k"], n_salts=4, how="left").select("row_id", "name").collect()}
    assert salted == plain


def test_salt_is_deterministic_across_runs(spark):
    fact, dim = _fixtures(spark)
    a = salted_join(fact, dim, ["k"], n_salts=8)
    b = salted_join(fact.repartition(7), dim, ["k"], n_salts=8)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_salted_join_spreads_hot_key(spark):
    fact, dim = _fixtures(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)).cast("int")
    n_buckets = fact.filter(F.col("k") == 1).select(salt.alias("s")).distinct().count()
    assert n_buckets == 8  # the hot key's 900 rows land in all 8 salt buckets


def test_aqe_skew_join_splits_hot_partition(spark):
    """The SCALE.md claim that AQE skew-join handles skewed PKs,
    demonstrated: with test-scaled thresholds, a 90%-hot-key
    sort-merge join's final adaptive plan shows the hot partition
    split (SortMergeJoin(skew=true) / AQEShuffleRead skewed) AND the
    result is exact."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        fact = spark.range(300000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise((F.col("id") % 200) + 2)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string"), F.lit("x" * 64)).alias("p"),
        )
        dim = spark.range(1, 302).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
        )
        j = fact.join(dim, "k")
        rows = j.collect()  # finalizes THIS DataFrame's adaptive plan
        assert len(rows) == 300000  # every fact row matched exactly once
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the hot partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_converts_sort_merge_to_broadcast_at_runtime(spark, tmp_path):
    """The other AQE re-plan the 100 TB story leans on: with the
    broadcast threshold pinned BELOW the dim's file size, the static
    plan is a sort-merge join (asserted on the pre-execution plan —
    without this assertion the test is vacuous); the dim's tiny
    post-filter runtime size then converts it to a BroadcastHashJoin
    in the final adaptive plan."""
    from pyspark.sql import functions as F

    spark.range(200000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 1000).alias("sel"),
    ).write.parquet(str(tmp_path / "dim"))
    spark.range(500000).select(
        (F.col("id") % 200000).alias("k"), F.col("id").alias("x")
    ).write.parquet(str(tmp_path / "fact"))

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")  # 64KB < dim file
        fact = spark.read.parquet(str(tmp_path / "fact"))
        dim = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("sel") == 7)  # 200 rows live
        j = fact.join(dim, "k").agg(F.count(F.lit(1)).alias("n"))
        initial = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in initial, "setup broken: static plan must be SMJ"
        [row] = j.collect()
        assert row["n"] == 500  # 200 dim keys x ~2.5 fact rows each
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the adaptive plan string carries BOTH sections; judge only the
        # final one (the initial section legitimately keeps the SMJ)
        final = plan.split("== Initial Plan ==")[0]
        assert "BroadcastHashJoin" in final and "SortMergeJoin" not in final
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
