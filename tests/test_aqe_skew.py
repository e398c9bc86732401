"""AQE skew-join handling: with a deliberately skewed key and skew
thresholds scaled down to test size, AQE must split the oversized
partition (OptimizeSkewedJoin) and the join result must stay exact."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # r7 split the session thresholds: the adaptive one must be
        # disabled here too, else AQE promotes this SMJ to broadcast
        # from runtime sizes and the skew handler never engages
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        # coalescing first would merge small partitions and mask the skew
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 100k rows, 95% on key 0 -> one partition dwarfs the rest
        # uuid() pad: incompressible, so shuffle-partition byte sizes
        # reflect the row skew (repeat('x',32) compresses to nothing)
        big = spark.range(0, 100_000).select(
            F.expr("CASE WHEN id % 20 != 0 THEN 0 ELSE id END").alias("k"),
            F.expr("uuid()").alias("pad"))
        small = spark.range(0, 5_000).select(
            F.col("id").alias("k"), F.lit(1).alias("v"))
        joined = big.join(small, "k").select("k", "v", "pad")
        # collect the join DF itself so ITS AdaptiveSparkPlan finalizes
        # (count() would execute a separate plan tree)
        n = len(joined.collect())
        # key 0 holds the 95000 non-multiples PLUS id=0 itself; other
        # keys are multiples of 20, matching small iff < 5000
        expected = 95_001 + sum(1 for k in range(20, 100_000, 20) if k < 5_000)
        assert n == expected
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, (
            "AQE did not mark the skewed join:\n" + final_plan[:2000])
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
