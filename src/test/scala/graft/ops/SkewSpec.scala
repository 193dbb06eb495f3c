package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin equals the plain join on skewed data") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => ("hot", i)) ++ (1 to 500).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 500).map(i => s"k$i")).zipWithIndex
      .toDF("sk", "attr")
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "v", "attr")
    val salted = Skew.saltedJoin(big, small, "k", "sk")
      .select("k", "v", "attr")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedTopK equals the single-window top-k") {
    import spark.implicits._
    val df = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 200).map(i => (s"k${i % 20}", i)))
      .toDF("k", "v")
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("k"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
    }
    val salted = Skew.saltedTopK(df, "k", col("v").desc, 3)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed join partition at runtime (the no-salt path)") {
    // The division of labor this spec pins down: AQE handles
    // shuffle-join skew ON ITS OWN (this test), so Skew.saltedJoin is
    // reserved for the cases AQE can't touch (e.g. skewed window/topk,
    // above). Thresholds are lowered so local-scale data triggers the
    // same OptimizeSkewedJoin decision a hot key triggers at 100 TB.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 200000).map(i => ("hot", i)) ++ (1 to 2000).map(i => (s"k${i % 97}", i)))
        .toDF("k", "v")
      val right = ((1 to 50).map(i => ("hot", i)) ++ (1 to 97).map(i => (s"k$i", i)))
        .toDF("rk", "attr")
      val joined = big.join(right, col("k") === col("rk"))
        .select(col("v"), col("attr")) // keep the collected payload tiny
      // run THIS Dataset's own QueryExecution — a .count() (or a write)
      // builds a separate execution and leaves this plan unfinalized
      joined.collect()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join, plan:\n${finalPlan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    // InjectRuntimeFilter: with a selective filter on the small side,
    // Spark plants a bloom-filter semi-reduction on the big side's scan
    // — row-level pruning BEFORE the shuffle, the runtime analog of
    // static partition pruning. At 100 TB this is the difference
    // between shuffling the fact table and shuffling the matching rows.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
        .filter(col("p_partkey") % 1000 === 0) // selective build side
      val q = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey").count()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") || optimized.contains("BloomFilterMightContain") ||
        optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter, plan:\n${optimized.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
