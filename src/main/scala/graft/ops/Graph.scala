package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bulk-iterative graph analytics over edge DataFrames — the second
  * graph family beside [[Dedup.connectedComponents]]. PageRank here is
  * the canonical "fixed-point over a static edge partitioning"
  * workload: the edge set is shuffled ONCE, every iteration reuses that
  * partitioning and exchanges only (node, double) pairs.
  */
object Graph {

  /** Directed handoff edges from an event log: src → dst when dst's
    * event immediately follows src's within the same `streamCol`
    * stream (ties broken by `tieCol`), self-loops dropped, pairs
    * deduplicated. One window pass — the same single-exchange shape as
    * [[Sessions.sessionize]].
    */
  def handoffEdges(events: DataFrame, streamCol: String, keyCol: String,
                   tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("src", lag(col(keyCol), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col(keyCol))
      .select(col("src"), col(keyCol).as("dst"))
      .distinct()
  }

  /** PageRank with uniform teleport and dangling-mass redistribution:
    * `pr' = (1−d)/N + d · (Σ_in pr/outdeg + dangling/N)`, run for a
    * FIXED `iterations` (deterministic output — no float-tolerance
    * convergence test an external oracle would have to reproduce).
    *
    * Scale: `edges` (with out-degrees pre-joined) is persisted and
    * hash-partitioned on `src` once; each iteration is (1) one join of
    * the O(nodes) rank table onto that static partitioning, (2) one
    * combinable sum-shuffle of (dst, contribution) pairs, (3) a scalar
    * dangling-mass aggregate broadcast back. Nothing wide ever carries
    * more than (long, double). Each round's rank table is persisted
    * and re-rooted as a LogicalRDD (the [[Dedup.connectedComponents]]
    * lineage cut) so the analyzer's tree stays O(1)-deep.
    */
  def pageRank(edges: DataFrame, iterations: Int = 8,
               damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    def shallow(df: DataFrame): DataFrame = spark.createDataFrame(df.rdd, df.schema)

    val ed = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = ed.groupBy("src").agg(count(lit(1)).cast("double").as("od"))
    // static per-edge state, shuffled once and reused every round
    val edW = ed.join(deg, "src").repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = ed.select(col("src").as("v")).union(ed.select(col("dst").as("v")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count().toDouble

    var pr = shallow(nodes.withColumn("pr", lit(1.0) / lit(n))
      .persist(StorageLevel.MEMORY_AND_DISK))
    var prev: DataFrame = null
    for (_ <- 1 to iterations) {
      val contrib = edW.join(pr, edW("src") === pr("v"))
        .groupBy(col("dst").as("cv"))
        .agg(sum(col("pr") / col("od")).as("contrib"))
      // dangling mass: rank sitting on nodes with no out-edges
      val dangling = pr.join(deg, pr("v") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("mass"))
      val next = nodes
        .join(contrib, nodes("v") === contrib("cv"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("v"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("mass") / lit(n))).as("pr"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      if (prev != null) prev.unpersist()
      prev = pr
      pr = shallow(next)
    }
    pr
  }
}
