package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping — the lakehouse technique that makes
  * a 100 TB table cheap to query on TWO correlated predicates at once.
  *
  * A table range-partitioned and sorted by a single column gives tight
  * parquet row-group min/max stats on that column only; a box predicate
  * on (x, y) still scans every row group for the y side. Interleaving
  * the bits of both dimensions into one Morton key and clustering by it
  * gives every row group a small axis-aligned bounding box in BOTH
  * dimensions, so the reader's row-group-stats pruning skips most of
  * the table for 2-D boxes (LayoutSpec proves the skip on real parquet
  * footers).
  *
  * All pure built-in bit arithmetic — codegen'd, no UDF, no shuffle
  * beyond the one range-exchange that the clustering write itself is.
  */
object Layout {

  /** 2-D Morton key: interleave the low `bits` bits of two non-negative
    * integer columns (x in even positions, y in odd). 16 bits per dim
    * fills 32 output bits — enough resolution for any row-group-level
    * clustering; values must be pre-bucketed into [0, 2^bits).
    */
  def zorderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xs, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(ys, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Equi-depth bucket boundaries for a numeric column, collected once
    * at plan time (approxQuantile — one pass, driver-side literals, the
    * same discipline as the IVF centroid literals): maps an arbitrary
    * numeric dimension onto [0, 2^bits) so it can feed [[zorderKey2]].
    */
  def quantileBucketizer(df: DataFrame, c: String, nBuckets: Int): Column = {
    require(nBuckets > 1, "need at least 2 buckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val splits = df.stat.approxQuantile(c, probs, 0.001).distinct.sorted
    // CASE-chain over literals: codegen'd per-row binary decision list
    splits.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(c) > s, lit(i + 1)).otherwise(acc)
    }
  }

  /** Cluster-write: range-partition by the clustering key into `nFiles`
    * output files, sort within each partition by it, write parquet.
    * With a Morton key this is Z-ORDER OPTIMIZE; with a plain column it
    * is linear clustering — the comparison baseline.
    */
  def clusteredWrite(df: DataFrame, key: Column, outPath: String, nFiles: Int): Unit =
    df.withColumn("__ck", key)
      .repartitionByRange(nFiles, col("__ck"))
      .sortWithinPartitions(col("__ck"))
      .drop("__ck")
      .write.mode("overwrite").parquet(outPath)
}
