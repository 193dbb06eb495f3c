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

  /** Hilbert-curve clustering key for two bucketed dimensions (the
    * classic xy2d walk, Hilbert 1891 via the bit-level formulation in
    * Warren's Hacker's Delight §16): like [[zorderKey2]] it linearizes
    * a 2-D bucket grid so range-clustering gives every row group a
    * tight bounding box in BOTH dimensions — but the Hilbert walk
    * never takes the Morton curve's long diagonal jumps, so adjacent
    * key ranges are adjacent CELLS, which at 100 TB means box queries
    * touch fewer row groups for the same file count (the property
    * Databricks added liquid clustering for).
    *
    * Built as `bits` chained projections (quadrant bit, rotation,
    * reflection — all integer when/bitwise ops): each round's (x, y, d)
    * are NAMED columns, so the plan is a linear projection chain rather
    * than an exponentially-duplicated expression tree, and every round
    * is exact long arithmetic the oracle replays as chained CTEs.
    * Inputs must be pre-bucketed into [0, 2^bits).
    */
  def withHilbertKey2(df: DataFrame, x: Column, y: Column, bits: Int,
                      out: String): DataFrame = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    var cur = df.withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur.withColumn("__rx", rx).withColumn("__ry", ry)
      val nx = when(col("__ry") === 1, col("__hx"))
        .otherwise(when(col("__rx") === 1, lit(s - 1) - col("__hy"))
          .otherwise(col("__hy")))
      val ny = when(col("__ry") === 1, col("__hy"))
        .otherwise(when(col("__rx") === 1, lit(s - 1) - col("__hx"))
          .otherwise(col("__hx")))
      cur = cur
        .withColumn("__hd", col("__hd") +
          lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        .withColumn("__nx", nx).withColumn("__ny", ny)
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny")
    }
    cur.withColumn(out, col("__hd"))
      .drop("__hx", "__hy", "__hd", "__rx", "__ry")
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

  /** Clustering-depth advisor (the Iceberg/Delta OPTIMIZE decision
    * metric): simulate writing the table as `nFiles` range-clustered
    * files under each CANDIDATE sort key, take per-file [min, max] of
    * the PROBE column, and report the average/max file-range overlap
    * depth — "a point predicate on the probe column must open this
    * many files". Depth ≈ 1 means the candidate key clusters the probe
    * perfectly (file skipping works); depth ≈ nFiles means every file
    * must be read and re-clustering pays for itself. The number that
    * decides zo1-style rewrites BEFORE paying for them.
    *
    * Determinism: file assignment is `ntile(nFiles)` over the total
    * (key, id) order; overlap counts are exact integers; avg depth is
    * one integer micro-division. Scale: the gate form's global ntile
    * is the semantics; production uses `repartitionByRange`'s sampled
    * boundaries ([[clusteredWrite]]) and reads [min, max] straight
    * from parquet footers — the report is then footer-only, O(files²)
    * on file COUNT, no data pass at all.
    */
  def clusteringDepthReport(df: DataFrame,
                            candidates: Seq[(String, Column)],
                            probeCol: String, idCol: Column,
                            nFiles: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val legs = candidates.map { case (name, key) =>
      val filed = df.select(key.as("k"), col(probeCol).as("p"), idCol.as("id"))
        .withColumn("f", ntile(nFiles).over(
          Window.orderBy(col("k"), col("id"))))
      val ranges = filed.groupBy("f")
        .agg(min("p").as("lo"), max("p").as("hi"))
      val depth = ranges.as("x").join(ranges.as("y"),
          col("x.lo") <= col("y.hi") && col("y.lo") <= col("x.hi"))
        .groupBy(col("x.f").as("f"))
        .agg(count(lit(1)).cast("long").as("d"))
      depth.agg(count(lit(1)).cast("long").as("n_files"),
          sum("d").cast("long").as("sd"),
          max("d").as("max_depth"), min("d").as("min_depth"))
        .select(lit(name).as("sort_key"), col("n_files"),
          expr("(sd * 1000000L) div n_files").as("avg_depth_micro"),
          col("max_depth"), col("min_depth"))
    }
    legs.reduce(_ unionByName _)
  }

  /** The consistent-hash ring for `n` shards × `vnodes` virtual nodes:
    * (position, shard) points, position = the 60-bit fold of
    * `md5("shard-<s>:v<v>")` — the same md5Hash60 domain the engine
    * hashes keys into, computed driver-side so the identical literals
    * serialize into both the Spark plan and the oracle SQL.
    */
  def hashRing(n: Int, vnodes: Int = 16): Seq[(Long, Int)] =
    (for { s <- 0 until n; v <- 0 until vnodes } yield {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard-$s:v$v".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16), s)
    }).sortBy(_._1)

  /** Shard-rebalance audit, mod-hash vs consistent-hash (Karger et al.
    * STOC'97): assign every key to shards under BOTH schemes at
    * `fromShards` and `toShards`, emit per-scheme shard counts plus the
    * two moved-key totals. The planning number this exists for: growing
    * n→n+1 moves ~n/(n+1) of a mod-hashed corpus (a near-total
    * reshuffle at 100 TB) but only ~1/(n+1) of a ring-hashed one —
    * this op measures the actual ratio on the actual key population,
    * and the per-shard counts show the ring's vnode-smoothed balance.
    *
    * Scale: assignment is ONE in-row pass (ring = a sorted plan-time
    * literal array; successor search an integer fold over n·vnodes
    * entries); the only shuffles are the 4 shard-count rollups.
    * Determinism: positions and key hashes share the md5Hash60 domain;
    * successor distance is an exact integer mod — no ties (positions
    * are distinct), no floats.
    */
  def consistentHashRebalance(keys: DataFrame, fromShards: Int = 8,
                              toShards: Int = 9, vnodes: Int = 16,
                              idCol: String = "doc_id"): DataFrame = {
    val M = 1L << 60
    val h = Dedup.md5Hash60(col(idCol).cast("string"))
    def ringAssign(r: Seq[(Long, Int)]): Column =
      aggregate(typedlit(r),
        struct(lit(Long.MaxValue).as("d"), lit(-1).as("s")),
        (acc, e) => {
          val dist = pmod(e.getField("_1") - h + lit(M), lit(M))
          when(dist < acc.getField("d"),
            struct(dist.as("d"), e.getField("_2").as("s"))).otherwise(acc)
        }).getField("s")
    val assigned = keys.select(col(idCol),
        pmod(h, lit(fromShards.toLong)).cast("int").as("mod_from"),
        pmod(h, lit(toShards.toLong)).cast("int").as("mod_to"),
        ringAssign(hashRing(fromShards, vnodes)).as("ring_from"),
        ringAssign(hashRing(toShards, vnodes)).as("ring_to"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val counts = Seq("mod_from", "mod_to", "ring_from", "ring_to").map { c =>
      assigned.groupBy(col(c).as("shard"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(c).as("scheme"), col("shard"), col("n_docs"))
    }.reduce(_ unionByName _)
    val moved = assigned.agg(
        sum(when(col("mod_from") =!= col("mod_to"), 1L).otherwise(0L))
          .cast("long").as("mm"),
        sum(when(col("ring_from") =!= col("ring_to"), 1L).otherwise(0L))
          .cast("long").as("rm"))
      .select(explode(array(
        struct(lit("moved_mod").as("scheme"), lit(-1).as("shard"),
          col("mm").as("n_docs")),
        struct(lit("moved_ring").as("scheme"), lit(-1).as("shard"),
          col("rm").as("n_docs")))).as("r"))
      .select(col("r.scheme"), col("r.shard"), col("r.n_docs"))
    counts.unionByName(moved)
  }
}
