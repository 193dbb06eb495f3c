package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.TestSpark

/** Z-order layout: key correctness against a reference Morton
  * implementation, and the actual data-skipping claim proven on real
  * parquet footers — the z-clustered layout must leave most row groups
  * with bounding boxes DISJOINT from a 2-D box predicate, where the
  * single-column linear layout cannot prune the second dimension at
  * all.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var r = 0L
    var b = 0
    while (b < bits) {
      r |= ((x >> b) & 1L) << (2 * b)
      r |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    r
  }

  test("zorderKey2 matches the reference Morton interleave") {
    import spark.implicits._
    val pairs = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", Layout.zorderKey2(col("x"), col("y"), bits = 8))
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) -> r.getAs[Long]("z"))
      .toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 8), s"morton($x,$y)")
    }
  }

  /** Per row group: (min, max) of each requested column, straight from
    * the parquet footers the reader's stats pruning consults.
    */
  private def rowGroupBounds(dir: String, cols: Seq[String]): Seq[Map[String, (Long, Long)]] = {
    val files = new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        cols.map { c =>
          val cc = b.getColumns.asScala.find(_.getPath.toDotString == c)
            .getOrElse(fail(s"column $c missing from footer"))
          val st = cc.getStatistics
          c -> (st.genericGetMin.asInstanceOf[Number].longValue(),
                st.genericGetMax.asInstanceOf[Number].longValue())
        }.toMap
      } finally rd.close()
    }
  }

  private def overlapping(groups: Seq[Map[String, (Long, Long)]],
                          box: Map[String, (Long, Long)]): Int =
    groups.count { g =>
      box.forall { case (c, (lo, hi)) =>
        val (mn, mx) = g(c)
        mx >= lo && mn <= hi
      }
    }

  test("z-order clustering skips most row groups for a 2-D box; linear layout cannot") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    // normalize both dims onto [0, 256) equi-depth buckets, then Morton
    val bx = Layout.quantileBucketizer(li, "l_partkey", 256)
    val by = Layout.quantileBucketizer(li, "l_suppkey", 256)
    val zkey = Layout.zorderKey2(bx, by, bits = 8)

    val linDir = "/tmp/graft_layout/linear"
    val zDir = "/tmp/graft_layout/zorder"
    Layout.clusteredWrite(li, col("l_partkey"), linDir, nFiles = 16)
    Layout.clusteredWrite(li, zkey, zDir, nFiles = 16)

    // both layouts hold identical data
    val a = spark.read.parquet(linDir)
    val b = spark.read.parquet(zDir)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // a narrow box on the SECOND dimension only: suppkey in [1, 12].
    // The linear layout (clustered by partkey) has no suppkey locality:
    // every row group's suppkey range spans the domain, so stats
    // pruning keeps ~all groups. The z-layout bounds both dims.
    val boxCols = Seq("l_suppkey", "l_partkey")
    val linGroups = rowGroupBounds(linDir, boxCols)
    val zGroups = rowGroupBounds(zDir, boxCols)
    assert(linGroups.size >= 8 && zGroups.size >= 8, "need enough row groups to prune")
    val box = Map("l_suppkey" -> (1L, 12L))
    val linHit = overlapping(linGroups, box)
    val zHit = overlapping(zGroups, box)
    assert(linHit >= linGroups.size * 3 / 4,
      s"linear layout unexpectedly pruned the 2nd dim: $linHit/${linGroups.size}")
    assert(zHit * 2 <= zGroups.size,
      s"z-order should skip at least half the row groups: hit $zHit/${zGroups.size}")
  }

  test("hilbert key: bijective on the grid; every consecutive cell pair adjacent") {
    val s = spark
    import s.implicits._
    val grid = (for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)).toDF("x", "y")
    val keyed = Layout.withHilbertKey2(grid, col("x"), col("y"), bits = 3, out = "d")
      .collect().map(r => (r.getAs[Long]("d"), (r.getInt(0), r.getInt(1))))
    assert(keyed.map(_._1).distinct.length === 64)
    assert(keyed.map(_._1).min === 0L && keyed.map(_._1).max === 63L)
    // THE Hilbert property (and what Morton lacks): walking the key
    // order never jumps — consecutive keys are manhattan-adjacent cells
    val byD = keyed.sortBy(_._1).map(_._2)
    byD.zip(byD.tail).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"cells ($x1,$y1)->($x2,$y2) not adjacent — not a Hilbert walk") }
    // base-quadrant orientation of the classic U
    val base = Layout.withHilbertKey2(
        Seq((0, 0), (0, 1), (1, 1), (1, 0)).toDF("x", "y"),
        col("x"), col("y"), bits = 1, out = "d").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getAs[Long]("d"))).toMap
    assert(base === Map((0, 0) -> 0L, (0, 1) -> 1L, (1, 1) -> 2L, (1, 0) -> 3L))
  }

  test("consistentHashRebalance: ring moves far fewer keys than mod at n→n+1") {
    val s = spark
    import s.implicits._
    val keys = (1L to 2000L).map(i => s"key-$i").toDF("doc_id")
    val out = Layout.consistentHashRebalance(keys).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val movedMod = out.find(_._1 == "moved_mod").get._3
    val movedRing = out.find(_._1 == "moved_ring").get._3
    // mod 8→9 relocates ~8/9 of keys; the ring only ~1/9 (vnode noise
    // aside) — the whole reason the ring exists
    assert(movedMod > 1500, s"mod-hash moved only $movedMod of 2000")
    assert(movedRing * 3 < movedMod,
      s"ring moved $movedRing vs mod $movedMod — expected a ≥3x gap")
    // every scheme's shard counts conserve the corpus
    Seq("mod_from", "mod_to", "ring_from", "ring_to").foreach { sch =>
      assert(out.filter(t => t._1 == sch && t._2 >= 0).map(_._3).sum === 2000L,
        s"$sch does not conserve keys") }
  }

  test("clusteringDepthReport: probe-aligned key gives depth 1, orthogonal key gives depth nFiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // p cycles 0..9 as id grows: sorting by id leaves every file with
    // the full p range (depth = nFiles); sorting by p packs ranges
    // disjointly (depth = 1, up to the ntile boundary rows)
    val df = (0L until 400L).map(i => (i, i % 10)).toDF("id", "p")
    val rep = Layout.clusteringDepthReport(df,
        Seq(("by_p", col("p")), ("by_id", col("id"))),
        probeCol = "p", idCol = col("id"), nFiles = 8)
      .collect().map(r => r.getAs[String]("sort_key") -> r).toMap
    assert(rep("by_id").getAs[Long]("avg_depth_micro") === 8000000L)
    // interior files share BOTH endpoint values with their neighbors
    // (a p-value spans a file boundary), so depth peaks at 3, never 8
    assert(rep("by_p").getAs[Long]("max_depth") <= 3L)
    assert(rep("by_p").getAs[Long]("min_depth") >= 1L)
    assert(rep("by_p").getAs[Long]("avg_depth_micro") <
      rep("by_id").getAs[Long]("avg_depth_micro") / 2)
  }
}
