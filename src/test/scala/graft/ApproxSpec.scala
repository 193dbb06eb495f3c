package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the approximate-aggregate family (ag1): sketches
  * have no cross-engine oracle, so their contract is relative error
  * against the exact answers on real data.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val li =
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").cache()

  test("approx_count_distinct stays within 5% of exact per group") {
    val joined = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx=$a exact=$e")
    }
  }

  test("approx_percentile at accuracy 10000 stays within 1% of exact") {
    val got = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.99), 10000)").as("ap"),
        expr("percentile(l_extendedprice, array(0.5, 0.99))").as("ex"))
      .collect()
    got.foreach { r =>
      val ap = r.getSeq[Double](1)
      val ex = r.getSeq[Double](2)
      ap.zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: approx=$a exact=$e")
      }
    }
  }
}
