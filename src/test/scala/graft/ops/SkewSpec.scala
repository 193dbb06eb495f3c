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
}
