package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated test tables
  * (see /root/repo/TESTDATA.md). All engine code receives DataFrames;
  * this is the only place that knows the on-disk layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
