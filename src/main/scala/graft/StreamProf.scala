package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling main for the streaming fixed-overhead hunt:
  * times each phase of one streaming drain separately.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local()
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    s.read.parquet(s"$d/lineitem.parquet").count()

    // --- empty-stream floor: AvailableNow over one tiny file, no state
    Queries.withStreamShuffle(s) {
      import org.apache.spark.sql.streaming.Trigger
      val one = s.range(10).toDF("v")
      val dir = Queries.scratch("prof_src"); val ck = Queries.scratch("prof_ck")
      one.coalesce(1).write.mode("overwrite").parquet(dir)
      t("floor: 1-batch stateless drain") {
        s.readStream.schema(one.schema).parquet(dir)
          .writeStream.format("noop").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ck)
          .start().awaitTermination()
      }
      val ck2 = Queries.scratch("prof_ck2")
      t("floor: 2nd stateless drain (warm)") {
        s.readStream.schema(one.schema).parquet(dir)
          .writeStream.format("noop").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ck2)
          .start().awaitTermination()
      }
      val ck3 = Queries.scratch("prof_ck3")
      t("floor: stateful drain (dropDup)") {
        s.readStream.schema(one.schema).parquet(dir)
          .dropDuplicates("v")
          .writeStream.format("noop").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ck3)
          .start().awaitTermination()
      }
      val ck4 = Queries.scratch("prof_ck4")
      val src4 = Queries.scratch("prof_src4")
      s.range(40).toDF("v").repartition(4).write.mode("overwrite").parquet(src4)
      t("floor: 4-batch stateful drain") {
        s.readStream.schema(one.schema).option("maxFilesPerTrigger", 1)
          .parquet(src4)
          .dropDuplicates("v")
          .writeStream.format("noop").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ck4)
          .start().awaitTermination()
      }
    }

    // --- mv2 phases
    Queries.withStreamShuffle(s) {
      t("mv2: full query") {
        SparkEntry.queries("mv2_stream_view")(s, d).count()
      }
      t("mv2: full query (2nd)") {
        SparkEntry.queries("mv2_stream_view")(s, d).count()
      }
    }
    t("s9: full query") { SparkEntry.queries("s9_stream_merge_e2e")(s, d).count() }
    t("s9: full query (2nd)") { SparkEntry.queries("s9_stream_merge_e2e")(s, d).count() }
    t("t8: full query") { SparkEntry.queries("t8_stream_latest")(s, d).count() }
    t("t8: full query (2nd)") { SparkEntry.queries("t8_stream_latest")(s, d).count() }
    s.stop()
  }
}
