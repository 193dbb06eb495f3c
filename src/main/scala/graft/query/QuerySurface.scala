package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's Athena read surface, re-expressed as plain DataFrame
  * ops — no Athena/CSV materialization hop (athena.py:29-88), results
  * stay distributed.
  */
object QuerySurface {

  /** `SELECT COUNT(*) as n_rows FROM t` (athena.py:75-81 = A1). */
  def countRows(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))

  /** `SELECT DISTINCT account FROM t` (data_faker.py:64-68 = A2). */
  def distinctValues(df: DataFrame, column: String): DataFrame =
    df.select(column).distinct()

  /** `SELECT * FROM t LIMIT n` preview (athena.py:83-86 = O2), made
    * deterministic with an explicit sort.
    */
  def preview(df: DataFrame, orderCol: String, n: Int): DataFrame =
    df.orderBy(col(orderCol)).limit(n)

  /** Latest-k rows of one key, descending range key — the DynamoDB
    * `Query(hash_key, scan_index_forward=False, limit=k)` pattern
    * (data_faker.py:105-111 = S8/O3).
    */
  def latestOfKey(df: DataFrame, keyCol: String, key: String,
                  rangeCol: String, k: Int): DataFrame =
    df.filter(col(keyCol) === key).orderBy(col(rangeCol).desc).limit(k)

  /** The compare() oracle (compare.py:50-79 = J2): source-of-truth vs
    * lake readback. The reference sorts both sides and zips row-by-row;
    * distributed-first this is two anti-semijoins — no driver collect,
    * no global sort. Returns (rows only in left, rows only in right).
    */
  def compare(source: DataFrame, lake: DataFrame): (DataFrame, DataFrame) =
    (source.exceptAll(lake), lake.exceptAll(source))

  /** Convenience: true iff both relations are multiset-equal. */
  def isEqual(source: DataFrame, lake: DataFrame): Boolean = {
    val (l, r) = compare(source, lake)
    l.isEmpty && r.isEmpty
  }

  /** First-n differing rows, labeled by side — the reference prints the
    * first 10 diffs on mismatch (compare.py:66-79); distributed version
    * via limit, no driver-side zip.
    */
  def diffReport(source: DataFrame, lake: DataFrame, n: Int = 10): DataFrame = {
    val (l, r) = compare(source, lake)
    l.withColumn("side", lit("source_only"))
      .unionByName(r.withColumn("side", lit("lake_only")))
      .limit(n)
  }

  /** Classified snapshot diff: one row per key, labeled added /
    * removed / changed / unchanged, by full-outer-joining the two
    * keyed snapshots and comparing a content hash. The reconciliation
    * REPORT form of [[compare]]: exceptAll says WHETHER the lake
    * drifted, this says per key WHERE and HOW. Both inputs must be
    * unique per key (snapshot shape, e.g. Merge.dedupLatest output).
    *
    * Scale: each side's payload collapses to one 128-bit hash BEFORE
    * the join, so only (key, hash) pairs cross the exchange — never
    * content columns — and the join itself is a plain equi-join on the
    * key. Output is O(keys), streamable to a report sink. Content
    * columns are name-sorted and null-sentineled so the hash is
    * column-order- and null-safe.
    */
  def diffClassify(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, as: String) = {
      val content = df.columns.filterNot(keys.contains).sorted.toSeq
      df.select(keys.map(col) :+ md5(concat_ws("\u001f",
        content.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*)).as(as): _*)
    }
    hashed(source, "h_src").join(hashed(target, "h_tgt"), keys, "full_outer")
      .withColumn("status",
        when(col("h_tgt").isNull, lit("added"))
          .when(col("h_src").isNull, lit("removed"))
          .when(col("h_src") === col("h_tgt"), lit("unchanged"))
          .otherwise(lit("changed")))
  }
}

/** The reference's raw-SQL entry point (`run_athena_query(database,
  * sql)` — athena.py:29-64) re-expressed: register the lake as a view,
  * submit SQL strings, results stay distributed DataFrames (no CSV
  * materialization hop, no polling waiter — SURVEY §2.1 S10/T10 n/a).
  */
object SqlSurface {

  /** Register a lake path under a view name (the "database.table"). */
  def registerLake(spark: org.apache.spark.sql.SparkSession, path: String,
                   view: String = "transactions"): Unit =
    spark.read.parquet(path).createOrReplaceTempView(view)

  /** `run_athena_query` analog: SQL in, DataFrame out. */
  def query(spark: org.apache.spark.sql.SparkSession, sql: String): DataFrame =
    spark.sql(sql)

  /** The two canned queries the reference driver issues
    * (athena.py:75-88): COUNT(*) and an ordered LIMIT preview.
    */
  def countRows(spark: org.apache.spark.sql.SparkSession, view: String): DataFrame =
    spark.sql(s"SELECT COUNT(*) AS n_rows FROM $view")

  def previewSql(spark: org.apache.spark.sql.SparkSession, view: String, n: Int): DataFrame =
    spark.sql(s"SELECT * FROM $view ORDER BY id LIMIT $n")
}
