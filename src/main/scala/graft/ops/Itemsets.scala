package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining: co-occurring item pairs within baskets with
  * support / confidence / lift — the association-rule primitive behind
  * "parts bought together" audits and, in the corpus world, tag/source
  * co-occurrence analysis.
  */
object Itemsets {

  /** All item pairs `(a < b)` co-occurring in at least `minSupport`
    * baskets, with their exact support counts and the derived
    * `support` / `confidence(a→b)` / `lift` ratios.
    *
    * Scale design — the A-Priori pruning that makes pair mining
    * feasible at 100 TB:
    *   1. distinct (basket, item) — one combinable dedup shuffle;
    *   2. frequent ITEMS first: any item in < minSupport baskets
    *      cannot appear in a frequent pair (downward closure), so the
    *      self-join input is semi-join-pruned to frequent items before
    *      any pair is formed;
    *   3. the pair join is an equi-join on basket over the PRUNED
    *      (basket, item) table carrying ids only, `a < b` halving the
    *      output; pair counting is another combinable shuffle.
    * The n² blowup per basket is bounded by the largest basket's
    * FREQUENT-item count, not its raw size. All ratios are single
    * divisions of exact longs cast to double in a fixed order.
    *
    * `minSupportMicro` makes the threshold RELATIVE: the effective
    * cut is `max(minSupport, ceil(n_baskets · minSupportMicro/10⁶))`.
    * An absolute threshold stops pruning as data grows (at 10× the
    * corpus every item clears a fixed 2 and candidate pairs grow
    * linearly with basket count — the r12 scale-smoke's worst entry);
    * relative support is how production A-Priori keeps the frequent-
    * item set — and with it the pair-join input — SHRINKING as a
    * fraction of the corpus. The threshold is in-plan (a broadcast
    * 1-row crossJoin), no extra action.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long, minSupportMicro: Long = 0L): DataFrame = {
    val bi = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct().persist()
    val nBaskets = bi.agg(countDistinct("basket").cast("long").as("n_baskets"))
    // a purely ABSOLUTE threshold is a literal — keep the static
    // filters (no broadcast dependency on the item-count leg, two
    // fewer exchanges: the PlanGoldenSpec-pinned fi1 shape); only the
    // relative path pays the in-plan broadcast scalar its scaling
    // cut needs
    val relative = minSupportMicro > 0L
    val thr = greatest(lit(minSupport),
      expr(s"(n_baskets * ${minSupportMicro}L + 999999L) div 1000000L"))
    val freq0 = bi.groupBy("item").agg(count(lit(1)).cast("long").as("item_n"))
    val freq =
      if (relative)
        freq0.crossJoin(broadcast(nBaskets))
          .filter(col("item_n") >= thr)
          .select("item", "item_n")
      else freq0.filter(col("item_n") >= minSupport)
    val pruned = bi.join(freq, "item")
      .select(col("basket"), col("item"), col("item_n"))
    val pairs = pruned.as("x").join(pruned.as("y"), Seq("basket"))
      .filter(col("x.item") < col("y.item"))
      .select(col("x.item").as("item_a"), col("y.item").as("item_b"),
        col("x.item_n").as("n_a"), col("y.item_n").as("n_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).cast("long").as("n_ab"),
        first("n_a").cast("long").as("n_a"),
        first("n_b").cast("long").as("n_b"))
    val kept = if (relative) pairs else pairs.filter(col("n_ab") >= minSupport)
    val nb = col("n_baskets").cast("double")
    val withNb = kept.crossJoin(broadcast(nBaskets))
    (if (relative) withNb.filter(col("n_ab") >= thr) else withNb)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / nb).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        (col("n_ab").cast("double") * nb /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** Sequential-pattern mining (the GSP/PrefixSpan primitive at
    * bounded depth): contiguous event-type n-grams (n = 2, 3) over
    * each entity's TIME-ORDERED stream, supported by the number of
    * entities whose stream CONTAINS the pattern (presence, not
    * occurrence count — the standard sequence-support definition).
    * The ORDERED complement to [[pairCounts]]'s unordered baskets:
    * "view→click→purchase" is signal where {view, click, purchase}
    * is noise.
    *
    * Determinism: per-entity order is the (ts, seq) total order
    * rebuilt via `array_sort(struct(...))` (the bpe3 ordered-
    * reassembly discipline — never bare collect_list); supports are
    * exact integers; the top-k cut is a (support desc, pattern asc)
    * total order.
    *
    * Scale: one entity-keyed reassembly shuffle (narrow type strings),
    * in-row gram explosion, one combinable distinct-support shuffle —
    * patterns are vocabulary^n-bounded, never corpus-sized.
    */
  def sequentialPatterns(events: DataFrame, entityCol: String,
                         tsCol: String, seqCol: String, itemCol: String,
                         ns: Seq[Int] = Seq(2, 3), minSupport: Long = 2L,
                         topK: Int = 20): DataFrame = {
    val seqs = events.groupBy(col(entityCol).as("e"))
      .agg(transform(array_sort(collect_list(struct(col(tsCol).as("t"),
          col(seqCol).as("s"), col(itemCol).as("it")))),
        x => x.getField("it")).as("arr"))
    val tot = seqs.agg(count(lit(1)).cast("long").as("n_entities"))
    val legs = ns.map { n =>
      seqs.select(col("e"), explode(expr(
          s"""CASE WHEN size(arr) >= $n THEN
             |  transform(sequence(1, size(arr) - ${n - 1}),
             |    i -> concat_ws('>', slice(arr, i, $n)))
             |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
          .as("pattern"))
        .distinct() // presence per entity, not occurrences
        .groupBy("pattern")
        .agg(count(lit(1)).cast("long").as("n_support"))
        .withColumn("n", lit(n.toLong))
    }
    legs.reduce(_ unionByName _)
      .filter(col("n_support") >= minSupport)
      .crossJoin(broadcast(tot))
      .withColumn("support_micro",
        expr("(n_support * 1000000L) div n_entities"))
      .orderBy(col("n_support").desc, col("pattern").asc)
      .limit(topK)
      .select(col("n"), col("pattern"), col("n_support"),
        col("n_entities"), col("support_micro"))
  }
}
