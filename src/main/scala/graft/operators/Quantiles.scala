package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable multi-pass EXACT grouped quantiles at fact-table scale.
  *
  * `row_number() OVER (PARTITION BY group)` sorts the whole corpus in
  * |group| reducer partitions — unusable when groups are few and rows are
  * 100 TB. This operator computes the same exact rank-based (DISC)
  * quantile — the value at rank ceil(p·n) in value order, which is a raw
  * input value, bit-comparable across engines — with every stage bounded:
  *
  *  1. per-group min/max/count (map-side combined);
  *  2. equal-width value histogram over B buckets (shuffle ≤ groups×B
  *     partial rows per input partition);
  *  3. cumulative bucket counts via a bounded B² join-aggregate (no
  *     window over the group key), locating the single bucket holding
  *     each target rank;
  *  4. optional RECURSIVE refinement (`levels` > 1): re-histogram the
  *     located bucket's rows per (group, quantile) and narrow again —
  *     candidates shrink ~B× per level (n/B, n/B², ...), so two levels
  *     bound the final lookup at n/B² rows;
  *  5. rank lookup inside the last bucket only: candidates compress to
  *     per-value counts, a window keyed by (group, quantile) cumulates
  *     the DISTINCT values of one bucket, and the answer is the first
  *     value whose cumulative count reaches the local rank.
  */
object Quantiles {

  /** Exact grouped quantiles, long format: one row per (group, quantile
    * label) with the exact value, plus the group count.
    *
    * NULL contract: quantiles are taken over the NON-NULL values of a
    * group (SQL percentile semantics), and `n_events` counts those same
    * non-null values. Without the shared filter, a group with nulls gets
    * a rank ceil(p·n) computed over MORE rows than the histogram holds —
    * the rank can exceed every bucket's cumulative count and the group
    * silently vanishes from the output. A group whose values are all
    * null has no quantile and produces no row.
    *
    * @param probs (label, p) pairs, 0 < p <= 1
    * @return columns: <key>, which (label), v (exact value), n_events
    */
  def exactGroupedQuantiles(df: DataFrame, key: String, value: String,
      probs: Seq[(String, Double)], buckets: Int = 256): DataFrame =
    exactGroupedQuantilesDeep(df, key, value, probs, buckets, levels = 1)

  /** The `levels`-pass variant: each extra level re-histograms the
    * located bucket per (group, quantile), multiplying the effective
    * resolution to B^levels without ever sorting more than one bucket's
    * DISTINCT values. Use when n/B outgrows a partition at extreme group
    * sizes (a trillion-row group with B=256 and levels=2 leaves ~15M
    * candidate rows, value-compressed before the final window). */
  def exactGroupedQuantilesDeep(df: DataFrame, key: String, value: String,
      probs: Seq[(String, Double)], buckets: Int = 256, levels: Int = 2): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (_, p) => p > 0 && p <= 1 })
    require(levels >= 1, "levels must be >= 1")
    val B = buckets
    val e = df.select(col(key), col(value)).filter(col(value).isNotNull)
    val stats = e.groupBy(key)
      .agg(min(value).as("lo"), max(value).as("hi"), count(lit(1)).as("n_events"))
    val bkt = when(col("hi") === col("lo"), lit(0)).otherwise(
      least(lit(B - 1),
        floor((col(value) - col("lo")) / (col("hi") - col("lo")) * B).cast("int")))
    val withB = e.join(broadcast(stats), Seq(key)).withColumn("bkt", bkt)
    val hist = withB.groupBy(col(key), col("bkt")).agg(count(lit(1)).as("c"))
    val hb = hist.select(col(key).as("k_b"), col("bkt").as("bkt_b"), col("c").as("c_b"))
    val cum = hist.join(broadcast(hb),
        col(key) === col("k_b") && col("bkt_b") <= col("bkt"))
      .groupBy(col(key), col("bkt"), col("c")).agg(sum("c_b").as("cum"))
      .withColumn("cum_before", col("cum") - col("c"))
    val rankStructs: Column = array(probs.map { case (label, p) =>
      struct(lit(label).as("which"), ceil(lit(p) * col("n_events")).cast("long").as("r"))
    }: _*)
    val ranks = stats.select(col(key), explode(rankStructs).as("t"))
      .select(col(key), col("t.which").as("which"), col("t.r").as("r"))
    val target = cum.join(ranks, Seq(key))
      .filter(col("cum_before") < col("r") && col("r") <= col("cum"))
      .select(col(key).as("t_k"), col("which"), col("bkt").as("tbkt"),
        (col("r") - col("cum_before")).as("k"))
    // per-(group, quantile) candidate rows of the located bucket, with
    // the LOCAL rank k each quantile still has to find inside it
    var cand = withB.join(broadcast(target),
        col(key) === col("t_k") && col("bkt") === col("tbkt"))
      .select(col(key), col("which"), col("k"), col(value))
    for (_ <- 1 until levels) cand = refineOnce(cand, key, value, B)
    val vcounts = cand.groupBy(col(key), col("which"), col("k"), col(value))
      .agg(count(lit(1)).as("vc"))
    val wloc = Window.partitionBy(key, "which").orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vcounts.withColumn("vcum", sum("vc").over(wloc))
      .filter(col("vcum") >= col("k"))
      .groupBy(col(key), col("which")).agg(min(value).as("v"))
      .join(broadcast(stats.select(col(key), col("n_events"))), Seq(key))
      .select(col(key), col("which"), col("v"), col("n_events"))
  }

  /** One refinement pass: histogram the current candidate set per
    * (group, quantile), locate the sub-bucket holding the local rank,
    * and emit that sub-bucket's rows with the rank re-based into it.
    * Same bounded shapes as the first pass — a groups×quantiles×B
    * histogram, a B² cumulative join, and a hash join back — just keyed
    * by (group, quantile) instead of group. */
  private def refineOnce(cand: DataFrame, key: String, value: String, B: Int): DataFrame = {
    val bounds = cand.groupBy(col(key), col("which"), col("k"))
      .agg(min(value).as("lo"), max(value).as("hi"))
    val bkt = when(col("hi") === col("lo"), lit(0)).otherwise(
      least(lit(B - 1),
        floor((col(value) - col("lo")) / (col("hi") - col("lo")) * B).cast("int")))
    val withB = cand.join(broadcast(bounds), Seq(key, "which", "k"))
      .withColumn("bkt", bkt)
    val hist = withB.groupBy(col(key), col("which"), col("k"), col("bkt"))
      .agg(count(lit(1)).as("c"))
    val hb = hist.select(col(key).as("k_b"), col("which").as("w_b"),
      col("bkt").as("bkt_b"), col("c").as("c_b"))
    val cum = hist.join(broadcast(hb),
        col(key) === col("k_b") && col("which") === col("w_b") && col("bkt_b") <= col("bkt"))
      .groupBy(col(key), col("which"), col("k"), col("bkt"), col("c"))
      .agg(sum("c_b").as("cum"))
      .withColumn("cum_before", col("cum") - col("c"))
    val tgt = cum.filter(col("cum_before") < col("k") && col("k") <= col("cum"))
      .select(col(key).as("t_k"), col("which").as("t_w"), col("bkt").as("tbkt"),
        (col("k") - col("cum_before")).as("k2"))
    withB.join(broadcast(tgt),
        col(key) === col("t_k") && col("which") === col("t_w") && col("bkt") === col("tbkt"))
      .select(col(key), col("which"), col("k2").as("k"), col(value))
  }
}
