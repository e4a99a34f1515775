package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable two-pass EXACT grouped quantiles at fact-table scale.
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
  *  4. rank lookup inside that bucket only: candidates (~n/B rows)
  *     compress to per-value counts, a window keyed by (group, quantile)
  *     cumulates the DISTINCT values of one bucket, and the answer is
  *     the first value whose cumulative count reaches the local rank.
  *
  * If n/B outgrows a partition at extreme scale, raise B or apply step
  * 2-4 recursively inside the target bucket; the formulation is
  * unchanged.
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
      probs: Seq[(String, Double)], buckets: Int = 256): DataFrame = {
    require(probs.nonEmpty && probs.forall { case (_, p) => p > 0 && p <= 1 })
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
    val cand = withB.join(broadcast(target),
      col(key) === col("t_k") && col("bkt") === col("tbkt"))
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
}
