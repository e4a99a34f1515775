package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Online DATA SELECTION: score an arriving document stream against the
  * STORED DSIR model (graft.operators.Quality.t19CostsWrite) — the
  * streaming twin of t19WeightsFrom, for ingest pipelines that decide
  * keep/resample AS documents arrive rather than in a batch pass.
  *
  * Shape: completely STATELESS and shuffle-free. The ≤4097-row cost
  * frame collapses to a one-row MAP column (bucket → cost_micro, plus
  * the smoothed default for train-unseen buckets) and cross-joins the
  * stream as a broadcast static side; each document then scores inside
  * one codegen'd projection — featurize row-locally
  * (Quality.dsirBucketArray) and fold the map lookups with
  * `aggregate(...)`. No keyed state, no watermark, no aggregation mode
  * constraints: every micro-batch emits its scores in append mode.
  * Model updates require a query RESTART (rebuild the static DataFrame
  * against the new artifact path): the static side's file listing is
  * cached at DataFrame creation, so overwriting the same path under a
  * running query is not a clean snapshot swap — it can surface
  * FileNotFoundException or stale data mid-batch. Write each retrained
  * model to a fresh path and restart the scorer against it.
  *
  * At 100 TB/day of arriving crawl this is the selection front-door:
  * the scorer's cost is one map pass over the batch, and because the
  * weights are the exact batch estimator (spec: stream scores ≡
  * Quality.t19WeightsFrom on the same rows), the online and offline
  * selections agree bit-for-bit.
  */
object StreamingSelect {

  /** Fold a document's bucket array over the (map, default) model. */
  private def weightOf(bks: Column, cm: Column, dflt: Column): Column =
    aggregate(bks, lit(0L),
      (acc, b) => acc + coalesce(element_at(cm, b), dflt))

  /** Score a (doc_id, lang, text) stream against a stored cost frame
    * (the parquet written by Quality.t19CostsWrite, read as a static
    * DataFrame). Emits (doc_id, n_bigrams, weight_micro, mean_micro)
    * for every stream doc with ≥ 2 words — the same contract as the
    * batch scorer. */
  def scoreAgainstStore(stream: DataFrame, costs: DataFrame): DataFrame = {
    val model = costs.filter(col("bucket") >= 0)
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cost_micro")))).as("cm"))
      .crossJoin(costs.filter(col("bucket") === -1L)
        .select(col("cost_micro").as("dflt")))
    stream
      .select(col("doc_id"), Quality.dsirBucketArray(col("text")).as("bks"))
      .filter(size(col("bks")) >= 1)
      .crossJoin(broadcast(model))
      .select(col("doc_id"),
        size(col("bks")).cast("long").as("n_bigrams"),
        weightOf(col("bks"), col("cm"), col("dflt")).as("weight_micro"))
      .withColumn("mean_micro",
        floor(col("weight_micro").cast("double") / col("n_bigrams")).cast("long"))
  }
}
