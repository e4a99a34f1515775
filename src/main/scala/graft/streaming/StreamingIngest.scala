package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed INGEST FRONT DOOR as one streaming query — the
  * streaming twin of the batch pretraining-cut composition (p3's
  * screen→dedup→select skeleton), chained from the already-spec'd
  * stages so each keeps its own contract:
  *
  *   screen (StreamingScreen.keep — stateless codegen'd CASE)
  *     → first-wins exact dedup (StreamingDedup — one boolean of keyed
  *       state per content fingerprint, RocksDB-spillable)
  *     → DSIR selection score against the STORED model
  *       (StreamingSelect.scoreAgainstStore — stateless broadcast map)
  *
  * One query, one state operator (the dedup), append mode throughout:
  * every arriving document is screened, deduplicated against everything
  * that ever passed, and scored for selection before it lands — the
  * shape a 100 TB/day crawl runs so that storage, embedding, and
  * indexing only ever see surviving, scored documents.
  *
  * Equivalence contract (spec-pinned): under doc_id-ordered arrival the
  * emitted (doc_id → weight) map is IDENTICAL to running the batch
  * stages in sequence — Quality.screenReason filter → d1's min-doc_id
  * first-occurrence collapse → Quality.t19WeightsFrom on the survivors.
  */
object StreamingIngest {

  /** stream: (doc_id, source, text); costs: the stored DSIR cost frame
    * (Quality.t19CostsWrite). Emits (doc_id, n_bigrams, weight_micro,
    * mean_micro) for every surviving document. */
  def pipeline(stream: DataFrame, costs: DataFrame): DataFrame = {
    import stream.sparkSession.implicits._
    val kept = StreamingScreen.keep(stream)
    val deduped = StreamingDedup.dedup(
      kept.select(md5(col("text")).as("fingerprint"), col("doc_id"), col("text"))
        .as[StreamingDedup.Doc])
    StreamingSelect.scoreAgainstStore(
      deduped.toDF().select(col("doc_id"), col("text")), costs)
  }
}
