package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online exact dedup of a document stream: the first document with a
  * given fingerprint passes, every later duplicate is dropped — the
  * streaming twin of graft.operators.Dedup.d1ExactDedup, for ingest
  * pipelines where the corpus arrives continuously.
  *
  * State is one boolean per fingerprint, partitioned by Spark's
  * keyed-state store — memory per executor is bounded by its share of
  * distinct fingerprints, and for an unbounded corpus the state store
  * spills via RocksDB. The fingerprint should be content-derived
  * (md5 / graft.functions.WinnowFingerprints head) so replays stay
  * idempotent.
  */
object StreamingDedup {

  case class Doc(fingerprint: String, doc_id: Long, text: String)

  def dedup(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, Doc](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Doc], seen: GroupState[Boolean]) =>
          if (seen.exists) {
            Iterator.empty // all duplicates of an already-passed doc
          } else {
            seen.update(true)
            // several docs with the same fingerprint in one batch:
            // deterministic winner (smallest doc_id)
            Iterator.single(rows.minBy(_.doc_id))
          }
      }
  }

  /** Streaming twin of Dedup.d9IncrementalDedup — continuous-crawl
    * ingest against an already-stored corpus: drop stream docs whose
    * fingerprint exists in the STATIC store (stream-static left-anti
    * join — re-planned per micro-batch, no state), then first-wins
    * within the stream itself (the keyed-state dedup above).
    *
    * The static side is the stored dedup index: fingerprint-only, so at
    * 100 TB the join reads one indexed column, and because the anti-join
    * is stateless the store can grow between micro-batches (each batch
    * sees the current snapshot — exactly the semantics a recurring crawl
    * wants). */
  def dedupAgainstStore(stream: Dataset[Doc],
      storedFps: org.apache.spark.sql.DataFrame): Dataset[Doc] = {
    import stream.sparkSession.implicits._
    val novel = stream.join(storedFps, Seq("fingerprint"), "left_anti").as[Doc]
    dedup(novel)
  }
}
