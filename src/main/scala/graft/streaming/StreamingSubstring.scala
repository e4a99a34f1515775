package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online exact duplicated-SUBSTRING detection: the streaming twin of
  * graft.operators.Dedup.d17SubstringDedup, for ingest pipelines that
  * must flag sub-document duplication as documents arrive rather than
  * in a nightly batch pass.
  *
  * Same fingerprint as the batch operator — the codegen'd
  * `token_window_hashes` rolling hash at the same width — so a span the
  * batch pass would mark is a span the stream marks. Each window
  * fingerprint is a state key holding its FIRST occurrence (doc_id,
  * pos); a new arrival whose (doc_id, pos) is not that keeper emits a
  * duplicated [pos, pos+w) span. Within a micro-batch the min
  * (doc_id, pos) arrival is the keeper, so for documents arriving in
  * doc_id order the emitted span set equals the batch operator's
  * duplicated-span frame exactly (spec-asserted across micro-batch
  * boundaries); under out-of-order arrival the keeper is
  * first-by-arrival — the deployment contract of an append-only crawl
  * log.
  *
  * State is one 12-byte (doc_id, pos) pair per DISTINCT window in the
  * corpus, spread across the keyed state store (RocksDB at scale) — the
  * same envelope as StreamingDedup's fingerprint set one granularity
  * down. The per-doc interval union is downstream's gaps-and-islands
  * over the emitted spans, exactly as in the batch plan.
  */
object StreamingSubstring {

  case class WinHit(h: Long, doc_id: Long, pos: Int)
  case class DupSpan(doc_id: Long, pos: Int, e: Int)

  /** (doc_id, text) frame → one WinHit per w-token window, rolling-hash
    * fingerprinted inside whole-stage codegen; usable on a static OR
    * streaming frame (the spec runs both and diffs). */
  def windowHits(docs: DataFrame, w: Int): Dataset[WinHit] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        posexplode(graft.functions.TokenWindows.hashes(col("text"), w)))
      .toDF("doc_id", "pos", "h")
      .select(col("h"), col("doc_id"), col("pos").cast("int").as("pos"))
      .as[WinHit]
  }

  /** Fingerprint-keyed stateful duplicated-span emission. */
  def dupSpans(docs: DataFrame, w: Int): Dataset[DupSpan] = {
    import docs.sparkSession.implicits._
    windowHits(docs, w)
      .groupByKey(_.h)
      .flatMapGroupsWithState[(Long, Int), DupSpan](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[WinHit], state: GroupState[(Long, Int)]) =>
          val arriving = rows.map(r => (r.doc_id, r.pos)).toVector.distinct
          val keeper = state.getOption.getOrElse(arriving.min)
          state.update(keeper)
          arriving.filter(_ != keeper)
            .map { case (d, p) => DupSpan(d, p, p + w) }.iterator
      }
  }
}
