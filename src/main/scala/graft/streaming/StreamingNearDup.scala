package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Online NEAR-dup detection: the streaming twin of
  * graft.operators.Dedup.d3MinHashLsh, for ingest pipelines that must
  * flag fuzzy duplicates as documents arrive rather than in a nightly
  * batch.
  *
  * Same math as the batch operator — the codegen'd MinHashSig signature
  * and the same band/key split (Dedup.NumHashes, Dedup.BandSize,
  * Dedup.hashA/hashB), so a pair the batch pipeline would catch is a
  * pair the stream catches. Each LSH bucket (band, key) is a state key
  * holding the doc ids that have landed in it; a new arrival emits one
  * candidate per stored neighbor (and per smaller-id batch-mate), then
  * joins the bucket. The same pair surfacing from several bands is
  * downstream's `distinct` — exactly the batch operator's contract.
  *
  * State is one id list per OCCUPIED bucket — total state is
  * docs × bands ids spread across the keyed state store (RocksDB at
  * scale), the same envelope as StreamingDedup's fingerprint set. A
  * bounded-retention deployment adds a timeout eviction or backs the
  * lookup with the stored index (the dedupAgainstStore pattern); the
  * semantics here are the unbounded first-class ones.
  */
object StreamingNearDup {

  case class BandHit(band: Int, key: String, doc_id: Long)
  case class Candidate(doc_a: Long, doc_b: Long)

  /** (doc_id, text) frame → one BandHit per (doc, band): tokenize,
    * signature, band split — all inside whole-stage codegen, usable on a
    * static OR streaming frame (spec runs both and diffs). */
  def bandHits(docs: DataFrame): Dataset[BandHit] = {
    import docs.sparkSession.implicits._
    val as = (0 until Dedup.NumHashes).map(Dedup.hashA)
    val bs = (0 until Dedup.NumHashes).map(Dedup.hashB)
    val bandExpr = s"transform(sequence(0, ${Dedup.NumHashes / Dedup.BandSize - 1}), " +
      s"b -> concat_ws('_', ${(0 until Dedup.BandSize)
        .map(j => s"sig[b * ${Dedup.BandSize} + $j]").mkString(", ")}))"
    docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), graft.functions.MinHashSigF(col("t"), Dedup.P, as, bs).as("sig"))
      .select(col("doc_id"), posexplode(expr(bandExpr)).as(Seq("band", "key")))
      .select(col("band").cast("int").as("band"), col("key"), col("doc_id"))
      .as[BandHit]
  }

  /** Bucket-keyed stateful candidate emission. Output pairs are ordered
    * (doc_a < doc_b); duplicates across bands/batches are possible, as
    * in the batch operator before its final distinct. */
  def candidates(docs: DataFrame): Dataset[Candidate] = {
    import docs.sparkSession.implicits._
    bandHits(docs)
      .groupByKey(h => (h.band, h.key))
      .flatMapGroupsWithState[List[Long], Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandHit], state: GroupState[List[Long]]) =>
          val stored = state.getOption.getOrElse(Nil)
          val arriving = rows.map(_.doc_id).toVector.distinct.sorted
          val out = Vector.newBuilder[Candidate]
          var known = stored
          arriving.foreach { id =>
            known.foreach { other =>
              if (other != id)
                out += (if (other < id) Candidate(other, id) else Candidate(id, other))
            }
            known = id :: known
          }
          state.update(known)
          out.result().iterator
      }
  }
}
