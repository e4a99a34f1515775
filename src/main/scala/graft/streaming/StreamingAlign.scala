package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.Multimodal

/** The image-text ALIGNMENT GATE as a stream — m6's streaming sibling,
  * the front door a multimodal crawl ingest runs BEFORE anything lands
  * in the asset store (the batch p8 cut then only ever sees pairs that
  * passed): arriving (asset_id, source, caption, payload) rows pass
  * through only if the stub-encoder cosine gate holds (the LAION filter,
  * m6's exact integer arithmetic).
  *
  * Mechanics: completely STATELESS — the verdict is row-local map work
  * (embed both modalities, integer dot, cross-multiplied threshold), so
  * the stream needs no watermark, no keyed state, no join; a micro-batch
  * costs exactly its own rows. This is the cheapest member of the
  * streaming screen family (StreamingScreen = text rules,
  * StreamingRangeCheck = vector store probe, StreamingDedup = exact
  * store probe): the only one with zero static side.
  */
object StreamingAlign {

  /** Pass through only the aligned pairs; `keepScore` retains the exact
    * integer dot for downstream ranking/audit. */
  def alignedOnly(stream: DataFrame, keepScore: Boolean = false): DataFrame = {
    val v = Multimodal.m6Verdicts(stream)
      .filter(org.apache.spark.sql.functions.col("aligned") === 1L)
    if (keepScore) v.select("asset_id", "source", "payload", "alignment_dot")
    else v.select("asset_id", "source", "payload")
  }
}
