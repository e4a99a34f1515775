package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorExpressions => V}

/** The vector-level INGEST GATE as a stream — s18's streaming sibling,
  * completing the recurring-crawl screen family across tiers and modes
  * (StreamingDedup.dedupAgainstStore = exact text, d24ScreenFrom =
  * fuzzy text, m5ScreenFrom = media; this is the embedding tier): an
  * arriving vector passes through ONLY if the static store holds no
  * neighbor with cosine ≥ τ — the guard a serving tier runs in front of
  * the v1 upsert so re-uploads and near-duplicate re-embeds never silt
  * up the store (the reference upserts unconditionally,
  * embeddingController.js:10-57).
  *
  * Mechanics: one stream-static LEFT-ANTI join with the cosine
  * threshold inside the codegen'd join condition — completely
  * STATELESS (no watermark, no keyed state; the join re-plans per
  * micro-batch against the current store snapshot, so a store that
  * grows between batches is seen immediately — the StreamingDedup
  * contract). At scale the static side is the stored index, and the
  * same τ-filter composes with an IVF probe (prune lists first, then
  * the anti condition) exactly as the batch operator documents.
  */
object StreamingRangeCheck {

  /** Pass through only the arriving (qid, qemb) rows with NO stored
    * neighbor at cosine ≥ tau in `store` (vec_id, embedding). */
  def novelOnly(stream: DataFrame, store: DataFrame, tau: Double): DataFrame =
    stream.join(store,
      V.cosine(col("qemb"), col("embedding")) >= tau, "left_anti")
}
