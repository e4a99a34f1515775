package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The t25 domain/content screen at INGEST — the deployment shape a
  * crawl pipeline actually runs it in: classify every arriving
  * document before anything downstream (dedup state, embedding jobs,
  * storage) pays for it. The reference screens content at upload time
  * (customTrainDataController.js gates what enters the vector store);
  * this is that gate as a Structured Streaming stage.
  *
  * Shape: completely STATELESS and shuffle-free — the verdict is
  * [[Quality.screenReason]], a row-local codegen'd CASE (blocklist and
  * bad-word vocabulary are literal predicates; production-sized lists
  * ride a broadcast, same plan), so every micro-batch emits in append
  * mode with no watermark, no keyed state, and no aggregation-mode
  * constraints. At 100 TB/day the screen's cost is one map pass over
  * each arriving batch, and because the verdict column is the SAME
  * expression the batch rollup aggregates, online and offline
  * attribution agree bit-for-bit (spec-pinned).
  *
  * Model/rule updates follow the StreamingSelect discipline: the rule
  * constants compile into the expression, so a changed blocklist means
  * restarting the query — there is no mid-query snapshot-swap hazard
  * because nothing is read from disk at all. */
object StreamingScreen {

  /** Annotate an arriving (doc_id, source, text) stream with its
    * first-failing-rule verdict — the audit feed (every doc, with WHY
    * it lives or dies). */
  def verdicts(stream: DataFrame): DataFrame =
    stream.select(col("doc_id"), col("source"),
      Quality.screenReason(col("source"), col("text")).as("reason"))

  /** The ingest front door: pass through only documents every rule
    * keeps, schema unchanged — what downstream dedup/indexing consumes. */
  def keep(stream: DataFrame): DataFrame =
    stream.filter(Quality.screenReason(col("source"), col("text")) === "kept")
}
