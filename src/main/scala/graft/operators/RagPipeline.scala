package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CharHistEmbedF, RecursiveChunksF, TopK, VectorExpressions => V}

/** The reference's end-to-end RAG story (customTrainDataController.js
  * runWithEmbeddings: document → RecursiveCharacterTextSplitter → embed →
  * HNSW store → retriever top-k → QA context) composed from graft
  * operators:
  *
  *   ingest:   documents → separator-aware chunks → encoder → LSH-bucketed
  *             chunk index (one map stage + no shuffle until persisted)
  *   retrieve: queries → encoder → bucket-equality candidate join →
  *             codegen'd cosine → bounded top-k → context assembly
  *
  * The encoder is the clearly-marked stub (graft.functions.CharHistEmbed);
  * swapping in model inference changes nothing downstream. At 100 TB the
  * index is written date/namespace-partitioned (graft.sources.Sources)
  * and the retrieve side broadcasts the query batch, exactly like s2.
  */
object RagPipeline {

  val ChunkSize = 200
  val Overlap = 40
  val TopKChunks = 3

  /** documents(doc_id, text) → chunk index (chunk_uid, doc_id, chunk_idx,
    * chunk, embedding, bucket). chunk_uid = doc_id * 10_000 + chunk_idx. */
  def ingest(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        posexplode(RecursiveChunksF.chunks(col("text"), ChunkSize, Overlap)).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_uid", col("doc_id") * 10000 + col("chunk_idx"))
      .withColumn("embedding", CharHistEmbedF.embed(col("chunk")))
      .withColumn("bucket", Similarity.lshBucket(col("embedding")))

  /** queries(query_id, question) × index → top-k chunks per query with
    * rank. Candidates pruned by LSH bucket equality BEFORE scoring. */
  def retrieve(index: DataFrame, queries: DataFrame): DataFrame = {
    val q = queries
      .withColumn("qemb", CharHistEmbedF.embed(col("question")))
      .withColumn("qbucket", Similarity.lshBucket(col("qemb")))
      .select(col("query_id"), col("qemb"), col("qbucket"))
    index.join(broadcast(q), col("bucket") === col("qbucket"))
      .groupBy("query_id")
      .agg(TopK.topKByScore(V.cosine(col("qemb"), col("embedding")), col("chunk_uid"), TopKChunks).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "chunk_uid")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("chunk_uid"))
  }

  /** Assemble the QA context: top-k chunk texts per query, rank order
    * (the RetrievalQAChain prompt-stuffing step). */
  def answerContext(index: DataFrame, queries: DataFrame): DataFrame =
    retrieve(index, queries)
      .join(index.select("chunk_uid", "chunk"), Seq("chunk_uid"))
      .groupBy("query_id")
      .agg(concat_ws("\n---\n", array_sort(collect_list(struct(col("rank"), col("chunk"))))
        .getField("chunk")).as("context"))
      .orderBy("query_id")
}
