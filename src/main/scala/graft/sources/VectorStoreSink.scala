package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TopK, VectorExpressions => V}

/** On-disk vector store: the chunk index (graft.operators.RagPipeline.ingest)
  * persisted PARTITIONED BY its LSH bucket. A query probes only its own
  * bucket's directory — at 100 TB the scan cost of a retrieval is
  * |bucket|, not |corpus|, enforced by partition pruning at the file
  * level (the on-disk analogue of Pinecone's namespace+index layout,
  * embeddingmodel.js).
  *
  * Retrieval collects the query batch's bucket ids (a handful of ints —
  * driver-side by design: it parameterizes the SCAN, it is not data
  * processing) and pushes them as a static partition filter; the
  * subsequent bucket-equality join + cosine top-k is the s2 shape.
  */
object VectorStoreSink {

  def write(index: DataFrame, path: String): Unit =
    index.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)

  def retrieve(s: SparkSession, path: String, queries: DataFrame, k: Int): DataFrame = {
    val q = queries
      .withColumn("qemb", graft.functions.CharHistEmbedF.embed(col("question")))
      .withColumn("qbucket", graft.operators.Similarity.lshBucket(col("qemb")))
      .select(col("query_id"), col("qemb"), col("qbucket"))
    // bounded driver collect — at most 2^NumPlanes = 256 distinct bucket
    // ids (and in practice |queries| of them), a scan parameter. The
    // isin() over the bucket PARTITION column prunes non-matching
    // partition directories at planning time, so retrieval reads only
    // the buckets the queries hash into
    val buckets = q.select("qbucket").distinct().collect().map(_.getInt(0))
    val candidates = s.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
      .select("chunk_uid", "embedding", "bucket")
    candidates.join(broadcast(q), col("bucket") === col("qbucket"))
      .groupBy("query_id")
      .agg(TopK.topKByScore(V.cosine(col("qemb"), col("embedding")), col("chunk_uid"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "chunk_uid")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("chunk_uid"))
  }
}
