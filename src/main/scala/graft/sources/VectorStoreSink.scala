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

  /** Delete an id batch from the store, rewriting ONLY the partitions
    * that contain those ids (partition-pruned copy-on-write — the
    * on-disk form of embeddingmodel.deleteEmbeddingsByIds).
    *
    * Shape: the affected-bucket set is derived as a FRAME (distinct
    * buckets of the matching ids — bounded by |ids|), and the rewrite
    * scan joins it broadcast on the bucket PARTITION column, so dynamic
    * partition pruning restricts the read to affected `bucket=`
    * directories; dynamic partitionOverwriteMode then commits only the
    * partitions present in the written frame. Unaffected partitions are
    * neither read (beyond the pushed-filter id probe) nor rewritten —
    * at 100 TB a 1000-id delete touches ~1000 lists, not the corpus.
    * The localCheckpoint materializes the survivors before the
    * overwrite so the write never reads the files it replaces. */
  def deleteByIds(s: SparkSession, path: String, ids: Seq[Long]): Unit = {
    val store = s.read.parquet(path)
    // both slivers MATERIALIZE (localCheckpoint) before the overwrite:
    // their lineage reads the very files the write replaces
    val affected = store.filter(col("chunk_uid").isin(ids: _*))
      .select("bucket").distinct().localCheckpoint()
    val survivors = store.join(broadcast(affected), Seq("bucket"))
      .filter(!col("chunk_uid").isin(ids: _*))
      .localCheckpoint()
    // a fully-emptied bucket writes no partition under dynamic overwrite,
    // which would leave its old files (and the deleted ids) in place —
    // compute those up front and drop the directories after the commit;
    // the set is bounded by |ids| and directory removal is file-system
    // management, not data processing
    val emptied = affected.join(survivors.select("bucket").distinct(),
        Seq("bucket"), "left_anti")
      .collect().map(_.get(0))
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
    finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if (emptied.nonEmpty) {
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(s.sessionState.newHadoopConf())
      emptied.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"bucket=$b"), true)
      }
    }
  }

  def retrieve(s: SparkSession, path: String, queries: DataFrame, k: Int): DataFrame = {
    val q = queries
      .withColumn("qemb", graft.functions.CharHistEmbedF.embed(col("question")))
      .withColumn("qbucket", graft.operators.Similarity.lshBucket(col("qemb")))
      .select(col("query_id"), col("qemb"), col("qbucket"))
      // true domain bound (NumPlanes sign bits → [0, 2^NumPlanes)); also
      // the selective predicate Spark's DPP heuristic requires on the
      // build side before it will inject partition pruning
      .filter(col("qbucket").between(0, (1 << graft.operators.Similarity.NumPlanes) - 1))
    // the retrieval join IS the pruning: broadcasting the query batch
    // against the bucket PARTITION column hands Spark a dynamic
    // partition-pruning subquery, so the scan reads only the bucket=
    // directories the queries hash into (plan-asserted:
    // dynamicpruningexpression in PartitionFilters) — no bucket-id set
    // ever rides through the driver
    val candidates = s.read.parquet(path)
      .select("chunk_uid", "embedding", "bucket")
    candidates.join(broadcast(q), col("bucket") === col("qbucket"))
      .groupBy("query_id")
      .agg(TopK.topKByScore(V.cosine(col("qemb"), col("embedding")), col("chunk_uid"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "chunk_uid")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("chunk_uid"))
  }
}
