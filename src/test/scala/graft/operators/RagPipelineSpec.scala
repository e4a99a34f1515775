package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RagPipelineSpec extends SparkSpec {

  private lazy val index =
    RagPipeline.ingest(graft.Tables.documents(spark, sfDir).select("doc_id", "text")).cache()

  test("ingest: every non-empty doc is chunked, uids unique, buckets assigned") {
    val docs = graft.Tables.documents(spark, sfDir).filter(length(col("text")) > 0).count()
    assert(index.select("doc_id").distinct().count() == docs)
    assert(index.count() == index.select("chunk_uid").distinct().count())
    assert(index.filter(col("bucket").isNull).count() == 0)
  }

  test("retrieving a chunk's own text returns that chunk at rank 1") {
    import spark.implicits._
    val probes = index.select("chunk_uid", "chunk").orderBy("chunk_uid").limit(3).collect()
    val queries = probes.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getString(1)) }.toSeq
      .toDF("query_id", "question")
    val top1 = RagPipeline.retrieve(index, queries)
      .filter(col("rank") === 1).orderBy("query_id").collect()
    probes.zip(top1).foreach { case (probe, got) =>
      val gotChunk = index.filter(col("chunk_uid") === got.getLong(2))
        .select("chunk").head().getString(0)
      // identical text -> cosine exactly 1; ties only possible between
      // chunks with identical histograms, which must carry identical text score
      assert(gotChunk == probe.getString(1),
        s"query for uid ${probe.getLong(0)} retrieved ${got.getLong(2)}")
    }
  }

  test("answerContext stuffs the retrieved chunks in rank order, deterministically") {
    import spark.implicits._
    val queries = Seq((0L, index.select("chunk").head().getString(0))).toDF("query_id", "question")
    val a = RagPipeline.answerContext(index, queries).head().getString(1)
    val b = RagPipeline.answerContext(index, queries).head().getString(1)
    assert(a == b && a.nonEmpty)
    assert(a.split("\n---\n").length <= RagPipeline.TopKChunks)
  }
}
