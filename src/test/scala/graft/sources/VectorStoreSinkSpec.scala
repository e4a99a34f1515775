package graft.sources

import graft.SparkSpec
import graft.operators.RagPipeline
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VectorStoreSinkSpec extends SparkSpec {

  test("bucket-partitioned store: pruned retrieval equals in-memory retrieval") {
    import spark.implicits._
    val index = RagPipeline.ingest(
      graft.Tables.documents(spark, sfDir).select("doc_id", "text")).cache()
    val path = Files.createTempDirectory("graft-vstore").toFile.getAbsolutePath + "/index"
    VectorStoreSink.write(index, path)

    // file-backed query batch (how a real batch arrives): a purely local
    // relation would be constant-folded below the Filter node Spark's
    // DPP heuristic looks for, which no real source-backed batch is
    val qpath = Files.createTempDirectory("graft-vstore-q").toFile.getAbsolutePath + "/queries"
    index.select("chunk").limit(2).collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getString(0)) }.toSeq.toDF("query_id", "question")
      .write.parquet(qpath)
    val queries = spark.read.parquet(qpath)

    val fromDisk = VectorStoreSink.retrieve(spark, path, queries, RagPipeline.TopKChunks)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val inMemory = RagPipeline.retrieve(index, queries)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(fromDisk == inMemory && fromDisk.nonEmpty)

    // the scan must carry a DYNAMIC partition-pruning filter on bucket:
    // the broadcast query join against the partition column is the
    // pruning mechanism (no driver-collected bucket set anywhere)
    val q = queries.limit(1)
    val plan = VectorStoreSink.retrieve(spark, path, q, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on bucket visible:\n${plan.take(2000)}")
  }
}
