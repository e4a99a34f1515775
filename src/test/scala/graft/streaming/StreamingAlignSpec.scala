package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAlignSpec extends SparkSpec {

  test("stream gate passes exactly the batch-m6 aligned set across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchAligned = Multimodal.m6AlignmentScreen(spark, sfDir).collect()
      .collect { case r if r.getLong(3) == 1L => r.getLong(0) }.toSet
    val corpus = Multimodal.m6Paired(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

    val mem = MemoryStream[(Long, String, String, String)]
    val stream = mem.toDS().toDF("asset_id", "source", "caption", "payload")
    val q = StreamingAlign.alignedOnly(stream, keepScore = true)
      .writeStream.format("memory").queryName("align_gate")
      .outputMode("append").start()
    mem.addData(corpus.take(corpus.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(corpus.drop(corpus.length / 2).toIndexedSeq: _*)
    q.processAllAvailable()
    val passed = spark.sql("select asset_id, alignment_dot from align_gate")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(passed.keySet == batchAligned,
      "the stateless stream gate must equal the batch screen")
    // the scores agree with the batch screen's exact integer dots
    val batchDots = Multimodal.m6AlignmentScreen(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    passed.foreach { case (id, dot) => assert(dot == batchDots(id), s"asset $id") }
    // and the gate really drops something (the planted swaps)
    assert(passed.size < corpus.length, "the plant must be filtered")
  }
}
