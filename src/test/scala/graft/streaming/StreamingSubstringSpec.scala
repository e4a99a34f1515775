package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

class StreamingSubstringSpec extends SparkSpec {

  test("streaming duplicated spans equal the batch d17 span frame on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc_id-ordered arrival: the streaming keeper rule then coincides
    // with the batch global-min rule, so the span sets must be EQUAL
    val docs = Dedup.corpusSub(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingSubstring.dupSpans(stream, Dedup.SubW)
      .writeStream.format("memory").queryName("substream").outputMode("append").start()
    // three micro-batches: spans must surface within a batch AND across
    // boundaries (fingerprint state carries the earlier batches)
    val thirds = docs.grouped((docs.length + 2) / 3).toSeq
    thirds.foreach { b => mem.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
    val got = spark.sql("select doc_id, pos, e from substream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    q.stop()
    val want = Dedup.substringDupSpans(Dedup.corpusSub(spark, sfDir), Dedup.SubW)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got.nonEmpty, "planted passages must stream at least one span")
    assert(got == want, s"stream/batch divergence: " +
      s"stream-only=${(got -- want).take(5)} batch-only=${(want -- got).take(5)}")
  }
}
