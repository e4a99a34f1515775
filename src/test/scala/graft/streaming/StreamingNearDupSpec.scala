package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

class StreamingNearDupSpec extends SparkSpec {

  test("streaming near-dup candidates equal the batch d3 pair set on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Dedup.corpusNear(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingNearDup.candidates(stream)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    // two micro-batches: pairs must surface both within a batch and
    // across the batch boundary (bucket state carries the first half)
    val (b1, b2) = docs.splitAt(docs.length / 2)
    mem.addData(b1.toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*)
    q.processAllAvailable()
    val got = spark.sql("select distinct doc_a, doc_b from neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val want = Dedup.d3MinHashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream/batch divergence: " +
      s"stream-only=${(got -- want).take(5)} batch-only=${(want -- got).take(5)}")
  }
}
