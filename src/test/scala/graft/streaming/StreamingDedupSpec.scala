package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup._

  test("first doc per fingerprint passes; later duplicates drop, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedup(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()

    // batch 1: two distinct + an in-batch duplicate (higher id loses)
    mem.addData(Doc("fpA", 2, "a"), Doc("fpA", 1, "a"), Doc("fpB", 3, "b"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of fpA + one new
    mem.addData(Doc("fpA", 9, "a"), Doc("fpC", 4, "c"))
    q.processAllAvailable()
    val got = spark.sql("select fingerprint, doc_id from dedup_out")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set(("fpA", 1L), ("fpB", 3L), ("fpC", 4L)))
  }

  test("st5: the staged streaming screen emits exactly d9's batch output") {
    // the registered oracle-promoted row: batch 0 primes state with the
    // existing corpus, batch 1 streams d9's new batch through the gate —
    // the emitted survivors must equal the batch operator bit-for-bit
    // (the same DuckDB oracle gates both)
    val got = StreamingQueries.st5StreamDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = graft.operators.Dedup.d9IncrementalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("dedupAgainstStore drops stored fingerprints, then first-wins within the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stored = Seq("fpOld1", "fpOld2").toDF("fingerprint")
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedupAgainstStore(mem.toDS(), stored)
      .writeStream.format("memory").queryName("inc_dedup_out").outputMode("append").start()

    mem.addData(
      Doc("fpOld1", 10, "recrawl of stored doc"), // in the store -> dropped
      Doc("fpNew1", 11, "new"),
      Doc("fpNew1", 12, "new again"))             // in-stream dup -> first wins
    q.processAllAvailable()
    mem.addData(
      Doc("fpOld2", 13, "another stored"),        // dropped
      Doc("fpNew1", 14, "late dup"),              // cross-batch dup -> dropped
      Doc("fpNew2", 15, "fresh"))
    q.processAllAvailable()
    val got = spark.sql("select fingerprint, doc_id from inc_dedup_out")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set(("fpNew1", 11L), ("fpNew2", 15L)))
  }
}
