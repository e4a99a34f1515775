package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingUpsertSpec extends SparkSpec {
  import StreamingUpsert._

  test("latest-wins per vec_id across batches, stale updates ignored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = StreamingUpsert.latestWins(mem.toDS())
      .writeStream.format("memory").queryName("store").outputMode("update").start()

    mem.addData(Upsert(1, 1, 10, Array(1f)), Upsert(2, 1, 20, Array(2f)))
    q.processAllAvailable()
    mem.addData(Upsert(1, 3, 11, Array(3f)), Upsert(1, 2, 99, Array(9f))) // seq 3 wins, 2 stale
    q.processAllAvailable()
    mem.addData(Upsert(1, 2, 98, Array(8f))) // stale vs stored seq 3 -> current re-emitted
    q.processAllAvailable()
    val latest = spark.sql("select vec_id, seq, label from store")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
    q.stop()
    assert(latest(1L) == (1L, 3L, 11))
    assert(latest(2L) == (2L, 1L, 20))
  }

  test("st4: streaming write-path post-image == the batch upsert (v1)") {
    val streamed = StreamingQueries.st4StreamUpsert(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val batch = graft.operators.Similarity.v1Upsert(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(streamed.sameElements(batch) && streamed.nonEmpty)
  }
}
