package graft.streaming

import graft.SparkSpec
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The composed ingest front door: stream ≡ the batch stages run in
  * sequence (screen → first-wins dedup → stored-model DSIR scoring). */
class StreamingIngestSpec extends SparkSpec {

  test("composed pipeline equals batch screen→dedup→score, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("ingest").toString + "/costs"
    Quality.t19CostsWrite(spark, sfDir, dir)
    val costs = spark.read.parquet(dir)

    // corpus with planted exact duplicates (copies of every 10th doc at
    // +100000), arriving in doc_id order across two micro-batches
    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val all = (base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, s, t) => (id + 100000, s, t) }).sortBy(_._1)

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingIngest.pipeline(
        mem.toDF().toDF("doc_id", "source", "text"), costs)
      .writeStream.format("memory").queryName("ingest_out")
      .outputMode("append").start()
    val (b1, b2) = all.splitAt(all.length / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val got = spark.sql("select * from ingest_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    q.stop()

    // batch twin: the same stages in sequence
    val df = all.toSeq.toDF("doc_id", "source", "text")
    val screened = df.filter(Quality.screenReason(col("source"), col("text")) === "kept")
    val winners = screened
      .withColumn("fp", md5(col("text")))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .join(screened.withColumn("fp", md5(col("text"))), Seq("fp", "doc_id"))
      .select(col("doc_id"), lit("xx").as("lang"), col("text"))
    val want = Quality.t19WeightsFrom(spark, dir, winners).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want,
      s"stream/batch divergence: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    // the planted duplicates were dropped by the dedup stage
    assert(got.keys.forall(_ < 100000))
    assert(got.nonEmpty)
  }
}
