package graft.streaming

import graft.SparkSpec
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSelectSpec extends SparkSpec {

  test("streaming DSIR scores equal the batch scorer on the same docs, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("dsir_stream").toString
    val path = s"$dir/costs"
    Quality.t19CostsWrite(spark, sfDir, path)
    val costs = spark.read.parquet(path)

    // a mix of in-corpus docs and new (train-unseen-vocab) arrivals
    val corpusDocs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val novel = Seq(
      (800001L, "xx", "zzqx wwvy zzqx wwvy kkjh"),
      (800002L, "en", "one two three four five six"),
      (800003L, "xx", "solo"))                       // < 2 words: no score
    val all = corpusDocs.toSeq ++ novel

    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingSelect.scoreAgainstStore(
        mem.toDF().toDF("doc_id", "lang", "text"), costs)
      .writeStream.format("memory").queryName("dsir_stream_out")
      .outputMode("append").start()
    val (b1, b2) = all.splitAt(10)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val got = spark.sql("select * from dsir_stream_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    q.stop()

    val batch = Quality.t19WeightsFrom(spark, path,
        spark.createDataFrame(all).toDF("doc_id", "lang", "text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == batch, s"stream/batch divergence: ${(got.toSet diff batch.toSet) ++ (batch.toSet diff got.toSet)}")
    assert(!got.contains(800003L) && got.contains(800001L))
  }

  test("row-local featurizer equals the batch featurizer's per-doc bucket multiset") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").limit(30)
    val rowLocal = docs
      .select(col("doc_id"), explode(Quality.dsirBucketArray(col("text"))).as("bucket"))
      .groupBy("doc_id", "bucket").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Quality.dsirFeats(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(rowLocal == batch)
  }
}
