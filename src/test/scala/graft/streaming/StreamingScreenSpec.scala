package graft.streaming

import graft.SparkSpec
import graft.operators.Quality
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingScreenSpec extends SparkSpec {

  private def corpusRows(n: Int): Seq[(Long, String, String)] =
    graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").limit(n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  // crafted rows exercising every rule, including precedence (a short
  // doc on a blocked source must die as blocked_source)
  private val crafted = Seq(
    (900001L, Quality.BlockedSources.head, "tiny"),
    (900002L, "srcX", "too short"),
    (900003L, "srcX", "slow dup slow dup slow dup slow dup slow dup ok ok"),
    (900004L, "srcX",
      "the quick brown fox jumps over the lazy dog again and again today"))

  test("streaming verdicts equal the batch verdict expression, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = corpusRows(20) ++ crafted
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingScreen.verdicts(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("screen_stream_out")
      .outputMode("append").start()
    val (b1, b2) = all.splitAt(12)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    val got = spark.sql("select * from screen_stream_out").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    q.stop()

    val batch = spark.createDataFrame(all).toDF("doc_id", "source", "text")
      .select(col("doc_id"), Quality.screenReason(col("source"), col("text")).as("reason"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == batch)
    assert(got(900001L) == "blocked_source") // precedence over too_short
    assert(got(900002L) == "too_short")
    assert(got(900003L) == "badword")
    assert(got(900004L) == "kept")
  }

  test("keep() passes exactly the kept docs with schema unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = corpusRows(15) ++ crafted
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingScreen.keep(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("screen_keep_out")
      .outputMode("append").start()
    mem.addData(all: _*); q.processAllAvailable()
    val got = spark.sql("select * from screen_keep_out")
    assert(got.columns.toSeq == Seq("doc_id", "source", "text"))
    val gotIds = got.collect().map(_.getLong(0)).toSet
    q.stop()

    val expected = spark.createDataFrame(all).toDF("doc_id", "source", "text")
      .filter(Quality.screenReason(col("source"), col("text")) === "kept")
      .collect().map(_.getLong(0)).toSet
    assert(gotIds == expected)
    assert(gotIds.contains(900004L) && !gotIds.contains(900003L))
  }

  test("the streaming plan is stateless: no state store operators") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingScreen.verdicts(mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("screen_plan_out")
      .outputMode("append").start()
    mem.addData((1L, "s", "t")); q.processAllAvailable()
    val plan = q.lastProgress.toString
    q.stop()
    assert(!plan.contains("stateOperators\" : [ {"),
      s"screen must not register state operators:\n$plan")
  }
}
