package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  test("JSONL ingest: schema'd read, malformed rows quarantined not fatal") {
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}""")
    w.println("""{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s2"}""")
    w.println("""{not valid json""")
    w.close()
    // Spark disallows querying only the corrupt-record column on a raw
    // file scan; cache the parsed result first (same as production use)
    val df = Sources.readDocumentsJsonl(spark, f.getAbsolutePath).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("doc_id") === 1).select("text").head().getString(0) == "hello world")
  }

  test("binaryFile media ingest: glob prunes at listing, content feeds the decode pipeline") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-media").toFile
    def put(name: String, bytes: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      out.write(bytes); out.close()
    }
    put("a.bin", Array.tabulate(37)(_.toByte))
    put("b.bin", Array.tabulate(160)(i => (i * 3).toByte))
    put("notes.txt", "not media".getBytes) // filtered out by the glob
    val media = Sources.readMediaFiles(spark, dir.getAbsolutePath)
    val rows = media.orderBy("file_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a.bin", "b.bin"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(37L, 160L))
    // blobs flow into the typed decode pipeline unchanged
    val assets = media.select(
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("file_name")))
          .cast("long").as("asset_id"),
        lit("image").as("media_type"), col("content").as("payload"))
      .as[graft.operators.MultimodalDecode.Asset]
    val feats = graft.operators.MultimodalDecode.extractFrameFeatures(assets)
    assert(feats.count() == 2 * graft.operators.MultimodalDecode.FramesPerAsset)
  }

  test("CSV ingest round-trips typed events") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "events.csv")
    val w = new java.io.PrintWriter(f)
    w.println("event_id,ts_us,user_id,event_type,value")
    w.println("1,1700000000000000,42,click,1.5")
    w.println("2,1700000060000000,42,view,2.5")
    w.close()
    val df = Sources.readEventsCsv(spark, f.getAbsolutePath)
    assert(df.count() == 2)
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.agg(sum("value")).head().getDouble(0) == 4.0)
  }

  test("streaming file source: JSONL directory ingested incrementally") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-stream").toFile
    def writeDoc(n: Int): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, s"batch$n.jsonl"))
      w.println(s"""{"doc_id": $n, "text": "doc number $n", "lang": "en", "source": "s$n"}""")
      w.close()
    }
    writeDoc(1); writeDoc(2)
    val stream = spark.readStream
      .schema(Sources.documentSchema)
      .json(dir.getAbsolutePath)
      .groupBy("lang").count()
    val q = stream.writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val counts = spark.sql("select lang, count from filesrc").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("en" -> 2L))
  }

  test("partitioned parquet sink: day filter prunes partitions") {
    val out = Files.createTempDirectory("graft-part").toFile.getAbsolutePath + "/events"
    val events = graft.Tables.events(spark, sfDir)
    Sources.writeEventsPartitioned(events, out)
    val back = Sources.readEventsPartitioned(spark, out)
    assert(back.count() == events.count())
    // pruning: filtering one day must touch only that day's directory
    val oneDay = back.filter(col("day") === "2024-01-05")
    val expected = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(oneDay.count() == expected && expected > 0)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition filter in:\n$plan")
  }

  test("ORC sink round-trips with partition pruning and predicate pushdown") {
    val out = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath + "/events"
    val events = graft.Tables.events(spark, sfDir)
    Sources.writeEventsPartitionedOrc(events, out)
    val back = Sources.readEventsPartitionedOrc(spark, out)
    assert(back.count() == events.count())
    // row-level equality with the parquet source (ORC is an exact
    // interchange, not a lossy re-encode): compare checksums
    val sumA = events.agg(sum(col("event_id")), sum(col("user_id"))).collect()(0)
    val sumB = back.agg(sum(col("event_id")), sum(col("user_id"))).collect()(0)
    assert(sumA == sumB)
    val oneDay = back.filter(col("day") === "2024-01-05" && col("user_id") > 10)
    val expected = events.filter(
      date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05" && col("user_id") > 10).count()
    assert(oneDay.count() == expected && expected > 0)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no partition filter in:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(user_id"),
      s"no pushed predicate on the ORC scan:\n$plan")
  }
}
