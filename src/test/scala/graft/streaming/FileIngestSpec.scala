package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileIngestSpec extends SparkSpec {

  private def writeJsonl(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  test("file arrivals ingest through quarantine into the bucketed store, exactly once") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val in = s"$root/in"; val store = s"$root/store"
    val quarantine = s"$root/quarantine"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()

    val text = "the quick brown fox jumps over the lazy dog. " * 12
    writeJsonl(in, "f1.jsonl", Seq(
      s"""{"doc_id": 1, "text": "$text", "lang": "en", "source": "a"}""",
      s"""{"doc_id": 2, "text": "$text some more words here", "lang": "en", "source": "a"}""",
      """{"doc_id": 3, "text":""" // corrupt: truncated JSON
    ))

    val (storeQ, quarantineQ) = FileIngest.start(spark, in, store, quarantine, ckpt)
    try {
      storeQ.processAllAvailable(); quarantineQ.processAllAvailable()

      // second file ARRIVES while the stream runs
      writeJsonl(in, "f2.jsonl", Seq(
        s"""{"doc_id": 4, "text": "$text and a different tail", "lang": "en", "source": "b"}""",
        """not json at all"""
      ))
      storeQ.processAllAvailable(); quarantineQ.processAllAvailable()

      val idx = spark.read.parquet(store)
      val docIds = idx.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(docIds == Set(1L, 2L, 4L), s"indexed docs: $docIds")
      // chunk pipeline ran: multiple chunks per doc, embeddings + buckets present
      assert(idx.count() > 3)
      assert(idx.filter(col("embedding").isNull || col("bucket").isNull).count() == 0)
      // physically partitioned by bucket (partition-pruned retrieval layout)
      val bucketDirs = new java.io.File(store).list().count(_.startsWith("bucket="))
      assert(bucketDirs > 0)

      // corrupt lines landed in quarantine, one per bad record
      val bad = spark.read.parquet(quarantine).collect().map(_.getString(0))
      assert(bad.length == 2, bad.mkString("; "))

      // retrieval over the streamed store: the s2-shaped pruned probe.
      // Querying with an indexed chunk's own text guarantees its LSH
      // bucket matches, so the top hit must be that chunk.
      import spark.implicits._
      val probe = idx.select("chunk_uid", "chunk").orderBy("chunk_uid").head()
      val queries = Seq((100L, probe.getString(1))).toDF("query_id", "question")
      val hits = graft.sources.VectorStoreSink.retrieve(spark, store, queries, k = 2)
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      assert(hits.nonEmpty)
      assert(hits.head == ((1, probe.getLong(0))), hits.mkString(","))
    } finally {
      storeQ.stop(); quarantineQ.stop()
    }
  }

  test("restart from checkpoint does not re-ingest processed files") {
    val root = Files.createTempDirectory("graft-ingest2").toString
    val in = s"$root/in"; val store = s"$root/store"
    val quarantine = s"$root/quarantine"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    writeJsonl(in, "f1.jsonl",
      Seq("""{"doc_id": 1, "text": "some document text that is long enough", "lang": "en", "source": "a"}"""))

    val (q1, b1) = FileIngest.start(spark, in, store, quarantine, ckpt)
    q1.processAllAvailable(); b1.processAllAvailable()
    q1.stop(); b1.stop()
    val countAfterFirst = spark.read.parquet(store).count()

    // restart against the same checkpoint: f1 must not be re-indexed
    val (q2, b2) = FileIngest.start(spark, in, store, quarantine, ckpt)
    try {
      q2.processAllAvailable(); b2.processAllAvailable()
      assert(spark.read.parquet(store).count() == countAfterFirst)
    } finally { q2.stop(); b2.stop() }
  }
}
