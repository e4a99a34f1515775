package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The broadcast merge-table BPE path (the production-vocabulary shape:
  * cl100k is ~100k merges — too big to compile into the expression tree,
  * exactly right for a TorrentBroadcast model artifact). */
class BpeBroadcastSpec extends SparkSpec {

  test("broadcast fixture table counts identically to the compiled expression") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      .withColumn("w", split(lower(col("text")), "[^a-z0-9]+"))
    val bc = spark.sparkContext.broadcast(BpeVocab.Table)
    val both = docs.select(col("doc_id"),
        BpeCountF.count(col("w")).as("compiled"),
        BpeCountF.countWith(col("w"), bc).as("broadcast"))
      .filter(col("compiled") =!= col("broadcast"))
    assert(both.isEmpty, s"divergent rows: ${both.collect().take(3).mkString}")
    // pseudo-random words over the merge alphabet, checked row-by-row
    val alpha = "thescanrowkeyvaluefast".toCharArray
    val words = (0 until 500).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until (3 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val wdf = words.map(w => Tuple1(Seq(w))).toDF("w")
    val diff = wdf.select(BpeCountF.count(col("w")).as("a"),
        BpeCountF.countWith(col("w"), bc).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }

  test("a 4k-merge synthetic table rides the broadcast and stays map-only") {
    import spark.implicits._
    // 26 chains x 160 rules: rule (c^i, c) -> c^{i+1} is valid BPE (its
    // left side is the previous rule's product, its right a base char)
    val merges: Array[(String, String)] =
      (for { c <- 'a' to 'z'; i <- 1 to 160 } yield (c.toString * i, c.toString)).toArray
    assert(merges.length >= 4000)
    val table = new BpeTable(merges)
    // independent driver-side truth: the canonical repeatedly-merge-the-
    // lowest-ranked-present-pair formulation (what tiktoken runs), which
    // for a valid table equals rank-ascending full application
    val rank = merges.zipWithIndex.toMap
    def canonical(word: String): Int = {
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        val cands = syms.indices.dropRight(1)
          .flatMap(j => rank.get((syms(j), syms(j + 1))).map(r => (r, j)))
        if (cands.isEmpty) done = true
        else {
          val (_, j) = cands.min
          syms = syms.patch(j, Seq(syms(j) + syms(j + 1)), 2)
        }
      }
      syms.length
    }
    Seq("a" * 161, "b" * 322, "z" * 5, "ab" * 40, "q").foreach { w =>
      assert(table.countWord(w) == canonical(w), s"loop != canonical on '$w'")
    }
    val bc = spark.sparkContext.broadcast(table)
    val rows = (0 until 200).map { i =>
      val c = ('a' + i % 26).toChar.toString
      (i.toLong, Seq(c * (1 + i), "mixed" + c))
    }
    val df = rows.toDF("id", "w")
    val got = df.select(col("id"), BpeCountF.countWith(col("w"), bc).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, ws) =>
      assert(got(id) == ws.map(table.countWord(_).toLong).sum, s"row $id")
    }
    // map-only: the counting projection plans with no exchange
    val plan = df.select(BpeCountF.countWith(col("w"), bc))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("countFromModel loads a persisted (rank, left, right) artifact in rank order") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("bpe_model").toString
    // persist the fixture table as the artifact, deliberately shuffled:
    // the loader must re-establish rank order or counts change
    val rnd = new scala.util.Random(7)
    rnd.shuffle(BpeVocab.Merges.zipWithIndex.toSeq)
      .map { case ((l, r), i) => (i.toLong + 1, l, r) }
      .toDF("rank", "left", "right")
      .write.mode("overwrite").parquet(path)
    val model = spark.read.parquet(path)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      .withColumn("w", split(lower(col("text")), "[^a-z0-9]+"))
    val diff = docs.select(BpeCountF.count(col("w")).as("a"),
        BpeCountF.countFromModel(spark, model, col("w")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty)
  }
}
