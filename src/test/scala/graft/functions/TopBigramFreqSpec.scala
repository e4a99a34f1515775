package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopBigramFreqSpec extends SparkSpec {

  private def brute(ws: Seq[String]): Long =
    if (ws.length < 2) 0L
    else ws.sliding(2).map(_.mkString(" ")).toSeq.groupBy(identity).values.map(_.size).max.toLong

  test("expression equals the brute-force sliding-window count on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small vocab forces repeated bigrams; include empty and 1-word arrays
    val data = (1 to 300).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => "w" + rnd.nextInt(6)).toSeq
    } :+ Seq.empty[String] :+ Seq("only")
    val df = data.toDF("w")
    val rows = df.select(col("w"), TopBigramFreq(col("w")).as("top")).collect()
    rows.foreach { r =>
      val ws = r.getSeq[String](0)
      assert(r.getLong(1) == brute(ws), s"mismatch for $ws")
    }
  }

  test("null elements break the bigram chain instead of throwing (SQL callers)") {
    // SQL callers can pass array('a', NULL, ...); exercise eval + codegen
    // through the Column API with null tokens (same evaluation path)
    import spark.implicits._
    val df = Seq(
      Seq[String]("a", "b", null, "a", "b", "a", "b"), // chain breaks at null: 'a b' ×3
      Seq[String](null, null),
      Seq[String]("x", null)).toDF("w")
    val got = df.select(TopBigramFreq(col("w"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 0L, 0L))
  }

  test("fully repetitive array yields n-1; all-distinct adjacent bigrams yield 1") {
    import spark.implicits._
    val df = Seq(
      Seq.fill(10)("rep"),
      (1 to 10).map("u" + _)).toDF("w")
    val got = df.select(TopBigramFreq(col("w"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L, 1L))
  }
}
