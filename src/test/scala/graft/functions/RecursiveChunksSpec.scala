package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecursiveChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(text: String, size: Int, overlap: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(RecursiveChunksF.chunks(col("text"), size, overlap).as("c"))
      .head().getSeq[String](0)

  test("short text is a single chunk; empty text none") {
    assert(chunk("hello", 10, 2) == Seq("hello"))
    assert(chunk("", 10, 2).isEmpty)
  }

  test("every chunk respects the size cap and chunks cover the text") {
    // non-periodic text: indexOf-based alignment below would find earlier
    // occurrences of a chunk in repeated text and misreport a gap
    val rnd = new scala.util.Random(3)
    val text = (1 to 250).map(i => s"w$i${rnd.alphanumeric.take(3).mkString}").mkString(" ")
    val cs = chunk(text, 100, 20)
    assert(cs.forall(_.length <= 100))
    // coverage: text reconstructible by aligning each chunk at its position
    var pos = 0
    cs.foreach { c =>
      val at = text.indexOf(c, math.max(0, pos - 60))
      assert(at >= 0, s"chunk not found in order: $c")
      pos = at + c.length
    }
    assert(pos == text.length, "chunks do not reach end of text")
  }

  test("prefers paragraph > newline > space boundaries") {
    val para = "aaaa aaaa\n\nbbbb bbbb cccc"
    val cs = chunk(para, 12, 0)
    assert(cs.head.endsWith("\n\n"), cs.toString) // paragraph cut wins
    val spaces = "one two three four five six"
    chunk(spaces, 10, 0).dropRight(1).foreach(c => assert(c.endsWith(" "), c))
  }

  test("paragraph separator straddling the window edge never oversizes a chunk") {
    // "\n\n" starting exactly at index chunkSize - 1 spans the window
    // boundary; a lastIndexOf from end - 1 would cut at end + 1 and emit
    // a chunkSize + 1 chunk.
    for (size <- 8 to 14) {
      val text = "a" * (size - 1) + "\n\n" + "b" * 30
      val cs = chunk(text, size, 0)
      assert(cs.forall(_.length <= size), s"size=$size -> ${cs.map(_.length)}")
    }
  }

  test("hard cut only when no separator exists in range") {
    val cs = chunk("x" * 250, 100, 10)
    assert(cs.forall(_.length <= 100))
    assert(cs.length >= 3)
  }

  test("t6 query is deterministic and covers all non-empty docs") {
    val a = graft.operators.TextAnalysis.t6RecursiveChunk(spark, sfDir).collect().toSeq
    val b = graft.operators.TextAnalysis.t6RecursiveChunk(spark, sfDir).collect().toSeq
    assert(a == b)
    val docs = graft.Tables.documents(spark, sfDir).filter(length(col("text")) > 0).count()
    assert(a.map(_.getLong(0)).distinct.size.toLong == docs)
  }
}
