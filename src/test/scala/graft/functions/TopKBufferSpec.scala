package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TopKBufferSpec extends AnyFunSuite {

  private def naiveTopK(pairs: Seq[(Double, Long)], k: Int): Seq[Long] =
    pairs.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)

  test("keeps the k best by (score desc, id asc)") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 10L), (5.0, 2L), (3.0, 7L), (5.0, 1L), (0.5, 99L)).foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.sortedIds.toSeq == Seq(1L, 2L, 7L))
  }

  test("ties broken by smaller id") {
    val buf = new TopKBuffer(2)
    Seq((1.0, 5L), (1.0, 3L), (1.0, 9L)).foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.sortedIds.toSeq == Seq(3L, 5L))
  }

  test("matches naive top-k on random input (seeded)") {
    val rnd = new Random(42)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(40)
      val pairs = Seq.fill(n)((rnd.nextInt(200) / 2.0 - 50, rnd.nextInt(50).toLong))
      val buf = new TopKBuffer(5)
      pairs.foreach { case (s, i) => buf.insert(s, i) }
      assert(buf.sortedIds.toSeq == naiveTopK(pairs, 5), s"trial $trial: $pairs")
    }
  }

  test("merge equals single-buffer insert of the union (seeded)") {
    val rnd = new Random(7)
    for (trial <- 0 until 200) {
      val l = Seq.fill(rnd.nextInt(20))((rnd.nextInt(40) / 2.0 - 10, rnd.nextInt(30).toLong))
      val r = Seq.fill(rnd.nextInt(20))((rnd.nextInt(40) / 2.0 - 10, rnd.nextInt(30).toLong))
      val a = new TopKBuffer(4); l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKBuffer(4); r.foreach { case (s, i) => b.insert(s, i) }
      a.mergeIn(b)
      assert(a.sortedIds.toSeq == naiveTopK(l ++ r, 4), s"trial $trial")
    }
  }

  test("NaN scores rank LARGEST (Spark SortOrder semantics), not unplaceable") {
    // Spark's window `ORDER BY score DESC` puts NaN first; the buffer
    // must agree or the WindowTopKRewrite changes results on NaN input.
    val buf = new TopKBuffer(2)
    Seq((1.0, 1L), (Double.NaN, 2L), (5.0, 3L), (Double.NaN, 4L)).foreach {
      case (s, i) => buf.insert(s, i)
    }
    assert(buf.sortedIds.toSeq == Seq(2L, 4L)) // both NaNs beat every finite score
  }

  test("-0.0 and 0.0 are the same rank (ties fall through to id)") {
    val buf = new TopKBuffer(2)
    Seq((0.0, 7L), (-0.0, 3L), (-1.0, 1L)).foreach { case (s, i) => buf.insert(s, i) }
    assert(buf.sortedIds.toSeq == Seq(3L, 7L))
  }

  test("serialization round-trips") {
    val buf = new TopKBuffer(4)
    Seq((2.0, 1L), (3.0, 2L), (1.0, 3L)).foreach { case (s, i) => buf.insert(s, i) }
    val back = TopKBuffer.fromBytes(4, buf.toBytes)
    assert(back.sortedIds.toSeq == buf.sortedIds.toSeq)
  }
}
