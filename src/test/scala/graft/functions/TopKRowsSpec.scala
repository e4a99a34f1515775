package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TopKRowsSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))
  private val proj = UnsafeProjection.create(schema)

  private def row(id: Long, s: String) =
    proj(InternalRow(id, UTF8String.fromString(s))).copy()

  private def idsOf(b: TopKRowsBuffer) = b.sortedRows.map(_.getLong(0)).toSeq

  test("keeps k best by (score desc, id asc), best-first") {
    val b = new TopKRowsBuffer(2, idAsc = true, schema)
    b.insert(1.0, 10, row(10, "a"))
    b.insert(3.0, 30, row(30, "c"))
    b.insert(2.0, 20, row(20, "b"))
    b.insert(3.0, 5, row(5, "t")) // ties: lower id beats id=30? no — beats 2.0
    assert(idsOf(b) == Seq(5L, 30L))
    assert(b.sortedRows.map(_.getUTF8String(1).toString).toSeq == Seq("t", "c"))
  }

  test("descending id tiebreak") {
    val b = new TopKRowsBuffer(2, idAsc = false, schema)
    b.insert(1.0, 1, row(1, "x"))
    b.insert(1.0, 9, row(9, "y"))
    b.insert(1.0, 5, row(5, "z"))
    assert(idsOf(b) == Seq(9L, 5L))
  }

  test("serialize round-trip preserves distinct payloads (no buffer aliasing)") {
    val b = new TopKRowsBuffer(3, idAsc = true, schema)
    b.insert(3.0, 3, row(3, "three"))
    b.insert(2.0, 2, row(2, "two"))
    b.insert(1.0, 1, row(1, "one"))
    val back = TopKRowsBuffer.fromBytes(3, idAsc = true, schema, b.toBytes)
    assert(back.sortedRows.map(_.getUTF8String(1).toString).toSeq ==
      Seq("three", "two", "one"))
    assert(idsOf(back) == Seq(3L, 2L, 1L))
  }

  test("merge equals inserting both streams") {
    val a = new TopKRowsBuffer(3, idAsc = true, schema)
    val b = new TopKRowsBuffer(3, idAsc = true, schema)
    Seq((5.0, 50L), (1.0, 10L)).foreach { case (s, i) => a.insert(s, i, row(i, s.toString)) }
    Seq((4.0, 40L), (3.0, 30L), (2.0, 20L)).foreach { case (s, i) => b.insert(s, i, row(i, s.toString)) }
    a.mergeIn(b)
    assert(idsOf(a) == Seq(50L, 40L, 30L))
  }

  test("NaN scores rank largest, matching Spark's DESC sort order") {
    val b = new TopKRowsBuffer(2, idAsc = true, schema)
    b.insert(9.0, 1, row(1, "finite"))
    assert(b.wouldAccept(Double.NaN, 2))
    b.insert(Double.NaN, 2, row(2, "nan"))
    b.insert(Double.PositiveInfinity, 3, row(3, "inf"))
    assert(idsOf(b) == Seq(2L, 3L)) // NaN first, then +Inf; 9.0 evicted
  }

  test("±0.0 tie is broken by id, in both tiebreak directions") {
    val asc = new TopKRowsBuffer(1, idAsc = true, schema)
    asc.insert(0.0, 7, row(7, "a"))
    assert(asc.wouldAccept(-0.0, 3)) // same rank, lower id wins
    asc.insert(-0.0, 3, row(3, "b"))
    assert(idsOf(asc) == Seq(3L))
    val desc = new TopKRowsBuffer(1, idAsc = false, schema)
    desc.insert(-0.0, 3, row(3, "b"))
    desc.insert(0.0, 7, row(7, "a"))
    assert(idsOf(desc) == Seq(7L))
  }

  test("wouldAccept is consistent with insert") {
    val b = new TopKRowsBuffer(1, idAsc = true, schema)
    b.insert(2.0, 2, row(2, "a"))
    assert(b.wouldAccept(3.0, 9))
    assert(b.wouldAccept(2.0, 1)) // tie, lower id wins
    assert(!b.wouldAccept(2.0, 3))
    assert(!b.wouldAccept(1.0, 0))
  }
}
