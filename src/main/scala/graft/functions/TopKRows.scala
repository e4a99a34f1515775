package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate that carries a PAYLOAD struct with each kept
  * row: keeps the k (score, id, payload) entries with the highest score
  * (ties broken by id, ascending or descending per `idAsc`) and returns
  * the payload structs as an array ordered best-first.
  *
  * This generalizes [[TopKByScore]] (which keeps only ids) to the
  * latest-per-key / top-k-with-columns shape: `row_number() OVER
  * (PARTITION BY p ORDER BY s DESC, id) WHERE rn <= k` with arbitrary
  * projected columns. The window form shuffles EVERY row of the corpus
  * to its group's reducer before discarding all but k; this aggregate
  * combines map-side, so the shuffle carries at most k rows per
  * (partition, group) — on a 100 TB events table with a `latest event
  * per user` query, that is the difference between shuffling the table
  * and shuffling one row per user per input partition.
  *
  * Buffer = flat primitive arrays for (score, id) plus an InternalRow
  * array for payloads; a candidate only materializes its payload copy
  * AFTER beating the current worst, so steady-state cost per non-qualifying
  * row is one comparison and zero allocation.
  */
case class TopKRowsByScore(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    idAsc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  private lazy val payloadSchema = payload.dataType.asInstanceOf[StructType]

  // Payload rows are stored as dedicated UnsafeRow copies: the struct
  // eval returns a row whose variable-length values (UTF8String) alias
  // the scan's reused input buffer, and GenericInternalRow.copy() is
  // shallow — a deep unsafe projection + copy() is the only safe way to
  // retain a row across input iterations.
  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadSchema)

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(k, idAsc, payloadSchema)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]; val iv = i.asInstanceOf[Long]
      if (buf.wouldAccept(sv, iv)) {
        val row = payload.eval(input).asInstanceOf[InternalRow]
        buf.insert(sv, iv, toUnsafe(row).copy())
      }
    }
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKRowsBuffer): Any = new GenericArrayData(buf.sortedRows)

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer =
    TopKRowsBuffer.fromBytes(k, idAsc, payloadSchema, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "topk_rows_by_score"
}

/** Fixed-capacity top-k of (score, id, payload) entries. Order: higher
  * score wins, ties by id (direction per `idAsc`). Same linear-rescan
  * eviction strategy as [[TopKBuffer]] — k is small. */
final class TopKRowsBuffer(val k: Int, val idAsc: Boolean, val schema: StructType) {
  private[functions] var scores = new Array[Double](k)
  private[functions] var ids = new Array[Long](k)
  private[functions] var rows = new Array[InternalRow](k)
  private[functions] var size = 0
  private var worst = -1 // valid when size == k

  // Total order matching Spark's SortOrder on doubles: NaN ranks LARGEST
  // (first under DESC), ±0.0 compare equal (normalized at the entry
  // points below, mirroring NormalizeFloatingNumbers). Raw `>` would
  // never accept a NaN score — a silent divergence from the window form
  // the WindowTopKRewrite replaces.
  @inline private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && (if (idAsc) i < i2 else i > i2))
  }

  @inline private def norm(s: Double): Double = if (s == 0.0d) 0.0d else s

  /** True iff insert(s, i, _) would retain the entry — lets the caller
    * skip materializing the payload copy for losing rows. */
  def wouldAccept(s0: Double, i: Long): Boolean = {
    val s = norm(s0)
    size < k || beats(s, i, scores(worst), ids(worst))
  }

  def insert(s0: Double, i: Long, row: InternalRow): Unit = {
    val s = norm(s0)
    if (size < k) {
      scores(size) = s; ids(size) = i; rows(size) = row; size += 1
      if (size == k) worst = findWorst()
    } else if (beats(s, i, scores(worst), ids(worst))) {
      scores(worst) = s; ids(worst) = i; rows(worst) = row
      worst = findWorst()
    }
  }

  private def findWorst(): Int = {
    var w = 0; var j = 1
    while (j < size) {
      if (beats(scores(w), ids(w), scores(j), ids(j))) w = j
      j += 1
    }
    w
  }

  def mergeIn(other: TopKRowsBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j), other.rows(j)); j += 1 }
  }

  /** payload rows ordered best-first — same total order as `beats` (a
    * `sortBy(-score)` negation would misplace NaN). */
  def sortedRows: Array[InternalRow] = {
    (0 until size).toArray
      .sortWith((a, b) => beats(scores(a), ids(a), scores(b), ids(b)))
      .map(rows(_))
  }

  def toBytes: Array[Byte] = {
    // rows are always dedicated UnsafeRows (inserted via projection+copy
    // or deserialized), so their bytes can be written out directly
    val encoded = (0 until size).map { j =>
      (scores(j), ids(j), rows(j).asInstanceOf[UnsafeRow].getBytes)
    }
    val total = 4 + encoded.map(e => 8 + 8 + 4 + e._3.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(size)
    encoded.foreach { case (s, i, b) =>
      bb.putDouble(s); bb.putLong(i); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }
}

object TopKRows {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Shim

  /** Column API: bounded top-k rows per group — keeps the k highest
    * (score, id-tiebreak) entries and returns their payload structs
    * best-first. `payload` must be a struct column. */
  def topKRowsByScore(score: Column, id: Column, payload: Column, k: Int,
      idAsc: Boolean = true): Column =
    Shim.column(TopKRowsByScore(Shim.expression(score), Shim.expression(id),
      Shim.expression(payload), k, idAsc).toAggregateExpression())
}

object TopKRowsBuffer {
  def fromBytes(k: Int, idAsc: Boolean, schema: StructType, bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKRowsBuffer(k, idAsc, schema)
    var j = 0
    while (j < n) {
      val s = bb.getDouble; val i = bb.getLong
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(schema.length)
      row.pointTo(rowBytes, len)
      buf.insert(s, i, row)
      j += 1
    }
    buf
  }
}
