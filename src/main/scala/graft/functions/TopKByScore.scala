package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken by smaller id) and returns the ids as an
  * array ordered best-first.
  *
  * This is the scale-path replacement for the window-function top-k the
  * reference's retriever implies (customTrainDataController.js:70
  * `vectorStore.asRetriever()`): a window `row_number` must shuffle ALL
  * N×Q scored pairs to Q partitions before discarding everything past
  * rank k, while this aggregate combines map-side — each input partition
  * contributes at most k rows per group to the shuffle, so shuffle volume
  * is O(partitions × groups × k) regardless of N. On a 1000-executor /
  * 100 TB scan the window variant is a cluster-wide shuffle of the whole
  * score matrix; this is a few kilobytes per partition.
  *
  * Buffer = flat arrays (no boxing); update inserts only when the
  * candidate beats the current worst, so steady-state cost per row is one
  * comparison.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = { buf.mergeIn(other); buf }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

/** Fixed-capacity min-heap-free top-k: a small unsorted array plus the
  * index of the current worst entry; k is small (≤ a few hundred) so a
  * linear rescan on eviction beats heap bookkeeping. Order: higher score
  * wins, then lower id. */
final class TopKBuffer(val k: Int) {
  private[functions] var scores = new Array[Double](k)
  private[functions] var ids = new Array[Long](k)
  private[functions] var size = 0
  private var worst = -1 // index of current worst, valid when size == k

  // Total-order comparison matching Spark's SortOrder on doubles: NaN is
  // the LARGEST value (first under DESC). Raw `>` would make NaN lose
  // every comparison, silently diverging from the window form this
  // aggregate replaces. java.lang.Double.compare gives that total order;
  // -0.0 is normalized to 0.0 at insert (below) to mirror Spark's
  // NormalizeFloatingNumbers, so compare() never sees a ±0.0 tie.
  @inline private def beats(s: Double, i: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && i < i2)
  }

  def insert(s0: Double, i: Long): Unit = {
    val s = if (s0 == 0.0d) 0.0d else s0 // -0.0 → 0.0 (Spark sorts them equal)
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      if (size == k) worst = findWorst()
    } else if (beats(s, i, scores(worst), ids(worst))) {
      scores(worst) = s; ids(worst) = i
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

  def mergeIn(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  /** ids ordered best-first (score desc with NaN first, id asc) — the
    * same total order as `beats`, not a `sortBy(-score)` negation, which
    * would misplace NaN. */
  def sortedIds: Array[Long] = {
    (0 until size).toArray
      .sortWith((a, b) => beats(scores(a), ids(a), scores(b), ids(b)))
      .map(ids(_))
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { val s = bb.getDouble; val i = bb.getLong; buf.insert(s, i); j += 1 }
    buf
  }
}

object TopK {
  /** Column API: topk_by_score(score, id, k) → Array[Long] best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Shim.column(
      TopKByScore(Shim.expression(score), Shim.expression(id), k)
        .toAggregateExpression())
}
