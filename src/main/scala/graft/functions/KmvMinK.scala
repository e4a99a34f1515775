package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: keeps the k smallest
  * DISTINCT hash values seen and returns them ascending (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM'02 — the
  * bottom-k estimator: with h uniform on [0, M), the k-th smallest
  * distinct hash v_k estimates the distinct count as (k−1)·M / v_k).
  * Reference analogue: the reference's usage dashboards re-aggregate
  * the raw collection per request (controllers/trackUsageController.js:
  * 61-133, TrackUsage.aggregate grouped rollups); a recurring 100 TB
  * crawl keeps a mergeable sketch ledger instead.
  *
  * Why an aggregate and not `slice(array_sort(collect_set(h)), 1, k)`:
  * collect_set's buffer is CARDINALITY-sized — per group it holds every
  * distinct hash before the slice throws almost all of them away, which
  * at 100 TB is the corpus in executor memory. This buffer is k longs,
  * map-side combinable, and the shuffle carries at most k values per
  * (partition, group) no matter how many rows streamed in. Duplicates
  * dedup INSIDE the buffer (binary-search insert rejects an exact hit),
  * so no distinct-exchange precedes the sketch — one pass, one bounded
  * shuffle, same as the a1/a4 HLL path but with a value-level artifact
  * the engine can also UNION-merge (the union of two groups' bottom-k
  * sets, re-truncated to k, IS the union sketch — a4's mergeability
  * contract for sampling sketches).
  *
  * Determinism: md5-prefix hashes in, exact longs out — no RNG, no
  * floats, so the DuckDB oracle reproduces the sketch bit-for-bit with
  * a per-group ORDER BY hash LIMIT k (the d3 hash-parity discipline).
  */
case class KmvMinK(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KmvBuffer): Any = new GenericArrayData(buf.values)

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "kmv_min_k"
}

/** Sorted-ascending distinct array of at most k longs. Insert is a
  * binary search + shift (k is small — 64 here — so the memmove beats
  * tree bookkeeping); an exact duplicate is rejected, which is what
  * makes the sketch correct WITHOUT a distinct() upstream. */
final class KmvBuffer(val k: Int) {
  private[functions] var vals = new Array[Long](k)
  private[functions] var size = 0

  def insert(h: Long): Unit = {
    if (size == k && h >= vals(size - 1)) return // can't make the cut
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && vals(lo) == h) return // duplicate — already held
    // shift right from the insertion point; the last slot falls off
    // when the buffer is full
    var j = math.min(size, k - 1)
    while (j > lo) { vals(j) = vals(j - 1); j -= 1 }
    vals(lo) = h
    if (size < k) size += 1
  }

  def mergeIn(other: KmvBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.vals(j)); j += 1 }
  }

  def values: Array[Long] = java.util.Arrays.copyOfRange(vals, 0, size)

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 8)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putLong(vals(j)); j += 1 }
    bb.array()
  }
}

object KmvBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getLong); j += 1 }
    buf
  }
}

object Kmv {
  /** Column API: kmv_min_k(hash, k) → Array[Long], the k smallest
    * distinct hashes ascending. */
  def minK(hash: Column, k: Int): Column =
    Shim.column(KmvMinK(Shim.expression(hash), k).toAggregateExpression())
}
