package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): Rabin-Karp rolling hash over k-char windows, then the
  * minimum hash of each w-hash window is selected (rightmost-min rule),
  * yielding a small position-robust fingerprint set. Guarantees any
  * shared substring of length ≥ w+k-1 contributes a shared fingerprint.
  *
  * One pass, O(len) amortized, no substring allocation — the rolling
  * hash updates incrementally, unlike an n-gram hash that re-reads k
  * chars per position.
  */
object WinnowUtil {
  final val Base = 1000003L
  final val K = 8 // n-gram length
  final val W = 4 // winnow window (hashes)

  def fingerprints(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < K) { // short text: single hash of the whole string
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + s.charAt(i); i += 1 }
      return new GenericArrayData(Array(h))
    }
    val numHashes = n - K + 1
    val hashes = new Array[Long](numHashes)
    var pow = 1L
    var i = 1
    while (i < K) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < K) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < numHashes) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + K - 1)
      hashes(i) = h
      i += 1
    }
    // winnow: min of each window of W hashes, rightmost on ties
    val sel = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    val lastStart = math.max(numHashes - W, 0)
    while (start <= lastStart) {
      var minIdx = start
      var j = start + 1
      val end = math.min(start + W, numHashes)
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      sel.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** winnow_fingerprints(text) → sorted distinct array<long>. */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  protected override def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowUtil.fingerprints($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  def fingerprints(text: Column): Column =
    Shim.column(WinnowFingerprints(Shim.expression(text)))
}
