package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of the distinct character n-gram sets of two
  * strings, as one codegen'd expression.
  *
  * The naive plan (transform/sequence → array_distinct → array_intersect
  * / array_union) materializes ~L string objects per row per side; this
  * expression hashes each n-gram window inline (FNV-1a over the char
  * window) into a long set — no substring allocation, one pass per
  * string. Set semantics are identical to the string-set formulation
  * (a 64-bit collision would need ~2^32 distinct n-grams per doc).
  */
object CharNgramJaccardUtil {
  private def hashWindow(s: String, start: Int, n: Int): Long = {
    var h = SimHashUtil.FnvOffset
    var i = start
    while (i < start + n) { h ^= s.charAt(i).toLong & 0xffffL; h *= SimHashUtil.FnvPrime; i += 1 }
    h
  }

  private def ngramSet(s: String, n: Int): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long]()
    val len = s.length
    if (len <= n) { set.add(hashWindow(s, 0, len)); return set }
    var i = 0
    while (i + n <= len) { set.add(hashWindow(s, i, n)); i += 1 }
    set
  }

  def jaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = ngramSet(a.toString, n)
    val sb = ngramSet(b.toString, n)
    var overlap = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) overlap += 1 }
    val union = sa.size + sb.size - overlap
    if (union == 0) 0.0 else overlap.toDouble / union
  }

  /** The distinct n-gram hash set of one string as an array — the SAME
    * FNV window hashes [[jaccard]] compares, exposed so a candidate
    * screen (d2's prefix filter) can operate in the identical set space
    * and shuffle 8-byte longs instead of substrings. */
  def ngramHashes(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val set = ngramSet(s.toString, n)
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** NOTE on edge semantics: strings shorter than n contribute their whole
  * text as a single "shingle", mirroring the greatest(len-2, 1) guard in
  * the oracle SQL formulation. */
case class CharNgramJaccard(left: Expression, right: Expression, n: Int)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_ngram_jaccard"

  protected override def nullSafeEval(l: Any, r: Any): Any =
    CharNgramJaccardUtil.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CharNgramJaccardUtil.jaccard($a, $b, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgramJaccard {
  def apply(a: Column, b: Column, n: Int): Column =
    Shim.column(CharNgramJaccard(Shim.expression(a), Shim.expression(b), n))
}

/** char_ngram_hashes(text) → array<long>: the distinct FNV n-gram hash
  * set of a string (the exact set [[CharNgramJaccard]] scores over). */
case class CharNgramHashes(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  protected override def nullSafeEval(input: Any): Any =
    CharNgramJaccardUtil.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramJaccardUtil.ngramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramHashesF {
  def apply(text: Column, n: Int): Column =
    Shim.column(CharNgramHashes(Shim.expression(text), n))
}
