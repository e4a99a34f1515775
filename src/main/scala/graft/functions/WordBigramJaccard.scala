package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of the distinct WORD-BIGRAM sets of two strings,
  * as one codegen'd expression — the verify-stage scorer for LSH
  * candidate pairs (t18): the same shingle space d3's MinHash signature
  * approximates, computed exactly on the candidate sliver.
  *
  * Tokenization is `trim` + split on `\s+` — identical to the signature
  * path (MinHashSig's input split) and to the oracle's
  * `string_split_regex(trim(text), '\s+')`. Each bigram is hashed
  * (FNV-1a over "w1 w2") into a long set rather than materialized as a
  * string — the CharNgramJaccard design; a 64-bit collision would need
  * ~2^32 distinct bigrams per doc (the documented one-sided-error
  * argument, SURVEY oracle rules). */
object WordBigramJaccardUtil {
  private def fnv(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong & 0xffffL; h *= SimHashUtil.FnvPrime; i += 1 }
    h
  }

  private def bigramSet(s: String): java.util.HashSet[java.lang.Long] = {
    val t = s.trim.split("\\s+")
    val set = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i + 1 < t.length) {
      // hash(w1) ⊕ separator ⊕ hash(w2) chained — identical key to
      // hashing the string "w1 w2" (the TopBigramFreq scheme)
      val sep = fnv(fnv(SimHashUtil.FnvOffset, t(i)), " ")
      set.add(fnv(sep, t(i + 1)))
      i += 1
    }
    set
  }

  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val sa = bigramSet(a.toString)
    val sb = bigramSet(b.toString)
    var overlap = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) overlap += 1 }
    val union = sa.size + sb.size - overlap
    if (union == 0) 0.0 else overlap.toDouble / union
  }
}

case class WordBigramJaccard(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "word_bigram_jaccard"

  protected override def nullSafeEval(l: Any, r: Any): Any =
    WordBigramJaccardUtil.jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WordBigramJaccardUtil.jaccard($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordBigramJaccard {
  def apply(a: Column, b: Column): Column =
    Shim.column(WordBigramJaccard(Shim.expression(a), Shim.expression(b)))
}
