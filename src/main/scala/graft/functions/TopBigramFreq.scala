package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Max multiplicity of any adjacent word bigram in a token array, as one
  * codegen'd expression — the Gopher "top 2-gram fraction" numerator
  * computed row-locally.
  *
  * The relational formulation (explode bigrams → count per (doc, bigram)
  * → max per doc) shuffles every bigram of the corpus twice to answer a
  * per-document question; this expression replaces both exchanges and
  * the join back with one hash-count pass per row, so the repetition
  * screen becomes a pure map stage that scales with scan bandwidth.
  *
  * Bigrams are identified by an FNV-1a hash over `w1 + ' ' + w2` (no
  * bigram strings are allocated); equal bigrams always collide onto the
  * same key, and a false 64-bit collision — which could only ever
  * OVERSTATE the max multiplicity — needs ~2^32 distinct bigrams in one
  * document (same argument as [[CharNgramJaccardUtil]]).
  *
  * Returns 0 for arrays with fewer than two elements; null array → null.
  * A null ELEMENT breaks the bigram chain (no bigram is formed with it on
  * either side) — internal callers never produce null tokens, but the
  * expression is SQL-registered and must survive `array('a', NULL, 'b')`.
  */
object TopBigramFreqUtil {
  private def fnvWord(h0: Long, s: String): Long = {
    var h = h0
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong & 0xffffL; h *= SimHashUtil.FnvPrime; i += 1 }
    h
  }

  def topBigramFreq(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[java.lang.Long, Int](math.min(n, 64))
    var best = 0
    // hash each word once, then combine adjacent (prev, cur) pairs with
    // the separator in between — identical key to hashing "w1 w2"
    var prev = 0L
    var prevValid = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        prevValid = false // a null token forms no bigram on either side
      } else {
        val wordHash = fnvWord(SimHashUtil.FnvOffset, arr.getUTF8String(i).toString)
        if (prevValid) {
          val sep = prev ^ (' '.toLong & 0xffffL)
          val cur = fnvWord(sep * SimHashUtil.FnvPrime, arr.getUTF8String(i).toString)
          val c = counts.merge(cur, 1, (a, b) => a + b)
          if (c > best) best = c
        }
        prev = wordHash
        prevValid = true
      }
      i += 1
    }
    best.toLong
  }
}

case class TopBigramFreq(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_bigram_freq requires array<string>, got $other")
    }
  }
  override def prettyName: String = "top_bigram_freq"

  protected override def nullSafeEval(input: Any): Any =
    TopBigramFreqUtil.topBigramFreq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TopBigramFreqUtil.topBigramFreq($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopBigramFreq {
  def apply(words: Column): Column =
    Shim.column(TopBigramFreq(Shim.expression(words)))
}
