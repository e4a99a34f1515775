package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling hash of every w-TOKEN sliding window of a text, one 64-bit
  * fingerprint per window position (index = starting token position).
  * The exact-substring dedup primitive (d17): grouping windows by this
  * fingerprint is equivalent to grouping by the window's token string,
  * absent 64-bit collisions — the accepted fingerprinting trade.
  *
  * Cost is the point: a slice-and-hash per position re-reads w tokens
  * per window (O(n·w) per doc — at 100 TB the dominant map-stage term);
  * here both levels roll. Per-token char hashes accumulate in one
  * left-to-right pass, and the window hash is a degree-(w-1) polynomial
  * over token hashes mod 2^64, updated in O(1) per step (Rabin-Karp,
  * the [[WinnowUtil]] construction one level up the token hierarchy).
  * Whitespace tokenization mirrors `split(text, "\\s+")` including the
  * leading-empty-token rule, so positions line up with the declarative
  * form.
  */
object TokenWindowHashUtil {
  final val CharBase = 1000003L
  final val TokBase = 0x9E3779B97F4A7C15L // odd ⇒ invertible mod 2^64

  def windowHashes(text: UTF8String, w: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    // one pass: per-token polynomial char hashes, split on whitespace runs
    val toks = new scala.collection.mutable.ArrayBuffer[Long]()
    if (n > 0 && Character.isWhitespace(s.charAt(0))) toks += 0L // split("\\s+") keeps a leading empty token
    var i = 0
    while (i < n) {
      if (Character.isWhitespace(s.charAt(i))) i += 1
      else {
        var h = 0L
        while (i < n && !Character.isWhitespace(s.charAt(i))) {
          h = h * CharBase + s.charAt(i); i += 1
        }
        toks += h
      }
    }
    val m = toks.length
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L
    var k = 1
    while (k < w) { pow *= TokBase; k += 1 }
    val out = new Array[Long](m - w + 1)
    var hw = 0L
    k = 0
    while (k < w) { hw = hw * TokBase + toks(k); k += 1 }
    out(0) = hw
    k = 1
    while (k <= m - w) {
      hw = (hw - toks(k - 1) * pow) * TokBase + toks(k + w - 1)
      out(k) = hw
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** token_window_hashes(text, w) → array<long>, index = token position. */
case class TokenWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hashes"

  protected override def nullSafeEval(input: Any): Any =
    TokenWindowHashUtil.windowHashes(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenWindowHashUtil.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindows {
  def hashes(text: Column, w: Int): Column =
    Shim.column(TokenWindowHashes(Shim.expression(text), w))
}
