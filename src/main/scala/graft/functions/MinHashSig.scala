package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Full k-hash MinHash signature of a token array's adjacent word
  * bigrams, as ONE codegen'd expression: for every bigram
  * `t[i] + ' ' + t[i+1]`, the md5-prefix base hash (bit-identical to
  * [[Md5PrefixModUtil]]) feeds k permutations `(a_j·h + b_j) mod P`,
  * and the per-permutation minima are the signature.
  *
  * The relational formulation explodes every shingle hash of the corpus
  * through a doc-keyed shuffle just to take k minima per document —
  * per-document state that one pass over the row computes. With this
  * expression, MinHash LSH is: map (signature) → ×bands explode → band
  * bucket join; nothing doc×shingle-shaped is ever exchanged. Duplicate
  * bigrams need no dedup pass: min() is idempotent, so repeats cannot
  * change any signature lane.
  *
  * Contract: fewer than two tokens yields a signature of P sentinels
  * (every real lane value is < P) — callers filter those rows out, as
  * the relational form's size-≥2 filter did. A null ELEMENT forms no
  * bigram with either neighbour (internal callers never produce null
  * tokens, but the eval must not NPE on one). */
object MinHashSigUtil {
  private val Space = UTF8String.fromString(" ")

  def sig(arr: ArrayData, mod: Long, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(mod)
    var i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        val bg = UTF8String.concat(arr.getUTF8String(i), Space, arr.getUTF8String(i + 1))
        val h = Md5PrefixModUtil.hash(bg, mod)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % mod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, mod: Long, as: Seq[Long], bs: Seq[Long])
  extends UnaryExpression {
  require(mod > 0 && as.nonEmpty && as.length == bs.length)

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigUtil.sig(input.asInstanceOf[ArrayData], mod, asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigUtil.sig($c, ${mod}L, $asRef, $bsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigF {
  def apply(tokens: Column, mod: Long, as: Seq[Long], bs: Seq[Long]): Column =
    Shim.column(MinHashSig(Shim.expression(tokens), mod, as, bs))
}
