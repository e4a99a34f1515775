package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual DIFFERENCE hash (dHash) over a binary payload —
  * the standard image near-dup fingerprint (Krawetz's dHash: compare
  * adjacent downsampled cells, bit i = cell_i > cell_{i+1}) applied to
  * the byte stream a decoded asset yields. 65 equal stripes of the
  * payload are averaged; 64 adjacent-pair comparisons make the hash.
  *
  * Why GRADIENT bits instead of aHash's mean-threshold bits: each bit
  * depends only on two ADJACENT stripes, so a local edit (appended
  * tail, re-encode artifacts at the end of the stream) perturbs only
  * the bits whose stripes it touches — the leading bits are provably
  * stable, which is what makes prefix blocking sound (aHash's global
  * mean couples every bit to every byte). Deterministic, no codec
  * involved: the container has no image libraries, so the payload IS
  * the decoded surrogate (the m1/m2/m3 convention).
  */
object DHashUtil {
  final val Cells = 65

  def dhash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cell = new Array[Double](Cells)
    var i = 0
    while (i < Cells) {
      val from = (i.toLong * n / Cells).toInt
      val until = ((i + 1).toLong * n / Cells).toInt
      if (until > from) {
        var s = 0L; var j = from
        while (j < until) { s += (bytes(j) & 0xff); j += 1 }
        cell(i) = s.toDouble / (until - from)
      }
      i += 1
    }
    var h = 0L
    i = 0
    while (i < Cells - 1) {
      if (cell(i) > cell(i + 1)) h |= (1L << i)
      i += 1
    }
    h
  }
}

case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires binary input, got ${child.dataType}")
  override def prettyName: String = "dhash64"

  protected override def nullSafeEval(input: Any): Any =
    DHashUtil.dhash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHashUtil.dhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash {
  def dhash64(payload: Column): Column = Shim.column(DHash64(Shim.expression(payload)))
}
