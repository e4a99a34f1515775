package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** STUB text encoder: L2-normalized 64-bucket character histogram.
  *
  * Stands in for a model encoder (no model runtime in this container) so
  * the RAG pipeline (graft.operators.RagPipeline) is runnable end-to-end:
  * deterministic, similar texts → nearby vectors, identical text →
  * identical vector (cosine exactly 1). A real deployment swaps ONLY
  * this expression for a batched model-inference stage; every operator
  * downstream (LSH bucketing, top-k retrieval) is unchanged.
  */
object CharHistEmbedUtil {
  final val Dim = 64

  def embed(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Float](Dim)
    var i = 0
    while (i < bytes.length) { counts((bytes(i) & 0x7f) % Dim) += 1f; i += 1 }
    var norm = 0.0
    i = 0
    while (i < Dim) { norm += counts(i).toDouble * counts(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < Dim) { counts(i) *= inv; i += 1 }
    }
    new GenericArrayData(counts.map(java.lang.Float.valueOf))
  }
}

case class CharHistEmbed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "char_hist_embed"

  protected override def nullSafeEval(input: Any): Any =
    CharHistEmbedUtil.embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHistEmbedUtil.embed($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHistEmbedF {
  def embed(text: Column): Column = Shim.column(CharHistEmbed(Shim.expression(text)))
}
