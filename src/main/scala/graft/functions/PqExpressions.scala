package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native expressions for the trained-PQ hot path
  * (graft.sources.PqCodebook, s9/s10). The declarative form — nested
  * `transform`/`aggregate` higher-order functions — is semantically
  * right but evaluates N × M × k interpreted lambdas (Spark HOFs don't
  * codegen); at 2000 corpus rows × 32 subspaces × 32 codewords that is
  * millions of boxed closure calls per pass, and it measured ~17 s for
  * the s9 curve at sf0.1. These expressions run the identical integer
  * arithmetic as tight JVM loops (the HOF twins remain in PqCodebook
  * and a spec pins native ≡ declarative).
  *
  * The loop bodies live in [[PqOps]] as static methods; `doGenCode`
  * emits a single static call, so whole-stage codegen stays intact
  * around them (the NearestIndex pattern, with the kernel hoisted).
  *
  * Fixed-point contract (must match PqCodebook + the DuckDB oracle):
  * components are floored to integer micros (`floor(v * 1e6)` as long)
  * before any arithmetic; distances/inner products are exact longs;
  * argmin ties resolve to the LOWEST codeword index. Codes are 1-based
  * (the `element_at` / SQL `array[i]` convention).
  */
object PqOps {

  /** micro-quantize the slice of v covered by subspace m (length taken
    * from the codeword). */
  private def microSub(v: ArrayData, offset: Int, sub: Int): Array[Long] = {
    val out = new Array[Long](sub)
    var j = 0
    while (j < sub) {
      out(j) = math.floor(v.getFloat(offset + j).toDouble * 1e6).toLong
      j += 1
    }
    out
  }

  /** codes[m] = 1-based argmin_c Σ_j (micro(v)[j] − cbs[m][c][j])², ties
    * to the lowest c. */
  def encode(v: ArrayData, cbs: ArrayData): ArrayData = {
    val m = cbs.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    var offset = 0
    while (mi < m) {
      val cb = cbs.getArray(mi)
      val k = cb.numElements()
      val sub = if (k == 0) 0 else cb.getArray(0).numElements()
      val x = microSub(v, offset, sub)
      var best = 0; var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        val cent = cb.getArray(c)
        var d = 0L; var j = 0
        while (j < sub) { val t = x(j) - cent.getLong(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best + 1
      offset += sub
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** tbls[m][c] = Σ_j micro(v)[j] · cbs[m][c][j] — the query's exact
    * integer ADC lookup table. */
  def table(v: ArrayData, cbs: ArrayData): ArrayData = {
    val m = cbs.numElements()
    val tbls = new Array[ArrayData](m)
    var mi = 0
    var offset = 0
    while (mi < m) {
      val cb = cbs.getArray(mi)
      val k = cb.numElements()
      val sub = if (k == 0) 0 else cb.getArray(0).numElements()
      val x = microSub(v, offset, sub)
      val row = new Array[Long](k)
      var c = 0
      while (c < k) {
        val cent = cb.getArray(c)
        var ip = 0L; var j = 0
        while (j < sub) { ip += x(j) * cent.getLong(j); j += 1 }
        row(c) = ip
        c += 1
      }
      tbls(mi) = new GenericArrayData(row)
      offset += sub
      mi += 1
    }
    new GenericArrayData(tbls)
  }

  /** Σ_m tbls[m][codes[m]] — M lookups, exact integer sum. */
  def score(codes: ArrayData, tbls: ArrayData): Long = {
    val m = math.min(codes.numElements(), tbls.numElements())
    var acc = 0L; var mi = 0
    while (mi < m) {
      acc += tbls.getArray(mi).getLong(codes.getInt(mi) - 1)
      mi += 1
    }
    acc
  }
}

abstract class PqBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  /** Static PqOps method the expression delegates to. */
  protected def kernel: String

  protected override def nullSafeEval(l: Any, r: Any): Any

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqOps.$kernel($a, $b);")
}

/** pq_encode(vec, cbs) → 1-based code per subspace. */
case class PqEncode(left: Expression, right: Expression) extends PqBinaryExpression {
  override def prettyName: String = "pq_encode"
  override protected val kernel: String = "encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(ArrayType(LongType))))
  protected override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.encode(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_adc_table(vec, cbs) → per-subspace exact integer inner-product
  * lookup table. */
case class PqAdcTable(left: Expression, right: Expression) extends PqBinaryExpression {
  override def prettyName: String = "pq_adc_table"
  override protected val kernel: String = "table"
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(ArrayType(LongType))))
  protected override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.table(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** pq_adc_score(codes, tbls) → exact integer ADC score. */
case class PqAdcScore(left: Expression, right: Expression) extends PqBinaryExpression {
  override def prettyName: String = "pq_adc_score"
  override protected val kernel: String = "score"
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(LongType)))
  protected override def nullSafeEval(l: Any, r: Any): Any =
    PqOps.score(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  def encode(vec: Column, cbs: Column): Column =
    Shim.column(PqEncode(Shim.expression(vec), Shim.expression(cbs)))
  def adcTable(vec: Column, cbs: Column): Column =
    Shim.column(PqAdcTable(Shim.expression(vec), Shim.expression(cbs)))
  def adcScore(codes: Column, tbls: Column): Column =
    Shim.column(PqAdcScore(Shim.expression(codes), Shim.expression(tbls)))
}
