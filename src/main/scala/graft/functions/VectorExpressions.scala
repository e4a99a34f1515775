package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The reference scores vectors inside Pinecone / hnswlib
  * (embeddingmodel.js, customTrainDataController.js:60-70); here scoring
  * is a first-class codegen'd expression so it runs inside whole-stage
  * codegen over billions of rows — no UDF serialization, no boxing.
  * Math is float32 inputs accumulated in double, single pass.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  // Declared input types matter for SQL callers: a SQL literal like
  // array(1.0, 2.0) is array<double>, and reading it with getFloat would
  // silently reinterpret 8-byte elements as garbage floats. Declaring
  // array<float> makes the analyzer insert the cast (or fail loudly).
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
}

/** dot(a, b) accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot(a, b) over array<long> — exact int64 end-to-end (the
  * s19 MaxSim hot path: quantized components, no float anywhere, no
  * intermediate array the HOF zip_with form would allocate per row). */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "vec_idot"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
        ArrayType(org.apache.spark.sql.types.LongType))

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a||b|), 0.0 when either norm is 0. One pass. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** vec_nearest(v, centroids) → 0-based index of the centroid with the
  * highest cosine similarity to v; ties keep the LOWEST index (callers
  * sort the codebook by id, so this is the "cos DESC, cid ASC" argmax).
  * Returns -1 for an empty codebook.
  *
  * This is the IVF assignment primitive: with the codebook broadcast as
  * a per-row array literal, coarse assignment is a pure map over the
  * corpus — no N×|codebook| join, no window, no shuffle (the window
  * formulation shuffles |codebook|×N rows to run an argmax Spark can
  * evaluate per-row). */
case class NearestIndex(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest"
  override def inputTypes: Seq[AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]; val cs = r.asInstanceOf[ArrayData]
    var best = -1; var bestScore = Double.NegativeInfinity
    val m = cs.numElements()
    var j = 0
    while (j < m) {
      val c = cs.getArray(j)
      val n = math.min(v.numElements(), c.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = c.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
      if (s > bestScore) { bestScore = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c = ctx.freshName("cent")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val s = ctx.freshName("s"); val best = ctx.freshName("best"); val bs = ctx.freshName("bestScore")
      s"""
         |int $best = -1;
         |double $bs = java.lang.Double.NEGATIVE_INFINITY;
         |int $m = $cs.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cs.getArray($j);
         |  int $n = java.lang.Math.min($v.numElements(), $c.numElements());
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $v.getFloat($i);
         |    double $y = (double) $c.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $s = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         |  if ($s > $bs) { $bs = $s; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def cosine(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))
  def dot(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))
  def intDot(a: Column, b: Column): Column =
    Shim.column(IntDotProduct(Shim.expression(a), Shim.expression(b)))
  def nearest(v: Column, centroids: Column): Column =
    Shim.column(NearestIndex(Shim.expression(v), Shim.expression(centroids)))
}
