package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** md5_prefix_mod(s) = ('0x' || substr(md5(s), 1, 15))::bigint % mod,
  * fused: digest → first 60 bits → mod, with no hex-string rendering,
  * no substring, no string-to-number parse. Drop-in replacement for the
  * conv(substring(md5(...), 1, 15), 16, 10) chain (d3's per-shingle
  * base hash — the hottest scalar in the dedup path) while remaining
  * bit-identical to the DuckDB oracle's formulation. */
object Md5PrefixModUtil {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String, mod: Long): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex digits == first 60 bits: 8 big-endian bytes >>> 4
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) % mod
  }
}

case class Md5PrefixMod(child: Expression, mod: Long) extends UnaryExpression {
  require(mod > 0)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_mod"

  protected override def nullSafeEval(input: Any): Any =
    Md5PrefixModUtil.hash(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5PrefixModUtil.hash($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixModF {
  def apply(s: Column, mod: Long): Column = Shim.column(Md5PrefixMod(Shim.expression(s), mod))
}
