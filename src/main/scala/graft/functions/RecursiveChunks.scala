package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Separator-aware recursive chunking — the role of the reference's
  * RecursiveCharacterTextSplitter (customTrainDataController.js:62,
  * chunkSize=1000): prefer breaking at paragraph > newline > space
  * boundaries, fall back to a hard cut, overlap consecutive chunks.
  * (Same contract, independent implementation — not a port of the
  * LangChain algorithm.)
  *
  * Greedy single pass per document, O(len): each chunk takes the largest
  * window ≤ chunkSize ending at the best available separator; the next
  * chunk starts `overlap` chars back, snapped forward past a mid-word
  * position. Runs as a codegen'd expression → explode, so chunking a
  * 100 TB corpus is a pure map stage with no shuffle.
  */
object RecursiveChunksUtil {
  def chunks(text: UTF8String, chunkSize: Int, overlap: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n <= chunkSize) return new GenericArrayData(Array[Any](text))
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var pos = 0
    while (pos < n) {
      var end = math.min(pos + chunkSize, n)
      if (end < n) {
        // best separator in (pos, end]: paragraph > newline > space.
        // The two-char paragraph separator is searched from end - 2 so the
        // whole "\n\n" fits inside the window — a match starting at
        // end - 1 would yield cut = end + 1, a chunkSize + 1 chunk.
        val para = s.lastIndexOf("\n\n", end - 2)
        val nl = s.lastIndexOf('\n', end - 1)
        val sp = s.lastIndexOf(' ', end - 1)
        val cut =
          if (para > pos) para + 2
          else if (nl > pos) nl + 1
          else if (sp > pos) sp + 1
          else end // hard cut: no separator in range
        end = cut
      }
      out += UTF8String.fromString(s.substring(pos, end))
      if (end >= n) {
        pos = n
      } else {
        var next = math.max(end - overlap, pos + 1)
        // snap forward past a mid-word start (begin at a fresh token)
        while (next < end && next > 0 && !Character.isWhitespace(s.charAt(next - 1))) next += 1
        pos = next
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** recursive_chunks(text) → array<string>, size/overlap fixed per expression. */
case class RecursiveChunks(child: Expression, chunkSize: Int, overlap: Int)
  extends UnaryExpression {
  require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "recursive_chunks"

  protected override def nullSafeEval(input: Any): Any =
    RecursiveChunksUtil.chunks(input.asInstanceOf[UTF8String], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RecursiveChunksUtil.chunks($c, $chunkSize, $overlap)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RecursiveChunksF {
  def chunks(text: Column, chunkSize: Int, overlap: Int): Column =
    Shim.column(RecursiveChunks(Shim.expression(text), chunkSize, overlap))
}
