package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Exact byte-pair-encoding token counting (the reference counts usage
  * tokens with a real BPE — tiktoken.encodingForModel().encode(),
  * service/trackUsageService.js:46-48 — where t1's tokenizer is a
  * whitespace approximation that diverges 25-40% from BPE counts).
  *
  * The BPE algorithm is the published one (Sennrich et al.,
  * arXiv:1508.07909; the same merge-loop tiktoken implements): a word
  * starts as its character sequence, and an ordered MERGE TABLE is
  * applied rank-ascending — each rule merges every (left-to-right,
  * non-overlapping) adjacent occurrence of its pair until none remain,
  * and the word's token count is the surviving symbol count. Applying
  * rules in rank order is equivalent to the repeatedly-merge-the-
  * lowest-ranked-present-pair formulation because in a valid merge
  * table a rule's two sides are themselves products of strictly
  * lower-ranked rules (or base characters), so no later rule can create
  * an occurrence of an earlier one.
  *
  * [[BpeVocab.Merges]] is a FIXTURE vocabulary (a cl100k-style table is
  * just a longer instance of the same structure): ~50 merges learned by
  * eyeballing the synthetic corpus vocabulary so that real multi-step
  * chains fire (w-in, d-ow, win-dow). The engine-side contract (count =
  * fixpoint of ordered full application) is what the DuckDB oracle
  * replicates string-for-string, so correctness of the LOOP — not of a
  * memorized vocab — is what the driver gate checks.
  *
  * Scale shape: the vocab is a static table compiled into the
  * expression (a production-sized one would ride a broadcast), the
  * count is map-only over the corpus, and a per-JVM memo keyed on the
  * word collapses the Zipf head — the merge loop runs roughly once per
  * DISTINCT word per executor, not once per token.
  */
object BpeVocab {
  /** Ordered merge table; rank = index + 1. Every side is buildable
    * from earlier merges or single characters (validated by BpeSpec). */
  val Merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"),                                  // the
    ("a", "n"),
    ("s", "c"), ("sc", "an"),                                 // scan
    ("r", "o"), ("ro", "w"),                                  // row
    ("k", "e"), ("ke", "y"),                                  // key
    ("v", "a"), ("l", "u"), ("va", "lu"), ("valu", "e"),      // value
    ("s", "t"), ("f", "a"), ("fa", "st"),                     // fast
    ("h", "a"), ("s", "h"), ("ha", "sh"),                     // hash
    ("p", "a"), ("r", "t"), ("pa", "rt"),                     // part
    ("t", "a"), ("b", "l"), ("ta", "bl"), ("tabl", "e"),      // table
    ("o", "r"), ("or", "t"), ("s", "ort"),                    // sort
    ("i", "n"), ("l", "in"), ("lin", "e"),                    // line
    ("d", "a"), ("da", "ta"),                                 // data
    ("e", "r"), ("g", "g"), ("a", "gg"),                      // agg
    ("o", "w"), ("l", "ow"), ("s", "low"),                    // slow
    ("w", "in"), ("d", "ow"), ("win", "dow"),                 // window
    ("g", "r"), ("o", "u"), ("gr", "ou"), ("grou", "p"),      // group
    ("m", "er"), ("mer", "g"), ("merg", "e"))                 // merge

  /** Zipf-head memo: merge loops run once per distinct word per JVM.
    * Bounded so an adversarial vocab cannot grow it without limit. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private final val MemoCap = 1 << 16

  /** BPE token count of one word (rank-ascending full application). */
  def countWord(word: String): Int = {
    val cached = memo.get(word)
    if (cached != null) return cached.intValue()
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) { syms += String.valueOf(word.charAt(i)); i += 1 }
    var r = 0
    while (r < Merges.length && syms.length > 1) {
      val (a, b) = Merges(r)
      var j = 0
      while (j < syms.length - 1) {
        if (syms(j) == a && syms(j + 1) == b) {
          syms(j) = a + b
          syms.remove(j + 1)
          // the merged symbol cannot be this rule's left side's suffix
          // starter (ab != a), so scanning on from j is leftmost
          // non-overlapping AND catches occurrences the merge exposes
        } else j += 1
      }
      r += 1
    }
    val n = syms.length
    if (memo.size < MemoCap) memo.put(word, Integer.valueOf(n))
    n
  }

  /** Total BPE token count of a word array (null words count 0). */
  def countAll(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) total += countWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }
}

/** bpe_count(words) → bigint: summed BPE token count of a word array. */
case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_count needs array<string>, got $other")
    }
  override def prettyName: String = "bpe_count"

  protected override def nullSafeEval(input: Any): Any =
    BpeVocab.countAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeVocab.countAll($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCountF {
  def count(words: Column): Column = Shim.column(BpeCount(Shim.expression(words)))
}
