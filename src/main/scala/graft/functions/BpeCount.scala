package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** The fixture vocabulary as a [[BpeTable]] — ONE merge-loop
    * implementation serves both the compiled-fixture expression and the
    * broadcast production path. */
  val Table: BpeTable = new BpeTable(Merges.toArray)

  /** BPE token count of one word (rank-ascending full application). */
  def countWord(word: String): Int = Table.countWord(word)

  /** One word's token sequence, pipe-joined (the encode path). */
  def encodeWord(word: String): String = Table.encodeWord(word)

  /** Total BPE token count of a word array (null words count 0). */
  def countAll(words: ArrayData): Long = Table.countAll(words)

  /** Pipe-joined token stream of a word array (the encode path). */
  def encodeAll(words: ArrayData): UTF8String = Table.encodeAll(words)
}

/** The BPE merge-loop engine over an ARBITRARY ordered merge table —
  * the object a PRODUCTION vocabulary (cl100k: ~100k merges, a few MB)
  * rides to executors as a Spark broadcast instead of being compiled
  * into the expression tree (which serializes per task and per codegen
  * compile). Same algorithm as documented on [[BpeVocab]]; the memo is
  * per-instance, rebuilt lazily on each executor after deserialization,
  * and bounded so the Zipf head is collapsed without unbounded growth. */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @transient private lazy val encMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private final val MemoCap = 1 << 16

  /** The merge loop itself — rank-ascending full application over one
    * word's character symbols. Shared by the count and encode paths so
    * there is exactly ONE implementation of the algorithm. */
  private def mergeSyms(word: String): scala.collection.mutable.ArrayBuffer[String] = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) { syms += String.valueOf(word.charAt(i)); i += 1 }
    var r = 0
    while (r < merges.length && syms.length > 1) {
      val (a, b) = merges(r)
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
    syms
  }

  def countWord(word: String): Int = {
    val cached = memo.get(word)
    if (cached != null) return cached.intValue()
    val n = mergeSyms(word).length
    if (memo.size < MemoCap) memo.put(word, Integer.valueOf(n))
    n
  }

  /** One word's BPE token SEQUENCE, pipe-joined ("me|rg|e") — the
    * tokenizer APPLICATION output (t21 counts it, this emits it),
    * memoized like the count so the Zipf head encodes once per JVM. */
  def encodeWord(word: String): String = {
    val cached = encMemo.get(word)
    if (cached != null) return cached
    val out = mergeSyms(word).mkString("|")
    if (encMemo.size < MemoCap) encMemo.put(word, out)
    out
  }

  /** The pipe-joined token stream of a word array, in word order (null
    * words contribute nothing, matching countAll's 0). */
  def encodeAll(words: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        if (sb.length > 0) sb.append('|')
        sb.append(encodeWord(words.getUTF8String(i).toString))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
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

/** bpe_encode(words) → string: the word array's full BPE token SEQUENCE
  * as one pipe-joined stream — tokenizer APPLICATION, where [[BpeCount]]
  * only counts. Same merge-loop engine and per-JVM distinct-word memo;
  * map-only, codegen'd. */
case class BpeEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode needs array<string>, got $other")
    }
  override def prettyName: String = "bpe_encode"

  protected override def nullSafeEval(input: Any): Any =
    BpeVocab.encodeAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeVocab.encodeAll($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bpe_count with the merge table as a BROADCAST model artifact — the
  * production-vocabulary path promised on [[BpeVocab]]: the table ships
  * to each executor ONCE (TorrentBroadcast), the expression tree carries
  * only the broadcast handle, and evaluation stays map-only inside
  * whole-stage codegen via a plan reference object. Counting is
  * identical to [[BpeCount]] given the same merges (spec-asserted,
  * including a ≥4k-merge synthetic table). */
case class BpeCountBroadcast(child: Expression,
    table: org.apache.spark.broadcast.Broadcast[BpeTable])
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_count_bc needs array<string>, got $other")
    }
  override def prettyName: String = "bpe_count_bc"

  protected override def nullSafeEval(input: Any): Any =
    table.value.countAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeBc", table,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev,
      c => s"((graft.functions.BpeTable) $ref.value()).countAll($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCountF {
  def count(words: Column): Column = Shim.column(BpeCount(Shim.expression(words)))

  /** The full token stream (pipe-joined) of a word array. */
  def encode(words: Column): Column = Shim.column(BpeEncode(Shim.expression(words)))

  /** Count with an explicit broadcast merge table. */
  def countWith(words: Column,
      table: org.apache.spark.broadcast.Broadcast[BpeTable]): Column =
    Shim.column(BpeCountBroadcast(Shim.expression(words), table))

  /** Load a persisted (rank, left, right) merge-table DataFrame — the
    * tokenizer model artifact — and bind it as a broadcast counting
    * column. The collect is VOCABULARY-bound (cl100k ≈ 100k rows, a few
    * MB): a model-artifact load like PqCodebook's, not a data-path
    * collect; rules apply in ascending rank order. */
  def countFromModel(s: org.apache.spark.sql.SparkSession,
      mergesDf: org.apache.spark.sql.DataFrame, words: Column): Column = {
    val merges = mergesDf.select("rank", "left", "right").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
    countWith(words, s.sparkContext.broadcast(new BpeTable(merges)))
  }
}
