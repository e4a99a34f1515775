package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.functions._

/** SparkSessionExtensions hook: registers graft's native expressions as
  * SQL functions, so the whole library surface is reachable from
  * `spark.sql(...)` — matching the reference's SQL passthrough
  * (postgreService.js) and making the engine usable from pure-SQL
  * clients:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * ...
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // window-topk -> bounded aggregate rewrite (see graft.plans)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("char_ngram_jaccard"),
      info("char_ngram_jaccard", "char_ngram_jaccard(a, b, n) - Jaccard of char n-gram sets"),
      (args: Seq[Expression]) => CharNgramJaccard(args(0), args(1),
        args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_bigram_jaccard"),
      info("word_bigram_jaccard", "word_bigram_jaccard(a, b) - Jaccard of word-bigram sets"),
      (args: Seq[Expression]) => WordBigramJaccard(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(text) - rolling-hash winnowing fingerprint set"),
      (args: Seq[Expression]) => WinnowFingerprints(args(0))))
    ext.injectFunction((
      FunctionIdentifier("token_window_hashes"),
      info("token_window_hashes", "token_window_hashes(text, w) - rolling hash per w-token sliding window"),
      (args: Seq[Expression]) => TokenWindowHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("recursive_chunks"),
      info("recursive_chunks", "recursive_chunks(text, size, overlap) - separator-aware chunking"),
      (args: Seq[Expression]) => RecursiveChunks(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("char_hist_embed"),
      info("char_hist_embed", "char_hist_embed(text) - stub encoder: normalized char histogram"),
      (args: Seq[Expression]) => CharHistEmbed(args(0))))
    ext.injectFunction((
      FunctionIdentifier("dhash64"),
      info("dhash64", "dhash64(payload) - 64-bit perceptual difference hash over a binary stream"),
      (args: Seq[Expression]) => DHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix_mod"),
      info("md5_prefix_mod", "md5_prefix_mod(s, m) - first 60 md5 bits mod m"),
      (args: Seq[Expression]) => Md5PrefixMod(args(0),
        args(1).eval() match { case i: Int => i.toLong; case l: Long => l })))
    ext.injectFunction((
      FunctionIdentifier("top_bigram_freq"),
      info("top_bigram_freq", "top_bigram_freq(words) - max multiplicity of any adjacent bigram"),
      (args: Seq[Expression]) => TopBigramFreq(args(0))))
    ext.injectFunction((
      FunctionIdentifier("topk_by_score"),
      info("topk_by_score", "topk_by_score(score, id, k) - ids of the k best-scored rows"),
      (args: Seq[Expression]) => TopKByScore(
        Cast(args(0), DoubleType), Cast(args(1), LongType),
        args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      info("pq_encode", "pq_encode(vec, cbs) - 1-based trained-PQ code per subspace"),
      (args: Seq[Expression]) => PqEncode(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_table"),
      info("pq_adc_table", "pq_adc_table(vec, cbs) - per-subspace integer ADC lookup table"),
      (args: Seq[Expression]) => PqAdcTable(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_score"),
      info("pq_adc_score", "pq_adc_score(codes, tbls) - exact integer ADC score"),
      (args: Seq[Expression]) => PqAdcScore(args(0), args(1))))
  }
}
