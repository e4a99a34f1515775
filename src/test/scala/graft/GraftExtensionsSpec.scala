package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  // Extensions bind at session build time, and getOrCreate would hand
  // back the shared extension-less session — so clear the default, build
  // a session WITH extensions (the global SparkContext is reused), and
  // restore afterwards.
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  test("native expressions are callable from pure SQL") {
    val r = spark.sql(
      """SELECT vec_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |                  array(cast(1.0 as float), cast(0.0 as float))) AS c,
        |       vec_dot(array(cast(2.0 as float)), array(cast(3.0 as float))) AS d,
        |       simhash64(array('a', 'b')) AS sh,
        |       char_ngram_jaccard('abcd', 'abcd', 3) AS j,
        |       word_bigram_jaccard('a b c', 'a b d') AS wj""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 6.0)
    assert(r.getDouble(3) == 1.0)
    // bigram sets {ab, bc} vs {ab, bd}: |∩|=1, |∪|=3
    assert(r.getDouble(4) == 1.0 / 3.0)
  }

  test("SQL double-array literals are implicitly cast to float arrays") {
    // array(1.0, 2.0) is array<double>; without declared input types the
    // expression would read 8-byte doubles with getFloat and return
    // garbage silently. ImplicitCastInputTypes must insert the cast.
    val r = spark.sql(
      """SELECT vec_cosine(array(1.0, 2.0), array(1.0, 2.0)) AS c,
        |       vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
  }

  test("text/fingerprint expressions callable from SQL") {
    val r = spark.sql(
      """SELECT size(winnow_fingerprints('the quick brown fox jumps over the dog')) AS nf,
        |       size(recursive_chunks('one two three four five six seven eight', 12, 2)) AS nc,
        |       size(char_hist_embed('hello')) AS dim,
        |       md5_prefix_mod('abc', 1000000007) AS h,
        |       dhash64(cast('some binary payload content here' AS binary)) AS ph""".stripMargin).head()
    assert(r.getInt(0) > 0 && r.getInt(1) > 1 && r.getInt(2) == 64 && r.getLong(3) >= 0)
    assert(r.getLong(4) == graft.functions.DHashUtil.dhash64(
      "some binary payload content here".getBytes("UTF-8")))
  }

  // NOTE: the spark.sql.extensions CONFIG activation path is applied when
  // the SparkContext is first created, so it cannot be exercised in this
  // shared-context test JVM; withExtensions (above) covers registration.

  test("top_bigram_freq callable from SQL") {
    val r = spark.sql("SELECT top_bigram_freq(array('a','b','a','b','a','b')) AS t").head()
    assert(r.getLong(0) == 3L) // 'a b' occurs 3 times
  }

  test("topk_by_score aggregate works from SQL") {
    spark.sql("SELECT * FROM VALUES (1.0, 10L), (3.0, 30L), (2.0, 20L) AS t(score, id)")
      .createOrReplaceTempView("scores")
    val ids = spark.sql("SELECT topk_by_score(score, id, 2) AS top FROM scores")
      .head().getSeq[Long](0)
    assert(ids == Seq(30L, 20L))
  }
}
