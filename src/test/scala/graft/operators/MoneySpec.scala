package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MoneySpec extends SparkSpec {
  import spark.implicits._

  test("guarded cents sum equals the decimal path on real data") {
    val e = graft.Tables.events(spark, sfDir)
    val decimalPath = e.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val centsPath = Money.sumCentsChecked(e, Seq("event_type"), "value", "total")
      .select("event_type", "total")
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(centsPath.keySet == decimalPath.keySet)
    decimalPath.foreach { case (k, d) =>
      assert(centsPath(k).compareTo(d) == 0, s"$k: cents=${centsPath(k)} decimal=$d")
    }
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)

  private def overflowError(m: String): Boolean =
    m.contains("GRAFT_MONEY_OVERFLOW_RISK") || m.contains("ARITHMETIC_OVERFLOW")

  test("a wrapping cents sum fails loudly, never returns garbage") {
    // 11 rows of 9e15 (inside the decimal(18,2) domain): the true cents
    // sum (9.9e18) wraps Long.MaxValue. Under ANSI (Spark 4 default) the
    // engine throws during aggregation; in non-ANSI sessions the guard
    // trips post-agg. Either way: an error, not a wrapped number.
    val big = Seq.fill(11)(("g", 9.0e15)).toDF("k", "v")
    val ex = intercept[Exception] {
      Money.sumCentsChecked(big, Seq("k"), "v", "total").collect()
    }
    assert(messages(ex).exists(overflowError), ex.toString)
  }

  test("guard trips on worst-case risk even when the actual sum fits") {
    // mixed signs: the running sum stays near zero (no ANSI overflow),
    // but n * max|cents| = 12 * 9e17 > 9e18 — under a different
    // partition order the partial sums COULD wrap, so the guard rejects
    val mixed = (1 to 12).map(i => ("g", if (i % 2 == 0) 9.0e15 else -9.0e15)).toDF("k", "v")
    val ex = intercept[Exception] {
      Money.sumCentsChecked(mixed, Seq("k"), "v", "total").collect()
    }
    assert(messages(ex).exists(_.contains("GRAFT_MONEY_OVERFLOW_RISK")), ex.toString)
  }
}
