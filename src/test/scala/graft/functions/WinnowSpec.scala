package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fp(texts: String*) =
    texts.toDF("text").select(Winnow.fingerprints(col("text")).as("fp"))
      .collect().map(_.getSeq[Long](0))

  test("identical text -> identical fingerprints; disjoint text -> disjoint") {
    val Seq(a, b, c) = fp("the quick brown fox jumps over the lazy dog",
                          "the quick brown fox jumps over the lazy dog",
                          "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss").toSeq
    assert(a == b)
    assert(a.toSet.intersect(c.toSet).isEmpty)
  }

  test("appended tail preserves most fingerprints (position robustness)") {
    val Seq(a, b) = fp("spark group query row data slow small filter customer line table",
                       "spark group query row data slow small filter customer line table and more words").toSeq
    val shared = a.toSet.intersect(b.toSet).size.toDouble / a.size
    assert(shared >= 0.7, s"shared=$shared")
  }

  test("prepended text still shares fingerprints (rolling hash is position-free)") {
    val Seq(a, b) = fp("spark group query row data slow small filter customer line table",
                       "XXXX YYYY spark group query row data slow small filter customer line table").toSeq
    assert(a.toSet.intersect(b.toSet).size >= a.size / 2)
  }

  test("d6 query surfaces planted near-dups deterministically") {
    val got = graft.operators.Dedup.d6Winnowing(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").collect().map(_.getLong(0))
    val hit = planted.count(id => got.contains((id, id + 100000)))
    assert(hit >= planted.length * 8 / 10, s"only $hit of ${planted.length}")
    val again = graft.operators.Dedup.d6Winnowing(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == again)
  }
}

/** Approximate variants: at 100 TB the exact distinct/quantile operators
  * (q10/q15) have sketch-based twins whose error is bounded — assert the
  * bounds hold on real data. */
class ApproxVariantsSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact (q10 scale path)") {
    val e = graft.Tables.events(spark, sfDir)
    val exact = e.select("user_id").distinct().count().toDouble
    val approx = e.agg(approx_count_distinct("user_id", 0.02)).head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("approx percentile within 5% of exact rank-based p95 (q15 scale path)") {
    val e = graft.Tables.events(spark, sfDir)
    val approx = e.agg(percentile_approx(col("value"), lit(0.95), lit(10000))).head().getDouble(0)
    val values = e.select("value").collect().map(_.getDouble(0)).sorted
    val exact = values(math.ceil(0.95 * values.length).toInt - 1)
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }
}
