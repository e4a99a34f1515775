package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  test("t8 flags the planted symbol runs and emits sane ratios") {
    val rows = Quality.t8GopherQuality(spark, sfDir)
    // every metric is a ratio in range; passes is a 0/1 flag
    assert(rows.filter(col("bullet_ratio") < 0 || col("bullet_ratio") > 1).count() == 0)
    assert(rows.filter(!col("passes").isin(0, 1)).count() == 0)
    // planted '#' runs (doc_id % 13 == 0) must register a positive hash_ratio
    val planted = rows.filter(col("doc_id") % 13 === 0)
    assert(planted.count() > 0)
    assert(planted.filter(col("hash_ratio") <= 0).count() == 0)
    // the hash run pushes those docs over the 0.1 symbol-ratio rule
    assert(planted.filter(col("passes") === 1 && col("hash_ratio") >= 0.1).count() == 0)
  }

  test("t9 detects the planted repeated lines and bounds the metrics") {
    val rows = Quality.t9Repetition(spark, sfDir)
    val planted = rows.filter(col("doc_id") % 9 === 0)
    assert(planted.count() > 0)
    // 3 identical appended lines => at least 2 duplicate lines per planted doc
    assert(planted.filter(col("dup_line_ratio") <= 0).count() == 0)
    assert(rows.filter(col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).count() == 0)
    assert(rows.filter(col("dup_line_ratio") < 0 || col("dup_line_ratio") >= 1).count() == 0)
  }

  test("t9 is a pure map stage: no join, no explode, one exchange (the final sort)") {
    val plan = Quality.t9Repetition(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"t9 must not join:\n$plan")
    assert(!plan.contains("Generate"), s"t9 must not explode:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"t9 must shuffle only for the final sort ($exchanges):\n$plan")
  }

  test("t10's gram filter is a broadcast hash join — the corpus never shuffles unmatched grams") {
    val plan = Quality.t10Contamination(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus side must not shuffle for the join:\n$plan")
  }

  test("t10 flags exactly the docs sharing an 8-gram with the benchmark set") {
    val hits = Quality.t10Contamination(spark, sfDir)
    val hitIds = hits.collect().map(_.getLong(0)).toSet
    // every canary-planted doc (12-word canary => five 8-grams) is flagged...
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 13 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(docs.nonEmpty && docs.subsetOf(hitIds), s"missing ${docs -- hitIds}")
    // ...and each flagged doc reports at least one overlapping distinct 8-gram
    assert(hits.filter(col("n_hits") <= 0).count() == 0)
  }

  test("t12 tf-idf emits at most K ranked terms per doc, scores descending, df sane") {
    val rows = Quality.t12Tfidf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= Quality.TfidfK, s"doc $doc has ${rs.length} terms")
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length), s"doc $doc ranks")
      // micro-scores non-increasing in rank order
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"doc $doc order")
    }
    // a corpus-universal term (df == n_docs) has idf 0 and can never outrank
    // a rarer term with positive score
    rows.foreach { r => assert(r.getLong(4) >= 1 && r.getLong(3) >= 1) }
  }

  test("t11 vocabulary is frequency-ranked with df <= tf and df >= 1") {
    val rows = Quality.t11VocabTopK(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= Quality.VocabK)
    val tfs = rows.map(_.getLong(1)).toSeq
    assert(tfs == tfs.sortBy(-_), "tf not descending")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1), s"word ${r.getString(0)}")
    }
  }
}
