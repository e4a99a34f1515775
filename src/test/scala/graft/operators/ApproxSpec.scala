package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ApproxSpec extends SparkSpec {

  test("HLL distinct counts are within the rsd envelope of exact") {
    val exact = Relational.q10DistinctCount(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Approx.approxDistinctUsers(spark, sfDir, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.15, s"$k: exact=$n approx=${approx(k)} err=$err") // 3x rsd
    }
  }

  test("sketch percentiles are within rank tolerance of the exact two-pass values") {
    val exact = Analytics.q15Percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = Approx.approxPercentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx.keySet == exact.keySet)
    // compare by VALUE spread: with accuracy=10000 and ~2k rows/group at
    // sf0.001, the sketch is near-exact; allow a small relative slack
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - p50) / math.max(math.abs(p50), 1e-9) <= 0.02, s"$k p50 $p50 vs $a50")
      assert(math.abs(a95 - p95) / math.max(math.abs(p95), 1e-9) <= 0.02, s"$k p95 $p95 vs $a95")
    }
  }

  test("a5 histogram sketches bracket every exact percentile; union row conserves") {
    val rows = Approx.a5HistUnion(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // every verdict is 1 (a correct monotone binning cannot miss)
    rows.values.foreach { case (_, lo50, ex50, ok50, lo95, ex95, ok95) =>
      assert(ok50 == 1L && ok95 == 1L)
      assert(lo50 <= ex50 && lo95 <= ex95)
    }
    // the union row's n equals the corpus size, and the per-type ns sum to it
    val total = graft.Tables.events(spark, sfDir).count()
    assert(rows("__all__")._1 == total)
    assert(rows.filterNot(_._1 == "__all__").values.map(_._1).sum == total)
  }

  test("a5 quantiles from STORED sketches equal the one-shot union brackets") {
    val path = java.nio.file.Files.createTempDirectory("graft-a5").toString + "/hist"
    Approx.a5SketchWrite(spark, sfDir, path)
    val fromStore = Approx.a5QuantilesFrom(spark, path).collect().head
    val allRow = Approx.a5HistUnion(spark, sfDir)
      .filter(col("event_type") === "__all__").collect().head
    assert(fromStore.getLong(0) == allRow.getLong(2),
      s"store p50_lo ${fromStore.getLong(0)} != ${allRow.getLong(2)}")
    assert(fromStore.getLong(1) == allRow.getLong(5),
      s"store p95_lo ${fromStore.getLong(1)} != ${allRow.getLong(5)}")
  }

  test("approx plans carry no Expand and a single aggregate exchange") {
    val hllPlan = Approx.approxDistinctUsers(spark, sfDir).queryExecution.executedPlan.toString
    assert(!hllPlan.contains("Expand"), hllPlan)
    val exactPlan = Relational.q10DistinctCount(spark, sfDir).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand") || exactPlan.contains("distinct"), exactPlan)
  }
}
