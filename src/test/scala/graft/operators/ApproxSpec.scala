package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, hll_sketch_agg, hll_sketch_estimate, hll_union}

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

  test("a6 inclusion-exclusion recovers a planted overlap within bound") {
    import spark.implicits._
    // |A| = 1000 (users 1..1000), |B| = 1001 (users 500..1500) ⇒ |A∩B| = 501
    val rows = (1L to 1000L).map(u => ("a", u)) ++ (500L to 1500L).map(u => ("b", u))
    val df = rows.toDF("seg", "uid")
    val sk = df.groupBy("seg").agg(hll_sketch_agg(col("uid")).as("sk")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val est = Seq((sk("a"), sk("b"))).toDF("ska", "skb")
      .select((hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb")) -
        hll_sketch_estimate(hll_union(col("ska"), col("skb")))).as("ix"))
      .head().getLong(0).toDouble
    val bound = Approx.HllIntersectBound * (1000 + 1001 + 1500)
    assert(math.abs(est - 501.0) <= bound,
      s"inclusion-exclusion estimate $est strayed past $bound of 501")
  }

  test("a6 pair frame carries the exact intersections and pinned verdicts") {
    val rows = Approx.a6HllIntersect(spark, sfDir).collect()
    val types = graft.Tables.events(spark, sfDir)
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, "one row per unordered pair")
    val ut = graft.Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byType = ut.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pairs are ordered")
      assert(r.getLong(2) == byType(a).size && r.getLong(3) == byType(b).size)
      assert(r.getLong(4) == (byType(a) & byType(b)).size, s"$a∩$b exact")
      assert(r.getInt(5) == 1, s"$a∩$b verdict must hold")
    }
  }

  test("approx plans carry no Expand and a single aggregate exchange") {
    val hllPlan = Approx.approxDistinctUsers(spark, sfDir).queryExecution.executedPlan.toString
    assert(!hllPlan.contains("Expand"), hllPlan)
    val exactPlan = Relational.q10DistinctCount(spark, sfDir).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand") || exactPlan.contains("distinct"), exactPlan)
  }
}
