package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** reference: value at rank ceil(p*n) in ascending value order. */
  private def naive(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted
    sorted(math.ceil(p * sorted.size).toInt - 1)
  }

  private val probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95, "p100" -> 1.0)

  private def checkGroups(groups: Map[String, Seq[Double]], buckets: Int,
      levels: Int = 1): Unit = {
    val df = groups.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }.toDF("g", "v")
    val got = Quantiles.exactGroupedQuantilesDeep(df, "g", "v", probs, buckets, levels)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    groups.foreach { case (g, vs) =>
      probs.foreach { case (label, p) =>
        val (v, n) = got((g, label))
        assert(n == vs.size)
        assert(v == naive(vs, p), s"group $g $label: got $v expected ${naive(vs, p)}")
      }
    }
  }

  test("matches the naive rank definition on random grouped data (property)") {
    val genGroup = for {
      n <- Gen.choose(1, 120)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100))
    } yield vs
    val genData = for {
      k <- Gen.choose(1, 5)
      gs <- Gen.listOfN(k, genGroup)
    } yield gs.zipWithIndex.map { case (vs, i) => s"g$i" -> (vs: Seq[Double]) }.toMap
    // drive the generator deterministically (raw scalacheck, fixed seed)
    val params = Gen.Parameters.default
    var seed = Seed(20260812L)
    val bucketChoices = Seq(1, 2, 7, 256)
    for (i <- 0 until 12) {
      val data = genData.apply(params, seed).get
      seed = seed.next
      checkGroups(data, bucketChoices(i % bucketChoices.size))
    }
  }

  test("recursive refinement matches the naive definition (property, tiny B forces depth)") {
    val genGroup = for {
      n <- Gen.choose(1, 120)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v * 100) / 100))
    } yield vs
    val genData = for {
      k <- Gen.choose(1, 4)
      gs <- Gen.listOfN(k, genGroup)
    } yield gs.zipWithIndex.map { case (vs, i) => s"g$i" -> (vs: Seq[Double]) }.toMap
    val params = Gen.Parameters.default
    var seed = Seed(20260813L)
    // B=2/levels=3 exercises repeated narrowing; B=16/levels=2 the realistic shape
    val shapes = Seq((2, 3), (16, 2), (4, 2))
    for (i <- 0 until 9) {
      val data = genData.apply(params, seed).get
      seed = seed.next
      val (b, l) = shapes(i % shapes.size)
      checkGroups(data, b, l)
    }
  }

  test("deep edge cases: all-equal bucket, heavy ties under refinement") {
    checkGroups(Map("eq" -> Seq.fill(50)(7.5)), 4, 3)
    checkGroups(Map("skew" -> (Seq.fill(900)(10.0) ++ (1 to 100).map(_.toDouble))), 8, 2)
    checkGroups(Map("one" -> Seq(42.0)), 2, 4)
  }

  test("edge cases: single row, all-equal values, two distinct, negatives") {
    checkGroups(Map("one" -> Seq(42.0)), 256)
    checkGroups(Map("eq" -> Seq.fill(50)(7.5)), 8)
    checkGroups(Map("two" -> (Seq.fill(99)(1.0) ++ Seq(2.0))), 4)
    checkGroups(Map("neg" -> Seq(-5.0, -1.0, -3.0, 0.0, -2.0)), 2)
  }

  test("heavy tie skew: one value holds the target rank") {
    // 90% of rows share one value — the bucket containing it is huge, but
    // the value-compression step keeps the final window input tiny
    val vs = Seq.fill(900)(10.0) ++ (1 to 100).map(_.toDouble)
    checkGroups(Map("skew" -> vs), 16)
  }

  test("nulls are excluded: quantiles + n_events are over non-null values only") {
    // pre-fix, a group with nulls could have rank ceil(p*n) exceed the
    // histogram row count and silently emit NO row for that group
    val df = Seq[(String, Option[Double])](
      ("g", Some(1.0)), ("g", None), ("g", Some(2.0)), ("g", None), ("g", Some(3.0)),
      ("allnull", None), ("allnull", None)
    ).toDF("g", "v")
    val got = Quantiles.exactGroupedQuantiles(df, "g", "v", probs, 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    probs.foreach { case (label, p) =>
      val (v, n) = got(("g", label))
      assert(n == 3, s"$label n_events")
      assert(v == naive(Seq(1.0, 2.0, 3.0), p), s"$label value")
    }
    // a group with no non-null values has no quantile → no row
    assert(!got.keySet.exists(_._1 == "allnull"))
  }
}
