package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-query consistency: different plan shapes over the same data
  * must agree on shared totals. */
class ConsistencySpec extends SparkSpec {

  test("q16 rollup grand total row equals q4 global rollup") {
    val rollupTotal = Analytics.q16Rollup(spark, sfDir)
      .filter(col("day_us") === -1 && col("event_type") === "ALL").head()
    val global = Relational.q4GlobalRollup(spark, sfDir).head()
    assert(rollupTotal.getAs[Long]("cnt") == global.getAs[Long]("total_events"))
    assert(rollupTotal.getAs[Double]("total_value") == global.getAs[Double]("total_value"))
  }

  test("q17 json-keyed totals sum to the global total") {
    val byKey = Analytics.q17Json(spark, sfDir)
      .agg(sum("cnt").as("n"), sum("total_value").as("v")).head()
    val global = Relational.q4GlobalRollup(spark, sfDir).head()
    assert(byKey.getAs[Long]("n") == global.getAs[Long]("total_events"))
  }

  test("q14 revenue equals a hand-rolled computation at sf0.001") {
    val got = Analytics.q14Multijoin(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // manual: collect small tables and join in Scala
    val cust = graft.Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val nat = graft.Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val asia = graft.Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
      .head().getInt(0)
    val orders = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val acc = scala.collection.mutable.Map[String, (BigDecimal, Long)]()
    graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount").collect().foreach { r =>
        orders.get(r.getLong(0)).foreach { custkey =>
          val nk = cust(custkey)
          val (nname, rk) = nat(nk)
          if (rk == asia) {
            val price = BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            val disc = BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            val rev = price * (1 - disc)
            val (s, c) = acc.getOrElse(nname, (BigDecimal(0), 0L))
            acc(nname) = (s + rev, c + 1)
          }
        }
      }
    assert(got.keySet == acc.keySet)
    acc.foreach { case (n, (s, c)) =>
      assert(got(n)._2 == c, s"count for $n")
      assert(math.abs(got(n)._1 - s.toDouble) < 1e-6, s"revenue for $n: ${got(n)._1} vs $s")
    }
  }

  test("e2 tumbling totals equal e1 session totals (same events, different windows)") {
    val e2 = Events.e2TumblingWindow(spark, sfDir).agg(sum("cnt")).head().getLong(0)
    val e1 = Events.e1Sessionize(spark, sfDir).agg(sum("n_events")).head().getLong(0)
    assert(e2 == e1)
  }
}
