package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("q25 ranks aggregated revenue descending with an orderkey tiebreak") {
    val rows = Warehouse.q25ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).toSeq
    assert(revs == revs.sortBy(-_), revs.toString)
  }

  test("q26 returns only the two nation pairs, both directions") {
    val pairs = Warehouse.q26BilateralVolume(spark, sfDir)
      .select("supp_nation", "cust_nation").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(pairs.nonEmpty)
  }

  test("q27 only returns orders whose quantity exceeds the threshold") {
    val r = Warehouse.q27LargeVolumeCustomers(spark, sfDir)
    assert(r.filter(col("total_qty") <= Warehouse.LargeOrderQty).count() == 0)
    // every returned order's qty matches an independent recomputation
    val got = r.select("o_orderkey", "total_qty").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val expected = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    got.foreach { case (k, q) => assert(expected(k) == q, s"order $k") }
  }
}
