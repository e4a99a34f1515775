package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LookupsSpec extends SparkSpec {

  test("q28 arrays are sorted by the unique leading struct field") {
    Lookups.q28GroupPush(spark, sfDir).collect().foreach { r =>
      val keys = r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
      assert(keys == keys.sorted, s"brand ${r.getString(0)}")
      assert(keys.size == r.getLong(2))
    }
  }

  test("q28 flat form encodes exactly the sorted array (driver-comparable scalar)") {
    Lookups.q28GroupPushFlat(spark, sfDir).collect().foreach { r =>
      val repr = r.getString(1)
      assert(repr.nonEmpty && repr.split('|').length == r.getLong(2))
      // entries stay sorted by the numeric leading key
      val keys = repr.split('|').map(_.takeWhile(_ != ':').toLong).toSeq
      assert(keys == keys.sorted)
    }
  }

  test("q29 keeps every event: matched + unknown counts cover the table") {
    val total = Lookups.q29LeftLookup(spark, sfDir).agg(sum("cnt")).head().getLong(0)
    assert(total == graft.Tables.events(spark, sfDir).count())
  }

  test("q30 page can contain zero-activity users and never drops rank order") {
    val rows = Lookups.q30UserActivityPage(spark, sfDir).collect()
    assert(rows.length == 15)
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts == counts.sortBy(-_))
    // the zero-count shape is reachable: the full (unpaged) ranking
    // includes users with no events at sf0.001
    val allUsers = graft.Tables.customer(spark, sfDir).count()
    val activeUsers = graft.Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(activeUsers < allUsers)
  }

  test("q36 page carries the exact filtered total and page count") {
    val rows = Lookups.q36PageWithTotal(spark, sfDir).collect()
    val filtered = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "O")
    val total = filtered.count()
    assert(rows.length == math.min(10, math.max(0, total - 20)))
    rows.foreach { r =>
      assert(r.getLong(3) == total, "total_count mismatch")
      assert(r.getLong(4) == math.ceil(total / 10.0).toLong, "page_count mismatch")
    }
    // the page itself is page 3 of the deterministic global order
    val expect = filtered.select("o_orderkey", "o_orderdate").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0), t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L)
      }
      .sortBy { case (k, t) => (-t, k) }
      .slice(20, 30).map(_._1).toSeq
    assert(rows.map(_.getLong(0)).toSeq == expect)
  }
}
