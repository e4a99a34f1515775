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
}
