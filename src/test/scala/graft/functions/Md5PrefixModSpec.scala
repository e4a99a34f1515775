package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5PrefixModSpec extends SparkSpec {
  test("fused hash equals the conv(substring(md5)) formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString).toDF("s")
    val P = graft.operators.Dedup.P
    val rows = df.select(
      Md5PrefixModF(col("s"), P).as("fused"),
      (conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10).cast("long") % P).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
