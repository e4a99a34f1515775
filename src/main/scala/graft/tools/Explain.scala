package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and row count) of one or
  * all SparkEntry queries. Usage: runMain graft.tools.Explain <sfDir> [query]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter { case (n, _) => only.forall(_ == n) }
      .foreach { case (n, fn) =>
        println(s"===== $n =====")
        val df = fn(spark, dir)
        df.explain("formatted")
        println(s"ROWS=${df.count()}")
      }
    spark.stop()
  }
}
