package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WindowTopKRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rule-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  private def data: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 500).map(i => (i.toLong, i % 7, rnd.nextInt(1000).toDouble))
      .toDF("id", "grp", "score")
  }

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("grp", "rn", "id")
  }

  test("pattern is rewritten: no Window in the optimized plan, topk aggregate present") {
    val q = windowTopK(data, 3)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), optimized)
    assert(optimized.contains("topk_by_score"), optimized)
  }

  test("rewritten results equal window semantics") {
    val q = windowTopK(data, 3).orderBy("grp", "rn")
    val got = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    // reference computed without the rule: plain session
    val df = data.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = df.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(3).zipWithIndex
        .map { case (r, i) => (g, i + 1, r._1) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("rn = 1 (latest-per-key shape) is rewritten and correct") {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = data.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("grp", "id")
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    val got = q.orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val expected = data.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.map { case (g, rows) => (g, rows.minBy(r => (-r._3, r._1))._1) }
      .sortBy(_._1)
    assert(got == expected)
  }

  test("NOT rewritten when the score column is projected (scores not preserved by aggregate)") {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("grp", "rn", "id", "score")
    assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("NOT rewritten for ascending score order") {
    val w = Window.partitionBy("grp").orderBy(col("score").asc, col("id").asc)
    val q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("grp", "rn", "id")
    assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("NOT rewritten when score is nullable") {
    val nullable = data.withColumn("score",
      when(col("id") % 50 === 0, lit(null)).otherwise(col("score")))
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = nullable.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("grp", "rn", "id")
    assert(q.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
