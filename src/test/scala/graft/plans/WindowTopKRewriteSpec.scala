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

  private def rewritten(q: DataFrame): Boolean = {
    val optimized = q.queryExecution.optimizedPlan.toString
    !optimized.contains("Window") && optimized.contains("topk_rows_by_score")
  }

  test("pattern is rewritten: no Window in the optimized plan, topk aggregate present") {
    assert(rewritten(windowTopK(data, 3)))
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
    assert(rewritten(q))
    val got = q.orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val expected = data.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.map { case (g, rows) => (g, rows.minBy(r => (-r._3, r._1))._1) }
      .sortBy(_._1)
    assert(got == expected)
  }

  test("projected payload columns (including the score) ride in the struct") {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("grp", "rn", "id", "score")
    assert(rewritten(q))
    val got = q.orderBy("grp", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val expected = data.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._3, r._1)).take(3).zipWithIndex
          .map { case (r, i) => (g, i + 1, r._1, r._3) }
      }.sortBy(t => (t._1, t._2))
    assert(got == expected)
  }

  test("descending id tiebreak is honored") {
    // bitwiseAND keeps the score provably non-nullable (x % 3 would be
    // nullable: non-ANSI remainder can return null on zero divisors)
    val tied = data.withColumn("score", col("id").bitwiseAND(lit(3L)).cast("double"))
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").desc)
    val q = tied.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("grp", "id")
    assert(rewritten(q))
    val got = q.orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val expected = tied.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._2).toSeq.map { case (g, rows) => (g, rows.minBy(r => (-r._3, -r._1))._1) }
      .sortBy(_._1)
    assert(got == expected)
  }

  test("timestamp scores rank via exact epoch micros") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 5, 1700000000000000L + i * 7919))
      .toDF("id", "grp", "us")
      .select(col("id"), col("grp"), timestamp_micros(col("us")).as("ts"))
    val w = Window.partitionBy("grp").orderBy(col("ts").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("grp", "id")
    assert(rewritten(q))
    val got = q.orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // latest micros per group = max us; ids increase with us here
    val expected = (0 until 5).map(g => (g, (1 to 100).filter(_ % 5 == g).max.toLong))
    assert(got == expected)
  }

  test("NOT rewritten for long scores (not exactly representable in double)") {
    val longScore = data.withColumn("score", col("id") * 1000000L)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = longScore.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("grp", "rn", "id")
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
