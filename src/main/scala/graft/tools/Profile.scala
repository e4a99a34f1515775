package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: ad-hoc stage timing experiments. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val li = graft.Tables.lineitem(spark, dir)
    time("lineitem scan") {
      li.select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 decimal aggs") {
      graft.operators.Relational.q1Agg(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("q1 double aggs (non-deterministic at scale)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 long-cents aggs") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(round(col("l_quantity") * 100).cast("long")),
             sum(round(col("l_extendedprice") * 100).cast("long")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    time("scan only") {
      docs.write.format("noop").mode("overwrite").save()
    }
    val sh = expr("array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3)))")
    time("char-3 shingles") {
      docs.select(col("doc_id"), sh.as("sh")).write.format("noop").mode("overwrite").save()
    }
    time("shingles + size only") {
      docs.select(col("doc_id"), size(sh).as("n")).write.format("noop").mode("overwrite").save()
    }
    time("full d2") {
      graft.operators.Dedup.d2NgramJaccard(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
