package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev probe (r14 receipt): bucketed vs exact HNSW build wall time at a
  * given sf dir. Usage: Test/runMain graft.operators.HnswScaleProbe <dir> */
object HnswScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf1")
    val s = graft.SessionTuning.shuffleScaleOut(graft.SessionTuning.inputSplits(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")), 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(s, dir).select("vec_id", "embedding")
    println("N=" + e.count())
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-20s min=${ts.min}%7.3f median=${ts.sorted.apply(1)}%7.3f")
    }
    time("build_bucketed") {
      Hnsw.buildAdjacency(e).write.format("noop").mode("overwrite").save()
    }
    if (!args.contains("--bucketed-only"))
      time("build_exact") {
        Hnsw.buildAdjacencyExact(e).write.format("noop").mode("overwrite").save()
      }
    s.stop()
  }
}
