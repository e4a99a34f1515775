package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-phase timing of the iterative operators (HNSW family,
  * graph family) under the Bench session shape — guide §1's "decide
  * whether the time is going to shuffle read / compute / scheduling"
  * step, approximated by phase boundaries since the UI is off. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SessionTuning.shuffleScaleOut(graft.SessionTuning.inputSplits(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")), 32)
      .withExtensions(new graft.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val e = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val qs = Similarity.externalQueries(spark, dir)

    // warm the JIT/codegen once
    noop(Hnsw.s21HnswTopK(spark, dir))

    (1 to 2).foreach { i =>
      println(s"--- iteration $i ---")
      val adj = time("buildAdjacency (ckpt)") {
        Hnsw.buildAdjacency(e).localCheckpoint()
      }
      val vis = time("visitedFrame (read)") {
        Hnsw.visitedFrame(e, adj, qs)
      }
      time("expandTopK + sort") {
        noop(Hnsw.expandTopK(e, vis).orderBy("qid", "rank"))
      }
      graft.Checkpoints.release(vis)
      graft.Checkpoints.release(adj)
      time("s21 end-to-end") { noop(Hnsw.s21HnswTopK(spark, dir)) }
      time("s22 end-to-end") { noop(Hnsw.s22HnswInsert(spark, dir)) }
      time("s23 end-to-end") { noop(Hnsw.s23HnswDelete(spark, dir)) }
      time("s24 end-to-end") { noop(Hnsw.s24HnswTuning(spark, dir)) }
      time("p11 nearDupCollapse") {
        val m = Hnsw.nearDupCollapse(e)
        noop(m); graft.Checkpoints.release(m)
      }
      time("p11 end-to-end") { noop(Hnsw.p11CollapseServe(spark, dir)) }

      // graph family phases
      val pairs = time("g: copurchasePairs (ckpt)") {
        val p = Graph.copurchasePairs(spark, dir).localCheckpoint()
        p
      }
      time("g1 iterations only") {
        noop(Graph.pageRank(pairs, Graph.Iterations,
          assumeNormalized = true))
      }
      graft.Checkpoints.release(pairs)
      time("g1 end-to-end") { noop(Graph.g1PageRank(spark, dir)) }
      time("g2 end-to-end") { noop(Graph.g2Triangles(spark, dir)) }
      time("g3 end-to-end") { noop(Graph.g3KhopReach(spark, dir)) }
      time("g4 end-to-end") { noop(Graph.g4Components(spark, dir)) }
    }
    spark.stop()
  }
}
