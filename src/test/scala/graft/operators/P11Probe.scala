package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: dissect the p11 collapse-serve path stage by stage.
  * Usage: Test/runMain graft.operators.P11Probe <dir> [--perturb]
  * Prints: reps count, per-cluster fragment stats, rep-level recall of
  * the beam read over the collapsed graph, end-to-end recall. */
object P11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf1")
    val spark = graft.SessionTuning.shuffleScaleOut(graft.SessionTuning.inputSplits(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val corpus = (if (args.contains("--perturb")) {
      raw.select(col("vec_id"), transform(col("embedding"), (x, j) =>
        when(j === 0, (x.cast("double")
          + floor(col("vec_id") / 10000000L).cast("double") / 1000.0)
          .cast("float")).otherwise(x)).as("embedding"))
    } else raw).localCheckpoint()
    val n = corpus.count()
    println(s"N=$n")
    val qs = Similarity.externalQueries(spark, dir).localCheckpoint()
    val t0 = System.nanoTime()
    val m = Hnsw.nearDupCollapse(corpus)
    val reps = m.filter(col("vec_id") === col("rep"))
      .select("vec_id", "embedding").localCheckpoint()
    val nReps = reps.count()
    println(f"reps=$nReps (collapse ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    // fragment stats: members per rep
    m.groupBy("rep").count().agg(min("count"), avg("count"), max("count")).show()
    val cos = graft.functions.VectorExpressions.cosine _
    // rep-level: beam read over the collapsed graph vs brute truth over reps
    val t1 = System.nanoTime()
    val adj = Hnsw.buildAdjacency(reps).localCheckpoint()
    println(f"rep graph build ${(System.nanoTime() - t1) / 1e9}%.1f s; adj rows=" + adj.count())
    val visited = Hnsw.visitedFrame(reps, adj, qs)
    val gotRep = visited.groupBy("qid")
      .agg(graft.functions.TopK.topKByScore(col("sc"), col("node"), Hnsw.K).as("nbrs"))
      .select(col("qid"), explode(col("nbrs")).as("neighbor"))
    val repEmb = reps.select(col("vec_id").as("neighbor"), col("embedding").as("nemb"))
    val gotRepScored = gotRep.join(repEmb, Seq("neighbor")).join(qs, Seq("qid"))
      .select(col("qid"), cos(col("qemb"), col("nemb")).as("sc"))
    val thrRep = Similarity.bruteTopKFrame(reps, qs, Hnsw.K, excludeSelf = false)
      .join(repEmb, Seq("neighbor")).join(qs, Seq("qid"))
      .groupBy("qid").agg(min(cos(col("qemb"), col("nemb"))).as("thr"))
    val jR = gotRepScored.join(thrRep, Seq("qid"))
    val hR = jR.filter(col("sc") >= col("thr") - 1e-9).count()
    val tR = jR.count()
    println(f"rep_level_recall@5 = ${hR.toDouble / tR}%.3f (hits=$hR/$tR)")
    // end-to-end
    val got = Hnsw.collapseServe(corpus, qs)
    val nemb = corpus.select(col("vec_id").as("neighbor"), col("embedding").as("nemb"))
    val gotScored = got.join(nemb, Seq("neighbor")).join(qs, Seq("qid"))
      .select(col("qid"), cos(col("qemb"), col("nemb")).as("sc"))
    val thr = Similarity.bruteTopKFrame(corpus, qs, Hnsw.K, excludeSelf = false)
      .join(nemb, Seq("neighbor")).join(qs, Seq("qid"))
      .groupBy("qid").agg(min(cos(col("qemb"), col("nemb"))).as("thr"))
    val j2 = gotScored.join(thr, Seq("qid")).localCheckpoint()
    val h2 = j2.filter(col("sc") >= col("thr") - 1e-9).count()
    val t2 = j2.count()
    println(f"end_to_end_recall@5 = ${h2.toDouble / t2}%.3f (hits=$h2/$t2)")
    // per-query breakdown
    j2.withColumn("hit", (col("sc") >= col("thr") - 1e-9).cast("int"))
      .groupBy("qid").agg(sum("hit").as("hits")).orderBy("qid").show(20)
    spark.stop()
  }
}
