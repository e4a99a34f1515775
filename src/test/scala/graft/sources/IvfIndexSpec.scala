package graft.sources

import graft.SparkSpec
import graft.functions.{TopK, VectorExpressions => V}
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private val K = 8
  private val TopN = 5

  private lazy val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

  private def bruteForce(queries: org.apache.spark.sql.DataFrame) =
    emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .groupBy("qid")
      .agg(TopK.topKByScore(V.cosine(col("qemb"), col("embedding")), col("vec_id"), TopN).as("nbrs"))
      .select(col("qid"), explode(col("nbrs")).as("neighbor"))

  test("trained IVF index: partitioned layout, pruned probe, recall vs brute force") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    val centroids = IvfIndex.train(emb, K)
    assert(centroids.length == K)
    IvfIndex.build(emb, centroids, dir)

    // inverted lists on disk: one cid=<i> directory per non-empty list,
    // and together they hold the whole corpus exactly once
    val cidDirs = new java.io.File(dir).list().count(_.startsWith("cid="))
    assert(cidDirs > 1 && cidDirs <= K, s"cid dirs: $cidDirs")
    assert(spark.read.parquet(dir).count() == emb.count())

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))

    // nprobe = K means exhaustive: results must EQUAL brute force
    val exhaustive = IvfIndex.probe(spark, dir, queries, centroids, TopN, nprobe = K)
      .select("qid", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteForce(queries).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exhaustive == brute)

    // bounded probes: recall rises monotonically with nprobe and beats
    // the scanned fraction. (This corpus is near-random — max pairwise
    // cosine 0.47 — so absolute recall at small nprobe is data-limited;
    // on clustered real embeddings it is far higher.)
    def recallAt(nprobe: Int): Double = {
      val got = IvfIndex.probe(spark, dir, queries, centroids, TopN, nprobe)
        .select("qid", "neighbor").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    val r2 = recallAt(2); val r4 = recallAt(4)
    assert(r2 >= 0.25, s"recall@$TopN nprobe=2 = $r2")
    assert(r4 >= r2, s"recall must not fall as nprobe grows: $r2 -> $r4")

    // the probe scan must prune to the probed lists via DYNAMIC
    // partition pruning (the broadcast probe join on the cid partition
    // column is the mechanism — no driver-collected cid set anywhere)
    val plan = IvfIndex.probe(spark, dir, queries, centroids, TopN, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on cid visible:\n${plan.take(2000)}")
  }

  test("training is deterministic for a fixed seed") {
    val a = IvfIndex.train(emb, K)
    val b = IvfIndex.train(emb, K)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
