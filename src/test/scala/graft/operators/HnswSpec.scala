package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s21: the HNSW-shape graph-ANN spec class (no DuckDB oracle by design
  * — the layered graph is engine-defined, like d4/m4). Pins:
  *   - build determinism (two builds of the same corpus are identical),
  *   - the structural contract (degree ≤ M per (layer, node); layer
  *     sizes decay geometrically),
  *   - read-path recall vs the s15 brute-force truth on the real
  *     corpus — the number an ANN index is judged by,
  *   - output shape + determinism of the full registered query. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")

  test("s21 build is deterministic: two independent builds are identical") {
    val a = Hnsw.buildAdjacency(e).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    val b = Hnsw.buildAdjacency(e).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("s21 graph shape: degree <= M per (layer, node); layer sizes decay") {
    val adj = Hnsw.buildAdjacency(e)
    val degMax = adj.groupBy("layer", "node").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(degMax <= Hnsw.M)
    val sizes = adj.select("layer", "node").distinct()
      .groupBy("layer").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // level >= l has expected mass n / 8^l: each upper layer must be a
    // small fraction of the one below (8x expected; assert 2x slack)
    assert(sizes(1) * 4 <= sizes(0), s"layer sizes $sizes")
    sizes.get(2).foreach(n2 => assert(n2 * 4 <= sizes(1), s"layer sizes $sizes"))
  }

  test("s21 recall@5 vs the s15 brute-force truth on the real corpus") {
    val got = Hnsw.s21HnswTopK(spark, sfDir)
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = Similarity.s15ExternalTopK(spark, sfDir)
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == truth.keySet)
    val hits = truth.map { case (q, t) => (got(q) & t).size }.sum
    val total = truth.values.map(_.size).sum
    val recall = hits.toDouble / total
    // beam-searched graph ANN on the 500-vector smoke corpus: the floor
    // is pinned from the measured value (leave headroom for corpus-size
    // overrides via GRAFT_TEST_SF_DIR)
    assert(recall >= 0.70, f"recall@5 = $recall%.3f")
  }

  test("s21 registered query: shape, ranks, and run-to-run determinism") {
    val r1 = Hnsw.s21HnswTopK(spark, sfDir).collect()
    val r2 = Hnsw.s21HnswTopK(spark, sfDir).collect()
    assert(r1.sameElements(r2))
    assert(r1.nonEmpty)
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.NumExternalQueries)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to Hnsw.K))
      // neighbors distinct within a query
      assert(rows.map(_.getLong(2)).distinct.length == rows.length)
    }
  }
}
