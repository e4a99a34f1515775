package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("d7's dup-cluster graph converges in at most 4 propagation rounds") {
    // d7's cost is rounds × (join + agg) driver jobs; dup-cluster graphs
    // are shallow by construction (pairs within a block), so a data change
    // that inflates the round count should fail here, not surface as an
    // unexplained bench regression
    val edges = Dedup.d2NgramJaccard(spark, sfDir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val (_, rounds) = Dedup.connectedComponentsWithRounds(edges)
    assert(rounds <= 4, s"dup-cluster graph took $rounds propagation rounds")
  }

  test("chains collapse transitively to the minimum id (multi-hop)") {
    // 1-2, 2-3, 3-4, 4-5: diameter 4 forces several propagation rounds
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; direction is irrelevant") {
    val got = cc(Seq((10L, 7L), (20L, 21L), (22L, 20L)))
    assert(got == Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("the propagation loop releases its checkpoints (no persisted-RDD leak)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    // diameter-4 chain → several iterations, each with a localCheckpoint
    val result = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(result.values.toSet == Set(1L))
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL labels checkpoint (the returned frame) may remain —
    // pre-fix this leaked sym0 + sym + one RDD per iteration
    assert(after - before <= 1, s"persisted RDDs grew $before -> $after")
  }

  test("d7 clusters are consistent with d2 pairs: every edge lands in one cluster") {
    val clusters = Dedup.d7DupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.d2NgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster id is always a member and the minimum of its cluster
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min == cid)
    }
  }
}
