package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s22: incremental HNSW insert — the reference's ACTUAL index
  * lifecycle (customTrainDataController.js:28-86 extends the hnswlib
  * index as documents arrive; the batch rebuild is the exception). The
  * d24/m5 incremental-twin spec shape for the graph index. Pins:
  *   - twin equality: insert against the PERSISTED adjacency
  *     (store-write + insert) ≡ the one-shot in-memory run,
  *   - every inserted vector is self-findable (rank-1 for its own
  *     query) — the property an ingest loop actually depends on,
  *   - structural invariants survive the insert: degree ≤ M, untouched
  *     nodes pass through bit-identically, every node keeps a list,
  *   - determinism of the full registered query,
  *   - read recall over the UPDATED graph vs brute force on the
  *     updated corpus. */
class HnswInsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")
  private lazy val batch = Hnsw.insertionBatch(spark, sfDir)

  test("s22 twins: persisted-index insert == one-shot insert") {
    val path = java.nio.file.Files.createTempDirectory("graft-s22").toString + "/adj"
    Hnsw.indexWrite(spark, sfDir, path)
    val persisted = Hnsw.s22FromPersisted(spark, sfDir, path).collect()
    val oneshot = Hnsw.s22HnswInsert(spark, sfDir).collect()
    assert(persisted.sameElements(oneshot) && persisted.nonEmpty)
  }

  test("s22 inserted vectors are self-findable at rank 1") {
    val adj2 = Hnsw.insertBatch(e, Hnsw.buildAdjacency(e), batch)
    val selfQ = batch.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val top1 = Hnsw.searchFrame(e.unionByName(batch), adj2, selfQ)
      .filter(col("rank") === 1)
      .select("qid", "neighbor").as[(Long, Long)].collect().toMap
    assert(top1.size == Hnsw.InsertBatchSize)
    top1.foreach { case (qid, nbr) =>
      assert(nbr == qid, s"inserted $qid not its own top-1 (got $nbr)")
    }
  }

  test("s22 structure: degree bound holds; untouched lists pass through") {
    val adj = Hnsw.buildAdjacency(e).localCheckpoint()
    val adj2 = Hnsw.insertBatch(e, adj, batch).localCheckpoint()
    val degMax = adj2.groupBy("layer", "node").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(degMax <= Hnsw.M)
    // every pre-insert node still has a list, every batch node gained one
    val before = adj.select("node").distinct().as[Long].collect().toSet
    val after = adj2.select("node").distinct().as[Long].collect().toSet
    assert(before.subsetOf(after))
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(batchIds.subsetOf(after))
    // untouched (layer, node) lists are bit-identical to the old graph
    val touched = adj2.select("layer", "node", "nbr")
      .except(adj.select("layer", "node", "nbr"))
      .select("layer", "node").distinct()
    val oldUntouched = adj.join(touched, Seq("layer", "node"), "left_anti")
      .select("layer", "node", "nbr").as[(Int, Long, Long)].collect().toSet
    val newUntouched = adj2.join(touched, Seq("layer", "node"), "left_anti")
      .select("layer", "node", "nbr").as[(Int, Long, Long)].collect().toSet
    assert(oldUntouched == newUntouched)
  }

  test("s22 clustered batch: capacity-bounded pins keep every insert reachable") {
    // the adversarial arrival shape (spam burst): InsertBatchSize
    // near-copies of ONE corpus vector — every insert's best existing
    // neighbor is the same node, so naive pinning would keep only the
    // top-M back-links and silently orphan the rest; the cascade must
    // spill pins across each insert's ranked pool instead
    val anchor = e.filter(col("vec_id") === 2).select(col("embedding").as("base"))
    val batch = spark.range(Hnsw.InsertBatchSize).crossJoin(anchor)
      .select((col("id") + 300000L).as("vec_id"),
        transform(col("base"), (x, j) =>
          when(j === 0, (x.cast("double") + (col("id") + lit(1)).cast("double")
            / lit(1000.0)).cast("float")).otherwise(x)).as("embedding"))
    val adj2 = Hnsw.insertBatch(e, Hnsw.buildAdjacency(e), batch)
      .localCheckpoint()
    val degMax = adj2.groupBy("layer", "node").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(degMax <= Hnsw.M)
    // every inserted vector keeps >= 1 in-link FROM THE OLD GRAPH — the
    // reachability guarantee the pin exists for
    val inFromOld = adj2.filter(col("layer") === 0
        && col("nbr") >= 300000L && col("node") < 300000L)
      .select("nbr").distinct().as[Long].collect().toSet
    val batchIds = (0L until Hnsw.InsertBatchSize.toLong).map(_ + 300000L).toSet
    assert(inFromOld == batchIds,
      s"orphaned inserts: ${batchIds -- inFromOld}")
  }

  test("s22 registered query: determinism, shape, and recall over the updated corpus") {
    val r1 = Hnsw.s22HnswInsert(spark, sfDir).collect()
    val r2 = Hnsw.s22HnswInsert(spark, sfDir).collect()
    assert(r1.sameElements(r2) && r1.nonEmpty)
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.NumExternalQueries)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to Hnsw.K))
      assert(rows.map(_.getLong(2)).distinct.length == rows.length)
    }
    // recall vs brute force over corpus ∪ batch (new nodes are candidates)
    val truth = Similarity.bruteTopKFrame(e.unionByName(batch),
        Similarity.externalQueries(spark, sfDir), Hnsw.K, excludeSelf = false)
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = r1.map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (got(q) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.70, f"post-insert recall@5 = $recall%.3f")
  }
}
