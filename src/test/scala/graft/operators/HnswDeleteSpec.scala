package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s23: graph-index DELETE — the index lifecycle's last verb (the
  * reference deletes vectors: embeddingController.js:99-110
  * deleteEmbeddings, :114-122 deleteNamespaceEmbeddings; the store rows
  * v5/v2 honor it, and the persisted s21/s22 adjacency must stop
  * serving doomed ids too). Engine-defined graph ⇒ spec class like
  * s21/s22 (no DuckDB oracle; the driver records rows-only). Pins:
  *   - the MASK contract: no doomed id survives on either side of any
  *     list — a serving tier never returns a deleted vector,
  *   - bounded repair: untouched lists pass through bit-identically;
  *     degree ≤ M everywhere after the re-trim,
  *   - twins: delete against the PERSISTED adjacency ≡ the one-shot,
  *   - the registered query: determinism, shape, doomed ids never in
  *     the results, and recall ≥ 0.70 vs brute force over survivors,
  *   - cache hygiene: no explicitly-persisted residue after a call. */
class HnswDeleteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding")
  private lazy val doomedIds = Hnsw.deleteIds.toSet
  private lazy val doomed =
    e.filter(col("vec_id").isin(Hnsw.deleteIds: _*))
  private lazy val survivors =
    e.filter(!col("vec_id").isin(Hnsw.deleteIds: _*))

  test("s23 mask: no doomed id on either side; untouched lists identical; degree bound") {
    val adj = Hnsw.buildAdjacency(e).localCheckpoint()
    val adj2 = Hnsw.deleteFromAdjacency(survivors, adj, doomed).localCheckpoint()
    val bad = adj2.filter(col("node").isin(Hnsw.deleteIds: _*)
      || col("nbr").isin(Hnsw.deleteIds: _*)).count()
    assert(bad == 0, s"$bad doomed entries survived the mask")
    val degMax = adj2.groupBy("layer", "node").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(degMax <= Hnsw.M)
    // lists that never pointed at a doomed id (and whose node survives)
    // are bit-identical to the old graph — the copy-on-write contract
    val affected = adj.filter(col("nbr").isin(Hnsw.deleteIds: _*))
      .select("layer", "node").distinct()
    val oldUntouched = adj
      .filter(!col("node").isin(Hnsw.deleteIds: _*))
      .join(affected, Seq("layer", "node"), "left_anti")
      .select("layer", "node", "nbr").as[(Int, Long, Long)].collect().toSet
    val newUntouched = adj2.join(affected, Seq("layer", "node"), "left_anti")
      .select("layer", "node", "nbr").as[(Int, Long, Long)].collect().toSet
    assert(oldUntouched == newUntouched)
    // repaired lists exist: every survivor that lost a link keeps a list
    // unless its entire neighborhood (old list ∪ bridges) was doomed
    val lostAll = adj.join(affected, Seq("layer", "node"), "left_semi")
      .select("layer", "node").distinct().count()
    val repaired = adj2.join(affected, Seq("layer", "node"), "left_semi")
      .select("layer", "node").distinct().count()
    assert(repaired >= lostAll * 9 / 10,
      s"repair dropped too many lists: $repaired of $lostAll survive")
  }

  test("s23 rename: deleting a canonical with surviving replicas keeps the family servable") {
    // replicate every 20th vector (id+100000, the d5 planting scheme);
    // the collapse-first build indexes the ORIGINAL id as the family's
    // canonical. Deleting that canonical must RENAME the graph node to
    // the surviving replica — masking it would make the replica
    // permanently unservable (the read's re-expansion reaches replicas
    // only through the family's graph node).
    val replicas = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val corpus = e.unionByName(replicas)
    val doomIds = Seq(0L, 20L, 40L)
    val doom = corpus.filter(col("vec_id").isin(doomIds: _*))
    val surv = corpus.filter(!col("vec_id").isin(doomIds: _*))
    val adj = Hnsw.buildAdjacency(corpus).localCheckpoint()
    val adj2 = Hnsw.deleteFromAdjacency(surv, adj, doom).localCheckpoint()
    assert(adj2.filter(col("node").isin(doomIds: _*)
      || col("nbr").isin(doomIds: _*)).count() == 0)
    // the renamed node carries the family's new min surviving id
    doomIds.foreach { d =>
      assert(adj2.filter(col("node") === (d + 100000)).count() > 0,
        s"family node for deleted canonical $d was masked, not renamed")
    }
    // a query AT the deleted vector's position must return the surviving
    // replica first (identical embedding ⇒ cosine 1.0, unique in corpus)
    val qs = e.filter(col("vec_id").isin(doomIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val got = Hnsw.searchFrame(surv, adj2, qs).collect()
    doomIds.foreach { d =>
      val top = got.filter(r => r.getLong(0) == d && r.getInt(1) == 1)
        .map(_.getLong(2))
      assert(top.sameElements(Array(d + 100000)),
        s"query at deleted canonical $d served ${top.mkString(",")}, " +
          s"expected surviving replica ${d + 100000}")
    }
    graft.Checkpoints.release(adj)
    graft.Checkpoints.release(adj2)
  }

  test("expandTopK: duplicate-embedding graph nodes never occupy two ranks") {
    // two graph nodes CAN carry identical embeddings after insertBatch
    // (only the pre-existing corpus is collapsed); the reporter must not
    // let one replica id fill two of the K ranks through both nodes
    val e0 = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val visited = Seq((7L, 1L, 0.9), (7L, 2L, 0.9), (7L, 3L, 0.5))
      .toDF("qid", "node", "sc")
    val rows = Hnsw.expandTopK(e0, visited).collect()
    val ids = rows.map(_.getLong(2))
    assert(ids.length == ids.distinct.length,
      s"duplicate neighbor ids across ranks: ${ids.mkString(",")}")
    assert(ids.toSet == Set(1L, 2L, 3L))
  }

  test("s23 twins: persisted-index delete == one-shot delete") {
    val path = java.nio.file.Files.createTempDirectory("graft-s23").toString + "/adj"
    Hnsw.indexWrite(spark, sfDir, path)
    val persisted = Hnsw.s23FromPersisted(spark, sfDir, path).collect()
    val oneshot = Hnsw.s23HnswDelete(spark, sfDir).collect()
    assert(persisted.sameElements(oneshot) && persisted.nonEmpty)
  }

  test("s23 registered query: doomed never returned; shape; determinism; recall; no residue") {
    def persistedIds: Set[Int] = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet.toSet
    val before = persistedIds
    val r1 = Hnsw.s23HnswDelete(spark, sfDir).collect()
    val leaked = persistedIds -- before
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
    val r2 = Hnsw.s23HnswDelete(spark, sfDir).collect()
    assert(r1.sameElements(r2) && r1.nonEmpty)
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.NumExternalQueries)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to Hnsw.K))
      assert(rows.map(_.getLong(2)).distinct.length == rows.length)
      rows.map(_.getLong(2)).foreach(n =>
        assert(!doomedIds.contains(n), s"deleted id $n served"))
    }
    // recall vs brute force over the SURVIVING corpus — the truth a
    // serving tier would compute after the store delete (v5's world)
    val truth = Similarity.bruteTopKFrame(survivors,
        Similarity.externalQueries(spark, sfDir), Hnsw.K, excludeSelf = false)
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = r1.map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (got(q) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.70, f"post-delete recall@5 = $recall%.3f")
  }
}
