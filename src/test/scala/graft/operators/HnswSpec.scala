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

  // ---- r14: the bucketed (above-threshold) build path ----

  test("bucketed build is deterministic and respects the degree bound") {
    val a = Hnsw.buildAdjacencyImpl(e, 0L).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    val b = Hnsw.buildAdjacencyImpl(e, 0L).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
    val degMax = Hnsw.buildAdjacencyImpl(e, 0L).groupBy("layer", "node")
      .agg(count(lit(1)).as("d")).agg(max(col("d"))).head().getLong(0)
    assert(degMax <= Hnsw.M)
  }

  test("bucketed build covers every member: no node vanishes from the adjacency") {
    // the fallback id-hash band's contract: a vector whose sign pattern
    // isolates it in every hyperplane band still keeps a neighbor list
    // AND appears as someone's neighbor (symmetrized candidates) — the
    // insert/delete invariants rely on full coverage
    val adj = Hnsw.buildAdjacencyImpl(e, 0L)
    val memberIds = e.select("vec_id").as[Long].collect().toSet
    val nodes = adj.filter(col("layer") === 0)
      .select("node").distinct().as[Long].collect().toSet
    assert(nodes == memberIds,
      s"layer-0 coverage: ${memberIds.size - nodes.size} member(s) lost a list")
  }

  test("bucketed-build recall@5 vs the s15 brute-force truth") {
    // force the bucketed candidate path on every layer (threshold 0) and
    // run the FULL registered read over the resulting graph — the number
    // the registered above-threshold plan is judged by
    val got = Hnsw.searchFrame(e, Hnsw.buildAdjacencyImpl(e, 0L),
        Similarity.externalQueries(spark, sfDir))
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = Similarity.s15ExternalTopK(spark, sfDir)
      .select("qid", "neighbor").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == truth.keySet)
    val hits = truth.map { case (q, t) => (got(q) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.70, f"bucketed recall@5 = $recall%.3f")
  }

  test("registered above-threshold build plans NO n-squared join") {
    // a synthetic corpus above BucketedThreshold: the REGISTERED
    // buildAdjacency must route layer 0 through the bucketed equi-join —
    // no CartesianProduct, no BroadcastNestedLoopJoin anywhere in the
    // layer-0 candidate plan (upper layers stay exact below threshold:
    // their expected sizes are n/8, n/64 < threshold at this n)
    val n = Hnsw.BucketedThreshold * 2
    val synth = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> cast(sin(vec_id * 13 + j) AS float))")
        .as("embedding"))
    val plan = Hnsw.buildAdjacency(synth).queryExecution.executedPlan.toString
    // the exact path IS allowed for the thin upper layers — assert the
    // quadratic operators appear at most for those (n/8 = 1024-member)
    // layers by bounding their count: layer 1 and 2 each plan one BNLJ,
    // layer 0 must not
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(!plan.contains("CartesianProduct"), "cartesian in registered build")
    assert(bnlj <= 2, s"layer 0 planned a nested-loop join ($bnlj BNLJ nodes)")
    // positive marker of the ring equi-join: the per-(band, bucket)
    // row_number window the bucketed candidate path sorts through
    assert(plan.contains("row_number"), "bucketed ring path missing from plan")
  }

  test("planesFor keeps the ~256-member bucket target at any layer size") {
    assert(Hnsw.planesFor(1L) == 3)
    assert(Hnsw.planesFor(500L) == 3)
    assert(Hnsw.planesFor(20000L) == 7) // log2(20000/256) = 6.3 -> 7
    assert(Hnsw.planesFor(200000L) == 10) // the sf10 layer the old clamp=8 broke
    assert(Hnsw.planesFor(100000000L) == 19)
    assert(Hnsw.planesFor(Long.MaxValue / 4) == Hnsw.MaxPlanes)
    // the population bound the target exists for: expected members per
    // bucket = layerN / 2^p stays within [TargetBucket/2, TargetBucket]
    // wherever the clamp doesn't bind
    Seq(10000L, 100000L, 1000000L, 50000000L).foreach { n =>
      val perBucket = n.toDouble / (1L << Hnsw.planesFor(n))
      assert(perBucket <= Hnsw.TargetBucket && perBucket > Hnsw.TargetBucket / 2.0,
        s"layerN=$n -> $perBucket per bucket")
    }
  }

  test("replicated corpus: build collapses to canonicals; reads expand with recall") {
    // exact-duplicate mass is the one input that structurally breaks a
    // plain top-M graph (closed cosine-1.0 cliques — measured recall
    // 0.10 at the 10x-replicated sf1 before collapse-first). Pin both
    // halves of the fix: the adjacency over corpus ∪ replicas is
    // IDENTICAL to the unreplicated build (canonical = min id = the
    // original), and the read over the replicated corpus returns
    // replica ids with tie-robust recall (a returned id is a hit iff
    // its TRUE cosine clears the query's 5th-best brute-force cosine)
    val rep = e
      .unionByName(e.select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
      .unionByName(e.select((col("vec_id") + 20000000L).as("vec_id"), col("embedding")))
    val a = Hnsw.buildAdjacency(e).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    val b = Hnsw.buildAdjacency(rep).select("layer", "node", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty, "replicated build diverged from canonical build")
    val qs = Similarity.externalQueriesFrame(e)
    val got = Hnsw.searchFrame(rep, Hnsw.buildAdjacency(rep), qs)
    val nemb = rep.select(col("vec_id").as("neighbor"), col("embedding").as("nemb"))
    val cosTo = got.join(nemb, Seq("neighbor"))
      .join(qs, Seq("qid"))
      .select(col("qid"),
        graft.functions.VectorExpressions.cosine(col("qemb"), col("nemb")).as("sc"))
    val thr = Similarity.bruteTopKFrame(rep, qs, Hnsw.K, excludeSelf = false)
      .join(nemb, Seq("neighbor")).join(qs, Seq("qid"))
      .groupBy("qid")
      .agg(min(graft.functions.VectorExpressions.cosine(col("qemb"), col("nemb")))
        .as("thr"))
    val joined = cosTo.join(thr, Seq("qid")).select(
      (col("sc") >= col("thr") - 1e-9).cast("int").as("hit"))
    val hits = joined.agg(sum(col("hit"))).head().getLong(0)
    val total = joined.count()
    val recall = hits.toDouble / total
    assert(recall >= 0.70, f"replicated-corpus tie-robust recall@5 = $recall%.3f")
    // and no replica family floods a result list: ranks stay 1..K per query
    val byQ = got.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to Hnsw.K)) }
  }

  test("s21 leaves no explicitly-persisted residue in a shared session") {
    // the adjacency cache is call-scoped (persisted inside visitedFrame,
    // released before it returns) — a long-lived service session must
    // not accrue MEMORY_AND_DISK generations across s21/s22/s23 calls.
    // localCheckpoint blocks are excluded: they are the documented
    // per-call result residue, released hop-over-hop by the loops.
    def persisted: Set[Int] = spark.sparkContext.getPersistentRDDs
      .filter { case (_, r) => !r.isCheckpointed }.keySet.toSet
    val before = persisted
    Hnsw.s21HnswTopK(spark, sfDir).collect()
    val leaked = persisted -- before
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("s24 tuning curve: deterministic; cost grows with ef; top setting serves") {
    val r1 = Hnsw.s24HnswTuning(spark, sfDir).collect()
    val r2 = Hnsw.s24HnswTuning(spark, sfDir).collect()
    assert(r1.sameElements(r2))
    assert(r1.length == Hnsw.TuningSettings.size)
    val byEf = r1.map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
    assert(byEf.map(_._1).sameElements(Hnsw.TuningSettings.map(_._1).sorted))
    // the knob buys candidates: visited-set size strictly grows across
    // the published range, and recall never degrades end-to-end
    assert(byEf.last._2 > byEf.head._2,
      s"visited/query flat across ef: ${byEf.toSeq}")
    byEf.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"visited/query shrank: ${byEf.toSeq}") }
    assert(byEf.last._3 >= byEf.head._3, s"recall curve inverted: ${byEf.toSeq}")
    assert(byEf.last._3 >= 0.70, f"max-setting recall = ${byEf.last._3}%.3f")
    byEf.foreach { case (_, v, rec) =>
      assert(v > 0 && rec >= 0.0 && rec <= 1.0) }
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
