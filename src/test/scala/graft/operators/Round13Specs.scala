package graft.operators

import graft.SparkSpec
import graft.functions.{Kmv, KmvBuffer}
import org.apache.spark.sql.functions._

/** Round-13 additions: g4 component ledger vs a driver-side union-find,
  * the KMV bottom-k sketch's buffer/merge/estimator contracts, and the
  * streaming oracle rows pinned stream ≡ batch bit-for-bit. */
class Round13Specs extends SparkSpec {
  import spark.implicits._

  // ---- g4: connected-component ledger ----

  /** Driver-side union-find over the fixture edges. */
  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("g4: component ledger equals the union-find recompute") {
    // two triangles bridged to one component + a path + an isolated edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 10L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L), (21L, 22L), (30L, 31L))
    val got = Graph.componentLedger(edges.toDF("u", "v"))
      .as[(Long, Long, Long)].collect().toSeq
    val ref = refComponents(edges)
    val wantNodes = ref.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val wantEdges = edges.groupBy(e => ref(e._1))
      .map { case (c, es) => c -> es.size.toLong }
    val want = wantNodes.toSeq
      .map { case (c, n) => (c, n, wantEdges(c)) }
      .sortBy { case (c, n, _) => (-n, c) }
    assert(got == want)
    // the bridge merged the triangles: component 1 spans six nodes
    assert(got.head == ((1L, 6L, 7L)))
  }

  test("g4: registered query — labels are component minima, edges consistent") {
    val df = Graph.g4Components(spark, sfDir)
    val rows = df.as[(Long, Long, Long)].collect()
    // every component here has at least 2 nodes and a spanning edge count
    rows.foreach { case (_, n, e) =>
      assert(n >= 2 && e >= n - 1)
    }
    // largest-first ordering with id tie-break
    assert(rows.sortBy { case (c, n, _) => (-n, c) }.toSeq == rows.toSeq)
  }

  // ---- a7: KMV bottom-k sketch ----

  test("KmvBuffer: insert dedups, keeps the k smallest, merge == union") {
    val b = new KmvBuffer(8)
    Seq(50L, 10L, 50L, 99L, 1L, 7L, 7L, 23L, 42L, 5L, 88L, 3L)
      .foreach(b.insert)
    assert(b.values.toSeq == Seq(1L, 3L, 5L, 7L, 10L, 23L, 42L, 50L))
    val c = new KmvBuffer(8)
    Seq(2L, 4L, 100L, 1L).foreach(c.insert)
    b.mergeIn(c)
    assert(b.values.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 7L, 10L, 23L))
    // serialization round-trip
    val rt = KmvBuffer.fromBytes(8, b.toBytes)
    assert(rt.values.toSeq == b.values.toSeq)
  }

  test("kmv_min_k aggregate: bottom-k of a duplicated stream, per group") {
    val rows = (1L to 200L).flatMap(i => Seq(("a", i), ("a", i))) ++
      (1L to 10L).map(i => ("b", i * 1000))
    val got = rows.toDF("g", "h").groupBy("g")
      .agg(Kmv.minK(col("h"), 64).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") == (1L to 64L))
    assert(got("b") == (1L to 10L).map(_ * 1000)) // undersized group: all
  }

  test("a7: merged __all__ sketch is consistent and the estimator is gated") {
    val df = Approx.a7KmvDistinct(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).contains("__all__"))
    rows.foreach { r =>
      val (nExact, nSketch, est, within) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getInt(6))
      assert(within == 1, s"row $r breached the pinned envelope")
      if (nSketch < Approx.KmvK) assert(est == nSketch && est == nExact)
    }
    // __all__ exact >= every per-type exact (it is the union)
    val all = rows.find(_.getString(0) == "__all__").get.getLong(1)
    assert(rows.forall(_.getLong(1) <= all))
  }

  // ---- a8: KMV-Jaccard between source shingle sets ----

  test("a8: sketch Jaccard equals the from-definition recompute; truth exact") {
    import graft.functions.Md5PrefixModF
    // the shingle-hash sets, driver-side (sf0.001: ~20 sources, small)
    val uh = graft.Tables.documents(spark, sfDir)
      .select(col("source"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1]))"))
        .as("g"))
      .select(col("source"), Md5PrefixModF(col("g"), Approx.KmvM).as("h"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, hs) => s -> hs.map(_._2).toSet }
    val k = Approx.KmvJacK
    def bottomK(s: Set[Long]) = s.toSeq.sorted.take(k)
    val got = Approx.a8KmvJaccard(spark, sfDir).collect()
    assert(got.length == uh.size * (uh.size - 1) / 2)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (uh(a), uh(b))
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == (sa & sb).size) // exact_ix
      val merged = (bottomK(sa).toSet | bottomK(sb).toSet).toSeq.sorted.take(k)
      val inter = merged.count(h => bottomK(sa).contains(h) && bottomK(sb).contains(h))
      assert(r.getLong(5) == merged.size && r.getLong(6) == inter)
      assert(r.getLong(7) == inter.toLong * 1000000L / merged.size)
      assert(r.getInt(9) == 1, s"pair ($a,$b) breached the pinned envelope")
    }
  }

  // ---- p10: context-length budget audit ----

  test("p10: packed/unpacked measures equal the driver recompute") {
    // raw token counts, the operator's own convention
    val counts = Corpus.cumulativeOffsets(
      graft.Tables.documents(spark, sfDir)
        .selectExpr("doc_id",
          "cast(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) as bigint) as tok"),
      "doc_id", "tok", Corpus.PackBucket)
      .select("doc_id", "tok").as[(Long, Long)].collect().sortBy(_._1)
    val got = Corpus.p10ContextBudget(spark, sfDir).collect()
    val total = counts.map(_._2).sum
    var cum = 0L
    val cums = counts.map { case (_, t) => val c = cum; cum += t; (t, c) }
    got.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == counts.length && r.getLong(2) == total)
      assert(r.getLong(3) == (total + l - 1) / l) // packed_windows
      val split = cums.count { case (t, c) => t > 0 && c / l != (c + t - 1) / l }
      assert(r.getLong(4) == split, s"split_docs at L=$l")
      val pad = counts.map { case (_, t) => l - math.min(t, l) }.sum
      val tr = counts.map { case (_, t) => math.max(t - l, 0L) }.sum
      assert(r.getLong(5) == pad && r.getLong(6) == tr)
      assert(r.getLong(7) == pad * 1000000L / (counts.length * l))
      assert(r.getLong(8) == tr * 1000000L / total)
    }
  }

  // ---- st1/st2: stream == batch, bit for bit ----

  test("st1: streaming tumbling ledger equals the batch e2 rollup") {
    val stream = graft.streaming.StreamingQueries
      .st1StreamTumbling(spark, sfDir).collect().toSeq
    val batch = Events.e2TumblingWindow(spark, sfDir).collect().toSeq
    assert(stream == batch)
  }

  test("st3: streaming interval-join attribution equals the batch join") {
    val stream = graft.streaming.StreamingQueries
      .st3StreamAttribution(spark, sfDir).collect().toSeq
    val e = Events.e1Sessionize(spark, sfDir) // warm Tables.events config
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("purchase_us"), col("cents").as("purchase_cents"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("us").as("click_us"))
    val batch = p.join(c, p("user_id") === c("cu") &&
        col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + 3600000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_us"), col("purchase_us"), col("purchase_cents"))
      .orderBy("user_id", "purchase_id", "click_id")
      .collect().toSeq
    assert(stream.nonEmpty && stream == batch)
    assert(e.count() > 0)
  }

  test("st2: streaming session ledger equals the batch e1 sessionization") {
    val stream = graft.streaming.StreamingQueries
      .st2StreamSessionize(spark, sfDir).collect().toSeq
    val batch = Events.e1Sessionize(spark, sfDir).collect().toSeq
    assert(stream == batch)
  }
}
