package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d27: the full engine output re-derived driver-side — LSH candidates
  * re-scored with an independent Levenshtein implementation, the 10%
  * gate re-applied, the ppm re-divided. */
class EditDedupSpec extends SparkSpec {

  /** Textbook two-row DP Levenshtein — independent of both engines. */
  private def lev(a: String, b: String): Long = {
    var prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length).toLong
  }

  test("d27 equals a driver-side recompute over the LSH candidate sliver") {
    val texts = Dedup.corpusNear(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val candidates = Dedup.d3Pairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = candidates.flatMap { case (a, b) =>
      val (ta, tb) = (texts(a), texts(b))
      val d = lev(ta, tb)
      val m = math.max(ta.length, tb.length).toLong
      if (d * 10 <= m) Some((a, b, d, m, (m - d) * 1000000L / m)) else None
    }.sortBy(p => (p._1, p._2)).toSeq
    val got = Dedup.d27EditDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "the planted near-recrawls must surface")
  }

  test("d27 collapsed default is bit-equal to the per-doc-pair naive form") {
    val got = Dedup.d27EditDedup(spark, sfDir).collect().toSeq
    val naive = Dedup.d27EditDedupNaive(spark, sfDir).collect().toSeq
    assert(got == naive)
  }

  test("d27 reports the appended-tail twins at exactly the tail's edit cost") {
    // corpusNear plants doc_id+100000 = doc_id text + NearTail: a pure
    // append, so the edit distance IS the tail length — any other value
    // means one engine's distance is not unit-cost character edits
    val rows = Dedup.d27EditDedup(spark, sfDir).collect()
      .filter(r => r.getLong(1) == r.getLong(0) + 100000L)
    assert(rows.nonEmpty)
    val texts = Dedup.corpusNear(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val tailLen = texts(r.getLong(1)).length - texts(r.getLong(0)).length
      assert(r.getLong(2) == tailLen.toLong,
        s"pair ${r.getLong(0)}/${r.getLong(1)}: dist ${r.getLong(2)} != tail $tailLen")
    }
  }
}

/** d28: the CDC chunker's defining property (boundaries follow content,
  * not position) driven through the ENGINE path, plus a full driver-side
  * ledger recompute. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def md5mod(s: String, m: Long): Long =
    graft.functions.Md5PrefixModUtil.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), m)

  /** Reference chunker — plain Scala from the d28 definition. */
  private def refChunks(text: String): Seq[String] = {
    val t = text.trim.split("\\s+")
    val bnds = (Dedup.CdcWindow to t.length - 1).filter { i =>
      md5mod(t.slice(i - Dedup.CdcWindow, i).mkString(" "), Dedup.CdcMod) == 0L
    }
    val starts = 1 +: bnds.map(_ + 1)
    val ends = bnds :+ t.length
    starts.zip(ends).map { case (st, en) => t.slice(st - 1, en).mkString(" ") }
  }

  test("d28 engine chunks equal the reference chunker on real documents") {
    val texts = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50).select("text").as[String].collect().toSeq
    val got = Dedup.cdcChunks(texts.toDF("text"))
      .select("ctext").as[String].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val want = texts.flatMap(refChunks)
      .groupBy(identity).map { case (k, v) => k -> v.length }
    assert(got == want)
  }

  test("d28 shift-invariance: a prepended paragraph leaves every chunk after the first intact") {
    val original = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 5).select("text").as[String].collect()
    val prepended = original.map("entirely novel preamble tokens inserted upstream " + _)
    val origChunks = Dedup.cdcChunks(original.toSeq.toDF("text"))
      .select("ctext").as[String].collect().toSeq
    val prepChunks = Dedup.cdcChunks(prepended.toSeq.toDF("text"))
      .select("ctext").as[String].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length }
    // per doc: everything after the doc's FIRST chunk must reappear —
    // CDC re-finds the same boundaries once past the edit
    original.foreach { doc =>
      val tail = refChunks(doc).drop(1)
      val counts = scala.collection.mutable.Map(prepChunks.toSeq: _*)
      tail.foreach { c =>
        assert(counts.getOrElse(c, 0) > 0, s"chunk lost after prepend: $c")
        counts(c) = counts(c) - 1
      }
    }
    assert(origChunks.nonEmpty)
  }

  test("d28 ledger equals a driver-side recompute over the exact corpus") {
    val row = Dedup.d28CdcChunks(spark, sfDir).head()
    val texts = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // corpusExact replants doc_id % 10 == 0 as exact recrawls
    val corpus = texts.map(_._2) ++ texts.filter(_._1 % 10 == 0).map(_._2)
    val chunks = corpus.flatMap(refChunks)
      .map(c => (md5mod(c, Dedup.CdcKeyMod), c.trim.split("\\s+").length.toLong))
    val byKey = chunks.groupBy(_._1).map { case (k, v) => k -> ((v.size, v.map(_._2).min)) }
    val nChunks = chunks.size.toLong
    val nDistinct = byKey.size.toLong
    val total = byKey.values.map { case (occ, nt) => occ * nt }.sum
    val stored = byKey.values.map(_._2).sum
    assert(row.getLong(0) == nChunks && row.getLong(1) == nDistinct)
    assert(row.getLong(2) == (nChunks - nDistinct) * 1000000L / nChunks)
    assert(row.getLong(3) == total && row.getLong(4) == stored)
    assert(row.getLong(5) == (total - stored) * 1000000L / total)
  }
}

/** e18: the sweep-line and its bucketed prefix-sum plan re-derived from
  * the raw events, closed-interval tie semantics included. */
class PeakConcurrencySpec extends SparkSpec {

  private val DayUs = 86400000000L

  test("e18 equals a driver-side sweep over the sessionized events") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sessions: 30-min gap per user, ordered by (us, event_id)
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity).map(_._1)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (start, last) = (sorted.head, sorted.head)
      for (us <- sorted.tail) {
        if (us - last > Events.SessionGapUs) { bounds += ((start, last)); start = us }
        last = us
      }
      bounds += ((start, last))
      bounds
    }.toSeq
    // clip to days, sweep with starts-before-ends at equal instants
    val byDay = sessions.flatMap { case (s0, e0) =>
      (s0 / DayUs to e0 / DayUs).map { d =>
        (d, math.max(s0, d * DayUs), math.min(e0, (d + 1) * DayUs - 1))
      }
    }.groupBy(_._1)
    val want = byDay.map { case (d, segs) =>
      val events = segs.flatMap { case (_, s0, e0) => Seq((s0, 1), (e0, -1)) }
        .sortBy { case (us, delta) => (us, -delta) }
      var (c, peak) = (0, 0)
      events.foreach { case (_, delta) => c += delta; peak = math.max(peak, c) }
      d -> ((segs.size.toLong, peak.toLong))
    }
    val got = Events.e18PeakConcurrency(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // sanity: peaks are positive and never exceed the day's session count
    got.values.foreach { case (n, p) => assert(p >= 1 && p <= n) }
  }
}

/** m7: planted scene boundaries through the engine path — smooth content
  * yields zero cuts, a hard content change is detected, output is
  * deterministic (the spec-only class contract: d4/d6/t6/m4/m5). */
class SceneCutSpec extends SparkSpec {
  import spark.implicits._

  // two 50-char "frames" with different gradient structure; the stride
  // divides the period so intra-scene windows are byte-identical
  private val a = "abcd efgh ijkl mnop qrst uvwx yz01 2345 6789 wxyz "
  private val b = "!" * 25 + "~" * 25 // high stripe-scale contrast
  assert(a.length == 50 && b.length == 50)

  test("m7: smooth content has zero cuts; a scene boundary is detected") {
    val fixture = Seq(
      (1L, a * 80),          // one smooth scene
      (2L, a * 40 + b * 40)  // hard cut at char 2000
    ).toDF("doc_id", "text")
    val got = Multimodal.sceneCutReport(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5)))).toMap
    // disjoint full frames: (4000 - 200) / 200 + 1 = 20
    val (f1, cuts1, maxh1) = got(1L)
    assert(f1 == 20L && cuts1 == 0L && maxh1 == 0L,
      s"smooth scene must be cut-free: $got")
    val (f2, cuts2, maxh2) = got(2L)
    assert(f2 == 20L)
    // the boundary aligns with the frame grid: EXACTLY one frame pair
    // differs, so exactly one cut
    assert(cuts2 == 1L, s"planted boundary missed (max hamming $maxh2): $got")
    assert(maxh2 > Multimodal.SceneTau)
  }

  test("m7: registered query is deterministic and shaped") {
    val r1 = Multimodal.m7SceneCuts(spark, sfDir).collect().toSeq
    val r2 = Multimodal.m7SceneCuts(spark, sfDir).collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
    assert(Multimodal.m7SceneCuts(spark, sfDir).columns.toSeq ==
      Seq("doc_id", "n_frames", "n_cuts", "n_shots",
        "mean_shot_frames_x100", "max_hamming"))
    // shots = cuts + 1 and the mean is the exact integer division
    r1.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) + 1)
      assert(r.getLong(4) == r.getLong(1) * 100 / (r.getLong(2) + 1))
    }
  }
}

/** q64: Gini + top-decile share re-derived with BigInt arithmetic from
  * the raw orders — the bucketed-rank plan must agree exactly. */
class GiniSpec extends SparkSpec {

  test("q64 equals a BigInt driver-side recompute per segment") {
    val custSeg = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderCents = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = custSeg.groupBy(_._2).map { case (seg, members) =>
      val xs = members.keys.toSeq
        .map(k => (orderCents.getOrElse(k, 0L), k)).sorted.map(_._1)
      val n = xs.size.toLong
      val s = BigInt(xs.sum)
      val t = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = ((2 * t - (n + 1) * s) * 1000000 / (BigInt(n) * s)).toLong
      val topK = n / 10
      val top = BigInt(xs.takeRight(topK.toInt).sum)
      seg -> ((n, s.toLong, gini, (top * 1000000 / s).toLong))
    }
    val got = Warehouse.q64GiniConcentration(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // inequality bounds: gini in [0, 1e6); top decile holds at least its
    // proportional share of revenue
    got.foreach { case (_, (n, _, gini, top10)) =>
      assert(gini >= 0 && gini < 1000000L)
      assert(top10 >= (n / 10) * 1000000L / n - 1)
    }
  }
}
