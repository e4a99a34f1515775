package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("t13 distributed prefix-sum equals the sequential packing") {
    val rows = Corpus.t13PackSequences(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // recompute sequentially in doc_id order
    var cum = 0L
    rows.sortBy(_._1).foreach { case (doc, n, packId, off) =>
      assert(packId == cum / Corpus.PackWindow, s"doc $doc pack_id")
      assert(off == cum % Corpus.PackWindow, s"doc $doc pack_offset")
      assert(off >= 0 && off < Corpus.PackWindow)
      cum += n
    }
    // pack ids are non-decreasing in doc order and start at 0
    val ids = rows.sortBy(_._1).map(_._3)
    assert(ids.head == 0L)
    assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
  }

  test("packSequences property: random sparse ids and token counts, several window/bucket sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // sparse non-contiguous ids, zero-token rows, counts larger than a window
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(100000).toLong, rnd.nextInt(900).toLong)
    }.distinct.groupBy(_._1).map(_._2.head).toSeq // unique ids
    val df = rows.toDF("id", "tok")
    for ((w, b) <- Seq((512L, 1000L), (64L, 17L), (1L, 100000L))) {
      val got = Corpus.packSequences(df, "id", "tok", w, b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      var cum = 0L
      got.foreach { case (id, tok, packId, off) =>
        assert(packId == cum / w && off == cum % w, s"id $id (w=$w b=$b)")
        cum += tok
      }
      assert(got.length == rows.length)
    }
  }

  test("t15 shards partition the corpus; checksum is order-independent and content-derived") {
    val rows = Corpus.t15ShardAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (sh, n, tok, ck) =>
      assert(sh >= 0 && sh < Corpus.NumShards && n > 0 && tok >= 0 && ck >= 0)
    }
    // shards partition the table
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == total)
    // checksum recompute from per-doc hashes, driver-side
    val hs = graft.Tables.documents(spark, sfDir)
      .select(graft.functions.Md5PrefixModF(col("text"), Dedup.P).as("h"))
      .collect().map(_.getLong(0))
    val want = hs.groupBy(_ % Corpus.NumShards).map { case (s, xs) => s -> xs.sum }
    rows.foreach { case (sh, _, _, ck) => assert(ck == want(sh), s"shard $sh") }
  }

  test("t14 weights equalize token mass up to the cap, shares sum to ~1e6") {
    val rows = Corpus.t14MixtureWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(3)).sum
    val nDomains = rows.length.toLong
    var shareSum = 0L
    rows.foreach { r =>
      assert(!r.isNullAt(5), "weight_ppm only null for token-less domains")
      val (nTokens, share, weight) = (r.getLong(3), r.getLong(4), r.getLong(5))
      shareSum += share
      assert(share == nTokens * 1000000L / totalTokens)
      assert(weight <= Corpus.MixtureCapPpm)
      assert(weight == math.min(totalTokens * 1000000L / (nDomains * nTokens),
        Corpus.MixtureCapPpm), s"domain ${r.getString(0)}/${r.getString(1)}")
      // upsampled domains are below the uniform share, downsampled above
      if (weight > 1000000L && weight < Corpus.MixtureCapPpm)
        assert(nTokens * nDomains < totalTokens)
    }
    // floor rounding loses at most 1 ppm per domain
    assert(shareSum <= 1000000L && shareSum >= 1000000L - nDomains)
  }

  test("t16 materialized copies stay within the deterministic bounds t14's weights imply") {
    val w = Corpus.t14MixtureWeights(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(5)) 0L else r.getLong(5))).toMap
    val rows = Corpus.t16ApplyMixture(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, c) = (r.getLong(2), r.getLong(3))
      // every doc gets floor(w/1e6) copies, at most one residual extra
      val full = w(k) / 1000000L
      assert(c >= full * n && c <= (full + 1) * n,
        s"domain $k: n_docs=$n n_copies=$c weight=${w(k)}")
    }
    // no RNG anywhere: a second run reproduces the counts exactly
    assert(Corpus.t16ApplyMixture(spark, sfDir).collect().toSeq == rows.toSeq)
  }

  test("p1 composed pipeline matches a driver-side screen→dedup→rollup recompute") {
    val got = Corpus.p1PipelineBudget(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    // independent recompute with plain Scala
    val wordRe = "[a-z0-9]+".r
    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val corpus = base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, t, l, src) => (id + 100000L, t, l, src) }
    val stopRe = "\\b(the|a|of|and|to|in|is)\\b".r
    val screened = corpus.map { case (id, t, l, src) =>
      (id, t, l, src, wordRe.findAllIn(t.toLowerCase).size.toLong)
    }.filter { case (_, t, _, _, tok) =>
      tok >= 10 && tok <= 2000 && stopRe.findFirstIn(t.toLowerCase).isDefined
    }
    val want = screened.groupBy(_._2).values.map { g =>
      val s = g.minBy(_._1) // survivor = min doc_id
      (s._3, s._4, s._5, g.size.toLong)
    }.toSeq.groupBy(s => (s._1, s._2)).map { case (k, ss) =>
      val (nDocs, nTokens, nInput) = (ss.size.toLong, ss.map(_._3).sum, ss.map(_._4).sum)
      k -> ((nDocs, nTokens, nInput, nDocs * 1000000L / nInput))
    }
    assert(got == want, s"pipeline divergence: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    // planted exact dups actually collapsed somewhere
    assert(got.values.exists { case (n, _, in, _) => in > n },
      "no domain shows collapsed duplicates")
  }

  test("p2 dataset card: rollups conserve the total row and shares are exact ppm") {
    val rows = Corpus.p2DatasetCard(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val total = rows.filter(_._1 == "total")
    assert(total.length == 1 && total.head._2 == "*")
    val (tdocs, ttokens, tchars) = (total.head._3, total.head._4, total.head._5)
    assert(tdocs == graft.Tables.documents(spark, sfDir).count())
    for (dim <- Seq("lang", "source")) {
      val slice = rows.filter(_._1 == dim)
      assert(slice.nonEmpty)
      assert(slice.map(_._3).sum == tdocs, s"$dim docs don't conserve")
      assert(slice.map(_._4).sum == ttokens, s"$dim tokens don't conserve")
      assert(slice.map(_._5).sum == tchars, s"$dim chars don't conserve")
      slice.foreach { r =>
        assert(r._6 == r._3 * 1000000L / tdocs && r._7 == r._4 * 1000000L / ttokens)
      }
    }
  }

  test("p2 aggregates the corpus once: no Expand, no corpus re-scan per rollup") {
    val plan = Corpus.p2DatasetCard(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"grouping-sets Expand forbidden:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 0, // cells are checkpointed: rollups read the RDD, not the files
      s"rollups must derive from the materialized cell grid, found $scans scans:\n$plan")
  }

  test("snapshotDiffFrames classifies planted add/remove/change exactly") {
    import spark.implicits._
    val a = Seq(
      (1L, "alpha beta", "en"),   // unchanged
      (2L, "gamma delta", "en"),  // changed in B
      (3L, "uno dos tres", "es"), // removed in B
      (5L, "eins zwei", "de")     // unchanged
    ).toDF("doc_id", "text", "lang")
    val b = Seq(
      (1L, "alpha beta", "en"),
      (2L, "gamma delta epsilon", "en"),
      (4L, "cuatro cinco", "es"), // added in B
      (5L, "eins zwei", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Corpus.snapshotDiffFrames(a, b).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    //                 (added, removed, changed, unchanged, tok_a, tok_b, delta)
    assert(got("en") == ((0L, 0L, 1L, 1L, 4L, 5L, 1L)))
    assert(got("es") == ((1L, 1L, 0L, 0L, 3L, 2L, -1L)))
    assert(got("de") == ((0L, 0L, 0L, 1L, 2L, 2L, 0L)))
  }

  test("d22: the derived snapshots obey their construction invariants") {
    val rows = Corpus.d22SnapshotDiff(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val inA = rows.map(r => r.getLong(2) + r.getLong(3) + r.getLong(4)).sum  // removed+changed+unchanged
    val inB = rows.map(r => r.getLong(1) + r.getLong(3) + r.getLong(4)).sum  // added+changed+unchanged
    // membership counts match the modular construction exactly
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    assert(inA == docs.count(_ % 10 != 7))
    assert(inB == docs.count(_ % 9 != 4))
    // every changed doc gained tokens (the appended marker), so the
    // changed count is positive and B's mass exceeds A's on langs where
    // additions dominate removals... pin the global identity instead:
    val changed = rows.map(_.getLong(3)).sum
    assert(changed == docs.count(d => d % 10 != 7 && d % 9 != 4 && d % 6 == 0))
  }

  test("p5 training shards conserve the C4-clean corpus and its BPE mass") {
    val shards = Corpus.p5TrainingShards(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(shards.nonEmpty && shards.forall(s => s._1 >= 0 && s._1 < Corpus.NumShards))
    // conservation vs t29: every kept page lands in exactly one shard
    val kept = Quality.t29C4Filter(spark, sfDir).collect()
      .map(r => r.getLong(3)).sum
    assert(shards.map(_._2).sum == kept,
      s"shard docs ${shards.map(_._2).sum} != t29 kept pages $kept")
    // pack-id spans are consistent: every shard's span sits inside the
    // global pack range implied by the total BPE mass
    val totalBpe = shards.map(_._3).sum
    val maxPack = totalBpe / Corpus.PackWindow
    assert(shards.forall { case (_, _, _, first, last) =>
      first >= 0 && first <= last && last <= maxPack })
    // determinism across runs
    val again = Corpus.p5TrainingShards(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(shards.toSeq == again.toSeq)
  }
}
