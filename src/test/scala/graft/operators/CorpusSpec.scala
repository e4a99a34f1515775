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
}
