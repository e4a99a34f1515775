package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t23: distributed BPE merge-table training. */
class BpeTrainSpec extends SparkSpec {

  /** Independent reference trainer: the direct Sennrich learn_bpe loop
    * over an in-memory word-count map (overlapping pair positions, ties
    * to the lexicographically smallest pair, left-to-right
    * non-overlapping merge application). */
  private def referenceTrain(dir: String, rounds: Int): Seq[(Int, String, String, Long)] = {
    val re = "[a-z0-9]+".r
    val docs = graft.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    var vocab = docs.iterator
      .flatMap(t => re.findAllIn(t.toLowerCase))
      .foldLeft(Map.empty[List[String], Long]) { (m, w) =>
        val k = w.map(String.valueOf(_)).toList
        m.updated(k, m.getOrElse(k, 0L) + 1L)
      }
    (1 to rounds).map { r =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + n)
      }
      val ((a, b), c) = pairs.minBy { case ((x, y), n) => (-n, x, y) }
      vocab = vocab.foldLeft(Map.empty[List[String], Long]) { case (m, (syms, n)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        val k = out.toList
        m.updated(k, m.getOrElse(k, 0L) + n)
      }
      (r, a, b, c)
    }
  }

  test("t23 equals the independent reference trainer on the corpus") {
    val got = TextAnalysis.t23BpeTrain(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val ref = referenceTrain(sfDir, TextAnalysis.BpeTrainRounds)
    assert(got == ref)
  }

  test("winning pair counts are non-increasing over rounds (greedy argmax invariant)") {
    val counts = TextAnalysis.t23BpeTrain(spark, sfDir)
      .orderBy("rank").collect().map(_.getLong(3))
    assert(counts.length == TextAnalysis.BpeTrainRounds)
    counts.sliding(2).foreach { case Array(x, y) =>
      assert(x >= y, s"round counts increased: $x -> $y")
    }
  }

  test("learned table is valid BPE input for t21's counting contract") {
    // every learned side is a base char or the product of an earlier round
    val rows = TextAnalysis.t23BpeTrain(spark, sfDir)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2)))
    val products = scala.collection.mutable.Set.empty[String]
    rows.foreach { case (a, b) =>
      assert(a.length == 1 || products.contains(a), s"left '$a' unbuildable")
      assert(b.length == 1 || products.contains(b), s"right '$b' unbuildable")
      products += (a + b)
    }
  }
}

/** s11: scalar-quantized (SQ8) top-k. */
class Sq8Spec extends SparkSpec {

  test("s11 plans through the bounded top-k aggregate with a broadcast query side") {
    val df = Similarity.s11Sq8TopK(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must use the bounded aggregate, not a window:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
  }

  test("SQ8 codes stay in [0, 255] and the quantizer is monotone") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val rng = e.agg(
      min(array_min(col("embedding"))).cast("double").as("mn"),
      max(array_max(col("embedding"))).cast("double").as("mx"))
    val bounds = e.crossJoin(broadcast(rng))
      .select(explode(expr(
        "transform(embedding, x -> cast(floor((cast(x as double) - mn) * 255e0 / (mx - mn)) as bigint))"
      )).as("c"))
      .agg(min("c").as("lo"), max("c").as("hi")).collect()(0)
    assert(bounds.getLong(0) >= 0L && bounds.getLong(1) <= 255L)
  }

  test("SQ8 ranking recalls nearly all of s1's full-float cosine truth") {
    val truth = Similarity.s1BruteForceTopK(spark, sfDir).select("qid", "neighbor")
    val got = Similarity.s11Sq8TopK(spark, sfDir).select("qid", "neighbor")
    val hits = got.join(truth, Seq("qid", "neighbor")).count()
    val total = truth.count()
    // 8 bits/dim over the global range: reconstruction error ~0.4% of
    // range per dim — recall@5 should be near-perfect, gate at 0.9
    assert(hits * 10 >= total * 9, s"SQ8 recall too low: $hits/$total")
  }
}

/** t24: temperature-scaled language sampling weights. */
class TemperatureMixSpec extends SparkSpec {

  test("T=2 sampling flattens the distribution toward low-resource languages") {
    val rows = Corpus.t24TemperatureMix(spark, sfDir)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length >= 2)
    // shares sum to ~1e6 (floor rounding loses < #langs ppm)
    val nat = rows.map(_._3).sum
    val smp = rows.map(_._4).sum
    assert(nat > 1000000L - rows.length && nat <= 1000000L)
    assert(smp > 1000000L - rows.length && smp <= 1000000L)
    // flattening: the head loses share, the tail gains — and ordering
    // by token mass is preserved (temperature rescales, never reorders)
    val byTok = rows.sortBy(_._2)
    byTok.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._4 + 1, s"sampling reordered ${lo._1} vs ${hi._1}")
    }
    val head = byTok.last; val tail = byTok.head
    assert(head._4 <= head._3, s"head ${head._1} should lose share")
    assert(tail._4 >= tail._3, s"tail ${tail._1} should gain share")
  }

  test("sampled shares match the direct sqrt computation") {
    val rows = Corpus.t24TemperatureMix(spark, sfDir).collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    val micro = rows.map { case (tok, _) => math.floor(math.sqrt(tok.toDouble) * 1e6).toLong }
    val tot = micro.sum
    rows.zip(micro).foreach { case ((_, ppm), m) =>
      assert(ppm == m * 1000000L / tot)
    }
  }
}

/** a3: deterministic count-min heavy hitters. */
class CmsSpec extends SparkSpec {

  test("CMS estimates match an independent in-memory sketch recompute") {
    val re = "[a-z0-9]+".r
    val toks = graft.Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => re.findAllIn(r.getString(0).toLowerCase))
    def md5mod(s: String, m: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      var v = 0L; (0 until 8).foreach(i => v = (v << 8) | (d(i) & 0xffL))
      (v >>> 4) % m
    }
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long]
    toks.foreach { w =>
      (0 until Approx.CmsDepth).foreach { d =>
        val k = (d, md5mod(s"cms$d|$w", Approx.CmsWidth))
        grid(k) = grid.getOrElse(k, 0L) + 1L
      }
    }
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expTop = exact.toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
    val got = Approx.a3CmsHeavyHitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(g => (g._1, g._2)).toSeq == expTop)
    got.foreach { case (w, ex, est, over) =>
      val expEst = (0 until Approx.CmsDepth)
        .map(d => grid((d, md5mod(s"cms$d|$w", Approx.CmsWidth)))).min
      assert(est == expEst, s"'$w': est $est != recomputed $expEst")
      assert(over == est - ex && over >= 0L, s"'$w': overcount broken")
    }
  }

  test("the counter grid is bounded by depth x width regardless of vocab") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("w"))
    val gridRows = toks.select(
        explode(org.apache.spark.sql.functions.array((0 until Approx.CmsDepth).map(d =>
          graft.functions.Md5PrefixModF(concat(lit(s"cms$d|"), col("w")), Approx.CmsWidth)): _*)).as("b"))
      .distinct().count()
    assert(gridRows <= Approx.CmsDepth * Approx.CmsWidth)
    assert(Approx.a3CmsHeavyHitters(spark, sfDir).count() == 10)
  }
}

/** p3: composed pretraining cut (screen → dedup → decontam → mixture). */
class PretrainingCutSpec extends SparkSpec {

  test("per-lang ledger is monotone and the sampling ppm normalizes") {
    val rows = Corpus.p3PretrainingCut(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, raw, scr, ded, cln, _, _) =>
      assert(raw >= scr && scr >= ded && ded >= cln, s"$lang ledger not monotone")
    }
    val ppm = rows.map(_._7).sum
    assert(ppm > 1000000L - rows.length && ppm <= 1000000L)
    // the decontam stage must actually remove mass: every 50th doc
    // contains its own leading 15 words, so survivors among them drop
    assert(rows.map(_._4).sum > rows.map(_._5).sum, "decontam removed nothing")
  }

  test("stage counts match independent recomputations of each rule") {
    import graft.operators.{Quality => Q}
    val re = "[a-z0-9]+".r
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def toks(t: String) = re.findAllIn(t.toLowerCase).toVector
    def kept(src: String, t: String): Boolean = {
      val ws = toks(t)
      val bad = ws.count(Q.BadWords.contains)
      !Q.BlockedSources.contains(src) && ws.size >= Q.ScreenMinTok && bad * 10L < ws.size
    }
    val screened = docs.filter { case (_, _, src, t) => kept(src, t) }
    // exact-dup collapse: min doc_id per text
    val surv = screened.groupBy(_._4).map { case (_, g) => g.minBy(_._1) }.toSeq
    // decontam: any shared word 8-gram with the bench set
    val bench = docs.filter(_._1 % 50 == 0).map(d => toks(d._4).take(15).mkString(" ")) :+
      Q.CanaryText
    val benchGrams = bench.flatMap(t => toks(t).sliding(8).filter(_.size == 8).map(_.mkString(" "))).toSet
    val clean = surv.filterNot(d =>
      toks(d._4).sliding(8).filter(_.size == 8).exists(g => benchGrams(g.mkString(" "))))
    val got = Corpus.p3PretrainingCut(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docs.groupBy(_._2).foreach { case (lang, g) =>
      val exp = (g.length.toLong,
        g.count(d => kept(d._3, d._4)).toLong,
        surv.count(_._2 == lang).toLong,
        clean.count(_._2 == lang).toLong)
      assert(got(lang) == exp, s"$lang: got ${got(lang)} expected $exp")
    }
  }
}

/** t25: domain blocklist + bad-word screen. */
class DomainScreenSpec extends SparkSpec {

  test("reasons partition the corpus exactly") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val rows = Quality.t25DomainScreen(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("blocked sources only ever report blocked_source (precedence)") {
    val rows = Quality.t25DomainScreen(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (src, reason) =>
      if (Quality.BlockedSources.contains(src))
        assert(reason == "blocked_source", s"$src leaked reason $reason")
      else
        assert(reason != "blocked_source", s"$src wrongly blocked")
    }
  }

  test("badword verdict matches a row-level recompute of the integer ratio rule") {
    val d = graft.Tables.documents(spark, sfDir).select("source", "text").collect()
    val re = "[a-z0-9]+".r
    val expected = d.map { r =>
      val src = r.getString(0)
      val ws = re.findAllIn(r.getString(1).toLowerCase).toSeq
      val bad = ws.count(Quality.BadWords.contains)
      if (Quality.BlockedSources.contains(src)) "blocked_source"
      else if (ws.size < Quality.ScreenMinTok) "too_short"
      else if (bad * 10L >= ws.size) "badword"
      else "kept"
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Quality.t25DomainScreen(spark, sfDir).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(got == expected)
  }
}
