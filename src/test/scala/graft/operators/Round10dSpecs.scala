package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 continuation: the persisted unigram-LM artifact (t17's
  * deployment twin — train on the clean corpus, score any later batch). */
class UnigramLmStoreSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("stored-LM scoring equals the in-session t17 on the training corpus") {
    val dir = java.nio.file.Files.createTempDirectory("lm_store").toString + "/lm"
    Quality.t17LmWrite(spark, sfDir, dir)
    val stored = asMap(Quality.t17ScoreFrom(spark, dir,
      graft.Tables.documents(spark, sfDir).select("doc_id", "text")).collect())
    val inSession = asMap(Quality.t17UnigramLm(spark, sfDir).collect())
    assert(stored == inSession)
  }

  test("unseen terms take the sentinel default; mixed docs split exactly") {
    val dir = java.nio.file.Files.createTempDirectory("lm_dflt").toString + "/lm"
    Quality.t17LmWrite(spark, sfDir, dir)
    val stored = spark.read.parquet(dir)
    val dflt = stored.filter(col("term").isNull).select("cost_micro").as[Long].head()
    val sparkCost = stored.filter(col("term") === "spark")
      .select("cost_micro").as[Long].head()
    // "zzqx" is outside the synthetic vocabulary; "spark" is inside it
    val batch = Seq((1L, "zzqx zzqx zzqx"), (2L, "spark zzqx")).toDF("doc_id", "text")
    val got = asMap(Quality.t17ScoreFrom(spark, dir, batch).collect())
    assert(got(1L) == ((3L, 3L * dflt, dflt)))
    assert(got(2L) == ((2L, sparkCost + dflt, (sparkCost + dflt) / 2)))
    // the default is the ctf=1 cost: strictly the most surprising
    val maxCost = stored.filter(col("term").isNotNull)
      .agg(max(col("cost_micro"))).as[Long].head()
    assert(dflt >= maxCost)
  }
}

/** s14 binary quantization: driver-side recompute + the compression
  * curve's recall measurement vs the s1 truth. */
class BinaryTopKSpec extends SparkSpec {
  import spark.implicits._

  test("s14 equals a driver-side recompute from the sign-bit definition") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def code(v: Array[Float]): Long =
      (0 until 64).map(d => if (d < v.length && v(d) > 0f) 1L << d else 0L).sum
    val codes = vecs.map { case (id, v) => id -> code(v) }
    val want = codes.keys.filter(_ < 10).toSeq.sorted.flatMap { qid =>
      codes.toSeq.filter(_._1 != qid)
        .map { case (id, c) => (id, java.lang.Long.bitCount(codes(qid) ^ c)) }
        .sortBy { case (id, h) => (h, id) }.take(5)
        .zipWithIndex.map { case ((id, h), i) => (qid, i + 1, id, h) }
    }
    val got = Similarity.s14BinaryTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == want)
  }

  test("s14 recall vs s1 truth is nonzero (the 32x-compression trade, measured)") {
    val truth = Similarity.s1BruteForceTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Similarity.s14BinaryTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall > 0.0, s"binary recall@5 $recall")
    info(f"s14 binary recall@5 vs s1 truth: $recall%.2f")
  }
}

/** t28 novelty: driver-side recompute from the definition over the
  * planted d17 corpus. */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("t28 equals the definition recomputed driver-side; planted shares depress novelty") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .map { case (id, t0) =>
        var t = t0
        if (id % 3 == 0) t = t + " " + Dedup.MirrorPassage
        if (id % 5 == 0) t = Dedup.BoilerPrefix + " " + t
        (id, t)
      }
    val w = Dedup.SubW
    val wins = docs.flatMap { case (id, t) =>
      val toks = t.split("\\s+")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => (id, toks.slice(i, i + w).mkString(" ")))
    }
    val pdh = wins.groupBy(identity).map { case ((id, win), g) => (id, win, g.size.toLong) }
    val ndocs = pdh.groupBy(_._2).map { case (win, g) => win -> g.size }
    val want = pdh.groupBy(_._1).map { case (id, rows) =>
      val n = rows.map(_._3).sum
      val novel = rows.filter(r => ndocs(r._2) == 1).map(_._3).sum
      id -> (n, novel, math.floor(1e6 * novel / n).toLong)
    }
    val got = Dedup.t28Novelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    // planted cross-doc shares (mirror passage on doc%3, boiler prefix on
    // doc%5) must depress novelty below 1e6 on those docs
    val shared = got.filter { case (id, _) => id % 3 == 0 || id % 5 == 0 }
    assert(shared.nonEmpty && shared.values.forall(_._3 < 1000000L))
  }
}

/** a4: HLL sketch union — contract verdicts plus the stored-sketch
  * deployment path. */
class HllUnionSpec extends SparkSpec {
  import spark.implicits._

  test("a4 verdicts hold on the corpus: per-type and unioned global") {
    val rows = Approx.a4HllUnion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("__all__"))
    rows.foreach(r => assert(r.getInt(2) == 1, s"out of contract: $r"))
    // the global exact is genuinely the cross-type distinct, not a sum
    val exactAll = rows.find(_.getString(0) == "__all__").get.getLong(1)
    val perType = rows.filter(_.getString(0) != "__all__").map(_.getLong(1))
    assert(exactAll <= perType.sum)
    assert(exactAll >= perType.max)
  }

  test("stored sketches union to the same estimate as the in-session union") {
    val path = java.nio.file.Files.createTempDirectory("hll_store").toString + "/sk"
    Approx.a4SketchWrite(spark, sfDir, path)
    val stored = Approx.a4UnionFrom(spark, path).as[Long].head()
    val inSession = graft.Tables.events(spark, sfDir).select("event_type", "user_id")
      .groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).as[Long].head()
    assert(stored == inSession)
  }
}

/** d21 containment: the prefix-filter screen must lose nothing — the
  * operator's output is compared against brute-force all-pairs
  * containment over the same distinct-shingle sets. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(text: String): Set[String] = {
    val t = text.trim.split("\\s+")
    if (t.length < 2) Set.empty
    else (0 until t.length - 1).map(i => s"${t(i)} ${t(i + 1)}").toSet
  }

  /** The d21 corpus rebuilt driver-side. */
  private def d21CorpusLocal: Seq[(Long, String)] = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    docs ++
      docs.filter(_._1 % 10 == 0).map { case (id, t) =>
        (id + 100000, t + Dedup.NearTail) } ++
      docs.filter(_._1 % 13 == 0).map { case (id, t) =>
        (id + 300000, t.trim.split("\\s+").take(16).mkString(" ")) }
  }

  test("d21 equals brute-force all-pairs containment (the screen loses nothing)") {
    val sets = d21CorpusLocal.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      inter = (sa & sb).size
      if inter * Dedup.ContainThetaDen >= sa.size * Dedup.ContainThetaNum
    } yield (a, b, inter.toLong, sa.size.toLong,
      math.floor(1e6 * inter / sa.size).toLong))
      .sortBy(r => (r._1, r._2))
    val got = Dedup.d21Containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("planted quotes surface at containment 1 despite low Jaccard") {
    val out = Dedup.d21Containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val quoteIds = docs.filter { case (id, t) =>
      id % 13 == 0 && t.trim.split("\\s+").length >= 17 }.map(_._1 + 300000)
    assert(quoteIds.nonEmpty)
    quoteIds.foreach { q =>
      val hit = out.find(r => r._1 == q && r._2 == q - 300000)
      assert(hit.exists(_._3 == 1000000L), s"quote $q not contained in its original")
    }
    // and at least one quote→original pair has Jaccard below the d3 LSH
    // regime (the pair class this operator exists for)
    val sets = d21CorpusLocal.map { case (id, t) => id -> shingles(t) }.toMap
    val lowJac = quoteIds.exists { q =>
      val (sa, sb) = (sets(q), sets(q - 300000))
      val j = (sa & sb).size.toDouble / (sa ++ sb).size
      j < 0.5
    }
    assert(lowJac)
  }
}
