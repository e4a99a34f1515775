package graft.operators

import graft.SparkSpec
import graft.functions.DHashUtil

/** m4 perceptual near-dup: kernel properties + planted recall. */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dhash kernel: deterministic, resampling-invariant, append-sensitive") {
    val base = ("the quick brown fox jumps over it " * 17).getBytes("UTF-8")
    assert(DHashUtil.dhash64(base) == DHashUtil.dhash64(base.clone()))
    assert(DHashUtil.dhash64(Array.emptyByteArray) == 0L)
    // RESAMPLING invariance: each byte doubled (a resolution change)
    // keeps every stripe mean identical up to boundary effects — tiny
    // hamming, same leading block
    val doubled = base.flatMap(b => Array(b, b))
    val (h1, h2) = (DHashUtil.dhash64(base), DHashUtil.dhash64(doubled))
    assert(hamming(h1, h2) <= Multimodal.PhashTau, s"hamming ${hamming(h1, h2)}")
    // at least one of the 8 bands is clean (what the LSH banding keys on)
    val bandsEqual = (0 until Multimodal.PhashBands).count { b =>
      ((h1 >>> (b * Multimodal.PhashBandBits)) & 0xffL) ==
      ((h2 >>> (b * Multimodal.PhashBandBits)) & 0xffL)
    }
    assert(bandsEqual >= 1, s"no clean band: ${h1.toBinaryString} vs ${h2.toBinaryString}")
    // a completely different payload is far away
    val other = ("zq9 xv7 kk2 mm0 pp3 " * 28).getBytes("UTF-8")
    assert(hamming(h1, DHashUtil.dhash64(other)) > Multimodal.PhashTau)
  }

  test("m4 recall + the exact machinery contract") {
    val out = Multimodal.m4PhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.forall(_._3 <= Multimodal.PhashTau))
    assert(out.forall(p => p._1 < p._2))
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val planted = docs.filter(_._1 % 10 == 0).map(_._1).map(id => (id, id + 100000)).toSet
    val found = out.map(p => (p._1, p._2)).toSet
    // LSH recall is probabilistic; on this corpus ≥90% of planted
    // resampled pairs must surface...
    val recall = (planted & found).size.toDouble / planted.size
    assert(recall >= 0.9, s"planted recall $recall")
    // ...and the machinery itself is exact: every planted pair whose
    // hashes share a clean band within τ IS emitted (a miss can only be
    // hash noise, never a join/verify bug)
    val hashes = docs.map { case (id, t) => id -> DHashUtil.dhash64(t.getBytes("UTF-8")) }.toMap ++
      docs.filter(_._1 % 10 == 0).map { case (id, t) =>
        (id + 100000) -> DHashUtil.dhash64(t.flatMap(c => s"$c$c").getBytes("UTF-8")) }.toMap
    planted.foreach { case (a, b) =>
      val (h1, h2) = (hashes(a), hashes(b))
      val cleanBand = (0 until Multimodal.PhashBands).exists { k =>
        ((h1 >>> (k * Multimodal.PhashBandBits)) & 0xffL) ==
        ((h2 >>> (k * Multimodal.PhashBandBits)) & 0xffL)
      }
      if (cleanBand && hamming(h1, h2) <= Multimodal.PhashTau)
        assert(found.contains((a, b)), s"in-contract pair ($a,$b) missed by the join")
    }
  }

  test("m4 is deterministic across runs") {
    val r1 = Multimodal.m4PhashNearDup(spark, sfDir).collect().toSeq
    val r2 = Multimodal.m4PhashNearDup(spark, sfDir).collect().toSeq
    assert(r1 == r2)
  }

  test("m5 incremental screen: re-uploads match, every match re-verifies driver-side") {
    val rows = Multimodal.m5IncrementalPhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))
    val byId = rows.map(t => t._1 -> t).toMap
    assert(rows.length == rows.map(_._1).distinct.length)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    def newPayload(id: Long): Array[Byte] =
      if (id >= 300000) docs(id - 300000).getBytes("UTF-8")
      else if (id >= 100000) docs(id - 100000).flatMap(c => s"$c$c").getBytes("UTF-8")
      else docs(id).getBytes("UTF-8")
    val baseHash = docs.filter(_._1 < 400)
      .map { case (id, t) => id -> DHashUtil.dhash64(t.getBytes("UTF-8")) }
    // exact re-uploads: identical bytes => identical hash => every band
    // collides and hamming is 0 — MUST be flagged
    (0L until 400L).filter(_ % 15 == 0).foreach { id =>
      assert(byId(id + 300000)._5 == 0L, s"exact re-upload of $id came out novel")
    }
    // re-encodes (byte-doubled): banding recall, m4's envelope
    val near = (0L until 400L).filter(_ % 10 == 0)
    val hits = near.count(id => byId(id + 100000)._5 == 0L)
    assert(hits >= near.size * 8 / 10, s"only $hits of ${near.size} re-encodes caught")
    // NO false matches: every reported match re-verifies at tau against
    // independently recomputed hashes
    rows.filter(_._4 >= 0L).foreach { t =>
      val d = hamming(DHashUtil.dhash64(newPayload(t._1)), baseHash(t._4))
      assert(d <= Multimodal.PhashTau, s"asset ${t._1} matched ${t._4} at hamming $d")
    }
  }

  test("m5 screen from the persisted index equals the one-shot screen") {
    val path = java.nio.file.Files.createTempDirectory("graft-m5").toString + "/idx"
    Multimodal.m5IndexWrite(spark, sfDir, path)
    val a = Multimodal.m5IncrementalPhash(spark, sfDir).collect().map(_.toString).toSeq
    val b = Multimodal.m5ScreenFrom(spark, sfDir, path).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
