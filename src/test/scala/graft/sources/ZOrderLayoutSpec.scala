package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ZOrderLayout: the Morton interleave against a driver bit-walk,
  * conservation through a real rewrite, and the point of the exercise —
  * file skipping on BOTH dimensions where a linear sort serves one. */
class ZOrderLayoutSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-zorder-$tag").toFile.getAbsolutePath + "/t"

  test("interleave matches a driver-side bit-walk") {
    import spark.implicits._
    val bits = 8
    val pairs = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (170L, 85L), (1L, 2L), (200L, 13L), (37L, 222L))
    val got = pairs.toDF("a", "b")
      .select(ZOrderLayout.interleave(Seq(col("a"), col("b")), bits).as("z"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) =>
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (i * 2)) | (((b >> i) & 1L) << (i * 2 + 1))
      }
    }
    assert(got.toSeq == want, "Morton numbers must match the bit-walk")
    // distinct inputs with ids < 2^bits give distinct z-values
    assert(want.distinct.length == want.length)
  }

  test("rewrite conserves rows and content, and files own disjoint z-rectangles") {
    val in = tmp("in")
    graft.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value").write.parquet(in)
    val out = tmp("zout")
    ZOrderLayout.rewrite(spark, in, out, Seq("user_id", "value"), bits = 8, nFiles = 8)
    def sig(dir: String) = spark.read.parquet(dir).agg(
      count(lit(1)), sum(col("event_id") % 997), sum(col("user_id") % 997),
      sum((col("value").cast("decimal(18,2)") * 100).cast("long") % 997)).head()
    assert(sig(out) == sig(in), "rewrite must conserve rows and content")
  }

  test("z-order prunes on both dimensions; a linear sort serves only its key") {
    val in = tmp("in2")
    graft.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value").write.parquet(in)
    val nFiles = 8
    val zOut = tmp("z")
    ZOrderLayout.rewrite(spark, in, zOut, Seq("user_id", "value"), 8, nFiles)
    val linOut = tmp("lin")
    spark.read.parquet(in).repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id").write.parquet(linOut)

    val cols = Seq("user_id", "value")
    val zRep = ZOrderLayout.statsReport(spark, zOut, cols).cache()
    val linRep = ZOrderLayout.statsReport(spark, linOut, cols).cache()
    assert(zRep.count() == nFiles && linRep.count() == nFiles)

    // narrow probes at fixed quantile bands of each dimension
    val Array(uLo, uHi) = graft.Tables.events(spark, sfDir)
      .stat.approxQuantile("user_id", Array(0.40, 0.45), 0.0)
    val Array(vLo, vHi) = graft.Tables.events(spark, sfDir)
      .stat.approxQuantile("value", Array(0.40, 0.45), 0.0)

    val zU = ZOrderLayout.candidates(zRep, "user_id", uLo, uHi)
    val zV = ZOrderLayout.candidates(zRep, "value", vLo, vHi)
    val linU = ZOrderLayout.candidates(linRep, "user_id", uLo, uHi)
    val linV = ZOrderLayout.candidates(linRep, "value", vLo, vHi)

    // the linear layout cannot skip anything on its non-key dimension
    assert(linV == nFiles, s"linear layout must scan all files on value ($linV)")
    // z-order skips on BOTH dimensions
    assert(zV < nFiles, s"z layout must skip files on value ($zV)")
    assert(zU < nFiles, s"z layout must skip files on user_id ($zU)")
    // and wins overall across the two probe dimensions
    assert(zU + zV < linU + linV,
      s"z ($zU+$zV) must beat linear ($linU+$linV) across dimensions")
  }
}
