package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, sfDir).select("doc_id", "lang", "source")

  test("d8 keeps exactly min(k, |stratum|) docs per stratum with dense ranks") {
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.d8StratifiedSample(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      val want = math.min(Sampling.SamplePerStratum.toLong, sizes(r.getString(0)))
      assert(r.getLong(1) == want, s"lang ${r.getString(0)}")
      assert(r.getLong(2) == want - 1, s"ranks not dense for ${r.getString(0)}")
    }
  }

  test("d8 selection is identical to the window formulation (and deterministic)") {
    val w = Window.partitionBy("lang")
      .orderBy(pmod(col("doc_id") * Sampling.HashMult, lit(Sampling.HashMod)), col("doc_id"))
    val windowForm = docs
      .withColumn("rank", row_number().over(w).cast("long") - 1)
      .filter(col("rank") < Sampling.SamplePerStratum)
      .select("lang", "rank", "doc_id", "source")
    val agg = Sampling.d8StratifiedSample(spark, sfDir)
    assert(agg.exceptAll(windowForm).count() == 0)
    assert(windowForm.exceptAll(agg).count() == 0)
    // rerun = same selection (pure function of doc_id)
    assert(Sampling.d8StratifiedSample(spark, sfDir).exceptAll(agg).count() == 0)
  }
}
