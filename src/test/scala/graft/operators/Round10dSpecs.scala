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
