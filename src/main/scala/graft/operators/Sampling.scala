package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TopKRows

/** Deterministic sampling for training-data pipelines.
  *
  * Data mixing ("N documents per language/source/quality stratum") needs
  * EXACT per-stratum counts with a reproducible selection — `sample()`
  * gives neither. The classic exact formulation ranks each stratum by a
  * deterministic pseudo-random priority and keeps the first k:
  * `row_number() OVER (PARTITION BY stratum ORDER BY priority)` — but
  * strata are few (languages, sources), so that window sorts the whole
  * corpus in |strata| reducer partitions: the q15 scale-killer shape.
  *
  * The scale path is the same bounded-top-k aggregate that replaced the
  * window in q11 ([[graft.functions.TopKRowsByScore]]): map-side combine
  * keeps k candidates per input partition, the shuffle carries
  * O(partitions × strata × k) rows regardless of corpus size, and the
  * result is bit-identical to the window form (spec-asserted; the
  * driver oracle IS the window form in DuckDB).
  *
  * Priority = a Knuth multiplicative hash of doc_id — pure integer
  * arithmetic, reproducible in any engine, and uncorrelated with id
  * order. Swapping the constant re-draws the sample.
  */
object Sampling {

  val SamplePerStratum = 20
  /** Knuth's 2^32 / φ multiplicative hashing constant. */
  val HashMult = 2654435761L
  val HashMod = 4294967296L // 2^32

  /** Exact k-per-stratum deterministic sample. Returns one row per kept
    * document with its in-stratum rank (0-based, priority order). */
  def stratifiedSample(docs: DataFrame, stratum: String, k: Int): DataFrame = {
    val pri = pmod(col("doc_id") * HashMult, lit(HashMod)).cast("double")
    docs
      .groupBy(col(stratum))
      .agg(TopKRows.topKRowsByScore(
        -pri, // top-k keeps HIGHEST score = lowest priority
        col("doc_id"),
        struct(col("doc_id"), col("source")),
        k).as("kept"))
      .select(col(stratum), posexplode(col("kept")).as(Seq("rank", "doc")))
      .select(col(stratum), col("rank").cast("long").as("rank"),
        col("doc.doc_id").as("doc_id"), col("doc.source").as("source"))
  }

  /** d8: 20 docs per language, deterministic. */
  def d8StratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.documents(s, dir).select("doc_id", "lang", "source"),
      "lang", SamplePerStratum)
      .orderBy("lang", "rank")

  /** Oracle: the window formulation — provably the same selection. */
  val d8Sql: String =
    s"""SELECT lang,
       | cast(row_number() OVER w - 1 AS bigint) AS rank,
       | doc_id, source
       |FROM documents
       |WINDOW w AS (PARTITION BY lang ORDER BY (doc_id * $HashMult) % $HashMod, doc_id)
       |QUALIFY row_number() OVER w <= $SamplePerStratum
       |ORDER BY lang, rank""".stripMargin
}
