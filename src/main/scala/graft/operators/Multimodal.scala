package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode/feature steps are
  * per-partition batch transforms (see graft.streaming / specs for the
  * mapPartitions decode stub — the codec libraries are intentionally not
  * in this container, so decode is a deterministic fake while the Spark
  * plumbing — schema, batching, partitioning — is real).
  *
  * These two oracle-checked queries exercise the relational plumbing:
  * binary ingestion + content addressing, and deterministic frame
  * sampling (an explode that never shuffles).
  */
object Multimodal {

  /** m1: binary asset table — per-source content stats over the binary
    * payload (documents.text stands in for the blob). */
  def m1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("sha", sha2(col("payload"), 256))
      .groupBy("source")
      .agg(count(lit(1)).as("n_assets"),
           sum(col("n_bytes")).as("total_bytes"),
           countDistinct(col("sha")).as("distinct_payloads"),
           min(col("sha")).as("min_sha"))
      .orderBy("source")

  val m1Sql: String =
    """SELECT source, count(*) AS n_assets,
      | cast(sum(octet_length(text::blob)) AS bigint) AS total_bytes,
      | count(DISTINCT sha256(text)) AS distinct_payloads,
      | min(sha256(text)) AS min_sha
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  val FrameStride = 50

  /** m2: deterministic frame sampling — every 50th "frame" of each asset
    * (n_chars as frame count), content-addressed. Pure map + explode. */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "n_chars")
      .filter(col("n_chars") > 0)
      .withColumn("frame_idx", explode(sequence(lit(0), (col("n_chars") - 1).cast("int"), lit(FrameStride))))
      .withColumn("frame_key", concat(col("doc_id").cast("string"), lit("_"), col("frame_idx").cast("string")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame_key").cast("binary")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val m2Sql: String =
    s"""SELECT doc_id, cast(i AS bigint) AS frame_idx,
       | md5(doc_id::varchar || '_' || i::varchar) AS frame_md5
       |FROM (SELECT doc_id,
       |   unnest(range(0, cast(n_chars AS int), $FrameStride)) AS i
       |  FROM documents WHERE n_chars > 0)
       |ORDER BY doc_id, frame_idx""".stripMargin
}
