package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition multimodal decode pipeline.
  *
  * Real pipelines decode image/audio/video blobs with native codec
  * libraries inside a partition-batch transform (in PySpark this is
  * `mapInPandas`; the Scala-native equivalent is `mapPartitions` over a
  * typed Dataset, which is what we do here). The codec libraries are
  * intentionally absent from this container, so `decodeFrame` is a
  * DETERMINISTIC STUB — everything around it (schema, batching,
  * partition-parallel execution, feature columns) is the real plumbing
  * and is what the spec exercises.
  */
object MultimodalDecode {

  case class Asset(asset_id: Long, media_type: String, payload: Array[Byte])
  case class FrameFeature(asset_id: Long, frame_idx: Int, width: Int, height: Int, mean_luma: Double)

  /** STUB decode: derives fake-but-deterministic frame features from the
    * payload bytes. A real deployment swaps only this function for a
    * codec call — the operator contract is unchanged. */
  def decodeFrame(payload: Array[Byte], frameIdx: Int): (Int, Int, Double) = {
    if (payload.isEmpty) return (16, 16, 0.0) // empty blob: degenerate frame
    val n = payload.length
    val w = 16 + (n % 16) * 8
    val h = 16 + ((n / 16) % 16) * 8
    val off = (frameIdx * 31) % n
    val luma = (payload(off) & 0xff) / 255.0
    (w, h, luma)
  }

  val FramesPerAsset = 4

  /** Decode + feature-extract: one pass per partition, constant memory —
    * rows are consumed and emitted lazily, never materialized per
    * partition. Partition count (not row count) bounds native-decoder
    * concurrency at scale. */
  def extractFrameFeatures(assets: Dataset[Asset]): Dataset[FrameFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        (0 until FramesPerAsset).iterator.map { f =>
          val (w, h, luma) = decodeFrame(a.payload, f)
          FrameFeature(a.asset_id, f, w, h, luma)
        }
      }
    }
  }

  case class AssetEmbed(asset_id: Long, media_type: String, embedding: Array[Float])

  /** Decode + EMBED in one per-partition pass — the multimodal front of
    * m3's semantic dedup. Each asset becomes an 8-dim stub embedding:
    * dims 0-1 are the decode stub's frame geometry (width/height of
    * frame 0, payload-length-derived), dims 2-7 are content-hash
    * components (md5 of the dimension index + payload). A real
    * deployment swaps this for a CLIP/CLAP-style encoder behind the same
    * mapPartitions batch contract; everything downstream (clustering,
    * dominance, survivors) is encoder-agnostic.
    *
    * Determinism contract (the d11 rule): every component is k/1024
    * with |k| ≤ 512 — dyadic rationals exactly representable in BOTH
    * float32 and float64, so the DuckDB oracle (which computes the same
    * arithmetic in double) scores bit-identical cosines. */
  def embedAssets(assets: Dataset[Asset]): Dataset[AssetEmbed] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h, _) = decodeFrame(a.payload, 0)
        val emb = new Array[Float](8)
        emb(0) = (w * 4 - 512) / 1024.0f
        emb(1) = (h * 4 - 512) / 1024.0f
        var j = 2
        while (j < 8) {
          md.reset()
          md.update(j.toString.getBytes("UTF-8"))
          md.update(a.payload)
          // first 15 hex chars of the digest, as in Md5PrefixMod / the
          // oracle's ('0x' || substr(md5(...), 1, 15))::bigint
          val hex = md.digest().take(8).map(b => f"$b%02x").mkString
          val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
          emb(j) = ((v % 1024) - 512) / 1024.0f
          j += 1
        }
        AssetEmbed(a.asset_id, a.media_type, emb)
      }
    }
  }

  /** Assemble a typed asset table from `documents` (text bytes standing in
    * for the media payload) — binary column + typed metadata. */
  def assetsFromDocuments(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }
}
