package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed vector-store MAINTENANCE LOOP — the deployment flow the
  * reference runs per tenant as HNSWLib.load → addDocuments → save
  * (customTrainDataController.js:56-62), re-expressed for the
  * inverted-file store: upsert stream → coarse-assigned APPEND into the
  * current index generation → staleness check against a freshly-trained
  * candidate codebook → threshold-triggered REBUILD as a new
  * generation.
  *
  * Generations, not in-place rewrites: a rebuild writes `gen_<g+1>`
  * beside the live `gen_<g>` and flips the current pointer (the max
  * generation present) — readers never observe a half-written index,
  * and a 100 TB rebuild streams corpus → new directory without
  * touching the serving copy. Appends go into the CURRENT generation's
  * `cid=` directories only (IvfIndex.append — map-only against the
  * stored codebook).
  *
  * Centroid ALIGNMENT before the staleness vote: k-means on the grown
  * store returns the same clusters under an arbitrary INDEX
  * PERMUTATION; comparing raw assignment indices would count every
  * vector of a permuted cluster as "reassigned" and spuriously trigger
  * rebuilds forever. The candidate codebook is therefore greedily
  * matched to the stored one (highest-cosine pairs first, driver-side
  * over the k×k sliver) so the metric measures real drift, not label
  * shuffling.
  */
object VectorStoreMaintenance {

  /** What one absorb cycle did. */
  case class MaintenanceReport(generation: Int, nVectors: Long,
      reassignPpm: Long, retrained: Boolean)

  private def genPath(root: String, g: Int) = s"$root/gen_$g"
  private def codebookPath(root: String, g: Int) = s"$root/codebook_$g"

  /** The live generation (max present; -1 for an empty/absent root).
    * Listed through Hadoop's FileSystem against the session's
    * configuration — the same path I/O the index reads/writes use — so
    * a non-local root (HDFS/S3) resolves instead of silently returning
    * -1 the way a driver-local java.io listing would; the pattern is
    * anchored so a sibling merely CONTAINING "gen_<n>" never counts. */
  def currentGen(s: SparkSession, root: String): Int = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) -1
    else fs.listStatus(path)
      .flatMap(st => "^gen_(\\d+)$".r.findFirstMatchIn(st.getPath.getName).map(_.group(1).toInt))
      .foldLeft(-1)(math.max)
  }

  private def saveCodebook(s: SparkSession, root: String, g: Int,
      cents: Array[Array[Float]]): Unit = {
    import s.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cid", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(root, g))
  }

  /** The stored codebook of a generation, cid-ordered. */
  def loadCodebook(s: SparkSession, root: String, g: Int): Array[Array[Float]] =
    s.read.parquet(codebookPath(root, g))
      .orderBy("cid").collect()
      .map(_.getSeq[Float](1).toArray)

  /** Bootstrap generation 0 from a base corpus. */
  def init(embeddings: DataFrame, k: Int, root: String, seed: Long = 42L): Unit = {
    val s = embeddings.sparkSession
    val cents = IvfIndex.train(embeddings, k, seed)
    IvfIndex.build(embeddings, cents, genPath(root, 0))
    saveCodebook(s, root, 0, cents)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Reorder `candidate` so its index i holds the centroid best matching
    * stored centroid i — greedy on descending cosine over the k×k pairs
    * (k is codebook-sized; this is driver-side sliver work). */
  private[sources] def alignTo(stored: Array[Array[Float]],
      candidate: Array[Array[Float]]): Array[Array[Float]] = {
    val pairs = for {
      i <- stored.indices; j <- candidate.indices
    } yield (cosine(stored(i), candidate(j)), i, j)
    val out = new Array[Array[Float]](stored.length)
    val usedS = new Array[Boolean](stored.length)
    val usedC = new Array[Boolean](candidate.length)
    pairs.sortBy { case (c, i, j) => (-c, i, j) }.foreach { case (_, i, j) =>
      if (!usedS(i) && !usedC(j)) { out(i) = candidate(j); usedS(i) = true; usedC(j) = true }
    }
    out
  }

  /** One maintenance cycle: append the batch into the current
    * generation, retrain a candidate codebook on the grown store, align
    * it, measure staleness, and rebuild as generation g+1 when the
    * reassignment rate crosses `thresholdPpm`. */
  def absorb(s: SparkSession, batch: DataFrame, root: String,
      thresholdPpm: Long, seed: Long = 42L): MaintenanceReport = {
    val g = currentGen(s, root)
    require(g >= 0, s"no generation under $root — call init first")
    val stored = loadCodebook(s, root, g)
    IvfIndex.append(batch.select("vec_id", "embedding"), stored, genPath(root, g))
    val store = s.read.parquet(genPath(root, g)).select("vec_id", "embedding")
      .localCheckpoint() // pinned: read by train, staleness, and a rebuild
    val candidate = alignTo(stored,
      IvfIndex.train(store, stored.length, seed))
    val st = IvfIndex.staleness(s, genPath(root, g), candidate).collect()(0)
    val (n, ppm) = (st.getLong(0), st.getLong(2))
    val retrain = ppm > thresholdPpm
    if (retrain) {
      IvfIndex.build(store, candidate, genPath(root, g + 1))
      saveCodebook(s, root, g + 1, candidate)
    }
    MaintenanceReport(if (retrain) g + 1 else g, n, ppm, retrain)
  }

  /** Serve against the live generation with its own codebook. */
  def probe(s: SparkSession, root: String, queries: DataFrame, k: Int,
      nprobe: Int, excludeSelf: Boolean = false): DataFrame = {
    val g = currentGen(s, root)
    IvfIndex.probe(s, genPath(root, g), queries,
      loadCodebook(s, root, g), k, nprobe, excludeSelf)
  }
}
