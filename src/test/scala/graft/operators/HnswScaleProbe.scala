package graft.operators

import org.apache.spark.sql.SparkSession

/** Dev probe (r14 receipt): bucketed vs exact HNSW build wall time at a
  * given sf dir. Usage: Test/runMain graft.operators.HnswScaleProbe <dir>
  * [--bucketed-only] [--recall|--recall-only] [--perturb]
  *
  * --perturb makes every replica DISTINCT (dim 0 += replica-index/1000,
  * replica index = vec_id / 10M per tools/gen_sf1.py's offset): the
  * scale dirs replicate 2000 distinct vectors, which the collapse-first
  * build reduces back below the bucketed threshold — the perturbed
  * corpus is the honest bucketed-path receipt: full-cardinality,
  * CLUSTERED (each replica family is a tight cosine cluster — the shape
  * that broke all-pairs-within-bucket in r14). */
object HnswScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf1")
    val s = graft.SessionTuning.shuffleScaleOut(graft.SessionTuning.inputSplits(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")), 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val raw = graft.Tables.embeddings(s, dir).select("vec_id", "embedding")
    val e = if (args.contains("--perturb")) {
      import org.apache.spark.sql.{functions => F}
      raw.select(F.col("vec_id"), F.transform(F.col("embedding"), (x, j) =>
        F.when(j === 0, (x.cast("double")
          + F.floor(F.col("vec_id") / 10000000L).cast("double") / 1000.0)
          .cast("float"))
          .otherwise(x)).as("embedding"))
    } else raw
    println("N=" + e.count())
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-20s min=${ts.min}%7.3f median=${ts.sorted.apply(1)}%7.3f")
    }
    time("build_bucketed") {
      Hnsw.buildAdjacency(e).write.format("noop").mode("overwrite").save()
    }
    if (!args.contains("--bucketed-only") && !args.contains("--recall-only"))
      time("build_exact") {
        Hnsw.buildAdjacencyExact(e).write.format("noop").mode("overwrite").save()
      }
    // --recall / --recall-only: the REGISTERED build's read recall at
    // this scale (where the bucketed path actually runs). Replicated
    // scale corpora carry exact-duplicate vectors, so recall is
    // TIE-ROBUST: a returned neighbor counts as a hit iff its TRUE
    // cosine clears the query's 5th-best brute-force cosine — id
    // mismatches among equal-scoring replicas are not misses.
    if (args.contains("--recall") || args.contains("--recall-only")) {
      val corpus = e // `functions._` below shadows `e` with Euler's constant
      import org.apache.spark.sql.functions._
      val cos = graft.functions.VectorExpressions.cosine _
      val ef = args.sliding(2).collectFirst {
        case Array("--ef", v) => v.toInt }.getOrElse(Hnsw.Ef)
      val qs = Similarity.externalQueries(s, dir)
      // --collapse: the composed p11 path (near-dup collapse → build
      // over family reps → read → exact member re-expansion) instead of
      // the raw registered read — the receipt that the documented
      // dense-cluster limit is routed around in the shipped pipeline
      val t0 = System.nanoTime()
      val got =
        if (args.contains("--collapse"))
          Hnsw.collapseServe(corpus, qs, Hnsw.CollapseTau, ef, Hnsw.BeamHops)
        else Hnsw.searchFrame(corpus, Hnsw.buildAdjacency(corpus), qs,
          ef, Hnsw.BeamHops)
      got.write.format("noop").mode("overwrite").save()
      println(f"read_end_to_end       ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        (if (args.contains("--collapse")) " (collapse+build+serve)" else ""))
      val nemb = corpus.select(col("vec_id").as("neighbor"), col("embedding").as("nemb"))
      val gotScored = got.join(nemb, Seq("neighbor")).join(qs, Seq("qid"))
        .select(col("qid"), cos(col("qemb"), col("nemb")).as("sc"))
      val thr = Similarity.bruteTopKFrame(corpus, qs, Hnsw.K, excludeSelf = false)
        .join(nemb, Seq("neighbor")).join(qs, Seq("qid"))
        .groupBy("qid").agg(min(cos(col("qemb"), col("nemb"))).as("thr"))
      val joined = gotScored.join(thr, Seq("qid"))
      val hits = joined.filter(col("sc") >= col("thr") - 1e-9).count()
      val total = joined.count()
      println(f"bucketed_recall@${Hnsw.K} = ${hits.toDouble / total}%.3f " +
        s"(hits=$hits/$total)")
    }
    s.stop()
  }
}
