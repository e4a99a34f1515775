package graft.sources

import graft.SparkSpec
import graft.functions.{TopK, PqExpressions => PQ, VectorExpressions => V}
import org.apache.spark.sql.functions._

class VectorIndexExportSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

  test("vector-index artifact: documented layout, bit-exact codebook round-trip, probe from disk") {
    val path = java.nio.file.Files.createTempDirectory("graft-vidx").toString + "/index"
    VectorIndexExport.build(emb, path, nlist = 8, k = 16)
    val root = new java.io.File(path)

    // the documented layout: meta + coarse + pq + cid-partitioned codes
    assert(Set("meta", "coarse", "pq", "codes").subsetOf(root.list().toSet))
    val cidDirs = new java.io.File(s"$path/codes").list().count(_.startsWith("cid="))
    assert(cidDirs > 1 && cidDirs <= 8, s"cid dirs: $cidDirs")

    val idx = VectorIndexExport.load(spark, path)
    assert(idx.meta.collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSeq == Seq((8, PqCodebook.M, PqCodebook.Sub, 16)))
    // every vector appears in exactly one inverted list
    assert(idx.codes.count() == emb.count())
    assert(idx.codes.select("vec_id").distinct().count() == emb.count())

    // codebooks round-trip BIT-EXACTLY (integers + float32 parquet):
    // the stored PQ codebook re-encodes the corpus to the codes stored
    // next to it
    val reEncoded = emb.crossJoin(broadcast(
        PqCodebook.kbsRow(idx.pq.withColumn("kcb", lit(16)), Seq(16))))
      .select(col("vec_id"), PQ.encode(col("embedding"), element_at(col("kbs"), 1)).as("rc"))
    val diverged = idx.codes.select(col("vec_id"), col("codes")).join(reEncoded, "vec_id")
      .filter(not(col("codes") === col("rc"))).count()
    assert(diverged == 0, s"$diverged stored code rows diverge from re-encoding via the stored codebook")

    // probing the STORED artifact equals probing the in-session build
    // (same deterministic codebooks -> same integer ADC scores)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val fromDisk = VectorIndexExport.probe(idx, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(fromDisk.nonEmpty)
    // in-session reference: identical arithmetic straight from the frames
    val cents = PqCodebook.train(emb, 16).withColumn("kcb", lit(16))
    val pcb = PqCodebook.kbsRow(cents, Seq(16))
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cemb"))
    val ccb = coarse.groupBy()
      .agg(sort_array(collect_list(struct(col("cid"), col("cemb")))).as("cb"))
      .select(expr("transform(cb, c -> c.cid)").as("cids"),
              expr("transform(cb, c -> c.cemb)").as("cembs"))
    val assigned = emb.crossJoin(broadcast(ccb)).crossJoin(broadcast(pcb))
      .select(col("vec_id"),
        element_at(col("cids"), V.nearest(col("embedding"), col("cembs")) + 1).as("cid"),
        PQ.encode(col("embedding"), element_at(col("kbs"), 1)).as("codes"))
    val ranked = queries.crossJoin(broadcast(ccb))
      .select(col("qid"), col("qemb"), posexplode(col("cembs")).as(Seq("cidx", "cemb")))
      .withColumn("csim", V.cosine(col("qemb"), col("cemb")))
      .groupBy("qid")
      .agg(TopK.topKByScore(col("csim"), col("cidx").cast("long"), 2).as("pcids"),
           first(col("qemb")).as("qemb"))
    val probes = ranked.crossJoin(broadcast(pcb))
      .select(col("qid"), PQ.adcTable(col("qemb"), element_at(col("kbs"), 1)).as("tbls"),
        explode(col("pcids")).as("pcid"))
    val inSession = assigned
      .join(broadcast(probes), col("cid") === col("pcid") && col("vec_id") =!= col("qid"))
      .withColumn("score", PQ.adcScore(col("codes"), col("tbls")).cast("double"))
      .groupBy("qid")
      .agg(TopK.topKByScore(col("score"), col("vec_id"), 5).as("nbrs"))
      .select(col("qid"), posexplode(col("nbrs")).as(Seq("pos", "neighbor")))
      .select(col("qid"), (col("pos") + 1).as("rank"), col("neighbor"))
      .orderBy("qid", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(fromDisk == inSession, "stored-artifact probe diverges from the in-session build")

    // the stored-codes scan is partition-pruned by the probe join
    val plan = VectorIndexExport.probe(idx, queries, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning on the codes scan:\n${plan.take(2000)}")
  }
}
