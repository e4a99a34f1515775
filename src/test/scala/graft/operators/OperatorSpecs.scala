package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  test("q1 groups are the (returnflag, linestatus) combinations and counts add up") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == graft.Tables.lineitem(spark, sfDir).count())
  }

  test("q4 global rollup equals manual totals") {
    val r = Relational.q4GlobalRollup(spark, sfDir).head()
    val e = graft.Tables.events(spark, sfDir)
    assert(r.getAs[Long]("total_events") == e.count())
    assert(r.getAs[Long]("distinct_users") == e.select("user_id").distinct().count())
  }

  test("q6 pagination returns page 3 of the global order") {
    val all = graft.Tables.orders(spark, sfDir)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .select("o_orderkey").limit(30).collect().map(_.getLong(0))
    val page = Relational.q6Pagination(spark, sfDir).collect().map(_.getAs[Long]("o_orderkey"))
    assert(page.toSeq == all.slice(20, 30).toSeq)
  }

  test("q8 semi-join never duplicates orders") {
    val df = Relational.q8SemijoinIn(spark, sfDir)
    assert(df.count() == df.select("o_orderkey").distinct().count())
  }

  test("q11 returns exactly one row per user") {
    val df = Relational.q11LatestPerKey(spark, sfDir)
    assert(df.count() == df.select("user_id").distinct().count())
  }
}

class SimilaritySpec extends SparkSpec {
  import graft.functions.{VectorExpressions => V}

  test("s1 ranks agree with a window-function reference plan") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("vec_id").asc)
    val ref = e.join(q, col("vec_id") =!= col("qid"))
      .withColumn("score", V.cosine(col("qemb"), col("embedding")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"))
      .orderBy("qid", "rank").collect().toSeq
    val got = Similarity.s1BruteForceTopK(spark, sfDir)
      .collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))) ==
           ref.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))))
  }

  test("s2 LSH results are a subset of candidates sharing a bucket") {
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.lshBucket(col("embedding")).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Similarity.s2LshTopK(spark, sfDir).collect().foreach { r =>
      assert(e(r.getLong(0)) == e(r.getLong(2)), s"qid ${r.getLong(0)} and neighbor ${r.getLong(2)} share no bucket")
    }
  }

  test("v1 upsert preserves the key count (no duplicate vec_ids)") {
    val total = Similarity.v1Upsert(spark, sfDir).agg(sum("cnt")).head().getLong(0)
    assert(total == graft.Tables.embeddings(spark, sfDir).count())
  }
}

class DedupSpec extends SparkSpec {
  test("d1 finds exactly the planted exact duplicates") {
    val expected = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).count()
    val got = Dedup.d1ExactDedup(spark, sfDir)
    assert(got.count() == expected)
    assert(got.filter(col("cnt") =!= 2).count() == 0)
  }

  test("d2 jaccard pairs include every planted near-dup with jaccard in (0.5, 1]") {
    val pairs = Dedup.d2NgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val planted = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").collect().map(_.getLong(0)).toSet
    planted.foreach { id =>
      assert(pairs.exists { case (a, b, j) => a == id && b == id + 100000 && j > 0.5 && j <= 1.0 },
        s"missing planted pair for doc $id")
    }
  }

  test("d3 minhash-LSH candidates include nearly all planted near-dups") {
    val got = Dedup.d3MinHashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").collect().map(_.getLong(0))
    val hit = planted.count(id => got.contains((id, id + 100000)))
    assert(hit >= planted.length * 8 / 10, s"only $hit of ${planted.length} planted pairs surfaced")
  }

  test("d4 simhash surfaces planted near-dups with small hamming distance, deterministically") {
    val run1 = Dedup.d4SimHash(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val run2 = Dedup.d4SimHash(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(run1 == run2)
    val planted = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").collect().map(_.getLong(0))
    val asSet = run1.map(t => (t._1, t._2)).toSet
    val hit = planted.count(id => asSet.contains((id, id + 100000)))
    assert(hit >= planted.length * 8 / 10, s"only $hit of ${planted.length} planted pairs surfaced")
  }

  test("d5 finds exactly the planted embedding copies") {
    val planted = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 20 === 0).select("vec_id").collect().map(_.getLong(0)).toSet
    val got = Dedup.d5EmbeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == planted.map(id => (id, id + 100000)))
  }

  test("d5 salted scale path returns the identical pair set (no broadcast)") {
    val broadcastForm = Dedup.d5EmbeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSeq
    val saltedForm = Dedup.d5EmbeddingNearDupSalted(spark, sfDir, salts = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSeq
    assert(saltedForm == broadcastForm)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import graft.operators.{TextAnalysis => T}

  test("token counts on literal rows") {
    import spark.implicits._
    val df = Seq("a b  c", " x ", "", "one,two three").toDF("text")
      .select(T.tokenCount(col("text")).as("t"), T.subTokenCount(col("text")).as("s"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((3, 3), (1, 1), (0, 0), (2, 4)))
  }

  test("t5 chunks reassemble the document (stride segments)") {
    val doc = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 1).select("text").head().getString(0)
    val chunks = TextAnalysis.t5Chunking(spark, sfDir)
      .filter(col("doc_id") === 1).orderBy("chunk_idx").collect()
    val expectedN = math.ceil(doc.length / TextAnalysis.ChunkStep.toDouble).toInt
    assert(chunks.length == expectedN)
    chunks.foreach { r =>
      val idx = r.getInt(1)
      val expected = doc.substring(idx * TextAnalysis.ChunkStep,
        math.min(idx * TextAnalysis.ChunkStep + TextAnalysis.ChunkSize, doc.length))
      assert(r.getAs[Int]("chunk_len") == expected.length)
    }
  }

  test("t3 every document gets exactly one prediction") {
    val total = TextAnalysis.t3LangId(spark, sfDir).agg(sum("docs")).head().getLong(0)
    assert(total == graft.Tables.documents(spark, sfDir).count())
  }
}

class EventsSpec extends SparkSpec {
  test("e1 session gaps respect the 30-minute rule") {
    val sessions = Events.e1Sessionize(spark, sfDir).collect()
    // sessions of the same user must be separated by > gap
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_seq"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > Events.SessionGapUs)
        case _ =>
      }
    }
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.Tables.events(spark, sfDir).count())
  }

  test("e2 hourly rollup total equals event count") {
    val total = Events.e2TumblingWindow(spark, sfDir).agg(sum("cnt")).head().getLong(0)
    assert(total == graft.Tables.events(spark, sfDir).count())
  }

  test("e3 funnel stages are monotone and match a brute-force per-user check") {
    val r = Events.e3Funnel(spark, sfDir).head()
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"($s1, $s2, $s3)")
    assert(s1 > 0)
    // brute force on the driver: earliest signup, then earliest later click,
    // then earliest later purchase, per user
    val byUser = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().groupBy(_.getLong(0))
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      val evs = rows.map(x => (x.getLong(1), x.getString(2)))
      val t1 = evs.collect { case (us, "signup") => us }.minOption
      val t2 = t1.flatMap(t => evs.collect { case (us, "click") if us > t => us }.minOption)
      val t3 = t2.flatMap(t => evs.collect { case (us, "purchase") if us > t => us }.minOption)
      if (t1.isDefined) n1 += 1
      if (t2.isDefined) n2 += 1
      if (t3.isDefined) n3 += 1
    }
    assert((s1, s2, s3) == ((n1, n2, n3)))
  }
}

class PivotSpec extends SparkSpec {
  test("q33 cells partition each user's events exactly") {
    val rows = Analytics.q33PivotActivity(spark, sfDir)
    // one row per user, n_events sums to the fact count
    assert(rows.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(rows.agg(sum("n_events")).head().getLong(0) ==
      graft.Tables.events(spark, sfDir).count())
    // a cell equals the independently-filtered per-type sum for one user
    val probe = rows.orderBy("user_id").head()
    val want = graft.Tables.events(spark, sfDir)
      .filter(col("user_id") === probe.getLong(0) && col("event_type") === "purchase")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")).head()
    assert(probe.getAs[Any]("purchase_value") == want.getAs[Any](0))
  }
}

class MultimodalDecodeSpec extends SparkSpec {
  test("frame extraction emits FramesPerAsset deterministic features per asset") {
    val assets = MultimodalDecode.assetsFromDocuments(spark, sfDir)
    val feats = MultimodalDecode.extractFrameFeatures(assets)
    val n = assets.count()
    assert(feats.count() == n * MultimodalDecode.FramesPerAsset)
    val once = feats.collect().sortBy(f => (f.asset_id, f.frame_idx)).toSeq
    val again = MultimodalDecode.extractFrameFeatures(assets).collect()
      .sortBy(f => (f.asset_id, f.frame_idx)).toSeq
    assert(once == again)
    once.foreach { f => assert(f.mean_luma >= 0.0 && f.mean_luma <= 1.0) }
  }

  test("empty payload decodes to a degenerate frame instead of throwing") {
    val (w, h, luma) = MultimodalDecode.decodeFrame(Array.emptyByteArray, 2)
    assert(w == 16 && h == 16 && luma == 0.0)
  }
}
