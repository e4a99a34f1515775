package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** e16: seasonal-naive forecast backtest — full driver-side recompute of
  * the forecast, the error totals, and the exact-division report. */
class ForecastBacktestSpec extends SparkSpec {

  test("e16 error report matches a driver-side seasonal-naive recompute") {
    val got = Events.e16ForecastBacktest(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty)
    val ev = graft.Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"), col("event_type"))
      .collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)), r.getString(1)))
    val d0 = ev.map(_._1).minBy(_.toEpochDay)
    val d1 = ev.map(_._1).maxBy(_.toEpochDay)
    val days = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toSeq
    val counts = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val types = ev.map(_._2).distinct
    val want = types.map { t =>
      val series = days.map(d => counts.getOrElse((d, t), 0L))
      val scored = (14 until series.length).map { i =>
        val fc = (series(i - 7) + series(i - 14)) / 2
        (series(i), fc)
      }
      val absErr = scored.map { case (n, fc) => math.abs(n - fc) }.sum
      val bias = scored.map { case (n, fc) => fc - n }.sum
      t -> ((scored.length.toLong, scored.map(_._1).sum, absErr, bias,
        absErr * 100 / scored.length))
    }.toMap
    assert(got == want, "backtest report mismatch")
    // the scored span excludes the 14-day warmup exactly
    got.values.foreach { case (nDays, _, _, _, _) =>
      assert(nDays == days.length - 14L, "warmup rows must be excluded")
    }
  }

  test("e16 is exact on a planted series with known seasonal error") {
    // planted: type X is perfectly weekly-periodic => zero error;
    // type Y alternates its seasonal level => known constant error
    import spark.implicits._
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 28).flatMap { d =>
      val day = base.plusDays(d)
      val x = Seq.fill(3 + (d % 7))(("X", day))            // periodic
      val y = Seq.fill(if ((d / 7) % 2 == 0) 2 else 6)(("Y", day)) // level flips
      x ++ y
    }
    val df = rows.zipWithIndex.map { case ((t, day), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(day.atStartOfDay), 1L, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.createOrReplaceTempView("___e16_fixture")
    // recompute via the same frame logic on the fixture
    val daily = df.select(col("ts").cast("date").as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val scored = daily
      .withColumn("l7", lag(col("n"), 7).over(w))
      .withColumn("l14", lag(col("n"), 14).over(w))
      .filter(col("l7").isNotNull && col("l14").isNotNull)
      .select(col("event_type"),
        abs(col("n") - expr("(l7 + l14) DIV 2")).as("ae"))
      .groupBy("event_type").agg(sum("ae").as("abs_err"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scored("X") == 0L, "periodic series must backtest error-free")
    // Y: 14 scored days; forecast = mean of the two previous regimes = 4,
    // actual alternates 2/6 week-wise => |err| = 2 every day
    assert(scored("Y") == 28L, "level-flip series must err by 2/day")
  }
}

/** q60/q61/q62: the Q5 same-nation join cycle, the Q6 pushdown probe,
  * and the Q19 disjunctive brackets — driver recomputes + the plan
  * contracts that make them worth benchmarking. */
class WarehouseQ5Q6Q19Spec extends SparkSpec {

  private def cents(d: Double): Long =
    (BigDecimal(d).setScale(2) * 100).toLongExact

  test("q60 keeps only same-nation (customer, supplier) revenue") {
    val got = Warehouse.q60LocalSupplier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val nations = graft.Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 1) // AMERICA
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val cust = graft.Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](2).longValue).toMap
    val supp = graft.Tables.supplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](2).longValue).toMap
    val y0 = java.time.LocalDateTime.parse("1997-01-01T00:00:00")
    val y1 = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime](2)
        !d.isBefore(y0) && d.isBefore(y1)
      }.map(r => r.getLong(0) -> cust(r.getLong(1))).toMap
    val cells = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount").collect()
      .flatMap { r =>
        orders.get(r.getLong(0)).flatMap { cn =>
          val sn = supp(r.getLong(1))
          if (sn == cn && nations.contains(cn))
            Some(nations(cn) -> cents(r.getDouble(2)) * (100 - cents(r.getDouble(3))))
          else None
        }
      }.groupBy(_._1)
      .map { case (n, xs) => (n, xs.map(_._2).sum / 10000, xs.length.toLong) }
      .toSeq.sortBy { case (n, rev, _) => (-rev, n) }
    assert(got.toSeq == cells, "Q5-shape local-supplier revenue mismatch")
  }

  test("q61 recomputes exactly and pushes every filter into the scan") {
    val r = Warehouse.q61ForecastRevenue(spark, sfDir).head()
    val want = graft.Tables.lineitem(spark, sfDir)
      .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice").collect()
      .filter { x =>
        val d = x.getAs[java.time.LocalDateTime](0)
        d.getYear == 1996 && x.getDouble(1) >= 0.05 && x.getDouble(1) <= 0.07 &&
          x.getDouble(2) < 24
      }.map(x => cents(x.getDouble(3)) * cents(x.getDouble(1)))
    assert(r.getLong(0) == want.sum && r.getLong(1) == want.length.toLong)
    // formatted mode prints the FULL PushedFilters list (toString truncates)
    val plan = Warehouse.q61ForecastRevenue(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("GreaterThanOrEqual(l_discount") &&
      plan.contains("LessThan(l_quantity"),
      s"Q6's whole point is scan-resident filters:\n$plan")
  }

  test("q62 brackets recompute exactly and the hulls prefilter both scans") {
    val r = Warehouse.q62BracketRevenue(spark, sfDir).head()
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getInt(2)))).toMap
    val want = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").collect()
      .flatMap { x =>
        val (brand, size) = parts(x.getLong(0))
        val q = x.getDouble(1)
        val hit =
          (brand == "Brand#12" && size >= 1 && size <= 10 && q >= 1 && q <= 11) ||
          (brand == "Brand#23" && size >= 1 && size <= 20 && q >= 10 && q <= 20) ||
          (brand == "Brand#3" && size >= 1 && size <= 30 && q >= 20 && q <= 30)
        if (hit) Some(cents(x.getDouble(2)) * (100 - cents(x.getDouble(3)))) else None
      }
    assert(r.getLong(0) == want.sum / 10000 && r.getLong(1) == want.length.toLong)
    val plan = Warehouse.q62BracketRevenue(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("LessThanOrEqual(l_quantity,30.0"),
      s"the quantity hull must reach the lineitem scan:\n$plan")
    assert(plan.contains("In(p_brand"),
      s"the brand hull must reach the part scan:\n$plan")
  }

  test("v7 pages by keyset with the prefix pushed, and the page is exact") {
    val got = Similarity.v7ListVectors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val all = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).length.toLong))
    val want = all
      .filter(t => t._2 == Similarity.ListNamespace &&
        t._1 > Similarity.ListAfterId &&
        t._1.toString.startsWith(Similarity.ListIdPrefix))
      .sortBy(_._1).take(Similarity.ListPageSize)
      .map(t => (t._1, t._1.toString, t._2, t._3))
    assert(got.toSeq == want.toSeq, "list page mismatch")
    assert(got.length <= Similarity.ListPageSize)
    val plan = Similarity.v7ListVectors(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThan(vec_id") &&
      plan.contains("EqualTo(label"),
      s"keyset + namespace must push into the scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the page cut must be top-k, not a global sort:\n$plan")
  }
}

/** e17: the deadline funnel — driver-side recompute of the windowed
  * min-chain and the containment relation vs the unbounded e3. */
class DeadlineFunnelSpec extends SparkSpec {

  test("e17 matches a driver-side recompute and never exceeds e3") {
    val r = Events.e17DeadlineFunnel(spark, sfDir).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val d = Events.FunnelDeadlineUs
    val byUser = ev.groupBy(_._1)
    val chains = byUser.values.map { es =>
      val t1 = es.collect { case (_, "signup", us) => us }.sorted.headOption
      val t2 = t1.flatMap(a => es.collect {
        case (_, "click", us) if us > a && us <= a + d => us }.sorted.headOption)
      val t3 = t2.flatMap(a => es.collect {
        case (_, "purchase", us) if us > a && us <= a + d => us }.sorted.headOption)
      (t1, t2, t3)
    }.toSeq
    val (n1, n2, n3) = (chains.count(_._1.isDefined).toLong,
      chains.count(_._2.isDefined).toLong, chains.count(_._3.isDefined).toLong)
    assert(got == ((n1, n2, n3, n2 * 1000000L / n1,
      if (n2 > 0) n3 * 1000000L / n2 else 0L)), "deadline funnel mismatch")
    // containment: the windowed funnel can only lose users vs e3
    val e3r = Events.e3Funnel(spark, sfDir).head()
    assert(got._1 == e3r.getLong(0), "step 1 has no deadline — counts equal")
    assert(got._2 <= e3r.getLong(1) && got._3 <= e3r.getLong(2),
      "deadline steps must be subsets of the unbounded funnel")
  }

  test("e17 loses a planted too-late converter that e3 keeps") {
    import spark.implicits._
    // user 1 converts in-window; user 2's click lands 25h after signup
    val h = 3600L * 1000000L
    val rows = Seq(
      (1L, 10L, "signup", 0L), (2L, 10L, "click", 2 * h), (3L, 10L, "purchase", 3 * h),
      (4L, 20L, "signup", 0L), (5L, 20L, "click", 25 * h), (6L, 20L, "purchase", 26 * h))
    val df = rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val d = Events.FunnelDeadlineUs
    val funnel = df.withColumn("us", unix_micros(col("ts")))
      .withColumn("t1_run", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("click_ok", when(col("event_type") === "click" &&
        col("us") > col("t1_run") && col("us") <= col("t1_run") + d, col("us")))
      .withColumn("t2_run", min(col("click_ok")).over(w))
      .withColumn("purchase_ok", when(col("event_type") === "purchase" &&
        col("us") > col("t2_run") && col("us") <= col("t2_run") + d, col("us")))
      .groupBy("user_id")
      .agg(min(col("click_ok")).as("t2"), min(col("purchase_ok")).as("t3"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(funnel(10L)._1.isDefined && funnel(10L)._2.isDefined, "in-window user converts")
    assert(funnel(20L)._1.isEmpty && funnel(20L)._2.isEmpty, "late click must not count")
  }
}

/** q63: co-purchase pairs — driver recompute + the basket-bounded
  * explosion arithmetic. */
class CopurchaseSpec extends SparkSpec {

  test("q63 pair supports match a driver-side recompute") {
    val got = Warehouse.q63Copurchase(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= Warehouse.CopurchaseK)
    val items = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val want = items.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSeq.sortBy { case (p1, p2, n) => (-n, p1, p2) }.take(Warehouse.CopurchaseK)
    assert(got.toSeq == want, "co-purchase support mismatch")
  }
}

/** s20: filtered serving at the compressed tier — namespace purity,
  * probe-respecting equality with the filtered brute force, and the
  * whole-store codebook contract. */
class FilteredAdcSpec extends SparkSpec {

  test("s20 serves only the namespace and tracks the filtered brute force") {
    val got = Similarity.s20FilteredAdcServe(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ns = Similarity.ServeLabels.toSet
    got.foreach { case (qid, _, nbr) =>
      assert(ns.contains(labels(nbr)), s"q$qid: neighbor $nbr outside the namespace")
    }
    // recall vs the filtered full-float brute force over the same batch
    val truth = Similarity.s5FilteredTopKFor(spark, sfDir,
        Similarity.externalQueries(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val mine = got.groupBy(_._1).map { case (q, xs) => q -> xs.map(_._3).toSet }
    val hits = mine.map { case (q, s) => (s intersect truth(q)).size }.sum
    val total = truth.values.map(_.size).sum
    assert(hits * 10 >= total * 6,
      s"filtered compressed recall collapsed: $hits/$total")
  }
}

/** v8: the metadata-update verb — conservation audit: payload mass and
  * row count invariant, ids move to exactly their patched labels. */
class UpdateMetadataSpec extends SparkSpec {

  test("v8 conserves payload mass and moves exactly the patched ids") {
    val post = Similarity.v8UpdateMetadata(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pre = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val check = r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong).sum
        (r.getLong(0), r.getAs[Number](1).longValue, check)
      }
    // driver-side merge with the same patch rule
    val merged = pre.map { case (id, l, c) =>
      (id, if (id % 11 == 0) l + 50 else l, c)
    }
    val want = merged.groupBy(_._2).map { case (l, xs) =>
      l -> ((xs.length.toLong,
        xs.map(t => BigInt(t._1 % Similarity.UpdateChecksumP)).sum
          .mod(BigInt(Similarity.UpdateChecksumP)).toLong,
        xs.map(_._3).sum))
    }
    assert(post == want, "post-image audit mismatch")
    // global conservation: rows and payload mass unchanged by the patch
    assert(post.values.map(_._1).sum == pre.length.toLong)
    assert(post.values.map(t => BigInt(t._3)).sum ==
      pre.map(t => BigInt(t._3)).sum, "payloads must not move")
    // patched namespaces exist: labels ≥ 50 hold exactly the %11 ids
    assert(post.keys.exists(_ >= 50L), "patch must create shifted labels")
  }
}

/** m6: image-text alignment screen — full driver-side recompute of the
  * integer embeddings, dot products, and the cosine gate; the planted
  * caption swaps must be exactly the dropped set. */
class AlignmentScreenSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def emb(text: String): Array[Long] =
    (0 until Multimodal.AlignDims).map { j =>
      java.lang.Long.parseLong(md5hex(j.toString + text).take(15), 16) % 1024 - 512
    }.toArray

  test("m6 verdicts match a driver-side integer-cosine recompute") {
    val got = Multimodal.m6AlignmentScreen(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.keys.foreach { id =>
      val caption = docs(id)
      val payload =
        if (id % 7 == 0) docs.getOrElse(id + 1, caption) else caption
      val (c, p) = (emb(caption), emb(payload))
      val dot = c.zip(p).map { case (a, b) => a * b }.sum
      val na = c.map(x => x * x).sum
      val nb = p.map(x => x * x).sum
      val aligned =
        if (dot > 0 && dot * dot * 10000L >= Multimodal.AlignTauSqX10k * na * nb) 1L
        else 0L
      assert(got(id) == ((dot, aligned)), s"asset $id")
      // identity pairs are self-cosine 1 exactly: dot == both norms
      if (payload == caption) assert(dot == na && dot == nb, s"asset $id identity")
    }
    // the screen's whole point: swapped captions are exactly the drops
    // (modulo the documented missing-successor fallback)
    val dropped = got.collect { case (id, (_, 0L)) => id }.toSet
    val planted = docs.keys.filter(id => id % 7 == 0 && docs.contains(id + 1)).toSet
    assert(dropped == planted, "drop set must equal the planted swap set")
  }
}

/** p8: the composed multimodal corpus cut — conservation identities and
  * a full driver-side recompute of every ledger column. */
class MultimodalCutSpec extends SparkSpec {

  test("p8 ledger recomputes driver-side and conserves the corpus") {
    val got = Multimodal.p8MultimodalCut(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(t => t._1 -> t._3).toMap
    // alignment: swapped payloads (with an existing successor) are the drops
    val rows = docs.map { case (id, src, text) =>
      val payload = if (id % 7 == 0) byId.getOrElse(id + 1, text) else text
      (id, src, payload, payload == text)
    }
    // exact dedup among aligned: keep the lowest id per payload
    val keepId = rows.filter(_._4).groupBy(_._3)
      .map { case (_, g) => g.map(_._1).min }.toSet
    val want = rows.groupBy(_._2).map { case (src, g) =>
      val aligned = g.filter(_._4)
      val kept = aligned.filter(r => keepId.contains(r._1))
      src -> ((g.length.toLong, (g.length - aligned.length).toLong,
        (aligned.length - kept.length).toLong, kept.length.toLong,
        kept.map(_._3.getBytes("UTF-8").length.toLong).sum,
        kept.map(r => r._1 % Multimodal.CutChecksumP).sum % Multimodal.CutChecksumP))
    }
    assert(got == want, "multimodal-cut ledger mismatch")
    // conservation per source: in = misaligned + dups + kept
    got.values.foreach { case (n, mis, dup, kept, _, _) =>
      assert(n == mis + dup + kept, "ledger must conserve assets")
    }
    // dup-drop activity tracks the corpus: present exactly when aligned
    // payloads repeat (sf0.01+ has duplicate texts; sf0.001 may not)
    val alignedRows = rows.filter(_._4)
    val corpusDups = alignedRows.length - alignedRows.map(_._3).distinct.length
    assert(got.values.map(_._3).sum == corpusDups.toLong,
      "dup drops must equal the corpus's aligned-payload multiplicity")
  }
}

/** t36: Heaps-law vocabulary growth — nested-prefix monotonicity and a
  * full driver-side recompute of every snapshot's exact masses. */
class HeapsVocabSpec extends SparkSpec {

  test("t36 snapshots match a driver-side recompute and nest monotonically") {
    val got = Quality.t36HeapsVocab(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Quality.HeapsSixteenths)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    val mid = docs.map(_._1).max
    got.foreach { case (k, nDocs, nTok, vocab) =>
      val t = (mid + 1) * k / 16 - 1
      val in = docs.filter(_._1 <= t)
      assert(nDocs == in.length.toLong, s"k=$k docs")
      assert(nTok == in.map(_._2.length.toLong).sum, s"k=$k tokens")
      assert(vocab == in.flatMap(_._2).distinct.length.toLong, s"k=$k vocab")
    }
    // nesting: all three masses are non-decreasing in k
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, "prefixes must nest")
    }
    // Heaps: vocabulary grows SLOWER than token mass between the two
    // largest snapshots (the sublinearity the broadcast designs rely on)
    val (h, f) = (got(got.length - 2), got.last)
    assert(BigInt(f._4) * h._3 <= BigInt(h._4) * f._3,
      "vocab growth must be sublinear in token growth on the top doubling")
  }
}
