package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("q38 window formulation equals the aggregate + self-join recompute") {
    val got = Warehouse.q38SmallQtyRevenue(spark, sfDir).head()
    // recompute with the two-scan shape the oracle uses
    val p = graft.Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val pl = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
    val a = pl.groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    val want = pl.join(a, Seq("l_partkey"))
      .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt") < col("sum_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
        .as("avg_yearly"), count(lit(1)).as("n_lines")).head()
    assert(got.getLong(1) == want.getLong(1) && got.getLong(1) > 0)
    assert(got.getDouble(0) == want.getDouble(0))
  }

  test("q25 ranks aggregated revenue descending with an orderkey tiebreak") {
    val rows = Warehouse.q25ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).toSeq
    assert(revs == revs.sortBy(-_), revs.toString)
  }

  test("q26 returns only the two nation pairs, both directions") {
    val pairs = Warehouse.q26BilateralVolume(spark, sfDir)
      .select("supp_nation", "cust_nation").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(pairs.nonEmpty)
  }

  test("q27 only returns orders whose quantity exceeds the threshold") {
    val r = Warehouse.q27LargeVolumeCustomers(spark, sfDir)
    assert(r.filter(col("total_qty") <= Warehouse.LargeOrderQty).count() == 0)
    // every returned order's qty matches an independent recomputation
    val got = r.select("o_orderkey", "total_qty").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val expected = graft.Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    got.foreach { case (k, q) => assert(expected(k) == q, s"order $k") }
  }

  test("q31 counts each qualifying order once however many lines matched") {
    val byPriority = Warehouse.q31ExistsReturned(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent recomputation: distinct orders in the window with >=1 'R' line
    val o = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val want = o.join(
        graft.Tables.lineitem(spark, sfDir)
          .filter(col("l_returnflag") === "R").select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPriority == want)
  }

  test("q32 keeps zero-order customers and accounts for every customer once") {
    val rows = Warehouse.q32CustDistribution(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.Tables.customer(spark, sfDir).count())
    // LEFT-join semantics: a customer with only urgent orders lands in the
    // c_count=0 bucket rather than vanishing (synthesize one by filtering
    // against a priority that excludes everything)
    val perCust = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(r => perCust.getOrElse(r.getLong(0), 0L))
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q43 audits every edge of the star and verdicts a clean load ok") {
    val rows = Warehouse.q43FkOrphans(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "customer->nation", "events->customer", "lineitem->orders", "orders->customer"))
    // driver-side recompute of one fact edge and one dimension edge
    val lo = graft.Tables.lineitem(spark, sfDir).select("l_orderkey").collect().map(_.getLong(0))
    val ok = graft.Tables.orders(spark, sfDir).select("o_orderkey").collect().map(_.getLong(0)).toSet
    val li = rows.find(_.getString(0) == "lineitem->orders").get
    assert(li.getLong(1) == lo.length && li.getLong(2) == lo.count(!ok.contains(_)))
    val cn = rows.find(_.getString(0) == "customer->nation").get
    val nk = graft.Tables.nation(spark, sfDir).select("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    val ck = graft.Tables.customer(spark, sfDir).select("c_nationkey").collect()
      .map(_.getAs[Number](0).longValue)
    assert(cn.getLong(1) == ck.length && cn.getLong(2) == ck.count(!nk.contains(_)))
    rows.foreach(r => assert(r.getInt(3) == (if (r.getLong(2) == 0) 1 else 0)))
  }

  test("q44 scores match a driver-side exact-quartile recompute") {
    val rows = Warehouse.q44RfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute the DISC cutoffs (value at rank ceil(p*n)) per dimension
    def cuts(vs: Array[Long]): (Long, Long, Long) = {
      val s = vs.sorted
      def at(p: Double) = s(math.ceil(p * s.length).toInt - 1)
      (at(0.25), at(0.5), at(0.75))
    }
    val (r25, r50, r75) = cuts(rows.map(_.getLong(1)))
    val (f25, f50, f75) = cuts(rows.map(_.getLong(2)))
    val (m25, m50, m75) = cuts(rows.map(_.getLong(3)))
    def above(v: Long, c: (Long, Long, Long)) =
      (if (v > c._1) 1 else 0) + (if (v > c._2) 1 else 0) + (if (v > c._3) 1 else 0)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getInt(4), r.getInt(5), r.getInt(6))
      assert(rs == 4 - above(r.getLong(1), (r25, r50, r75)), s"r ${r.getLong(0)}")
      assert(fs == 1 + above(r.getLong(2), (f25, f50, f75)), s"f ${r.getLong(0)}")
      assert(ms == 1 + above(r.getLong(3), (m25, m50, m75)), s"m ${r.getLong(0)}")
      assert(r.getInt(7) == rs * 100 + fs * 10 + ms)
      assert(rs >= 1 && rs <= 4 && fs >= 1 && fs <= 4 && ms >= 1 && ms <= 4)
    }
    // the quartile cut is real: every monetary score class is inhabited
    assert(rows.map(_.getInt(6)).toSet == Set(1, 2, 3, 4))
  }

  test("q45 profile rows match a driver-side recompute of the events table") {
    val prof = Warehouse.q45ColumnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("event_id", "event_type", "props", "ts", "user_id", "value"))
    val n = prof("event_id").getLong(1)
    prof.values.foreach(r => assert(r.getLong(1) == n)) // one n_rows
    // event_id is a unique key: distinct == rows, top_count == 1
    assert(prof("event_id").getLong(3) == n && prof("event_id").getLong(7) == 1L)
    // event_type: recompute distinct + top (ties by value) driver-side
    val types = graft.Tables.events(spark, sfDir)
      .select("event_type").collect().map(_.getString(0))
    val byT = types.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    val top = byT.toSeq.sortBy { case (v, c) => (-c, v) }.head
    val et = prof("event_type")
    assert(et.getLong(3) == byT.size && et.getString(6) == top._1 && et.getLong(7) == top._2)
    assert(et.getString(4) == types.min && et.getString(5) == types.max)
    // user_id: typed (numeric) min/max, not lexicographic
    val uids = graft.Tables.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val u = prof("user_id")
    assert(u.getString(4) == uids.min.toString && u.getString(5) == uids.max.toString)
    assert(u.getLong(3) == uids.distinct.length)
  }

  test("q46 triangle conserves revenue and recomputes LTV per cohort") {
    val rows = Warehouse.q46CohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalCents = graft.Tables.orders(spark, sfDir)
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")))
      .head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalCents, "cells must conserve revenue")
    rows.groupBy(_.getString(0)).foreach { case (cm, cohort) =>
      val byAge = cohort.sortBy(_.getLong(1))
      // age 0 exists and every cohort member is active in it
      assert(byAge.head.getLong(1) == 0L, s"$cm: first cell must be age 0")
      assert(byAge.head.getLong(2) == byAge.head.getLong(5),
        s"$cm: all cohort members order in their cohort month")
      // the cumulative is the running sum of the cells; LTV its div
      var run = 0L
      byAge.foreach { r =>
        run += r.getLong(3)
        assert(r.getLong(4) == run, s"$cm age ${r.getLong(1)}: cum mismatch")
        assert(r.getLong(6) == run / r.getLong(5), s"$cm: ltv division")
        assert(r.getLong(2) <= r.getLong(5), "active never exceeds cohort size")
      }
    }
  }

  test("q47 sole stragglers match a driver-side recompute") {
    val got = Warehouse.q47SoleStraggler(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty)
    // recompute: per (order, supp) max shipdate; orders with >1 supplier
    // and a UNIQUE latest supplier; gate on status 'F'; count per NAME.
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toString))
    val fOrders = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val names = graft.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perSupp = li.groupBy(t => (t._1, t._2))
      .map { case ((o, s), xs) => (o, s, xs.map(_._3).max) }
    val stragglers = perSupp.groupBy(_._1).toSeq.collect {
      case (o, g) if g.size > 1 && fOrders.contains(o) &&
        g.count(_._3 == g.map(_._3).max) == 1 =>
        g.maxBy(_._3)._2
    }
    val want = stragglers.groupBy(names).map { case (n, xs) => n -> xs.size.toLong }
      .toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    assert(got.toSeq == want, "top-20 straggler report mismatch")
  }

  test("q48 single-source risk matches a driver-side recompute") {
    val got = Warehouse.q48SingleSourceRisk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(got.nonEmpty && got.size <= 25)
    val pairs = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2) * 100).toLong))
      .groupBy(_._1).map { case ((p, su), xs) => (p, su, xs.map(_._2).sum) }
    val want = pairs.groupBy(_._1).map { case (p, g) =>
      val total = g.map(_._3).sum
      val top = g.toSeq.sortBy(t => (-t._3, t._2)).head
      (p, top._2, g.size.toLong, total, top._3,
        (BigInt(top._3) * 1000000 / total).toLong)
    }.toSeq.sortBy { case (p, _, _, tot, _, share) => (-share, -tot, p) }.take(25)
    assert(got.toSeq == want, "top-25 dominance report mismatch")
    got.foreach { case (_, _, n, tot, top, share) =>
      assert(top <= tot && share <= 1000000L)
      if (n == 1) assert(share == 1000000L, "sole supplier = full share")
    }
  }

  test("q49 idle-affluent report matches a driver-side recompute") {
    val got = Warehouse.q49IdleRich(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("b"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Number](1).longValue, r.getLong(2)))
    val lastByCust = graft.Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).maxBy(_.toString) }
    val nations = graft.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val pos = cust.map(_._3).filter(_ > 0)
    val (sumC, nPos) = (pos.sum, pos.length.toLong)
    val cutoff = lastByCust.values.maxBy(_.toString).minusDays(365)
    val idle = cust.filter(c => c._3 * nPos > sumC &&
      lastByCust.get(c._1).forall(_.isBefore(cutoff)))
    val want = idle.groupBy(c => nations(c._2))
      .map { case (n, xs) => n -> ((xs.length.toLong, xs.map(_._3).sum)) }
    assert(got == want, "per-nation idle-affluent masses mismatch")
    assert(idle.forall(c => c._3 * nPos > sumC), "threshold strict")
    assert(got.values.map(_._1).sum == idle.length.toLong)
  }

  test("q50 latency percentiles match a driver-side rank recompute") {
    val got = Warehouse.q50FulfillmentLatency(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val lastShip = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).maxBy(_.toString) }
    val lats = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .flatMap { r =>
        lastShip.get(r.getLong(0)).map { ship =>
          r.getString(1) -> java.time.temporal.ChronoUnit.DAYS.between(
            r.getAs[java.time.LocalDateTime](2).toLocalDate, ship.toLocalDate)
        }
      }
    val want = lats.groupBy(_._1).map { case (p, xs) =>
      val vs = xs.map(_._2).sorted
      def at(q: Double) = vs(math.ceil(q * vs.length).toInt - 1)
      p -> ((vs.length.toLong, at(0.5), at(0.9), at(0.99), vs.last))
    }
    assert(got == want, "per-priority latency ranks mismatch")
    got.values.foreach { case (_, p50, p90, p99, mx) =>
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx, "ranks must be monotone")
    }
  }

  test("q51 shares sum to ~1e6 per (year, region) and conserve revenue") {
    val rows = Warehouse.q51MarketShare(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // per (yr, region): integer-floored shares sum within |cells| of 1e6
    rows.groupBy(t => (t._1, t._2)).foreach { case ((y, rg), cells) =>
      val s = cells.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - cells.length,
        s"($y,$rg): share sum $s out of floor envelope")
    }
    // revenue conservation in e4 units against one independent aggregate
    val totE4 = graft.Tables.lineitem(spark, sfDir)
      .select(((col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(18,2)") * 100).cast("long")))
        .as("e4"))
      .agg(sum("e4")).head().getLong(0)
    // cells carry floor(e4/10000); allow the truncation slack per cell
    val cents = rows.map(_._4).sum
    assert(cents <= totE4 / 10000 && cents > totE4 / 10000 - rows.length,
      "cell revenue must conserve up to per-cell floor truncation")
  }

  test("q52 late-shipment mix matches a driver-side recompute") {
    val got = Warehouse.q52LateShipments(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        r.getAs[java.time.LocalDateTime](2)))).toMap
    val lines = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
    val want = lines.flatMap { case (ok, ship) => orders.get(ok).map { case (p, od) =>
        (p, if (ship.isAfter(od.plusDays(90))) 1L else 0L)
      } }.groupBy(_._1).map { case (p, xs) =>
        val (n, late) = (xs.length.toLong, xs.map(_._2).sum)
        p -> ((n, late, late * 1000000L / n))
      }
    assert(got == want, "late-shipment mix mismatch")
    assert(got.values.exists(_._2 > 0), "fixture must contain late lines")
  }

  test("q53 min-cost suppliers match a driver-side recompute") {
    val got = Warehouse.q53MinCostSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(got.nonEmpty && got.length <= 100)
    val slice = graft.Tables.part(spark, sfDir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val eurNations = graft.Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 3) // EUROPE
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val sup = graft.Tables.supplier(spark, sfDir).collect()
      .filter(r => eurNations.contains(r.getAs[Number](2).longValue))
      .map(r => r.getLong(0) -> ((r.getString(1),
        eurNations(r.getAs[Number](2).longValue),
        (BigDecimal(r.getDouble(3)).setScale(2) * 100).toLongExact))).toMap
    val offers = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .filter(r => slice.contains(r.getLong(0)) && sup.contains(r.getLong(1)))
      .map { r =>
        val c4 = (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact * 100 /
          r.getDouble(3).toLong
        ((r.getLong(0), r.getLong(1)), c4)
      }.groupBy(_._1).map { case ((p, su), xs) => (p, su, xs.map(_._2).min) }
    val bestByPart = offers.groupBy(_._1).map { case (p, g) => p -> g.map(_._3).min }
    val want = offers.toSeq.collect {
      case (p, su, c) if c == bestByPart(p) =>
        val (name, nn, bal) = sup(su)
        (bal, name, nn, p, slice(p), c)
    }.sortBy { case (bal, name, nn, p, _, _) => (-bal, name, nn, p) }.take(100)
    assert(got.toSeq == want, "Q2-shape report mismatch")
    // every part appears with ONLY its min-cost suppliers
    got.groupBy(_._4).foreach { case (p, rows) =>
      assert(rows.map(_._6).distinct.length == 1, s"part $p: non-min row leaked")
    }
  }

  test("q54 important-stock parts clear the exact ppm threshold") {
    val got = Warehouse.q54ImportantStock(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.nonEmpty)
    val asia = graft.Tables.nation(spark, sfDir)
      .filter(col("n_regionkey") === 2).select("n_nationkey").collect()
      .map(_.getAs[Number](0).longValue).toSet
    val asiaSupp = graft.Tables.supplier(spark, sfDir).collect()
      .filter(r => asia.contains(r.getAs[Number](2).longValue))
      .map(_.getLong(0)).toSet
    val perPart = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .filter(r => asiaSupp.contains(r.getLong(1)))
      .map(r => r.getLong(0) ->
        (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact)
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val total = perPart.values.sum
    val want = perPart.toSeq
      .filter { case (_, v) => BigInt(v) * 1000000 > BigInt(total) * Warehouse.ImportantPartPpm }
      .sortBy { case (p, v) => (-v, p) }
    assert(got.toSeq == want, "important-stock set mismatch")
    // the gate is strict: nothing at-or-below threshold survives
    want.foreach { case (_, v) => assert(BigInt(v) * 1000000 > BigInt(total) * 1000) }
  }

  test("q55 returns exactly the max-revenue supplier(s) of the quarter") {
    val got = Warehouse.q55TopSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    val q0 = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val q1 = java.time.LocalDateTime.parse("1996-04-01T00:00:00")
    val rev = graft.Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate").collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime](3)
        !d.isBefore(q0) && d.isBefore(q1)
      }
      .map { r =>
        val pc = (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact
        val dc = (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact
        r.getLong(0) -> pc * (100 - dc)
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val mx = rev.values.max
    val names = graft.Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = rev.toSeq.filter(_._2 == mx)
      .map { case (k, v) => (k, names(k), v / 10000) }.sortBy(_._1)
    assert(got.toSeq == want, "Q15-shape max-of-aggregate mismatch")
  }

  test("q56 distinct-supplier distribution matches a driver-side recompute") {
    val got = Warehouse.q56SupplierDistribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    val sizes = Warehouse.PartSizes.toSet
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .filter(r => r.getString(1) != "Brand#5" && r.getString(2) != "PROMO" &&
        sizes.contains(r.getInt(3)))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    val flagged = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey").collect()
      .map(_.getLong(0)).toSet
    val want = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(t => parts.contains(t._1) && !flagged.contains(t._2))
      .groupBy(t => parts(t._1))
      .map { case (k, xs) => (k._1, k._2, k._3, xs.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy { case (b, t, sz, c) => (-c, b, t, sz) }
    assert(got.toSeq == want, "Q16-shape distribution mismatch")
    // the complaint exclusion bites at sf0.01+ (sf0.001 generates no
    // negative balances); the recompute above applies the same filter, so
    // equality proves the exclusion wherever the fixture provides one
    assert(flagged.isEmpty ||
      want.map(_._4).sum < graft.Tables.lineitem(spark, sfDir)
        .select("l_partkey", "l_suppkey").distinct()
        .join(graft.Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(Warehouse.PartSizes: _*)),
          col("l_partkey") === col("p_partkey"), "left_semi").count())
  }

  test("q57 profit figures match a driver-side recompute (negatives kept exact)") {
    val got = Warehouse.q57ProductProfit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val parts = graft.Tables.part(spark, sfDir)
      .filter(col("p_name").like("%red%"))
      .select("p_partkey", "p_retailprice").collect()
      .map(r => r.getLong(0) ->
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact).toMap
    val supN = {
      val n = graft.Tables.nation(spark, sfDir)
        .select("n_nationkey", "n_name").collect()
        .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
      graft.Tables.supplier(spark, sfDir).collect()
        .map(r => r.getLong(0) -> n(r.getAs[Number](2).longValue)).toMap
    }
    val years = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1).getYear).toMap
    val want = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_quantity").collect()
      .filter(r => parts.contains(r.getLong(1)))
      .map { r =>
        val pc = (BigDecimal(r.getDouble(3)).setScale(2) * 100).toLongExact
        val dc = (BigDecimal(r.getDouble(4)).setScale(2) * 100).toLongExact
        val profit = pc * (100 - dc) - parts(r.getLong(1)) * 100 * r.getDouble(5).toLong
        ((supN(r.getLong(2)), years(r.getLong(0))), profit)
      }.groupBy(_._1)
      .map { case ((n, y), xs) => (n, y, xs.map(_._2).sum, xs.length.toLong) }
      .toSeq.sortBy { case (n, y, _, _) => (n, -y) }
    assert(got.toSeq == want, "Q9-shape profit mismatch")
    assert(want.exists(_._3 < 0) || want.forall(_._3 >= 0)) // exactness holds either way
  }

  test("q58 promo share conserves revenue and stays within [0, 1e6] ppm") {
    val rows = Warehouse.q58PromoShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (promo, total, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(promo >= 0 && promo <= total, s"month ${r.getString(0)}")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // independent recompute of one month's exact figures
    val m = rows.head.getString(0)
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_partkey", "p_type").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "PROMO")).toMap
    val lines = graft.Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount").collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime](1)
        f"${d.getYear}%04d-${d.getMonthValue}%02d" == m
      }
      .map { r =>
        val pc = (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact
        val dc = (BigDecimal(r.getDouble(3)).setScale(2) * 100).toLongExact
        (parts(r.getLong(0)), pc * (100 - dc))
      }
    val promoE4 = lines.filter(_._1).map(_._2).sum
    val totalE4 = lines.map(_._2).sum
    assert(rows.head.getLong(1) == promoE4 / 10000 &&
      rows.head.getLong(2) == totalE4 / 10000 &&
      rows.head.getLong(3) == (BigInt(promoE4) * 1000000 / totalE4).toLong,
      s"month $m exact figures")
  }

  test("q59 returned-revenue top-20 matches a driver-side recompute") {
    val got = Warehouse.q59ReturnedRevenue(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.nonEmpty && got.length <= 20)
    val q0 = java.time.LocalDateTime.parse("1995-07-01T00:00:00")
    val q1 = java.time.LocalDateTime.parse("1995-10-01T00:00:00")
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .filter { r =>
        val d = r.getAs[java.time.LocalDateTime](2)
        !d.isBefore(q0) && d.isBefore(q1)
      }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val revByCust = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .flatMap { r =>
        orders.get(r.getLong(0)).map { ck =>
          val pc = (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact
          val dc = (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact
          ck -> pc * (100 - dc)
        }
      }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val nations = graft.Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val cust = graft.Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        (BigDecimal(r.getDouble(3)).setScale(2) * 100).toLongExact,
        nations(r.getAs[Number](2).longValue)))).toMap
    val want = revByCust.toSeq.map { case (ck, e4) =>
      val (nm, bal, nn) = cust(ck)
      (ck, nm, e4 / 10000, bal, nn)
    }.sortBy { case (ck, _, rev, _, _) => (-rev, ck) }.take(20)
    assert(got.toSeq == want, "Q10-shape top-20 mismatch")
  }

  test("q43 fkEdge counts planted orphans and flips the verdict") {
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 7L, 8L, 9L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val r = Warehouse.fkEdge("child->parent", child, "k", parent, "p").head()
    assert(r.getString(0) == "child->parent")
    assert(r.getLong(1) == 6L)   // all child rows counted, duplicates included
    assert(r.getLong(2) == 3L)   // 7, 8, 9 are orphans
    assert(r.getInt(3) == 0)     // verdict flips on any orphan
  }
}
