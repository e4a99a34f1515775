package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse-grade relational shapes (TPC-H Q3/Q7/Q18 analogues) — the
  * reporting queries an analytics deployment of the reference would run
  * over its usage data at scale. Each exercises a join/aggregation
  * topology the rest of the inventory does not:
  *
  *  - q25: top-N over a grouped fact-fact join (ranking AFTER
  *    aggregation, not over raw rows);
  *  - q26: OR-of-pairs join predicate across two dimension arms;
  *  - q27: aggregate-derived semi-join (HAVING subquery feeding a scan).
  */
object Warehouse {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def revenue = sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))

  /** q25 (TPC-H Q3 shape): unshipped-order shipping priority — revenue of
    * BUILDING-segment orders placed before D with lines shipped after D,
    * top 10 by revenue.
    *
    * Plan: both date filters push into the scans, shrinking the one
    * fact-fact shuffle; the BUILDING customer set broadcasts as a
    * LEFT SEMI (no row duplication); the top-10 over the aggregate is
    * TakeOrderedAndProject (no global sort exchange). */
  def q25ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("timestamp")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_semi")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(revenue.cast("double").as("revenue"), count(lit(1)).as("line_count"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q25Sql: String =
    """SELECT l_orderkey, o_orderdate,
      | cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue,
      | count(*) AS line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q26 (TPC-H Q7 shape): bilateral shipping volume between two nations
    * by year — the OR-of-(supplier,customer)-nation-pairs predicate.
    *
    * Plan: supplier and customer are pre-filtered to the TWO nations
    * BEFORE their broadcasts (dimension pruning ahead of the join, so
    * the broadcast tables shrink ~12x), lineitem's date filter pushes
    * into its scan, and the only fact-fact shuffle joins the two
    * pre-pruned fact sides. The pair condition itself is a cheap
    * post-join filter on two broadcast-provided columns. */
  def q26BilateralVolume(s: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_3", "NATION_7")
    val n = Tables.nation(s, dir).filter(col("n_name").isin(nations: _*))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
              (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(revenue.cast("double").as("volume"), count(lit(1)).as("line_count"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q26Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      | cast(sum(vol) AS double) AS volume, count(*) AS line_count
      |FROM (
      | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2))) AS vol
      | FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Large-volume threshold for q27 — ~p99.7 of per-order quantity. */
  val LargeOrderQty = 300

  /** q27 (TPC-H Q18 shape): large-volume customers — orders whose total
    * line quantity exceeds a threshold, with customer attribution.
    *
    * Plan: ONE group-count-bound fact aggregate derives the qualifying
    * order set (the HAVING subquery); because the threshold makes it
    * rare (~0.3% of orders), that result BROADCASTS back against
    * orders — the orders scan never shuffles — and customer broadcasts
    * as usual. Ranking is top-100 over the joined result
    * (TakeOrderedAndProject). */
  def q27LargeVolumeCustomers(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > LargeOrderQty)
      .select(col("l_orderkey"), col("qty").cast("double").as("total_qty"))
    val c = Tables.customer(s, dir).select("c_custkey", "c_name")
    Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q27Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS total_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(cast(l_quantity AS decimal(18,2))) > $LargeOrderQty)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
       |FROM orders
       |  JOIN big ON o_orderkey = l_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** q31 (TPC-H Q4 shape): correlated EXISTS — orders in a quarter having
    * at least one returned line, counted by priority.
    *
    * Plan: EXISTS is a LEFT SEMI join, which never duplicates order rows
    * however many lines match; the returned-flag and date filters push
    * into their scans, and the semi-join's shuffle carries only the two
    * pruned key columns. The priority rollup afterwards is
    * group-count-bound. At 100 TB, both sides hash on orderkey — the
    * natural co-partitioning for bucketed storage. */
  def q31ExistsReturned(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderpriority")
    val returned = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q31Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1995-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q32 (TPC-H Q13 shape): customer order-count distribution — LEFT join
    * so zero-order customers land in the c_count=0 bucket, then a second
    * aggregation over the first's output.
    *
    * Plan: the first aggregate is keyed by customer (group-count-bound
    * after one fact shuffle on custkey); the second aggregates the
    * FIRST's output (rows = |customers|), so it is near-free. The join
    * condition's non-key predicate (priority filter) prunes orders
    * before the join, not after. */
  def q32CustDistribution(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    Tables.customer(s, dir).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count() skips the null non-matches
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q32Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN (
      |    SELECT o_custkey, o_orderkey FROM orders
      |    WHERE o_orderpriority <> '1-URGENT') o
      |   ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q38 (TPC-H Q17 shape): small-quantity revenue — lines of one brand's
    * parts whose quantity is below 20% of that part's average quantity,
    * summed as a yearly figure. The "row vs its own group's aggregate"
    * correlated-subquery topology, which no other inventory query has.
    *
    * Plan: ONE lineitem scan — the brand's part keys broadcast as a LEFT
    * SEMI before anything else (the scan shrinks to the brand's share),
    * then a window over the HIGH-cardinality l_partkey (per-part slices,
    * the e3 shape — not the q15 anti-shape) supplies each row its
    * group's sum/count, and the threshold test is row-local EXACT
    * decimal cross-multiplication: qty × 5 × cnt < sum_qty — no float
    * average crosses the engine boundary. The oracle spells the same
    * semantics as aggregate + self-join (two scans). */
  def q38SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val l = Tables.lineitem(s, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
    val w = Window.partitionBy("l_partkey")
    l.withColumn("sum_qty", sum(dec(col("l_quantity"))).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(dec(col("l_quantity")) * 5 * col("cnt") < col("sum_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q38Sql: String =
    """WITH pl AS (
      | SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
      | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')),
      |a AS (
      | SELECT l_partkey, sum(cast(l_quantity AS decimal(18,2))) AS sum_qty,
      |  count(*) AS cnt
      | FROM pl GROUP BY l_partkey)
      |SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) / 7.0 AS avg_yearly,
      | count(*) AS n_lines
      |FROM pl JOIN a USING (l_partkey)
      |WHERE cast(l_quantity AS decimal(18,2)) * 5 * cnt < sum_qty""".stripMargin

  // ---- q43: referential-integrity audit (FK orphan report) ----

  /** One FK edge's audit row: child rows, orphans (children whose key
    * matches no parent), and the ok verdict. The anti-join is keyed on
    * the parent's primary key — a parent-key sliver that broadcasts for
    * dimension parents and shuffles under AQE for fact parents; the
    * child side is one scan either way. Distinct parent keys are
    * projected first so the join build side is key-bound, never
    * row-bound. */
  private[graft] def fkEdge(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val pk = parent.select(col(parentKey).as("__pk")).distinct()
    val orphans = child.select(col(childKey).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    child.agg(count(lit(1)).as("n_children"))
      .crossJoin(orphans)
      .select(lit(name).as("edge"), col("n_children"), col("n_orphans"),
        (col("n_orphans") === 0).cast("int").as("ok"))
  }

  /** q43: the REFERENTIAL-INTEGRITY AUDIT — the FK orphan report a
    * warehouse runs before promoting a load (the dbt `relationships`
    * test / Mongo's cross-collection consistency check the reference
    * implicitly assumes when it $lookups users from trackUsage rows):
    * for every FK edge of the star (lineitem→orders, orders→customer,
    * customer→nation, events→customer), child count, orphan count, and
    * the ok verdict. A load that q42's cascade half-applied, a partial
    * ingest, or an out-of-order snapshot promotion shows up here as
    * n_orphans > 0 — this is the audit that DECIDES promotion, the
    * read-side twin of q42's deletion receipt.
    *
    * Scale: each edge is one child scan + an anti-join against the
    * DISTINCT parent-key projection (dimension parents broadcast; the
    * orders parent is a key-bound column, AQE picks the join); counts
    * are map-combined one-row aggregates. Nothing wider than a key
    * column ever moves. */
  def q43FkOrphans(s: SparkSession, dir: String): DataFrame =
    fkEdge("customer->nation",
        Tables.customer(s, dir).select("c_nationkey"), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey")
      .unionByName(fkEdge("events->customer",
        Tables.events(s, dir).select("user_id"), "user_id",
        Tables.customer(s, dir), "c_custkey"))
      .unionByName(fkEdge("lineitem->orders",
        Tables.lineitem(s, dir).select("l_orderkey"), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"))
      .unionByName(fkEdge("orders->customer",
        Tables.orders(s, dir).select("o_custkey"), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .orderBy("edge")

  val q43Sql: String =
    """SELECT 'customer->nation' AS edge, count(*) AS n_children,
      | cast(sum(CASE WHEN c_nationkey IN (SELECT n_nationkey FROM nation) THEN 0 ELSE 1 END) AS bigint) AS n_orphans,
      | cast(sum(CASE WHEN c_nationkey IN (SELECT n_nationkey FROM nation) THEN 0 ELSE 1 END) = 0 AS int) AS ok
      |FROM customer
      |UNION ALL
      |SELECT 'events->customer', count(*),
      | cast(sum(CASE WHEN user_id IN (SELECT c_custkey FROM customer) THEN 0 ELSE 1 END) AS bigint),
      | cast(sum(CASE WHEN user_id IN (SELECT c_custkey FROM customer) THEN 0 ELSE 1 END) = 0 AS int)
      |FROM events
      |UNION ALL
      |SELECT 'lineitem->orders', count(*),
      | cast(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM orders) THEN 0 ELSE 1 END) AS bigint),
      | cast(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM orders) THEN 0 ELSE 1 END) = 0 AS int)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders->customer', count(*),
      | cast(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer) THEN 0 ELSE 1 END) AS bigint),
      | cast(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM customer) THEN 0 ELSE 1 END) = 0 AS int)
      |FROM orders
      |ORDER BY edge""".stripMargin

  // ---- q44: RFM customer segmentation ----

  /** q44: RFM SEGMENTATION — the classic warehouse customer scoring
    * (recency / frequency / monetary, each cut at exact quartiles into a
    * 1-4 score and composed into the 111-444 cell) that a marketing
    * deployment of the reference would run over its usage ledger.
    * Recency = days from the customer's last order to the corpus's last
    * order; frequency = order count; monetary = exact lifetime cents.
    * Scores: f/m get 1 + (# cutoffs strictly below the value); recency
    * inverts (most recent = 4). Quartile cutoffs are the exact DISC
    * quantiles (value at rank ceil(p·n)) so every score is
    * bit-reproducible across engines.
    *
    * Scale: ONE map-combined shuffle keyed by o_custkey (high
    * cardinality, no skew) reduces the fact table; the three cutoff sets
    * come from [[Quantiles.exactGroupedQuantiles]] over the per-customer
    * frame in long format — the bounded histogram machinery, explicitly
    * NOT a row_number window over a 3-row partition key (the q15
    * anti-shape); the 9 cutoffs collapse to one row and broadcast back,
    * so scoring is map-only. At 100 TB the fact→customer rollup is the
    * only corpus-sized exchange. */
  def q44RfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val dmax = o.agg(max(col("d")).as("dmax"))
    val per = o.groupBy("o_custkey")
      .agg(max(col("d")).as("dlast"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .crossJoin(broadcast(dmax))
      .select(col("o_custkey").as("c_custkey"),
        datediff(col("dmax"), col("dlast")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val dims = per.select(explode(array(
        struct(lit("r").as("dim"), col("recency_days").as("v")),
        struct(lit("f").as("dim"), col("frequency").as("v")),
        struct(lit("m").as("dim"), col("monetary_cents").as("v")))).as("t"))
      .select(col("t.dim").as("dim"), col("t.v").as("v"))
    val cuts = Quantiles.exactGroupedQuantiles(dims, key = "dim", value = "v",
      probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
    def cut(d: String, w: String) =
      max(when(col("dim") === d && col("which") === w, col("v"))).as(d + w.drop(1))
    val cutRow = cuts.groupBy().agg(
      cut("r", "p25"), cut("r", "p50"), cut("r", "p75"),
      cut("f", "p25"), cut("f", "p50"), cut("f", "p75"),
      cut("m", "p25"), cut("m", "p50"), cut("m", "p75"))
    def above(v: org.apache.spark.sql.Column, d: String) =
      (v > col(d + "25")).cast("int") + (v > col(d + "50")).cast("int") +
        (v > col(d + "75")).cast("int")
    per.crossJoin(broadcast(cutRow))
      .withColumn("r_score", lit(4) - above(col("recency_days"), "r"))
      .withColumn("f_score", lit(1) + above(col("frequency"), "f"))
      .withColumn("m_score", lit(1) + above(col("monetary_cents"), "m"))
      .withColumn("rfm_cell",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .select("c_custkey", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score", "rfm_cell")
      .orderBy("c_custkey")
  }

  val q44Sql: String =
    """WITH o AS (
      | SELECT o_custkey, cast(o_orderdate AS date) AS d,
      |  cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint) AS cents
      | FROM orders),
      |per AS (
      | SELECT o_custkey AS c_custkey,
      |  date_diff('day', max(d), (SELECT max(d) FROM o)) AS recency_days,
      |  count(*) AS frequency, cast(sum(cents) AS bigint) AS monetary_cents
      | FROM o GROUP BY o_custkey),
      |dims AS (
      | SELECT 'r' AS dim, cast(recency_days AS bigint) AS v FROM per
      | UNION ALL SELECT 'f', frequency FROM per
      | UNION ALL SELECT 'm', monetary_cents FROM per),
      |rk AS (
      | SELECT dim, v, row_number() OVER (PARTITION BY dim ORDER BY v) AS rn,
      |  count(*) OVER (PARTITION BY dim) AS n FROM dims),
      |cuts AS (
      | SELECT
      |  max(CASE WHEN dim='r' AND rn = cast(ceil(0.25*n) AS bigint) THEN v END) AS r25,
      |  max(CASE WHEN dim='r' AND rn = cast(ceil(0.50*n) AS bigint) THEN v END) AS r50,
      |  max(CASE WHEN dim='r' AND rn = cast(ceil(0.75*n) AS bigint) THEN v END) AS r75,
      |  max(CASE WHEN dim='f' AND rn = cast(ceil(0.25*n) AS bigint) THEN v END) AS f25,
      |  max(CASE WHEN dim='f' AND rn = cast(ceil(0.50*n) AS bigint) THEN v END) AS f50,
      |  max(CASE WHEN dim='f' AND rn = cast(ceil(0.75*n) AS bigint) THEN v END) AS f75,
      |  max(CASE WHEN dim='m' AND rn = cast(ceil(0.25*n) AS bigint) THEN v END) AS m25,
      |  max(CASE WHEN dim='m' AND rn = cast(ceil(0.50*n) AS bigint) THEN v END) AS m50,
      |  max(CASE WHEN dim='m' AND rn = cast(ceil(0.75*n) AS bigint) THEN v END) AS m75
      | FROM rk)
      |SELECT p.c_custkey, cast(p.recency_days AS bigint) AS recency_days,
      | p.frequency, p.monetary_cents,
      | 4 - (CASE WHEN p.recency_days > c.r25 THEN 1 ELSE 0 END
      |    + CASE WHEN p.recency_days > c.r50 THEN 1 ELSE 0 END
      |    + CASE WHEN p.recency_days > c.r75 THEN 1 ELSE 0 END) AS r_score,
      | 1 + (CASE WHEN p.frequency > c.f25 THEN 1 ELSE 0 END
      |    + CASE WHEN p.frequency > c.f50 THEN 1 ELSE 0 END
      |    + CASE WHEN p.frequency > c.f75 THEN 1 ELSE 0 END) AS f_score,
      | 1 + (CASE WHEN p.monetary_cents > c.m25 THEN 1 ELSE 0 END
      |    + CASE WHEN p.monetary_cents > c.m50 THEN 1 ELSE 0 END
      |    + CASE WHEN p.monetary_cents > c.m75 THEN 1 ELSE 0 END) AS m_score,
      | (4 - (CASE WHEN p.recency_days > c.r25 THEN 1 ELSE 0 END
      |     + CASE WHEN p.recency_days > c.r50 THEN 1 ELSE 0 END
      |     + CASE WHEN p.recency_days > c.r75 THEN 1 ELSE 0 END)) * 100
      | + (1 + CASE WHEN p.frequency > c.f25 THEN 1 ELSE 0 END
      |      + CASE WHEN p.frequency > c.f50 THEN 1 ELSE 0 END
      |      + CASE WHEN p.frequency > c.f75 THEN 1 ELSE 0 END) * 10
      | + (1 + CASE WHEN p.monetary_cents > c.m25 THEN 1 ELSE 0 END
      |      + CASE WHEN p.monetary_cents > c.m50 THEN 1 ELSE 0 END
      |      + CASE WHEN p.monetary_cents > c.m75 THEN 1 ELSE 0 END) AS rfm_cell
      |FROM per p CROSS JOIN cuts c
      |ORDER BY c_custkey""".stripMargin

  // ---- q45: column profile (data-quality audit) ----

  /** q45: the COLUMN PROFILE — the per-column data-quality report
    * (Deequ/Great Expectations' profiler; the read-side of what q43
    * verdicts relationally): for every column of the events stream,
    * row count, null count, EXACT distinct count, typed min/max, and
    * the most frequent value with its count (ties broken by value).
    * The ingest review a pipeline reads before trusting a new feed —
    * a feed that silently nulled a column, collapsed a cardinality, or
    * froze a clock shows up on exactly one of these rows.
    *
    * Scale: two passes, both bounded. (1) Typed stats are ONE
    * map-combined one-row aggregate (nulls + min/max per column in a
    * single scan, exploded to per-column rows driver-free). (2) The
    * value histogram melts the table to (column, canonical value)
    * WITH map-side combine, so the exchange is distinct-bound, not
    * cell-bound; the second agg is column-bound. Values canonicalize
    * injectively to strings (decimals in cents-precision, timestamps in
    * fixed micro format) so one frame serves every type. Exact distinct
    * on an all-distinct key column costs its cardinality by definition —
    * a1/a4's HLL sketches are the documented 100 TB escape when ±2% is
    * acceptable; the profile is the exact twin. */
  def q45ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val e = Tables.events(s, dir)
    // (name, typed value, canonicalizer) — min/max aggregate in the
    // COLUMN'S type (a lexicographic "max" of a numeric is wrong) and
    // canonicalize after; the melt canonicalizes per row (injective).
    val fmtTs = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    val asStr = (c: Column) => c.cast("string")
    val canon: Seq[(String, Column, Column => Column)] = Seq(
      ("event_id", col("event_id"), asStr),
      ("event_type", col("event_type"), identity[Column] _),
      ("props", col("props"), identity[Column] _),
      ("ts", col("ts"), fmtTs),
      ("user_id", col("user_id"), asStr),
      ("value", dec(col("value")), asStr))
    // pass 1: typed stats, one map-combined row, exploded per column
    val statsRow = e.agg(count(lit(1)).as("n_rows"),
      canon.zipWithIndex.flatMap { case ((name, typed, _), i) =>
        Seq(sum(col(name).isNull.cast("long")).as(s"nn_$i"),
          min(typed).as(s"mn_$i"), max(typed).as(s"mx_$i"))
      }: _*)
    val stats = statsRow.select(col("n_rows"), explode(array(
        canon.zipWithIndex.map { case ((name, _, toS), i) =>
          struct(lit(name).as("colname"), col(s"nn_$i").as("n_nulls"),
            toS(col(s"mn_$i")).as("min_s"), toS(col(s"mx_$i")).as("max_s"))
        }: _*)).as("t"))
      .select(col("t.colname").as("colname"), col("n_rows"),
        col("t.n_nulls").as("n_nulls"), col("t.min_s").as("min_s"),
        col("t.max_s").as("max_s"))
    // pass 2: melted value histogram -> distinct count + top value
    val long = e.select(explode(array(canon.map { case (name, typed, toS) =>
        struct(lit(name).as("colname"), toS(typed).as("v"))
      }: _*)).as("t"))
      .select(col("t.colname").as("colname"), col("t.v").as("v"))
      .filter(col("v").isNotNull)
    val byVal = long.groupBy("colname", "v").agg(count(lit(1)).as("c"))
    val dist = byVal.groupBy("colname").agg(
        count(lit(1)).as("n_distinct"),
        min(struct((-col("c")).as("negc"), col("v").as("v"))).as("tp"))
      .select(col("colname"), col("n_distinct"),
        col("tp.v").as("top_value"), (-col("tp.negc")).as("top_count"))
    stats.join(dist, Seq("colname"), "left")
      .select("colname", "n_rows", "n_nulls", "n_distinct", "min_s",
        "max_s", "top_value", "top_count")
      .orderBy("colname")
  }

  val q45Sql: String =
    """WITH e AS (
      | SELECT cast(event_id AS varchar) AS event_id, event_type, props,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
      |  cast(user_id AS varchar) AS user_id,
      |  cast(cast(value AS decimal(18,2)) AS varchar) AS value
      | FROM events),
      |stats AS (
      | SELECT 'event_id' AS colname, count(*) AS n_rows,
      |   count(*) - count(event_id) AS n_nulls,
      |   cast(min(event_id) AS varchar) AS min_s,
      |   cast(max(event_id) AS varchar) AS max_s FROM events
      | UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),
      |   min(event_type), max(event_type) FROM events
      | UNION ALL SELECT 'props', count(*), count(*) - count(props),
      |   min(props), max(props) FROM events
      | UNION ALL SELECT 'ts', count(*), count(*) - count(ts),
      |   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f'),
      |   strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') FROM events
      | UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
      |   cast(min(user_id) AS varchar), cast(max(user_id) AS varchar) FROM events
      | UNION ALL SELECT 'value', count(*), count(*) - count(value),
      |   cast(min(cast(value AS decimal(18,2))) AS varchar),
      |   cast(max(cast(value AS decimal(18,2))) AS varchar) FROM events),
      |long AS (
      | SELECT 'event_id' AS colname, event_id AS v FROM e
      | UNION ALL SELECT 'event_type', event_type FROM e
      | UNION ALL SELECT 'props', props FROM e
      | UNION ALL SELECT 'ts', ts FROM e
      | UNION ALL SELECT 'user_id', user_id FROM e
      | UNION ALL SELECT 'value', value FROM e),
      |byval AS (
      | SELECT colname, v, count(*) AS c FROM long
      | WHERE v IS NOT NULL GROUP BY colname, v),
      |dist AS (
      | SELECT colname, cast(count(*) AS bigint) AS n_distinct
      | FROM byval GROUP BY colname),
      |top AS (
      | SELECT colname, v AS top_value, cast(c AS bigint) AS top_count,
      |  row_number() OVER (PARTITION BY colname ORDER BY c DESC, v) AS rn
      | FROM byval)
      |SELECT s.colname, s.n_rows, cast(s.n_nulls AS bigint) AS n_nulls,
      | d.n_distinct, s.min_s, s.max_s, t.top_value, t.top_count
      |FROM stats s LEFT JOIN dist d USING (colname)
      | LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (colname)
      |ORDER BY colname""".stripMargin

  // ---- q46: cohort LTV triangle ----

  /** q46: the COHORT LTV TRIANGLE — lifetime value by acquisition
    * cohort, the (cohort month × account age) revenue matrix every
    * subscription/usage business reads (e4 counts retained USERS; this
    * accumulates their MONEY): customers cohort at their first order
    * month; each cell reports active customers, exact revenue cents,
    * the running cumulative, and cumulative LTV per cohort member in
    * integer cents.
    *
    * Scale: the cohort frame is ONE map-combined min-aggregate keyed by
    * o_custkey and joins back to orders ON THE SAME KEY (co-partitioned
    * exchange, no broadcast of a customer-sized frame); the cell rollup
    * is (months × ages)-bound; the cumulative window runs over that
    * TINY triangle (the e10 rule — windowing the cell table, never the
    * fact table). LTV is integral division, exact at any size. */
  def q46CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("ym"),
      (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val coh = o.groupBy("o_custkey").agg(min(col("ym")).as("cym"))
    val sizes = coh.groupBy("cym").agg(count(lit(1)).as("cohort_users"))
    val cells = o.join(coh, Seq("o_custkey"))
      .groupBy(col("cym"), (col("ym") - col("cym")).as("age"))
      .agg(countDistinct(col("o_custkey")).as("n_active"),
        sum(col("cents")).as("revenue_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cym").orderBy("age")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells.withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .join(sizes, Seq("cym"))
      .select(
        format_string("%04d-%02d", expr("cym div 12"), expr("cym % 12 + 1"))
          .as("cohort_month"),
        col("age").cast("long").as("age_months"), col("n_active"),
        col("revenue_cents"), col("cum_revenue_cents"), col("cohort_users"),
        expr("cum_revenue_cents div cohort_users").as("ltv_cents_per_user"))
      .orderBy("cohort_month", "age_months")
  }

  val q46Sql: String =
    """WITH o AS (
      | SELECT o_custkey,
      |  (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS ym,
      |  cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint) AS cents
      | FROM orders),
      |coh AS (SELECT o_custkey, min(ym) AS cym FROM o GROUP BY o_custkey),
      |sizes AS (SELECT cym, count(*) AS cohort_users FROM coh GROUP BY cym),
      |cells AS (
      | SELECT c.cym, o.ym - c.cym AS age,
      |  count(DISTINCT o.o_custkey) AS n_active,
      |  cast(sum(o.cents) AS bigint) AS revenue_cents
      | FROM o JOIN coh c USING (o_custkey) GROUP BY c.cym, o.ym - c.cym),
      |cum AS (
      | SELECT cym, age, n_active, revenue_cents,
      |  cast(sum(revenue_cents) OVER (PARTITION BY cym ORDER BY age) AS bigint)
      |   AS cum_revenue_cents
      | FROM cells)
      |SELECT printf('%04d-%02d', cym // 12, cym % 12 + 1) AS cohort_month,
      | cast(age AS bigint) AS age_months, cast(n_active AS bigint) AS n_active,
      | revenue_cents, cum_revenue_cents,
      | cast(s.cohort_users AS bigint) AS cohort_users,
      | cast(cum_revenue_cents // s.cohort_users AS bigint) AS ltv_cents_per_user
      |FROM cum JOIN sizes s USING (cym)
      |ORDER BY cohort_month, age_months""".stripMargin

  /** q50: FULFILLMENT-LATENCY SLA report — per order priority, exact
    * DISC percentiles (p50/p90/p99) and the max of days from order
    * placement to the order's LAST shipment (the operational twin of
    * q25's revenue view: whether the expedited classes actually ship
    * faster, and what the tail looks like — SLA reporting needs exact
    * tail ranks, not an approx sketch, when the p99 drives penalties).
    *
    * Plan: lineitem reduces to one last-shipment row per order
    * (map-combined l_orderkey shuffle) and joins orders ON THE SAME KEY
    * (co-partitioned under AQE — no second fact exchange shape);
    * latencies go through the bounded two-pass [[Quantiles]] histogram
    * stack (NEVER a per-priority row_number window over the fact — the
    * q15 anti-shape); the wide report is a |priorities|-bound pivot
    * agg. */
  def q50FulfillmentLatency(s: SparkSession, dir: String): DataFrame = {
    val shipped = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      .groupBy("l_orderkey").agg(max("l_shipdate").as("last_ship"))
    val lat = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
      .join(shipped, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("last_ship").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("lat_days"))
      // the two-pass histogram stack re-reads this frame; checkpoint so
      // the fact join is paid once (the t20 rule)
      .localCheckpoint()
    val q = Quantiles.exactGroupedQuantiles(lat, key = "o_orderpriority",
      value = "lat_days",
      probs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99, "max" -> 1.0))
    q.groupBy("o_orderpriority").agg(
        max("n_events").as("n_orders"),
        max(when(col("which") === "p50", col("v"))).as("p50_days"),
        max(when(col("which") === "p90", col("v"))).as("p90_days"),
        max(when(col("which") === "p99", col("v"))).as("p99_days"),
        max(when(col("which") === "max", col("v"))).as("max_days"))
      .orderBy("o_orderpriority")
  }

  val q50Sql: String =
    """WITH ls AS (
      | SELECT l_orderkey, max(l_shipdate) AS last_ship
      | FROM lineitem GROUP BY 1),
      |lat AS (
      | SELECT o_orderpriority,
      |  date_diff('day', cast(o_orderdate AS date), cast(last_ship AS date)) AS lat
      | FROM orders JOIN ls ON o_orderkey = l_orderkey),
      |rk AS (
      | SELECT o_orderpriority, lat,
      |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY lat) AS rn,
      |  count(*) OVER (PARTITION BY o_orderpriority) AS n
      | FROM lat)
      |SELECT o_orderpriority, cast(max(n) AS bigint) AS n_orders,
      | max(CASE WHEN rn = cast(ceil(0.50 * n) AS bigint) THEN lat END) AS p50_days,
      | max(CASE WHEN rn = cast(ceil(0.90 * n) AS bigint) THEN lat END) AS p90_days,
      | max(CASE WHEN rn = cast(ceil(0.99 * n) AS bigint) THEN lat END) AS p99_days,
      | max(lat) AS max_days
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin

  /** q51 (TPC-H Q8's market-share shape generalized): national revenue
    * share WITHIN its region, per order year — the full dimension
    * hierarchy (customer → nation → region) exercised as a
    * ratio-to-report over the cell table.
    *
    * Exactness: revenue moves as integer TEN-THOUSANDTHS of a unit —
    * price_cents × (100 − discount_cents) — so the product of two
    * 2-decimal quantities stays integer (no float until nothing is
    * derived from it); the share is the decimal(38,0) cross-multiplied
    * integer division (overflow-free at any revenue mass).
    *
    * Plan: the only fact-fact exchange joins lineitem to orders on
    * orderkey; the customer join is key-bound under AQE (customer is
    * fact-sized — never broadcast); nation and region are true
    * broadcast dims; the rollup is (years × nations)-bound and the
    * within-(year, region) share runs as ONE window over that TINY cell
    * frame (the e10 rule). */
  def q51MarketShare(s: SparkSession, dir: String): DataFrame = {
    val revE4 = ((dec(col("l_extendedprice")) * 100).cast("long") *
      (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4")
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), revE4)
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate")).as("yr"))
    val cell = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("yr", "r_name", "n_name").agg(sum("rev_e4").as("rev_e4"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("yr", "r_name")
    cell.withColumn("region_e4", sum(col("rev_e4")).over(w))
      .select(col("yr"), col("r_name"), col("n_name"),
        expr("rev_e4 DIV 10000").as("revenue_cents"),
        expr("CAST(CAST(rev_e4 AS DECIMAL(38,0)) * 1000000 DIV region_e4 AS BIGINT)")
          .as("share_ppm"))
      .orderBy("yr", "r_name", "n_name")
  }

  val q51Sql: String =
    """WITH f AS (
      | SELECT cast(year(o_orderdate) AS int) AS yr, c_nationkey,
      |  cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |  (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)) AS rev_e4
      | FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey),
      |cell AS (
      | SELECT yr, r_name, n_name, cast(sum(rev_e4) AS bigint) AS rev_e4
      | FROM f
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      | GROUP BY 1, 2, 3)
      |SELECT yr, r_name, n_name,
      | cast(rev_e4 // 10000 AS bigint) AS revenue_cents,
      | cast(cast(rev_e4 AS hugeint) * 1000000 //
      |   sum(rev_e4) OVER (PARTITION BY yr, r_name) AS bigint) AS share_ppm
      |FROM cell ORDER BY yr, r_name, n_name""".stripMargin

  /** q52 (TPC-H Q12's CASE-sum shape): the LATE-SHIPMENT report — per
    * order priority, how many lineitems shipped within the 90-day SLA
    * vs late, and the late share in exact ppm (Q12 audits whether cheap
    * ship modes delay critical orders; without a shipmode column the
    * audit pivots on the priority classes themselves — q50 reports the
    * latency distribution, this reports the binary SLA verdict mix).
    *
    * Plan: ONE fact-fact orderkey join (both sides pruned to three
    * columns), the verdict is a row-local timestamp comparison against
    * orderdate + 90 days (exact interval arithmetic, no float), and the
    * CASE sums land in a map-combined aggregate on the |priorities|-
    * bound key — deliberately an aggregate, never a window, on a
    * 5-value key (the q15 anti-shape rule). */
  def q52LateShipments(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .cast("long"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("late")).as("n_late"))
      .select(col("o_orderpriority"), col("n_lines"), col("n_late"),
        expr("n_late * 1000000L DIV n_lines").as("late_ppm"))
      .orderBy("o_orderpriority")
  }

  val q52Sql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      | cast(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |   THEN 1 ELSE 0 END) AS bigint) AS n_late,
      | cast(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |   THEN 1 ELSE 0 END) * 1000000 // count(*) AS bigint) AS late_ppm
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q47 (TPC-H Q21 topology on this schema): the SOLE-STRAGGLER
    * supplier report — for each finalized ('F') multi-supplier order,
    * the one supplier whose latest shipment is strictly after every
    * other supplier's (the vendor who alone held the order open), and
    * per supplier how many orders they were that straggler for, top 20.
    * Q21's "kept orders waiting" needs commit/receipt dates this schema
    * lacks; the shape — a fact row judged against its own group with an
    * exists (another supplier shipped) AND a not-exists (nobody else
    * shipped as late) — is exactly Q21's, and the oracle keeps the
    * correlated form readable as window + HAVING.
    *
    * Plan: lineitem reduces to one (orderkey, suppkey) max-shipdate row
    * per supplier-order pair (map-side combined composite-key shuffle);
    * the exists/not-exists pair collapses into ONE whole-partition
    * Window node over HIGH-cardinality l_orderkey carrying both
    * max(s_max) and count(*) — never a supplier-keyed partition; the
    * per-order verdict aggregate reuses that same orderkey partitioning
    * (no third fact exchange), the 'F' gate is a co-partitioned LEFT
    * SEMI against the orders scan with the status filter PUSHED (orders
    * is a fact — never broadcast), the supplier rollup is |suppliers|-
    * bound, names arrive by broadcast (this data's supplier names are
    * NOT unique, so the report key is the name: a second |names|-bound
    * re-agg after the join, matching the SQL's GROUP BY s_name), and
    * the top-20 is TakeOrderedAndProject (numwait desc, s_name asc). */
  def q47SoleStraggler(s: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .groupBy("l_orderkey", "l_suppkey").agg(max("l_shipdate").as("s_max"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    val straggler = perSupp
      .withColumn("o_max", max(col("s_max")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .filter(col("s_max") === col("o_max") && col("n_supp") > 1)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_at_max"), min("l_suppkey").as("suppkey"))
      .filter(col("n_at_max") === 1)
    val ordersF = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    straggler.join(ordersF, straggler("l_orderkey") === ordersF("o_orderkey"), "left_semi")
      .groupBy("suppkey").agg(count(lit(1)).as("per_supp"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(sum("per_supp").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  /** q48 (TPC-H Q20's supply-side concern on this schema): the
    * SINGLE-SOURCE RISK report — per part, the supplier who dominates
    * its shipped volume, top 25 by dominance (share of total quantity
    * in exact ppm, volume and partkey tiebreaks). Q20 asks which
    * suppliers hold excess stock of a part; without a partsupp table
    * the auditable twin is concentration: a part whose volume one
    * vendor alone carries is the procurement risk a warehouse reviews.
    *
    * Plan: lineitem reduces to (partkey, suppkey, qty) — quantity in
    * exact centi-units (integral doubles × 100 → long), one map-
    * combined composite-key shuffle; ONE high-cardinality p_partkey
    * window partition carries total volume, supplier count, and the
    * dominance rank (three frames, one exchange); the share is a
    * decimal(38,0) cross-multiplied integer division (overflow-free at
    * any volume — the q42 receipt discipline); part and supplier are
    * dimensions riding broadcasts; the top-25 is
    * TakeOrderedAndProject. */
  def q48SingleSourceRisk(s: SparkSession, dir: String): DataFrame = {
    val pair = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_quantity") * 100).cast("long").as("q"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("q").as("qty_c"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    pair
      .withColumn("total_qty_c", sum(col("qty_c")).over(w))
      .withColumn("n_suppliers", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("qty_c").desc, col("l_suppkey"))))
      .filter(col("rn") === 1)
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_suppliers"), col("total_qty_c"), col("qty_c").as("top_qty_c"),
        expr("CAST(CAST(qty_c AS DECIMAL(38,0)) * 1000000 DIV total_qty_c AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("share_ppm").desc, col("total_qty_c").desc, col("p_partkey"))
      .limit(25)
  }

  /** q49 (TPC-H Q22 topology on this schema): the IDLE-AFFLUENT
    * customer report — per nation, the customers whose balance beats
    * the corpus's average POSITIVE balance yet who are DORMANT (no
    * order in the final year of the corpus calendar, or never ordered
    * at all — Q22's "likely to purchase" cohort: money parked, the
    * relationship gone cold), with exact-cent totals.
    *
    * Plan: balances move as exact cents (double → decimal(18,2) → ×100
    * → long, the repo money discipline); the average-positive threshold
    * and the corpus max order date are each ONE one-row aggregate
    * broadcast back (crossJoin vs one-row frames), and the threshold
    * comparison is the cross-multiplied integer form bal·n_pos > sum
    * (the q38 discipline — no float, no division); per-customer last
    * order date is a map-combined o_custkey aggregate LEFT-joined to
    * the rich sliver only (the balance filter runs first — the fact-
    * keyed frame never joins against full customers); nation is the
    * classic broadcast dim and the report is |nations|-bound. */
  def q49IdleRich(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
      (dec(col("c_acctbal")) * 100).cast("long").as("bal_c"))
    val pos = cust.filter(col("bal_c") > 0)
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
    val last = Tables.orders(s, dir)
      .groupBy("o_custkey").agg(max("o_orderdate").as("lastd"))
    val mx = Tables.orders(s, dir).agg(max("o_orderdate").as("maxd"))
    cust.crossJoin(broadcast(pos)).crossJoin(broadcast(mx))
      .filter(col("bal_c") * col("n_pos") > col("sum_c"))
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("lastd").isNull ||
        col("lastd") < col("maxd") - expr("INTERVAL 365 DAYS"))
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("bal_c").as("total_bal_cents"))
      .orderBy("n_name")
  }

  val q49Sql: String =
    """WITH c AS (
      | SELECT c_custkey, c_nationkey,
      |  cast(cast(c_acctbal AS decimal(18,2)) * 100 AS bigint) AS bal_c
      | FROM customer),
      |pos AS (
      | SELECT cast(sum(bal_c) AS bigint) AS sum_c, count(*) AS n_pos
      | FROM c WHERE bal_c > 0),
      |last AS (
      | SELECT o_custkey, max(o_orderdate) AS lastd FROM orders GROUP BY 1),
      |mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
      |j AS (
      | SELECT c.c_custkey, c.c_nationkey, c.bal_c, last.lastd
      | FROM c LEFT JOIN last ON c.c_custkey = last.o_custkey),
      |idle AS (
      | SELECT j.* FROM j, pos, mx
      | WHERE bal_c * n_pos > sum_c
      |  AND (lastd IS NULL OR lastd < maxd - INTERVAL 365 DAY))
      |SELECT n_name, count(*) AS n_cust,
      | cast(sum(bal_c) AS bigint) AS total_bal_cents
      |FROM idle JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY n_name""".stripMargin

  val q48Sql: String =
    """WITH pair AS (
      | SELECT l_partkey, l_suppkey,
      |  cast(sum(cast(l_quantity * 100 AS bigint)) AS bigint) AS qty_c
      | FROM lineitem GROUP BY 1, 2),
      |w AS (
      | SELECT l_partkey, l_suppkey, qty_c,
      |  sum(qty_c) OVER (PARTITION BY l_partkey) AS total_qty_c,
      |  count(*) OVER (PARTITION BY l_partkey) AS n_suppliers,
      |  row_number() OVER (PARTITION BY l_partkey
      |                     ORDER BY qty_c DESC, l_suppkey) AS rn
      | FROM pair)
      |SELECT p_partkey, p_name, s_suppkey, s_name, n_suppliers,
      | cast(total_qty_c AS bigint) AS total_qty_c, qty_c AS top_qty_c,
      | cast(cast(qty_c AS hugeint) * 1000000 // total_qty_c AS bigint) AS share_ppm
      |FROM w
      | JOIN part ON l_partkey = p_partkey
      | JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rn = 1
      |ORDER BY share_ppm DESC, total_qty_c DESC, p_partkey LIMIT 25""".stripMargin

  /** q53 (TPC-H Q2 topology): the MIN-COST SUPPLIER report — for every
    * part in a procurement slice (LARGE type, size ≤ 10), the
    * European supplier(s) whose best historical unit price equals the
    * part's minimum across the region, with supplier wealth attribution
    * (Q2 ranks candidate vendors by account balance). The schema has no
    * partsupp catalog, so the offer book derives from shipped history:
    * a (part, supplier) pair's cost is its cheapest observed unit
    * price. The defining Q2 topology — a row kept only when its value
    * equals a correlated MIN over the same dimensional slice — is kept
    * exactly.
    *
    * Exactness: unit cost moves as integer TEN-THOUSANDTHS per unit —
    * price_cents × 100 DIV qty (quantities are integral and ≥ 1; both
    * engines floor positive integer division) — so MIN and the
    * equality test never touch a float.
    *
    * Plan: the part slice and the region's supplier set broadcast as
    * LEFT SEMI prunes BEFORE the fact shuffle (lineitem shrinks to the
    * slice's share immediately); the offer book is ONE map-combined
    * composite-key aggregate; the per-part MIN reuses the same partkey
    * hashing (co-partitioned agg + join-back, the q38 alternative that
    * avoids carrying every offer through a window); dimensions arrive
    * by broadcast only after the fact side has collapsed to offer
    * rows. */
  def q53MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val eurNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir)
      .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        (dec(col("s_acctbal")) * 100).cast("long").as("s_acctbal_cents"))
    val slice = Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select("p_partkey", "p_name")
    val offers = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        ((dec(col("l_extendedprice")) * 100).cast("long") * 100)
          .as("price_c4"),
        col("l_quantity").cast("long").as("qty"))
      .join(broadcast(slice.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(sup.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("price_c4 DIV qty").as("unit_c4"))
      .groupBy("l_partkey", "l_suppkey").agg(min("unit_c4").as("cost_c4"))
    val best = offers.groupBy("l_partkey").agg(min("cost_c4").as("best_c4"))
    offers.join(best, Seq("l_partkey"))
      .filter(col("cost_c4") === col("best_c4"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal_cents"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_c4").as("unit_cost_c4"))
      .orderBy(col("s_acctbal_cents").desc, col("s_name"), col("n_name"),
        col("p_partkey"))
      .limit(100)
  }

  val q53Sql: String =
    """WITH eursupp AS (
      | SELECT s_suppkey, s_name, n_name,
      |  cast(cast(s_acctbal AS decimal(18,2)) * 100 AS bigint) AS s_acctbal_cents
      | FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      | WHERE r_name = 'EUROPE'),
      |slice AS (
      | SELECT p_partkey, p_name FROM part
      | WHERE p_type = 'LARGE' AND p_size <= 10),
      |offers AS (
      | SELECT l_partkey, l_suppkey,
      |  min(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) * 100
      |      // cast(l_quantity AS bigint)) AS cost_c4
      | FROM lineitem
      |  JOIN slice ON l_partkey = p_partkey
      |  JOIN eursupp ON l_suppkey = s_suppkey
      | GROUP BY 1, 2),
      |best AS (SELECT l_partkey, min(cost_c4) AS best_c4 FROM offers GROUP BY 1)
      |SELECT s_acctbal_cents, s_name, n_name, p_partkey, p_name,
      | o.cost_c4 AS unit_cost_c4
      |FROM offers o
      | JOIN best b ON o.l_partkey = b.l_partkey AND o.cost_c4 = b.best_c4
      | JOIN eursupp ON o.l_suppkey = s_suppkey
      | JOIN slice ON o.l_partkey = p_partkey
      |ORDER BY s_acctbal_cents DESC, s_name, n_name, p_partkey LIMIT 100""".stripMargin

  /** q54's share gate, in parts-per-million of the regional value mass. */
  val ImportantPartPpm = 1000L

  /** q54 (TPC-H Q11 topology): IMPORTANT-STOCK concentration — the parts
    * whose shipped value from ASIAN suppliers exceeds a fixed fraction
    * of the region's TOTAL shipped value (Q11's "significant share of
    * available stock" HAVING-against-a-global-scalar shape, on shipped
    * history instead of the absent partsupp catalog).
    *
    * Exactness: value moves as exact cents; the global threshold
    * comparison is the cross-multiplied integer form
    * value × 1e6 > total × ppm in decimal(38,0) — no float, no
    * division, overflow-free at any corpus size (the q42 receipt
    * discipline).
    *
    * Plan: the region's supplier set broadcasts as a LEFT SEMI prune
    * ahead of the fact shuffle; per-part value is ONE map-combined
    * partkey aggregate; the global total is a ONE-ROW aggregate OVER
    * THE AGGREGATE's output (never a second fact scan) broadcast back
    * via crossJoin; the final filter is row-local. */
  def q54ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val asiaSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey").agg(sum("cents").as("value_cents"))
    val total = perPart.agg(sum("value_cents").as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents").cast("decimal(38,0)") * 1000000 >
        col("total_cents").cast("decimal(38,0)") * ImportantPartPpm)
      .select(col("l_partkey").as("p_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("p_partkey"))
  }

  val q54Sql: String =
    s"""WITH asiasupp AS (
       | SELECT s_suppkey FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       | WHERE r_name = 'ASIA'),
       |pp AS (
       | SELECT l_partkey,
       |  cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint))
       |    AS bigint) AS value_cents
       | FROM lineitem
       | WHERE l_suppkey IN (SELECT s_suppkey FROM asiasupp)
       | GROUP BY 1),
       |tot AS (SELECT sum(value_cents) AS total_cents FROM pp)
       |SELECT l_partkey AS p_partkey, value_cents
       |FROM pp, tot
       |WHERE cast(value_cents AS hugeint) * 1000000 >
       |      cast(total_cents AS hugeint) * $ImportantPartPpm
       |ORDER BY value_cents DESC, p_partkey""".stripMargin

  /** q55 (TPC-H Q15 topology): the TOP-REVENUE SUPPLIER — supplier(s)
    * whose revenue over one quarter equals the maximum across all
    * suppliers (Q15's view + WHERE total = (SELECT max(total)) shape:
    * an aggregate judged against the max OF THE SAME AGGREGATE, which
    * no other inventory query has — q5 ranks raw rows, q47/q48 rank
    * within windows, this gates on a global scalar of a grouped
    * frame).
    *
    * Exactness: revenue accumulates in integer 1e-4 units
    * (price_cents × (100 − disc_cents)); the max-equality is integer;
    * the reported cents are DIV 10000 of a nonnegative sum (both
    * engines floor).
    *
    * Plan: the quarter filter pushes into the scan; per-supplier
    * revenue is ONE map-combined |suppliers|-bound aggregate; the max
    * is a one-row aggregate over that TINY frame, broadcast back via
    * crossJoin; the name arrives by broadcast after the gate. */
  def q55TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        ((dec(col("l_extendedprice")) * 100).cast("long") *
         (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4"))
      .groupBy("l_suppkey").agg(sum("rev_e4").as("rev_e4"))
    val mx = rev.agg(max("rev_e4").as("max_e4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("max_e4"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        expr("rev_e4 DIV 10000").as("total_revenue_cents"))
      .orderBy("s_suppkey")
  }

  val q55Sql: String =
    """WITH rev AS (
      | SELECT l_suppkey,
      |  cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |    (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)))
      |   AS bigint) AS rev_e4
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |   AND l_shipdate < TIMESTAMP '1996-04-01'
      | GROUP BY 1),
      |mx AS (SELECT max(rev_e4) AS max_e4 FROM rev)
      |SELECT s_suppkey, s_name,
      | cast(rev_e4 // 10000 AS bigint) AS total_revenue_cents
      |FROM rev, mx
      | JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_e4 = max_e4
      |ORDER BY s_suppkey""".stripMargin

  /** q56's size slice — Q16 probes 8 scattered sizes; six here. */
  val PartSizes: Seq[Int] = Seq(1, 9, 15, 23, 36, 49)

  /** q56 (TPC-H Q16 topology): SUPPLIER-COUNT distribution — how many
    * DISTINCT qualified suppliers can furnish each (brand, type, size)
    * part class, excluding one brand, one type, and suppliers with a
    * complaint on file (no comment column in this schema; a negative
    * account balance is the stand-in flag). Q16's shape: a NOT-IN
    * subquery against a flagged-supplier set + COUNT DISTINCT over a
    * relationship table — here the (part, supplier) relationship
    * derives from shipped history.
    *
    * Plan: the size/brand/type slice broadcasts as a LEFT SEMI prune
    * ahead of the fact scan; the (partkey, suppkey) DISTINCT is the one
    * fact-bound exchange (map-side combined — multiplicity collapses
    * before the shuffle); the complaint set is a tiny broadcast
    * LEFT ANTI; part attributes arrive by broadcast; the final
    * COUNT DISTINCT groups the |slice|-bound pair frame. */
  def q56SupplierDistribution(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(PartSizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val flagged = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    // the fact-bound DISTINCT runs over ONE packed long (partkey<<32 |
    // suppkey — both keys are < 2^31 at any TPC-H scale), not a two-col
    // row: the t10 fingerprint discipline. The two-column form was
    // allocation-fragile — quiet runs attained ~0.95× its pin while the
    // driver's interleaved sweep measured 1.4-1.8× calibrated for four
    // consecutive rounds (heap-churn-sensitive hash-aggregate rows);
    // an 8-byte key halves the distinct's per-entry allocation and
    // keeps the combine in primitive space.
    val pairs = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(slice.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select((shiftleft(col("l_partkey").cast("long"), 32)
        .bitwiseOR(col("l_suppkey").cast("long"))).as("ps"))
      .distinct()
      .select(shiftright(col("ps"), 32).as("l_partkey"),
        col("ps").bitwiseAND(lit((1L << 32) - 1L)).as("l_suppkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"), "left_anti")
    pairs.join(broadcast(slice), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q56Sql: String =
    s"""SELECT p_brand, p_type, p_size,
       | count(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       | JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
       | AND p_size IN (${PartSizes.mkString(", ")})
       | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** q57 (TPC-H Q9 topology): PRODUCT-LINE PROFIT by supplier nation and
    * order year, for parts matching a name token ('red' — Q9's
    * '%green%'). Without partsupp's supply cost, the cost leg prices
    * consumed quantity at the part's retail price; profit = revenue −
    * cost can be NEGATIVE, so the figure stays in exact integer 1e-4
    * units end-to-end — no floor division whose Spark (truncate) and
    * DuckDB (floor) semantics diverge below zero.
    *
    * Plan: the name-sliced part dim broadcasts (an INNER broadcast join
    * — retail price must ride along, unlike q53's semi); supplier →
    * nation is the second broadcast chain; the ONLY fact-fact exchange
    * is lineitem ⋈ orders on orderkey, carrying just (nation, year,
    * profit) upward into a (nations × years)-bound rollup. */
  def q57ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"),
        (dec(col("p_retailprice")) * 100).cast("long").as("retail_c"))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("price_c"),
        (dec(col("l_discount")) * 100).cast("long").as("disc_c"),
        col("l_quantity").cast("long").as("qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("n_name"),
        (col("price_c") * (lit(100L) - col("disc_c")) -
         col("retail_c") * 100L * col("qty")).as("profit_e4"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name", "o_year")
      .agg(sum("profit_e4").as("profit_e4"), count(lit(1)).as("n_lines"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q57Sql: String =
    """SELECT n_name, cast(year(o_orderdate) AS int) AS o_year,
      | cast(sum(
      |   cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |   (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)) -
      |   cast(cast(p_retailprice AS decimal(18,2)) * 100 AS bigint) * 100 *
      |   cast(l_quantity AS bigint)) AS bigint) AS profit_e4,
      | count(*) AS n_lines
      |FROM lineitem
      | JOIN part ON l_partkey = p_partkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  /** q58 (TPC-H Q14 topology): PROMO revenue share per ship month — the
    * conditional-aggregate-over-total ratio (Q14's promo_revenue
    * percentage), reported in exact ppm via decimal cross-multiplied
    * integer division (both sums nonnegative, so DIV and // agree).
    *
    * Plan: part's type flag broadcasts into the lineitem scan (INNER
    * broadcast — the flag rides along); there is NO fact-fact join at
    * all: the rollup is a map-combined (month)-bound aggregate with
    * both CASE sums in one pass. */
  def q58PromoShare(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        ((dec(col("l_extendedprice")) * 100).cast("long") *
         (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("month")
      .agg(sum(when(col("is_promo"), col("rev_e4")).otherwise(0L)).as("promo_e4"),
        sum("rev_e4").as("total_e4"))
      .select(col("month"),
        expr("promo_e4 DIV 10000").as("promo_revenue_cents"),
        expr("total_e4 DIV 10000").as("total_revenue_cents"),
        expr("CAST(CAST(promo_e4 AS DECIMAL(38,0)) * 1000000 DIV total_e4 AS BIGINT)")
          .as("promo_ppm"))
      .orderBy("month")
  }

  val q58Sql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      | cast(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) // 10000
      |   AS bigint) AS promo_revenue_cents,
      | cast(sum(rev_e4) // 10000 AS bigint) AS total_revenue_cents,
      | cast(cast(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
      |   AS hugeint) * 1000000 // sum(rev_e4) AS bigint) AS promo_ppm
      |FROM (
      | SELECT l_partkey, l_shipdate,
      |  cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |  (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)) AS rev_e4
      | FROM lineitem) l
      | JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** q59 (TPC-H Q10 topology): RETURNED-ITEM revenue per customer for
    * one quarter's orders — the churn-risk report (customers who
    * returned the most merchandise), with full customer attribution,
    * top 20. Q10's shape: a quarter-gated fact-fact join, a RETURN-flag
    * filter on the line side, and a grouped rollup keyed by the
    * customer dimension row.
    *
    * Plan: both fact filters push into their scans (the quarter cuts
    * orders ~25×, the R flag cuts lineitem ~3×); the fact-fact join is
    * the one orderkey exchange; customer is fact-sized so the custkey
    * join stays key-bound under AQE (never broadcast); nation
    * broadcasts; the rollup groups by the customer key with the
    * dimension attributes riding as group columns (functionally
    * dependent on c_custkey), and top-20 is TakeOrderedAndProject. */
  def q59ReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1995-10-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        ((dec(col("l_extendedprice")) * 100).cast("long") *
         (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4"))
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        (dec(col("c_acctbal")) * 100).cast("long").as("acctbal_cents"),
        col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("rev_e4").as("rev_e4"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        expr("rev_e4 DIV 10000").as("revenue_cents"),
        col("acctbal_cents"), col("n_name"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  val q59Sql: String =
    """SELECT c_custkey, c_name,
      | cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |   (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)))
      |  // 10000 AS bigint) AS revenue_cents,
      | cast(cast(c_acctbal AS decimal(18,2)) * 100 AS bigint) AS acctbal_cents,
      | n_name
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1995-07-01'
      |  AND o_orderdate < TIMESTAMP '1995-10-01'
      |  AND l_returnflag = 'R'
      |GROUP BY 1, 2, 4, 5
      |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin

  /** q60 (TPC-H Q5 topology): LOCAL-SUPPLIER revenue by nation — revenue
    * from 1997 orders where the customer and the line's supplier sit in
    * the SAME nation of one region (Q5's defining constraint: the
    * c_nationkey = s_nationkey equality that closes the join cycle
    * customer→orders→lineitem→supplier→customer, which no other
    * inventory query has).
    *
    * Plan: the region's nations broadcast twice (customer arm and
    * supplier arm); the order-year filter pushes into the orders scan;
    * the one fact-fact exchange is lineitem ⋈ orders; supplier
    * broadcasts; the same-nation equality is a row-local filter once
    * both nation keys ride the row, and the rollup is |nations|-
    * bound. */
  def q60LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val amNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        ((dec(col("l_extendedprice")) * 100).cast("long") *
         (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(expr("sum(rev_e4) DIV 10000").as("revenue_cents"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue_cents").desc, col("n_name"))
  }

  val q60Sql: String =
    """SELECT n_name,
      | cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |   (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint)))
      |  // 10000 AS bigint) AS revenue_cents,
      | count(*) AS n_lines
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA'
      |  AND s_nationkey = c_nationkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin

  /** q61 (TPC-H Q6): the FORECAST-REVENUE-CHANGE probe — discount
    * revenue that a promotion tweak would have foregone: one year of
    * shipments, discounts in the 5–7¢ band, small quantities. The
    * canonical PREDICATE-PUSHDOWN benchmark: a single scan, every
    * filter in the scan, one global aggregate, zero joins — it measures
    * the engine's scan path and nothing else (the plan spec pins all
    * three filters inside the parquet scan node).
    *
    * Exactness: the figure is Σ price_cents × disc_cents — integer 1e-4
    * currency units end-to-end. */
  def q61ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .select(((dec(col("l_extendedprice")) * 100).cast("long") *
               (dec(col("l_discount")) * 100).cast("long")).as("disc_e4"))
      .agg(sum("disc_e4").as("foregone_e4"), count(lit(1)).as("n_lines"))

  val q61Sql: String =
    """SELECT
      | cast(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |          cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint))
      |   AS bigint) AS foregone_e4,
      | count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q62 (TPC-H Q19 topology): the DISJUNCTIVE-BRACKET revenue probe —
    * three OR'd (brand, size-range, quantity-range) brackets over the
    * part ⋈ lineitem join (Q19's DNF predicate spanning BOTH join
    * sides, which no other inventory query has). The classic optimizer
    * trap: naively the OR evaluates only after the join, scanning
    * everything.
    *
    * Plan: the disjunction's per-side BOUNDING HULLS are applied as
    * conjunctive prefilters — quantity ∈ [1, 30] pushes into the
    * lineitem scan, (brand ∈ {12,23,3} AND size ∈ [1, 30]) into the
    * part scan — exactly what Catalyst cannot derive on its own from
    * a cross-side DNF; the slimmed part side broadcasts, and the exact
    * three-bracket test runs row-local on the joined sliver. */
  def q62BracketRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#3") &&
              col("p_size") >= 1 && col("p_size") <= 30)
      .select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select(col("l_partkey"), col("l_quantity"),
        ((dec(col("l_extendedprice")) * 100).cast("long") *
         (lit(100L) - (dec(col("l_discount")) * 100).cast("long"))).as("rev_e4"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size") <= 10 &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size") <= 20 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#3" && col("p_size") <= 30 &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30))
      .agg(expr("coalesce(sum(rev_e4), 0L) DIV 10000").as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  val q62Sql: String =
    """SELECT
      | cast(coalesce(sum(cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) *
      |   (100 - cast(cast(l_discount AS decimal(18,2)) * 100 AS bigint))), 0)
      |  // 10000 AS bigint) AS revenue_cents,
      | count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** q63's report size. */
  val CopurchaseK = 50

  /** q63: CO-PURCHASE PAIRS — the market-basket association report
    * (the support-counting step of Apriori/FP-growth, and the "bought
    * together" widget behind every storefront): for every unordered
    * pair of parts appearing in the same order, the number of orders
    * containing both, top [[CopurchaseK]] by support. A topology the
    * inventory lacks: WITHIN-GROUP PAIR ENUMERATION with a bounded
    * report.
    *
    * Scale: the pair explosion is the hazard — it is quadratic in
    * LINES PER ORDER, not in orders (TPC-H-shaped baskets hold ≤7
    * distinct parts, so Σ C(nᵢ,2) ≤ 21 × |orders| — linear in the
    * fact), and the self-join runs CO-PARTITIONED on l_orderkey (both
    * sides are the same distinct-pair frame, one exchange feeds both).
    * A retail deployment with thousand-line carts caps the basket
    * (drop or sample oversized orders) — the documented guard; the
    * pair-count rollup is map-side combined on (p1, p2) and the report
    * is TakeOrderedAndProject. */
  def q63Copurchase(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val a = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("p2"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(CopurchaseK)
  }

  val q63Sql: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
       |FROM items a JOIN items b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |GROUP BY 1, 2
       |ORDER BY n_orders DESC, p1, p2 LIMIT $CopurchaseK""".stripMargin

  /** q64: REVENUE CONCENTRATION per market segment — exact Gini
    * coefficient and top-decile revenue share in ppm, over per-customer
    * lifetime revenue in exact cents (zero-order customers included at
    * zero — concentration over the CUSTOMER BASE, not just buyers).
    * The inequality ledger a marketplace (or a corpus curator asking
    * "how concentrated is my token mass per source") reviews.
    *
    * Gini needs global ranks inside each segment — the one computation
    * that looks like it demands a per-segment row_number over every
    * customer (5 hot reducer keys at 100 TB). It does not: ranks come
    * from the t13 distributed-prefix-sum discipline — customers bucket
    * by the BIT LENGTH of their revenue (order-preserving and exact:
    * `length(bin(x+1))` = floor(log2)+1, no float log), per-(segment,
    * bucket) counts cumulate through a ≤64-row window, and row_number
    * runs within (segment, bucket) slices. Σ i·xᵢ then folds in ONE
    * map-combined aggregate; ties share equal x so the sum is
    * tie-order invariant. All arithmetic is integer cents with the
    * q42 decimal(38,0) discipline for the ppm steps (n²·x products
    * overflow int64 past ~sf100; DuckDB's HUGEINT matches). */
  def q64GiniConcentration(s: SparkSession, dir: String): DataFrame = {
    val custRev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
    val rev = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      .join(custRev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment").as("seg"), col("c_custkey").as("key"),
        coalesce(col("cents"), lit(0L)).as("x"))
    // order-preserving data-independent buckets: bit length of x+1
    val inBucket = Window.partitionBy("seg", "bkt").orderBy("x", "key")
    val ranked = rev.withColumn("bkt", length(bin(col("x") + 1)))
      .withColumn("rn", row_number().over(inBucket).cast("long"))
    val byBkt = Window.partitionBy("seg").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = ranked.groupBy("seg", "bkt")
      .agg(count(lit(1)).as("n_b"))
      .withColumn("off", sum(col("n_b")).over(byBkt) - col("n_b"))
    val withRank = ranked.join(offsets.select("seg", "bkt", "off"), Seq("seg", "bkt"))
      .select(col("seg"), col("x"), (col("off") + col("rn")).as("i"))
      .localCheckpoint()
    val g = withRank.groupBy("seg").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s"),
      expr("sum(cast(i as decimal(38,0)) * cast(x as decimal(38,0)))").as("t"))
    val top = withRank.join(broadcast(g.select(col("seg").as("seg2"), col("n").as("n2"))),
        col("seg") === col("seg2"))
      .filter(col("i") > col("n2") - expr("n2 DIV 10"))
      .groupBy("seg").agg(sum(col("x")).as("top_cents"))
    // LEFT join to `top` (ADVICE r12): a segment with n < 10 customers has
    // n DIV 10 = 0 and an EMPTY top-decile aggregate — an inner join would
    // silently drop the segment from the report instead of carrying it
    // with top10_share_ppm = 0 (coalesce below; oracle mirrors).
    g.join(top, Seq("seg"), "left")
      .select(col("seg").as("segment"), col("n").as("n_customers"),
        col("s").as("total_cents"),
        when(col("s") > 0, expr(
          "(2 * t - (cast(n as decimal(38,0)) + 1) * cast(s as decimal(38,0))) * 1000000" +
          " div (cast(n as decimal(38,0)) * cast(s as decimal(38,0)))"))
          .otherwise(lit(0L)).as("gini_ppm"),
        when(col("s") > 0,
          expr("cast(coalesce(top_cents, 0) as decimal(38,0)) * 1000000" +
            " div cast(s as decimal(38,0))"))
          .otherwise(lit(0L)).as("top10_share_ppm"))
      .orderBy("segment")
  }

  val q64Sql: String =
    """WITH rev AS (
      | SELECT c.c_mktsegment AS seg, c.c_custkey AS key,
      |  coalesce(o.cents, 0) AS x
      | FROM customer c LEFT JOIN (
      |   SELECT o_custkey,
      |    cast(sum(cast(cast(o_totalprice AS decimal(18,2)) * 100 AS bigint)) AS bigint) AS cents
      |   FROM orders GROUP BY 1) o ON c.c_custkey = o.o_custkey),
      |r AS (
      | SELECT seg, x,
      |  row_number() OVER (PARTITION BY seg ORDER BY x, key) AS i
      | FROM rev),
      |g AS (
      | SELECT seg, count(*) AS n, sum(x) AS s, sum(i * x) AS t
      | FROM r GROUP BY 1),
      |tp AS (
      | SELECT r.seg, sum(r.x) AS top_cents
      | FROM r JOIN g ON r.seg = g.seg
      | WHERE r.i > g.n - g.n // 10 GROUP BY 1)
      |SELECT g.seg AS segment, g.n AS n_customers, cast(g.s AS bigint) AS total_cents,
      | cast(CASE WHEN g.s > 0
      |   THEN ((2 * g.t - (g.n + 1) * g.s) * 1000000) // (g.n * g.s)
      |   ELSE 0 END AS bigint) AS gini_ppm,
      | cast(CASE WHEN g.s > 0
      |   THEN (coalesce(tp.top_cents, 0) * 1000000) // g.s ELSE 0 END AS bigint) AS top10_share_ppm
      |FROM g LEFT JOIN tp ON g.seg = tp.seg
      |ORDER BY segment""".stripMargin

  val q47Sql: String =
    """WITH a1 AS (
      | SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
      | FROM lineitem GROUP BY 1, 2),
      |w AS (
      | SELECT l_orderkey, l_suppkey, s_max,
      |  max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
      |  count(*) OVER (PARTITION BY l_orderkey) AS n_supp
      | FROM a1),
      |str AS (
      | SELECT l_orderkey, min(l_suppkey) AS suppkey
      | FROM w WHERE s_max = o_max AND n_supp > 1
      | GROUP BY l_orderkey HAVING count(*) = 1),
      |f AS (
      | SELECT suppkey FROM str
      | WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
      |SELECT s_name, count(*) AS numwait
      |FROM f JOIN supplier ON suppkey = s_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
}
