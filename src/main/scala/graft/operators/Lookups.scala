package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Lookup/enrichment pipeline shapes from the reference's remaining
  * aggregation endpoints:
  *
  *  - templateController.js:62-86 — $lookup → $unwind → $group with
  *    `$push` of SUB-DOCUMENTS: rows collapse into an array of structs
  *    per group (q28);
  *  - assistantService.js:132-150 — $lookup + $addFields with
  *    `$arrayElemAt`/`$ifNull`: LEFT lookup keeping unmatched rows with
  *    a null-coalesced field (q29);
  *  - userController.js:107-151 — $lookup pipeline + `$size` count +
  *    sort-by-count + skip/limit: per-entity activity counts INCLUDING
  *    zero-activity entities, ranked and paginated (q30).
  */
object Lookups {

  /** q28: group rows into a deterministic array of sub-documents —
    * Mongo's `$group {$push {…}}`. collect_list is unordered on a
    * cluster, so the contract is array_sort over structs whose FIRST
    * field is the unique key (struct ordering = lexicographic by field
    * order, hence deterministic). Map-side-combined single shuffle. */
  def q28GroupPush(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).filter(col("p_size") <= 3)
      .select("p_brand", "p_partkey", "p_name")
      .groupBy("p_brand")
      .agg(array_sort(collect_list(struct(col("p_partkey"), col("p_name"))))
             .as("parts"),
           count(lit(1)).as("n_parts"))
      .orderBy("p_brand")

  /** q28 driver form: same $push grouping, with the sub-document array
    * canonicalized to one `key:name|key:name|…` string. The driver's
    * oracle compare sorts/hashes scalar cells (an array-of-structs column
    * is unhashable on its side — observed in round 2), so the `queries`
    * entry ships this flat encoding; the array form above stays the
    * library API and is spec-validated. Same single map-side-combined
    * shuffle — the transform/join is a projection over the built array. */
  def q28GroupPushFlat(s: SparkSession, dir: String): DataFrame =
    q28GroupPush(s, dir).select(
      col("p_brand"),
      array_join(
        transform(col("parts"), x =>
          concat_ws(":", x.getField("p_partkey"), x.getField("p_name"))),
        "|").as("parts_repr"),
      col("n_parts"))

  val q28Sql: String =
    """SELECT p_brand,
      | string_agg(p_partkey || ':' || p_name, '|' ORDER BY p_partkey, p_name) AS parts_repr,
      | count(*) AS n_parts
      |FROM part WHERE p_size <= 3
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q29: LEFT lookup with first-match + $ifNull — every event keeps its
    * row even when the user dimension has no match; the display name
    * coalesces to a sentinel. The dim subset is broadcast; the fact side
    * never shuffles for the join (the one shuffle is the final rollup). */
  def q29LeftLookup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_custkey") % 3 === 0) // partial dim: 2/3 of users unmatched
      .select(col("c_custkey"), col("c_name"))
    Tables.events(s, dir).select("user_id", "value")
      .join(broadcast(c), col("user_id") === col("c_custkey"), "left")
      .select(coalesce(col("c_name"), lit("unknown")).as("display_name"), col("value"))
      .groupBy("display_name")
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("display_name")
  }

  val q29Sql: String =
    """SELECT coalesce(c_name, 'unknown') AS display_name,
      | count(*) AS cnt,
      | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value
      |FROM events LEFT JOIN (
      |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
      |  ON user_id = c_custkey
      |GROUP BY 1 ORDER BY display_name""".stripMargin

  /** q30: activity leaderboard INCLUDING zero-activity users —
    * $lookup-pipeline + $size + sort desc + skip/limit. The fact side
    * aggregates FIRST (group-count-bound shuffle), then the user dim
    * LEFT-joins the aggregate, so inactive users surface with count 0 —
    * the shape an inner join cannot express. Page 2 of 15 (skip 15). */
  def q30UserActivityPage(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir).select("user_id")
      .groupBy("user_id").agg(count(lit(1)).as("prompt_count"))
    Tables.customer(s, dir).select("c_custkey", "c_name")
      .join(counts, col("c_custkey") === col("user_id"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("prompt_count"), lit(0L)).as("prompt_count"))
      .orderBy(col("prompt_count").desc, col("c_custkey").asc)
      .offset(15).limit(15)
  }

  val q30Sql: String =
    """SELECT c_custkey, c_name, coalesce(cnt, 0) AS prompt_count
      |FROM customer LEFT JOIN (
      |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id) e
      |  ON c_custkey = user_id
      |ORDER BY prompt_count DESC, c_custkey ASC LIMIT 15 OFFSET 15""".stripMargin

  /** q36: PAGE + TOTAL in one response — the list-endpoint contract
    * (`countDocuments(query)` alongside `.skip().limit()` of the same
    * query, assistantController.js:328-340, :515-518): page 3 of the
    * filtered sort, each row annotated with the total matching count
    * and page count.
    *
    * The total is a one-row aggregate cross-joined (broadcast) onto the
    * page; the page itself collapses to TakeOrderedAndProject. Two
    * passes over the FILTERED scan (count + page) — the same two
    * queries the reference issues, and both are pushed-filter scans,
    * never a global sort. */
  def q36PageWithTotal(s: SparkSession, dir: String): DataFrame = {
    val PageSize = 10
    val q = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    val total = q.agg(count(lit(1)).as("total_count"))
    q.orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .offset(2 * PageSize).limit(PageSize)
      .crossJoin(broadcast(total))
      .withColumn("page_count",
        ceil(col("total_count").cast("double") / PageSize).cast("long"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
  }

  val q36Sql: String =
    """WITH q AS (
      |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
      |  WHERE o_orderstatus = 'O'),
      |t AS (SELECT count(*) AS total_count FROM q)
      |SELECT o_orderkey, o_orderdate, o_totalprice, total_count,
      | cast(ceil(cast(total_count AS double) / 10) AS bigint) AS page_count
      |FROM (SELECT * FROM q ORDER BY o_orderdate DESC, o_orderkey ASC
      |      LIMIT 10 OFFSET 20) p
      |CROSS JOIN t
      |ORDER BY o_orderdate DESC, o_orderkey ASC""".stripMargin
}
