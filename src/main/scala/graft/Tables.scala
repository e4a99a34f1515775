package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column-pruned parquet loaders for the driver-generated test tables.
  *
  * At 100 TB these reads are the dominant cost: every query should go
  * through here and immediately `.select(...)` the columns it needs so
  * Catalyst prunes the scan (`ReadSchema`) and pushes filters
  * (`PushedFilters`) into the parquet reader.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  /** events.ts has shipped in two physical layouts: a NANOSECOND parquet
    * timestamp (which Spark's reader rejects — [PARQUET_TYPE_ILLEGAL] —
    * so it is read as a raw long via legacy nanosAsLong and floor-divided
    * to microseconds, the same truncation DuckDB applies) and a plain
    * MICROSECOND timestamp (read natively as TIMESTAMP_NTZ). Dispatch on
    * the type the reader actually produced; both paths end at the same
    * session-TZ TimestampType instant (sessions pin UTC), so every
    * downstream query and oracle is layout-agnostic. */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
