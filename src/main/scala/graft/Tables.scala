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
  /** events.ts is a nanosecond parquet timestamp, which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a raw long (legacy
    * nanosAsLong) and truncate to microseconds with integer division —
    * the same floor-truncation DuckDB applies, so oracles agree. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000L")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
