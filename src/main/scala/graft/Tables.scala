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

  /** Widen a fact/corpus scan whose file layout cannot feed every core.
    *
    * Spark parallelizes a parquet scan by byte-range splits, but a split
    * only does work if a row group STARTS inside it — a table shipped as
    * one file with one row group runs its entire map stage (regex
    * tokenization, n-gram explodes, per-row scoring) on ONE task no
    * matter how many cores the session has. That is precisely the local
    * test-data shape (the round-9 regenerated tables are one row group
    * each), and it is invisible to the machine-epoch calibration, which
    * measures core throughput on `spark.range`, not scan splits.
    *
    * When `spark.graft.scan.widen=true` and the BYTE-estimated split
    * count is below the session's core count, a round-robin repartition
    * (cheap by construction: the table is at most
    * cores×maxPartitionBytes ≈ small) restores map-stage parallelism.
    * At production scale the estimate exceeds the core count and this
    * is the identity — no shuffle is ever added to a 100 TB scan.
    * Filters and column pruning push through Repartition, so
    * `PushedFilters`/`ReadSchema` are unaffected.
    *
    * OFF by default, deliberately: the knob pays one extra stage +
    * exchange per scan, which is the right trade only when the
    * per-split map work is large (minutes of regex/scoring behind one
    * task). Measured at the sf0.1 bench scale it is a net LOSS — those
    * queries are fixed-overhead dominated (sub-second), so widening
    * every scan added ~0.3-0.9 s/query while recovering less. Turn it
    * on for deployments whose file layout genuinely starves cores
    * (e.g. a few huge heavily-compressed files).
    * Known limit: a HUGE single-row-group file defeats the byte
    * estimate; that is a data-layout bug to fix at the writer. */
  private def widened(s: SparkSession, df: DataFrame, path: String): DataFrame = {
    val enabled = s.conf.get("spark.graft.scan.widen", "false").toBoolean
    if (!enabled) df
    else {
      val cores = s.sparkContext.defaultParallelism
      val bytes =
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(s.sessionState.newHadoopConf()).getContentSummary(p).getLength
        } catch { case _: Throwable => Long.MaxValue }
      val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
      val estSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
      if (estSplits < cores) df.repartition(cores) else df
    }
  }

  private def loadWide(s: SparkSession, dir: String, name: String): DataFrame =
    widened(s, load(s, dir, name), s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = loadWide(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = loadWide(s, dir, "orders")
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
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, raise_error, when, lit, concat}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = loadWide(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // A long-typed ts only arrives via the nanosAsLong legacy read of
        // a NANOSECOND parquet timestamp. Guard the unit assumption
        // instead of silently mis-scaling a future plain-int64 layout:
        // epoch-nanos for any plausible event date is >= 1e17 (~1973);
        // epoch-micros/millis/seconds are orders of magnitude below.
        // The check is one codegen'd comparison per row and fails loudly.
        raw.withColumn("ts",
          when(col("ts") >= lit(100000000000000000L),
            timestamp_micros(expr("ts DIV 1000L")))
            .otherwise(raise_error(concat(
              lit("events.ts: long value too small for epoch-nanoseconds; unrecognized int64 layout: "),
              col("ts").cast("string")))
              .cast(org.apache.spark.sql.types.TimestampType)))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = loadWide(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = loadWide(s, dir, "embeddings")
}
