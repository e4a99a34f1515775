package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact money aggregation, two interchangeable paths:
  *
  *  - DECIMAL (the inventory default, see q1's scaladoc): decimal-128
  *    sums are exact and accumulation-order independent to 38 digits —
  *    correct at any scale, ~3x slower per row than a long sum.
  *  - LONG CENTS with an overflow GUARD (this module): sum 2-decimal
  *    values as integer cents — fast, exact, order-independent — but a
  *    64-bit sum silently wraps around 9.2e18 cent-units (reachable on a
  *    100 TB fact table: 1e12 rows/group x 5e7 max cents overflows), so
  *    the guard computes the per-group worst case n * max|cents| in the
  *    SAME pass and raises instead of returning a wrapped sum.
  *
  * Two layers keep the fast path safe:
  *  - under ANSI mode (the Spark 4 default) a wrapping long sum already
  *    fails the job DURING aggregation (ARITHMETIC_OVERFLOW) — loud,
  *    but generic and data-order-dependent;
  *  - the guard here is conservative (worst case n * max|cents|, not the
  *    actual sum): it also trips for groups that merely COULD wrap —
  *    e.g. mixed-sign values whose running sum stayed in range this run
  *    but would wrap under another partition order — and it covers
  *    non-ANSI sessions, where a wrapped sum is otherwise SILENT.
  * A rejected group means "use the decimal path" — fail loudly, never
  * corrupt silently.
  */
object Money {

  /** Upper bound under which n * max|cents| provably fits in Int64
    * (9.2e18 with headroom; compared in double, which is exact for
    * products below 2^53 and conservatively rounded above). */
  private val GuardLimit = 9.0e18

  /** value -> integer cents (HALF_UP at the second decimal, matching
    * decimal(18,2) casts of the same doubles). */
  def cents(value: Column): Column =
    round(value.cast("decimal(18,2)") * 100).cast("long")

  /** Grouped exact money sum via guarded long cents. Output columns:
    * group cols, `<out>` (decimal(38,2), exact), `n_rows`.
    * One map-side-combined aggregate pass; the guard adds two cheap
    * aggregates (count, max) to the same shuffle. Raises
    * GRAFT_MONEY_OVERFLOW_RISK if any group's worst case could wrap. */
  def sumCentsChecked(df: DataFrame, groupCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val c = cents(col(valueCol))
    df.select(groupCols.map(col) :+ c.as("_cents"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_cents")).as("_sum_cents"),
           count(lit(1)).as("n_rows"),
           max(abs(col("_cents"))).as("_max_abs"))
      .withColumn(out,
        when(col("n_rows").cast("double") * col("_max_abs").cast("double") >= GuardLimit,
          raise_error(concat(lit("GRAFT_MONEY_OVERFLOW_RISK: group "),
            concat_ws(",", groupCols.map(g => col(g).cast("string")): _*),
            lit(" may exceed int64 cents; use the decimal path"))).cast("decimal(38,2)"))
        .otherwise((col("_sum_cents").cast("decimal(38,2)") / 100).cast("decimal(38,2)")))
      .drop("_sum_cents", "_max_abs")
  }
}
