package graft

import org.apache.spark.sql.SparkSession

/** Env-driven session sizing shared by the runnable mains (Bench,
  * Verify, tools.TimeQueries).
  *
  * Input-split sizing is a per-deployment scale knob (SURVEY §5): the
  * right split is the one whose DECOMPRESSED work fits a task budget,
  * but Spark sizes splits from compressed file bytes. A recurring-crawl
  * corpus is the worst case — near-identical replica documents
  * dictionary-compress ~50x, so a 128 MB split of such a file carries
  * gigabytes of scoring work and the scan collapses to a handful of
  * tasks. `SPARK_GRAFT_MAX_PARTITION_BYTES` (e.g. "4m" for the local
  * sf1 runs) sets the split budget for such data; unset, Spark's
  * defaults apply unchanged. `openCostInBytes` is lowered with it so
  * many-small-file tables are not re-coalesced past the requested
  * granularity.
  */
object SessionTuning {
  def inputSplits(b: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").fold(b) { v =>
      b.config("spark.sql.files.maxPartitionBytes", v)
        .config("spark.sql.files.openCostInBytes", "65536")
    }
}
